"""Model-zoo alternative backbones: weight-for-weight parity vs the
reference torch implementations (random-init torch model -> converter ->
JAX forward on the same input)."""

import os
import sys
import types

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, reference_available

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)

MODELS_DIR = os.path.join(
    REFERENCE_ROOT, "data_util", "face-alignment", "lib", "models"
)


def _ensure_torchvision_stub():
    """The reference zoo files import torchvision (absent here); other
    test modules may have installed their own partial stub — make sure
    whatever is in sys.modules carries a .models submodule."""
    tv = sys.modules.get("torchvision")
    if tv is None or not hasattr(tv, "models"):
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv.models


def _import_ref_module(name):
    """Import a reference lib/models file with heavyweight deps stubbed."""
    import importlib.util

    _ensure_torchvision_stub()
    spec = importlib.util.spec_from_file_location(
        f"ref_{name}", os.path.join(MODELS_DIR, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@needs_reference
@pytest.mark.parametrize("small", [False, True])
def test_u2net_parity(small):
    import torch
    import jax.numpy as jnp

    from dfanerf_tpu.models.perception.u2net import apply_u2net, u2net_from_torch

    ref = _import_ref_module("face_u2net")
    out_ch = 5
    torch.manual_seed(0)
    net = (ref.U2NETP_S5 if small else ref.U2NET)(in_ch=3, out_ch=out_ch)
    net.eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        ref_outs = net(x)

    params = u2net_from_torch(net.state_dict(), out_ch=out_ch, small=small)
    x_j = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    outs = apply_u2net(params, x_j, small=small)
    assert len(outs) == len(ref_outs)
    for got, want in zip(outs, ref_outs):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want.numpy(),
            atol=5e-4, rtol=1e-3,
        )


class _Cfg(dict):
    """Minimal yacs stand-in: attribute access + `in` support."""

    __getattr__ = dict.__getitem__


@needs_reference
@pytest.mark.parametrize("addition", [(None, False), (2, True)])
def test_face_ghostnet_parity(addition):
    import torch
    import jax.numpy as jnp

    from dfanerf_tpu.models.perception.ghostnet_face import (
        apply_face_ghostnet, face_ghostnet_from_torch,
    )

    ref = _import_ref_module("face_ghostnet")
    add_enc, add_dec = addition
    extra = _Cfg(
        INTERMEDIATE_CHANNELS=32, USE_REGRESS_BRANCH=False,
        USE_HEATMAP_BRANCH=True,
    )
    if add_enc:
        extra["ADDITION_ENCODER_LAYER"] = add_enc
    if add_dec:
        extra["ADDITION_DECODER_LAYER"] = True
    cfg = _Cfg(MODEL=_Cfg(EXTRA=extra, NUM_FACE_JOINTS=68, NUM_EYE_JOINTS=6))
    torch.manual_seed(0)
    net = ref.get_face_net(cfg, is_train=False)
    net.eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        want = net(x)["heatmap"].numpy()
    params = face_ghostnet_from_torch(
        net.state_dict(), addition_encoder=add_enc, addition_decoder=add_dec
    )
    got = apply_face_ghostnet(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        addition_encoder=add_enc, addition_decoder=add_dec,
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=5e-4, rtol=1e-3
    )


@needs_reference
def test_pose_hrnet_parity():
    """PoseHighResolutionNet: nearest fuse upsampling + branch-0 conv head
    (vs the face variant's bilinear fuse + concat head)."""
    import torch
    import jax.numpy as jnp

    from dfanerf_tpu.models.perception.hrnet import (
        apply_hrnet, hrnet_from_torch, pose_hrnet_config,
    )

    ref = _import_ref_module("pose_hrnet")
    extra = _Cfg(
        STAGE2=_Cfg(NUM_MODULES=1, NUM_BRANCHES=2, NUM_BLOCKS=[4, 4],
                    NUM_CHANNELS=[18, 36], BLOCK="BASIC", FUSE_METHOD="SUM"),
        STAGE3=_Cfg(NUM_MODULES=4, NUM_BRANCHES=3, NUM_BLOCKS=[4, 4, 4],
                    NUM_CHANNELS=[18, 36, 72], BLOCK="BASIC", FUSE_METHOD="SUM"),
        STAGE4=_Cfg(NUM_MODULES=3, NUM_BRANCHES=4, NUM_BLOCKS=[4, 4, 4, 4],
                    NUM_CHANNELS=[18, 36, 72, 144], BLOCK="BASIC",
                    FUSE_METHOD="SUM"),
        FINAL_CONV_KERNEL=1,
        PRETRAINED_LAYERS=["*"],
    )
    cfg_t = _Cfg(MODEL=_Cfg(EXTRA=extra, NUM_JOINTS=17))
    torch.manual_seed(0)
    net = ref.get_pose_net(cfg_t, is_train=False)
    net.eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        want = net(x).numpy()
    cfg = pose_hrnet_config(num_joints=17)
    params = hrnet_from_torch(net.state_dict(), cfg)
    got = apply_hrnet(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), cfg)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=5e-4, rtol=1e-3
    )


@needs_reference
def test_shufflenet_v2_parity():
    import torch
    import jax.numpy as jnp

    from dfanerf_tpu.models.perception.shufflenet import (
        apply_shufflenet_v2, shufflenet_v2_from_torch,
    )

    # the reference file does a package-relative import of a url helper it
    # never needs at inference; stub it
    utils_stub = types.ModuleType("ref_shuffle_utils")
    utils_stub.load_state_dict_from_url = lambda *a, **k: None
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_shufflenetv2", os.path.join(MODELS_DIR, "shufflenetv2.py")
    )
    mod = importlib.util.module_from_spec(spec)
    src = open(os.path.join(MODELS_DIR, "shufflenetv2.py")).read()
    src = src.replace("from .utils import load_state_dict_from_url",
                      "load_state_dict_from_url = None")
    exec(compile(src, "shufflenetv2.py", "exec"), mod.__dict__)

    torch.manual_seed(0)
    net = mod.shufflenet_v2_x0_5(num_classes=11)
    net.eval()
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        want = net(x).numpy()
    params = shufflenet_v2_from_torch(net.state_dict(), preset="x0.5")
    got = apply_shufflenet_v2(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), preset="x0.5"
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


@needs_reference
def test_face_mobilenet_ghosthead_parity():
    """MobileNetV2 features[:14] + GhostBottleneck decoder head
    (face_mobilenet_ghostHead.py)."""
    import torch
    import jax.numpy as jnp

    from dfanerf_tpu.models.perception.mobilenet import (
        apply_face_mobilenet_ghosthead,
        face_mobilenet_ghosthead_from_torch,
    )

    # the module imports eye_ghostnet + mobile_head relatively; load via a
    # synthetic package
    import importlib.util

    pkg = types.ModuleType("refzoo")
    pkg.__path__ = [MODELS_DIR]
    sys.modules["refzoo"] = pkg
    _ensure_torchvision_stub()
    ref = __import__("refzoo.face_mobilenet_ghostHead", fromlist=["x"])

    spec = ((1, 200, 96, 3, 1, 2), (1, 120, 64, 3, 1, 2))
    extra = _Cfg(
        USE_REGRESS_BRANCH=False, USE_HEATMAP_BRANCH=True, USE_AUX_HEAD=False,
        NUM_LAYERS=[n for n, *_ in spec],
        EXP_SIZE=[e for _, e, *_ in spec],
        NUM_FILTERS=[f for _, _, f, *_ in spec],
        NUM_KERNELS=[k for *_, k, _, _ in spec],
        USE_SE=[se for *_, se, _ in spec],
        STRIDES=[s for *_, s in spec],
        FINAL_CONV_KERNEL=1,
        USE_PRETRAIN=False,
    )
    cfg_t = _Cfg(
        MODEL=_Cfg(EXTRA=extra, NUM_FACE_JOINTS=68, IMAGE_SIZE=[64, 64]),
        FACE_DATASET=_Cfg(NEGATIVE_EXAMPLE=False),
    )
    torch.manual_seed(0)
    net = ref.get_face_net(cfg_t, is_train=False)
    net.eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        want = net(x)["heatmap"].numpy()
    params = face_mobilenet_ghosthead_from_torch(net.state_dict(), spec=spec)
    got = apply_face_mobilenet_ghosthead(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), spec=spec
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=5e-4, rtol=1e-3
    )


@needs_reference
@pytest.mark.parametrize("depth", [18, 50])
def test_pose_resnet_parity(depth):
    """PoseResNet (pose_resnet.py): ResNet trunk + ConvTranspose2d head —
    a distinct architecture family from the HRNet/mobilenet zoo."""
    import torch
    import jax.numpy as jnp

    from dfanerf_tpu.models.perception.zoo_extra import (
        apply_pose_resnet, pose_resnet_from_torch,
    )

    ref = _import_ref_module("pose_resnet")
    extra = _Cfg(
        NUM_LAYERS=depth, DECONV_WITH_BIAS=False, NUM_DECONV_LAYERS=3,
        NUM_DECONV_FILTERS=[256, 256, 256], NUM_DECONV_KERNELS=[4, 4, 4],
        FINAL_CONV_KERNEL=1,
    )
    cfg = _Cfg(MODEL=_Cfg(EXTRA=extra, NUM_JOINTS=17, INIT_WEIGHTS=False))
    torch.manual_seed(0)
    net = ref.get_pose_net(cfg, is_train=False)
    net.eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        want = net(x).numpy()
    params = pose_resnet_from_torch(net.state_dict(), depth=depth)
    got = apply_pose_resnet(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), depth=depth
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=5e-4, rtol=1e-3
    )


@needs_reference
def test_face_mobilenet_drelu_parity():
    """MobileNetV2-DReLU face net (face_mobilenet_DReLU.py): the dynamic
    k-piece-max activation + regress/heatmap/aux heads."""
    import torch
    import jax.numpy as jnp

    from dfanerf_tpu.models.perception.zoo_extra import (
        apply_face_mobilenet_drelu, face_mobilenet_drelu_from_torch,
    )

    ref = _import_ref_module("face_mobilenet_DReLU")
    extra = _Cfg(
        INTERMEDIATE_CHANNELS=32, USE_REGRESS_BRANCH=True,
        USE_HEATMAP_BRANCH=True, USE_AUX_HEAD=True,
        DECONV_WITH_BIAS=False, NUM_DECONV_LAYERS=3,
        NUM_DECONV_FILTERS=[256, 256, 256], NUM_DECONV_KERNELS=[4, 4, 4],
        FINAL_CONV_KERNEL=1, DOWN_SAMPLE=32,
    )
    cfg = _Cfg(
        MODEL=_Cfg(EXTRA=extra, NUM_FACE_JOINTS=68, IMAGE_SIZE=[64, 64])
    )
    torch.manual_seed(0)
    net = ref.get_face_net(cfg, is_train=False)
    net.eval()
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        want = net(x)
    params = face_mobilenet_drelu_from_torch(net.state_dict())
    got = apply_face_mobilenet_drelu(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(got["regress"]), want["regress"].numpy(),
        atol=5e-4, rtol=1e-3,
    )
    for k in ("heatmap", "heatmap_aux"):
        np.testing.assert_allclose(
            np.asarray(got[k]).transpose(0, 3, 1, 2), want[k].numpy(),
            atol=5e-4, rtol=1e-3,
        )


@needs_reference
def test_center_mobilenet_parity():
    """CenterNet-style FaceMobileNet (face_centerMobilenet.py): multi-scale
    MobileNetV2 features + grouped-deconv FPN + per-task heads."""
    import torch
    import jax.numpy as jnp

    from dfanerf_tpu.models.perception.zoo_extra import (
        DEFAULT_CENTER_HEADS, apply_center_mobilenet,
        center_mobilenet_from_torch,
    )

    ref = _import_ref_module("face_centerMobilenet")
    torch.manual_seed(0)
    net = ref.get_face_net(is_train=False)
    net.eval()
    x = torch.randn(1, 3, 128, 128)
    with torch.no_grad():
        want = net(x)
    params = center_mobilenet_from_torch(net.state_dict())
    got = apply_center_mobilenet(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]).transpose(0, 3, 1, 2), want[k].numpy(),
            atol=5e-4, rtol=1e-3,
        )


@needs_reference
def test_mobile_head_parity():
    """MobileHead decoder (mobile_head.py): bilinear upsample +
    mobile_block InvertedResiduals (fixed padding, 768 hidden cap)."""
    import torch
    import jax.numpy as jnp

    from dfanerf_tpu.models.perception.zoo_extra import (
        MOBILE_HEAD_SETTING, apply_mobile_head, mobile_head_from_torch,
    )

    # mobile_head imports mobile_block relatively; load via synthetic pkg
    pkg = types.ModuleType("refzoo")
    pkg.__path__ = [MODELS_DIR]
    sys.modules["refzoo"] = pkg
    _ensure_torchvision_stub()
    ref = __import__("refzoo.mobile_head", fromlist=["x"])

    cfg = _Cfg(MODEL=_Cfg(EXTRA=_Cfg(DECONV_WITH_BIAS=False)))
    torch.manual_seed(0)
    net = ref.MobileHead(cfg, 96, 68, [list(s) for s in MOBILE_HEAD_SETTING])
    net.eval()
    x = torch.randn(1, 96, 8, 8)
    with torch.no_grad():
        want = net(x).numpy()
    params = mobile_head_from_torch(net.state_dict())
    got = apply_mobile_head(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=5e-4, rtol=1e-3
    )


@needs_reference
@pytest.mark.parametrize("dense", [True, False])
def test_face_mobilenet_densereg_parity(dense):
    """denseReg variant: 1x1 dense-regression (or pooled FC) on
    features[:14] + aux deconv head (its use_heatmap branch references an
    undefined c4 upstream and is out of contract)."""
    import torch
    import jax.numpy as jnp

    from dfanerf_tpu.models.perception.zoo_extra import (
        apply_face_mobilenet_densereg, face_mobilenet_densereg_from_torch,
    )

    pkg = types.ModuleType("refzoo")
    pkg.__path__ = [MODELS_DIR]
    sys.modules["refzoo"] = pkg
    _ensure_torchvision_stub()
    ref = __import__("refzoo.face_mobilenet_denseReg", fromlist=["x"])
    extra = _Cfg(
        INTERMEDIATE_CHANNELS=32, USE_REGRESS_BRANCH=True,
        USE_HEATMAP_BRANCH=False, USE_AUX_HEAD=True,
        DECONV_WITH_BIAS=False, NUM_DECONV_LAYERS=3,
        NUM_DECONV_FILTERS=[256, 256, 256], NUM_DECONV_KERNELS=[4, 4, 4],
        FINAL_CONV_KERNEL=1, DOWN_SAMPLE=32, DENSE_REGRESSION=dense,
    )
    cfg = _Cfg(
        MODEL=_Cfg(EXTRA=extra, NUM_FACE_JOINTS=68, IMAGE_SIZE=[64, 64]),
        FACE_DATASET=_Cfg(NEGATIVE_EXAMPLE=False),
    )
    torch.manual_seed(0)
    net = ref.get_face_net(cfg, is_train=False)
    net.eval()
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        want = net(x)
    params = face_mobilenet_densereg_from_torch(net.state_dict())
    got = apply_face_mobilenet_densereg(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), dense=dense
    )
    w_reg = want["regress"].numpy()
    g_reg = np.asarray(got["regress"])
    if dense:
        g_reg = g_reg.transpose(0, 3, 1, 2)
    np.testing.assert_allclose(g_reg, w_reg, atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(got["heatmap_aux"]).transpose(0, 3, 1, 2),
        want["heatmap_aux"].numpy(), atol=5e-4, rtol=1e-3,
    )


@needs_reference
@pytest.mark.parametrize("variant", ["eyeBranch", "mutiScale"])
def test_face_mobilenet_staged_variants_parity(variant):
    """eyeBranch / mutiScale regress variants (staged backbone split;
    their use_heatmap branches reference undefined c4 upstream)."""
    import torch
    import jax.numpy as jnp

    from dfanerf_tpu.models.perception.zoo_extra import (
        apply_face_mobilenet_eyebranch,
        apply_face_mobilenet_mutiscale,
        face_mobilenet_staged_from_torch,
    )

    pkg = types.ModuleType("refzoo")
    pkg.__path__ = [MODELS_DIR]
    sys.modules["refzoo"] = pkg
    _ensure_torchvision_stub()
    ref = __import__(f"refzoo.face_mobilenet_{variant}", fromlist=["x"])
    extra = _Cfg(
        INTERMEDIATE_CHANNELS=32, USE_REGRESS_BRANCH=True,
        USE_HEATMAP_BRANCH=False, USE_AUX_HEAD=False,
        DECONV_WITH_BIAS=False, NUM_DECONV_LAYERS=3,
        NUM_DECONV_FILTERS=[256, 256, 256], NUM_DECONV_KERNELS=[4, 4, 4],
        FINAL_CONV_KERNEL=1, DOWN_SAMPLE=32,
    )
    cfg = _Cfg(
        MODEL=_Cfg(EXTRA=extra, NUM_FACE_JOINTS=68, NUM_EYE_JOINTS=6,
                   IMAGE_SIZE=[64, 64]),
        FACE_DATASET=_Cfg(NEGATIVE_EXAMPLE=False),
    )
    torch.manual_seed(0)
    net = ref.get_face_net(cfg, is_train=False)
    net.eval()
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        want = net(x)
    params = face_mobilenet_staged_from_torch(net.state_dict())
    apply = (apply_face_mobilenet_eyebranch if variant == "eyeBranch"
             else apply_face_mobilenet_mutiscale)
    got = apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k].numpy(), atol=5e-4, rtol=1e-3
        )


@needs_reference
def test_pose_mobilenet_parity():
    """PoseMobilenet (pose_mobilenet.py): full MobileNetV2 + ConvBNReLU
    funnel -> MLP regress head + deconv heatmap head."""
    import torch
    import jax.numpy as jnp

    from dfanerf_tpu.models.perception.zoo_extra import (
        apply_pose_mobilenet, pose_mobilenet_from_torch,
    )

    ref = _import_ref_module("pose_mobilenet")
    extra = _Cfg(
        INTERMEDIATE_CHANNELS=32, USE_REGRESS_BRANCH=True,
        USE_HEATMAP_BRANCH=True, DECONV_WITH_BIAS=False,
        NUM_DECONV_LAYERS=3, NUM_DECONV_FILTERS=[256, 256, 256],
        NUM_DECONV_KERNELS=[4, 4, 4], FINAL_CONV_KERNEL=1, DOWN_SAMPLE=32,
    )
    cfg = _Cfg(MODEL=_Cfg(EXTRA=extra, NUM_FACE_JOINTS=68, NUM_JOINTS=17,
                          IMAGE_SIZE=[64, 64]))
    torch.manual_seed(0)
    net = ref.get_pose_net(cfg, is_train=False)
    net.eval()
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        want = net(x)
    params = pose_mobilenet_from_torch(net.state_dict())
    got = apply_pose_mobilenet(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(got["regress"]), want["regress"].numpy(),
        atol=5e-4, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(got["heatmap"]).transpose(0, 3, 1, 2),
        want["heatmap"].numpy(), atol=5e-4, rtol=1e-3,
    )


@needs_reference
@pytest.mark.parametrize(
    "variant,kwargs",
    [
        ("eye_encoder_decoder", dict(rgb=True, brow=True, dm=0)),
        ("eye_encoder_decoder", dict(rgb=False, brow=False, dm=2)),
        ("eye_encoder_decoder_half", dict(add_enc=2, add_dec=True)),
    ],
)
def test_eye_encoder_decoder_variants_parity(variant, kwargs):
    """The non-300w eye encoder-decoder family: RGB input, brow channels,
    gaussian-modulate conv, addition encoder/decoder layers."""
    import torch
    import jax.numpy as jnp

    from dfanerf_tpu.models.perception.zoo_extra import (
        apply_eye_net_general, eye_net_general_from_torch, eye_net_sets,
    )

    ref = _import_ref_module(variant)
    extra = _Cfg(INTERMEDIATE_CHANNELS=32, USE_REGRESS_BRANCH=False,
                 USE_HEATMAP_BRANCH=True)
    if variant == "eye_encoder_decoder":
        rgb, brow, dm = kwargs["rgb"], kwargs["brow"], kwargs["dm"]
        if brow:
            extra["USE_BROW"] = True
        if dm:
            extra["USE_DM"] = True
        cfg = _Cfg(
            MODEL=_Cfg(EXTRA=extra, NUM_EYE_JOINTS=6, FACE_SIGMA=dm),
            DATASET=_Cfg(COLOR_RGB=rgb),
        )
        enc_sets, dec_sets = eye_net_sets()
        in_ch = 3 if rgb else 1
        sigma = float(dm)
    else:
        extra["ADDITION_ENCODER_LAYER"] = kwargs["add_enc"]
        extra["ADDITION_DECODER_LAYER"] = kwargs["add_dec"]
        cfg = _Cfg(MODEL=_Cfg(EXTRA=extra, NUM_EYE_JOINTS=6))
        enc_sets, dec_sets = eye_net_sets(kwargs["add_enc"],
                                          kwargs["add_dec"])
        in_ch = 3
        sigma = 0.0
    torch.manual_seed(0)
    net = ref.get_eye_net(cfg, is_train=False)
    net.eval()
    x = torch.randn(1, in_ch, 32, 48)
    with torch.no_grad():
        want = net(x)["heatmap"].numpy()
    params = eye_net_general_from_torch(net.state_dict(), enc_sets, dec_sets)
    got = apply_eye_net_general(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        enc_sets, dec_sets, num_joints=6, gaussian_sigma=sigma,
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=5e-4, rtol=1e-3
    )


@needs_reference
@pytest.mark.parametrize("variant", ["eye_ghostnet", "eye_fullGhostnet"])
def test_eye_ghostnet_regress_parity(variant):
    """Coordinate-regression GhostNet eye nets (squeeze + GAP + BN1d MLP)."""
    import torch
    import jax.numpy as jnp

    from dfanerf_tpu.models.perception.zoo_extra import (
        EYE_FULL_GHOSTNET_SETS, EYE_GHOSTNET_SETS,
        apply_eye_ghostnet_regress, eye_ghostnet_regress_from_torch,
    )

    ref = _import_ref_module(variant)
    extra = _Cfg(INTERMEDIATE_CHANNELS=32, USE_REGRESS_BRANCH=True,
                 USE_HEATMAP_BRANCH=False)
    cfg = _Cfg(MODEL=_Cfg(EXTRA=extra, NUM_EYE_JOINTS=6))
    torch.manual_seed(0)
    net = ref.get_eye_net(cfg, is_train=False)
    net.eval()
    sets = (EYE_GHOSTNET_SETS if variant == "eye_ghostnet"
            else EYE_FULL_GHOSTNET_SETS)
    x = torch.randn(2, 1, 32, 48)
    with torch.no_grad():
        want = net(x).numpy()
    params = eye_ghostnet_regress_from_torch(net.state_dict(), sets)
    got = apply_eye_ghostnet_regress(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), sets
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


@needs_reference
def test_mobile_hrnet_parity():
    """Mobile HRNet (pose_mobile_hrnet.py): HRNet skeleton with MOBILE
    InvertedResidual blocks (biased convs, ReLU6, fixed input padding)."""
    import torch
    import jax.numpy as jnp

    from dfanerf_tpu.models.perception.zoo_extra import (
        MOBILE_HRNET_STAGES, apply_mobile_hrnet, mobile_hrnet_from_torch,
    )

    ref = _import_ref_module("pose_mobile_hrnet")
    extra = _Cfg(
        STAGE2=_Cfg(NUM_MODULES=1, NUM_BRANCHES=2, NUM_BLOCKS=[4, 4],
                    NUM_CHANNELS=[18, 36], BLOCK="MOBILE", FUSE_METHOD="SUM"),
        STAGE3=_Cfg(NUM_MODULES=4, NUM_BRANCHES=3, NUM_BLOCKS=[4, 4, 4],
                    NUM_CHANNELS=[18, 36, 72], BLOCK="MOBILE",
                    FUSE_METHOD="SUM"),
        STAGE4=_Cfg(NUM_MODULES=3, NUM_BRANCHES=4, NUM_BLOCKS=[4, 4, 4, 4],
                    NUM_CHANNELS=[18, 36, 72, 144], BLOCK="MOBILE",
                    FUSE_METHOD="SUM"),
        FINAL_CONV_KERNEL=1,
        PRETRAINED_LAYERS=["*"],
    )
    cfg_t = _Cfg(MODEL=_Cfg(EXTRA=extra, NUM_JOINTS=17, INIT_WEIGHTS=False))
    torch.manual_seed(0)
    net = ref.get_pose_net(cfg_t, is_train=False)
    net.eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        want = net(x).numpy()
    params = mobile_hrnet_from_torch(net.state_dict())
    got = apply_mobile_hrnet(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=5e-4, rtol=1e-3
    )


@needs_reference
def test_pose_face_resnet_parity():
    """pose_face_resnet.py: PoseResNet trunk with TWO deconv heads (pose +
    face), outputs channel-concatenated."""
    import torch
    import jax.numpy as jnp

    from dfanerf_tpu.models.perception.zoo_extra import (
        apply_pose_face_resnet, pose_face_resnet_from_torch,
    )

    ref = _import_ref_module("pose_face_resnet")
    extra = _Cfg(
        NUM_LAYERS=18, DECONV_WITH_BIAS=False, NUM_DECONV_LAYERS=3,
        NUM_DECONV_FILTERS=[256, 256, 256], NUM_DECONV_KERNELS=[4, 4, 4],
        FINAL_CONV_KERNEL=1,
    )
    cfg = _Cfg(MODEL=_Cfg(EXTRA=extra, NUM_POSE_JOINTS=17,
                          NUM_FACE_JOINTS=68, INIT_WEIGHTS=False))
    torch.manual_seed(0)
    net = ref.get_pose_net(cfg, is_train=False)
    net.eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        want = net(x).numpy()
    params = pose_face_resnet_from_torch(net.state_dict(), depth=18)
    got = apply_pose_face_resnet(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), depth=18
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=5e-4, rtol=1e-3
    )


@needs_reference
def test_face_mobilenet_deconv_parity():
    """face_mobilenet.py exact deconv heads (use_mobile_head=False):
    regress + heatmap + aux on the plain ReLU6 backbone."""
    import torch
    import jax.numpy as jnp

    from dfanerf_tpu.models.perception.zoo_extra import (
        apply_face_mobilenet_deconv, face_mobilenet_deconv_from_torch,
    )

    pkg = types.ModuleType("refzoo")
    pkg.__path__ = [MODELS_DIR]
    sys.modules["refzoo"] = pkg
    _ensure_torchvision_stub()
    ref = __import__("refzoo.face_mobilenet", fromlist=["x"])
    extra = _Cfg(
        INTERMEDIATE_CHANNELS=32, USE_REGRESS_BRANCH=True,
        USE_HEATMAP_BRANCH=True, USE_AUX_HEAD=True,
        DECONV_WITH_BIAS=False, NUM_DECONV_LAYERS=3,
        NUM_DECONV_FILTERS=[256, 256, 256], NUM_DECONV_KERNELS=[4, 4, 4],
        FINAL_CONV_KERNEL=1, DOWN_SAMPLE=32,
    )
    cfg = _Cfg(
        MODEL=_Cfg(EXTRA=extra, NUM_FACE_JOINTS=68, IMAGE_SIZE=[64, 64]),
        FACE_DATASET=_Cfg(NEGATIVE_EXAMPLE=False),
    )
    torch.manual_seed(0)
    net = ref.get_face_net(cfg, is_train=False)
    net.eval()
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        want = net(x)
    params = face_mobilenet_deconv_from_torch(net.state_dict())
    got = apply_face_mobilenet_deconv(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(got["regress"]), want["regress"].numpy(),
        atol=5e-4, rtol=1e-3,
    )
    for k in ("heatmap", "heatmap_aux"):
        np.testing.assert_allclose(
            np.asarray(got[k]).transpose(0, 3, 1, 2), want[k].numpy(),
            atol=5e-4, rtol=1e-3,
        )


@needs_reference
@pytest.mark.parametrize("num_modules", [1, 2])
def test_fan_hourglass_parity(num_modules):
    """FAN stacked hourglass + CoordConv (face_net.py, coord_conv.py)."""
    import torch
    import jax.numpy as jnp

    from dfanerf_tpu.models.perception.zoo_extra import apply_fan, fan_from_torch

    # face_net imports core.coord_conv; alias a stub package for it, with
    # the cuda() calls neutralized for CPU execution
    import importlib.util

    cc_path = os.path.join(REFERENCE_ROOT, "data_util", "face-alignment",
                           "lib", "core", "coord_conv.py")
    src = open(cc_path).read().replace(".cuda()", "")
    cc = types.ModuleType("core.coord_conv")
    exec(compile(src, cc_path, "exec"), cc.__dict__)
    core_pkg = types.ModuleType("core")
    core_pkg.coord_conv = cc
    sys.modules["core"] = core_pkg
    sys.modules["core.coord_conv"] = cc

    spec = importlib.util.spec_from_file_location(
        "ref_face_net", os.path.join(MODELS_DIR, "face_net.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    torch.manual_seed(0)
    net = mod.FAN(num_modules=num_modules, num_landmarks=68)
    net.eval()
    # the reference hard-codes CoordConv dims for 256^2 inputs
    x = torch.randn(1, 3, 256, 256)
    with torch.no_grad():
        want_outs, want_bnds = net(x)
    params = fan_from_torch(net.state_dict(), num_modules=num_modules)
    outs, bnds = apply_fan(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        num_modules=num_modules,
    )
    assert len(outs) == len(want_outs)
    for got, want in zip(outs, want_outs):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want.numpy(),
            atol=5e-4, rtol=1e-3,
        )


@needs_reference
def test_face_mobilenet_old_parity():
    """face_mobilenet_old.py: unsplit MobileNetV2 + funnel + flatten MLP."""
    import torch
    import jax.numpy as jnp

    from dfanerf_tpu.models.perception.zoo_extra import (
        apply_face_mobilenet_old, face_mobilenet_old_from_torch,
    )

    ref = _import_ref_module("face_mobilenet_old")
    extra = _Cfg(DOWN_SAMPLE=32, INTERMEDIATE_CHANNELS=32,
                 USE_REGRESS_BRANCH=True, USE_HEATMAP_BRANCH=False)
    cfg = _Cfg(MODEL=_Cfg(EXTRA=extra, NUM_FACE_JOINTS=68,
                          IMAGE_SIZE=[64, 64]))
    torch.manual_seed(0)
    net = ref.get_face_net(cfg, is_train=False)
    net.eval()
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        want = net(x).numpy()
    params = face_mobilenet_old_from_torch(net.state_dict())
    got = apply_face_mobilenet_old(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


@needs_reference
def test_u2net_odd_size_ceil_pools():
    """ceil_mode pooling path: odd spatial sizes round UP at every level."""
    import torch
    import jax.numpy as jnp

    from dfanerf_tpu.models.perception.u2net import apply_u2net, u2net_from_torch

    ref = _import_ref_module("face_u2net")
    torch.manual_seed(1)
    net = ref.U2NETP_S5(in_ch=3, out_ch=2)
    net.eval()
    x = torch.randn(1, 3, 50, 38)
    with torch.no_grad():
        ref_outs = net(x)
    params = u2net_from_torch(net.state_dict(), out_ch=2, small=True)
    outs = apply_u2net(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                       small=True)
    np.testing.assert_allclose(
        np.asarray(outs[0]).transpose(0, 3, 1, 2), ref_outs[0].numpy(),
        atol=5e-4, rtol=1e-3,
    )
