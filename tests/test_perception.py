"""Perception model parity tests (random weights, converted) vs the
reference PyTorch architectures."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import REFERENCE_ROOT, reference_available

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


class TestBiSeNet:
    def test_shapes_and_jit(self):
        from dfanerf_tpu.models.perception.bisenet import apply_bisenet, init_bisenet

        params = init_bisenet(jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32)
        out, out16, out32 = jax.jit(apply_bisenet)(params, x)
        assert out.shape == (1, 64, 64, 19)
        assert out16.shape == out32.shape == (1, 64, 64, 19)
        assert bool(jnp.isfinite(out).all())

    @needs_reference
    def test_parity_vs_torch(self):
        import os, sys, types

        sys.path.insert(0, os.path.join(REFERENCE_ROOT, "data_util", "face_parsing"))
        import torch
        import torch.utils.model_zoo as modelzoo

        # torchvision isn't installed and model.py only imports it unused
        sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))

        # the reference Resnet18 downloads ImageNet weights at __init__;
        # no egress here, so neutralize and keep the random init
        modelzoo.load_url = lambda *a, **k: {}
        from model import BiSeNet as TorchBiSeNet

        from dfanerf_tpu.models.perception.bisenet import (
            apply_bisenet,
            bisenet_from_torch,
        )

        torch.manual_seed(0)
        net = TorchBiSeNet(19).eval()
        params = bisenet_from_torch(net.state_dict())
        x = np.random.RandomState(1).randn(1, 3, 64, 64).astype(np.float32)
        with torch.no_grad():
            ref, ref16, ref32 = net(torch.tensor(x))
        ours, ours16, ours32 = apply_bisenet(
            params, jnp.asarray(x.transpose(0, 2, 3, 1))
        )
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(ours32), ref32.numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
        )


class TestHRNet:
    def test_shapes(self):
        from dfanerf_tpu.models.perception.hrnet import apply_hrnet, init_hrnet

        params = init_hrnet(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 64, 64, 3))
        out = jax.jit(apply_hrnet)(params, x)
        assert out.shape == (1, 16, 16, 68)

    @needs_reference
    def test_parity_vs_torch(self):
        import os, sys

        sys.path.insert(
            0, os.path.join(REFERENCE_ROOT, "data_util", "face-alignment", "lib", "models")
        )
        import torch
        from face_hrnet import HighResolutionNet

        class NS:
            def __init__(self, **kw):
                self.__dict__.update(kw)

            def __getitem__(self, k):
                return self.__dict__[k]

        extra = NS(
            FINAL_CONV_KERNEL=1,
            STAGE2=dict(NUM_MODULES=1, NUM_BRANCHES=2, BLOCK="BASIC",
                        NUM_BLOCKS=[4, 4], NUM_CHANNELS=[18, 36], FUSE_METHOD="SUM"),
            STAGE3=dict(NUM_MODULES=4, NUM_BRANCHES=3, BLOCK="BASIC",
                        NUM_BLOCKS=[4, 4, 4], NUM_CHANNELS=[18, 36, 72], FUSE_METHOD="SUM"),
            STAGE4=dict(NUM_MODULES=3, NUM_BRANCHES=4, BLOCK="BASIC",
                        NUM_BLOCKS=[4, 4, 4, 4], NUM_CHANNELS=[18, 36, 72, 144],
                        FUSE_METHOD="SUM"),
        )
        # dict-style access used for stages, attr-style for EXTRA fields
        extra.__dict__["STAGE2"]["NUM_CHANNELS"] = [18, 36]
        config = NS(MODEL=NS(EXTRA=extra, NUM_JOINTS=68))

        torch.manual_seed(0)
        net = HighResolutionNet(config).eval()
        from dfanerf_tpu.models.perception.hrnet import apply_hrnet, hrnet_from_torch

        params = hrnet_from_torch(net.state_dict())
        x = np.random.RandomState(1).randn(1, 3, 64, 64).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.tensor(x))["heatmap"].numpy()
        ours = np.asarray(apply_hrnet(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(
            ours, ref.transpose(0, 2, 3, 1), atol=5e-4, rtol=1e-3
        )


class TestGhostNetEye:
    def test_shapes(self):
        from dfanerf_tpu.models.perception.ghostnet_eye import apply_eye_net, init_eye_net

        params = init_eye_net(jax.random.PRNGKey(0))
        x = jnp.zeros((2, 32, 48, 1))
        out = jax.jit(apply_eye_net)(params, x)
        assert out.shape == (2, 16, 24, 6)

    @needs_reference
    def test_parity_vs_torch(self):
        import os, sys

        sys.path.insert(
            0, os.path.join(REFERENCE_ROOT, "data_util", "face-alignment", "lib", "models")
        )
        import torch
        from eye_encoder_decoder_300w import get_eye_net

        class NS:
            def __init__(self, **kw):
                self.__dict__.update(kw)

        cfg = NS(MODEL=NS(
            NUM_EYE_JOINTS=6,
            EXTRA=NS(INTERMEDIATE_CHANNELS=240, USE_REGRESS_BRANCH=False,
                     USE_HEATMAP_BRANCH=True),
        ))
        torch.manual_seed(0)
        net = get_eye_net(cfg).eval()
        from dfanerf_tpu.models.perception.ghostnet_eye import (
            apply_eye_net,
            eye_net_from_torch,
        )

        params = eye_net_from_torch(net.state_dict())
        x = np.random.RandomState(2).randn(2, 1, 32, 48).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.tensor(x))["heatmap"].numpy()
        ours = np.asarray(apply_eye_net(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(
            ours, ref.transpose(0, 2, 3, 1), atol=5e-4, rtol=1e-3
        )


class TestMobileNetV2:
    def test_heatmap_head_shapes(self):
        from dfanerf_tpu.models.perception.mobilenet import (
            apply_face_mobilenet_heatmap, init_face_mobilenet_heatmap,
        )

        params = init_face_mobilenet_heatmap(jax.random.PRNGKey(0))
        x = jnp.zeros((1, 128, 128, 3))
        out = apply_face_mobilenet_heatmap(params, x)
        assert out.shape == (1, 16, 16, 68)

    @needs_reference
    def test_backbone_parity_vs_reference(self):
        import os, sys

        sys.path.insert(
            0, os.path.join(REFERENCE_ROOT, "data_util", "face-alignment", "lib")
        )
        import torch
        # import via package path so the relative `.mobile_head` import works
        # (clearing any other reference tree's 'models' package first)
        for k in [k for k in sys.modules if k == "models" or k.startswith("models.")]:
            del sys.modules[k]
        import importlib
        models_pkg = importlib.import_module("models.face_mobilenet")
        TorchMobileNetV2 = models_pkg.MobileNetV2

        from dfanerf_tpu.models.perception.mobilenet import (
            apply_mobilenet_v2, mobilenet_v2_from_torch,
        )

        torch.manual_seed(0)
        net = TorchMobileNetV2(cfg=None).eval()
        params = mobilenet_v2_from_torch(net.state_dict())
        x = np.random.RandomState(0).randn(1, 3, 64, 64).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.tensor(x)).numpy()
        ours = np.asarray(apply_mobilenet_v2(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(
            ours, ref.transpose(0, 2, 3, 1), atol=5e-4, rtol=1e-3
        )
