"""RAFT-small: real-weight parity vs the reference implementation using the
shipped raft-small.pth checkpoint."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import REFERENCE_ROOT, reference_available

from dfanerf_tpu.models.perception.raft import (
    apply_raft_small,
    flow_on_crops,
    init_raft_small,
    raft_small_from_torch,
)

RAFT_CKPT = os.path.join(
    REFERENCE_ROOT, "data_util", "UNFaceFlow", "pretrain_model", "raft-small.pth"
)
needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


class TestRaft:
    def test_shapes(self):
        params = init_raft_small(jax.random.PRNGKey(0))
        im = jnp.zeros((1, 32, 48, 3))
        flow, feat = apply_raft_small(params, im, im, iters=2)
        assert flow.shape == (1, 32, 48, 2)
        assert feat.shape == (1, 4, 6, 128)

    def test_zero_flow_for_identical_images(self):
        # with real weights, flow between identical images must be ~0
        if not os.path.isfile(RAFT_CKPT):
            pytest.skip("shipped raft-small.pth absent")
        import torch

        params = raft_small_from_torch(torch.load(RAFT_CKPT, map_location="cpu"))
        rng = np.random.RandomState(0)
        im = jnp.asarray(rng.randint(0, 255, (1, 64, 96, 3)).astype(np.float32))
        flow, _ = apply_raft_small(params, im, im, iters=12)
        assert float(jnp.abs(flow).mean()) < 0.5

    @needs_reference
    def test_real_weight_parity(self):
        import sys
        import types
        import torch

        core = os.path.join(REFERENCE_ROOT, "data_util", "UNFaceFlow", "core")
        sys.path.insert(0, core)
        from raft import RAFT as TorchRAFT

        class Args(dict):
            __getattr__ = dict.__getitem__

            def __contains__(self, k):
                return dict.__contains__(self, k)

        args = Args(small=True, mixed_precision=False, alternate_corr=False,
                    dropout=0, iters=6)
        net = TorchRAFT(args).eval()
        sd = torch.load(RAFT_CKPT, map_location="cpu")
        net.load_state_dict({k.replace("module.", ""): v for k, v in sd.items()})
        params = raft_small_from_torch(sd)

        # NOTE: size must keep the 1/64-res corr pyramid >= 2 px wide — the
        # reference's bilinear_sampler divides by (W-1) and NaNs on 1-px
        # levels (core/utils_core/utils.py:61), so 128x128 (both dims) not 64x96.
        ys, xs = np.mgrid[0:128, 0:128].astype(np.float32)
        im1 = np.stack(
            [128 + 100 * np.sin(xs / 10), 128 + 100 * np.cos(ys / 12),
             128 + 80 * np.sin((xs + ys) / 15)], 0,
        )[None]
        im2 = np.roll(im1, shift=3, axis=3)
        with torch.no_grad():
            ref_flow, ref_feat = net(torch.tensor(im1), torch.tensor(im2), iters=6)
        flow, feat = apply_raft_small(
            params,
            jnp.asarray(im1.transpose(0, 2, 3, 1)),
            jnp.asarray(im2.transpose(0, 2, 3, 1)),
            iters=6,
        )
        np.testing.assert_allclose(
            np.asarray(flow), ref_flow.numpy().transpose(0, 2, 3, 1),
            atol=5e-2, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(feat), ref_feat.numpy().transpose(0, 2, 3, 1),
            atol=5e-3, rtol=1e-3,
        )

    def test_flow_on_crops_contract(self):
        params = init_raft_small(jax.random.PRNGKey(0))
        src = np.zeros((1, 32, 48, 3), np.float32)
        tar = np.zeros((1, 32, 48, 3), np.float32)
        crop = np.array([[10, 58, 20, 52, 12, 60, 22, 54]])  # x1s x2s y1s y2s ...
        out = flow_on_crops(params, src, tar, crop, (128, 128), iters=1)
        assert out.shape == (1, 128, 128, 2)
        assert (out[0, :20, :, :] == 0).all()  # outside src rect untouched
        assert np.isfinite(out).all()


class TestRaftBasic:
    """RAFT 'basic' variant (core/raft.py:33-38 small=False): BasicEncoder,
    BasicUpdateBlock + SepConvGRU, convex upsampling, AlternateCorrBlock."""

    def test_shapes(self):
        from dfanerf_tpu.models.perception.raft import (
            apply_raft_basic, init_raft_basic)

        params = init_raft_basic(jax.random.PRNGKey(0))
        im = jnp.zeros((1, 32, 48, 3))
        flow, feat = apply_raft_basic(params, im, im, iters=2)
        assert flow.shape == (1, 32, 48, 2)
        assert feat.shape == (1, 4, 6, 256)

    def test_alternate_corr_equals_pyramid(self):
        """AlternateCorrBlock's fmap2-pooling lookup == CorrBlock's
        volume-pooling lookup (linearity of the dot product — the identity
        the reference's alt_cuda_corr path relies on)."""
        from dfanerf_tpu.models.perception.raft import (
            build_corr_pyramid, coords_grid, lookup_corr,
            lookup_corr_alternate)

        f1 = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 20, 32))
        f2 = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 20, 32))
        c = coords_grid(2, 16, 20) + jax.random.normal(
            jax.random.PRNGKey(3), (2, 16, 20, 2))
        a = lookup_corr(build_corr_pyramid(f1, f2), c, radius=4)
        b = lookup_corr_alternate(f1, f2, c, radius=4)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    @needs_reference
    @pytest.mark.slow
    def test_parity_vs_reference(self):
        """Fresh-init weight-for-weight parity vs the torch small=False
        RAFT in eval mode (BN running stats)."""
        import sys
        import torch

        core = os.path.join(REFERENCE_ROOT, "data_util", "UNFaceFlow", "core")
        if core not in sys.path:
            sys.path.insert(0, core)
        from raft import RAFT as TorchRAFT

        from dfanerf_tpu.models.perception.raft import (
            apply_raft_basic, raft_basic_from_torch)

        class Args(dict):
            __getattr__ = dict.__getitem__

            def __contains__(self, k):
                return dict.__contains__(self, k)

        args = Args(small=False, mixed_precision=False, alternate_corr=False,
                    dropout=0, iters=4)
        torch.manual_seed(3)
        net = TorchRAFT(args).eval()
        params = raft_basic_from_torch(net.state_dict())

        ys, xs = np.mgrid[0:128, 0:128].astype(np.float32)
        im1 = np.stack(
            [128 + 100 * np.sin(xs / 10), 128 + 100 * np.cos(ys / 12),
             128 + 80 * np.sin((xs + ys) / 15)], 0,
        )[None]
        im2 = np.roll(im1, shift=3, axis=3)
        with torch.no_grad():
            ref_flow, ref_feat = net(torch.tensor(im1), torch.tensor(im2),
                                     iters=4)
        flow, feat = apply_raft_basic(
            params,
            jnp.asarray(im1.transpose(0, 2, 3, 1)),
            jnp.asarray(im2.transpose(0, 2, 3, 1)),
            iters=4,
        )
        np.testing.assert_allclose(
            np.asarray(flow), ref_flow.numpy().transpose(0, 2, 3, 1),
            atol=5e-2, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(feat), ref_feat.numpy().transpose(0, 2, 3, 1),
            atol=5e-3, rtol=1e-3,
        )
