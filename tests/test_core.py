"""Golden-value and reference-parity tests for the pure math core."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import add_reference_to_path, reference_available

from dfanerf_tpu.core import (
    calc_volume_weights,
    composite_fields,
    euler2rot,
    get_rays,
    nerf_embedder,
    nerf_embed_dim,
    pose_to_euler_trans,
    rot_to_euler,
    sample_pdf,
    sincos_posenc,
    stratified_z_vals,
)
from dfanerf_tpu.core.posenc import et_embed
from dfanerf_tpu.core.rays import rays_for_pixels

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


# ---------------------------------------------------------------------------
# Independent numpy oracles (hand-derived from the published NeRF equations,
# used to validate both our code and — indirectly — the reference semantics).
# ---------------------------------------------------------------------------


def np_volume_weights(z_vals, ray_d, sigma, last_dist=1e10):
    dists = np.diff(z_vals, axis=-1)
    dists = np.concatenate([dists, np.full_like(dists[..., :1], last_dist)], -1)
    dists = dists * np.linalg.norm(ray_d, axis=-1, keepdims=True)
    alpha = 1.0 - np.exp(-(np.maximum(sigma, 0) + 1e-6) * dists)
    trans = np.cumprod(
        np.concatenate([np.ones_like(alpha[..., :1]), 1 - alpha + 1e-10], -1), -1
    )[..., :-1]
    return alpha * trans


class TestPosenc:
    def test_sincos_shape_and_values(self):
        p = jnp.array([[0.5, -0.25, 1.0]])
        enc = sincos_posenc(p, n_freqs=10, downscale=2.0)
        assert enc.shape == (1, 60)
        # first 3 entries: sin(pi * p / 2)
        np.testing.assert_allclose(
            np.asarray(enc[0, :3]), np.sin(np.pi * np.array([0.5, -0.25, 1.0]) / 2),
            atol=1e-6,
        )
        # entries 3:6: cos(pi * p / 2)
        np.testing.assert_allclose(
            np.asarray(enc[0, 3:6]), np.cos(np.pi * np.array([0.5, -0.25, 1.0]) / 2),
            atol=1e-6,
        )

    def test_embedder_layout(self):
        x = jnp.array([[0.3, -0.7, 2.0]])
        out = nerf_embedder(x, multires=3)
        assert out.shape == (1, nerf_embed_dim(3)) == (1, 21)
        xn = np.array([0.3, -0.7, 2.0])
        np.testing.assert_allclose(np.asarray(out[0, :3]), xn, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out[0, 3:6]), np.sin(xn), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out[0, 6:9]), np.cos(xn), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out[0, 9:12]), np.sin(2 * xn), rtol=1e-6)

    def test_et_embed_dim(self):
        et = jnp.ones((5, 6))
        assert et_embed(et).shape == (5, 42)

    @needs_reference
    def test_sincos_matches_reference_decoder(self):
        add_reference_to_path()
        import torch
        from decoder import Decoder as TorchDecoder

        dec = TorchDecoder(z_dim=8, hidden_size=16, dim_signal=4)
        p = torch.randn(1, 100, 3)
        ref = dec.transform_points(p).detach().numpy()
        ours = np.asarray(sincos_posenc(jnp.asarray(p.numpy()), 10, 2.0))
        np.testing.assert_allclose(ours, ref, atol=1e-5)
        ref_v = dec.transform_points(p, views=True).detach().numpy()
        ours_v = np.asarray(sincos_posenc(jnp.asarray(p.numpy()), 4, 2.0))
        np.testing.assert_allclose(ours_v, ref_v, atol=1e-5)

    @needs_reference
    def test_embedder_matches_reference(self):
        add_reference_to_path()
        import torch
        from run_nerf_helpers import get_embedder

        embed_fn, out_dim = get_embedder(3, 0)
        assert out_dim == nerf_embed_dim(3)
        x = torch.randn(7, 3)
        ref = embed_fn(x).detach().numpy()
        ours = np.asarray(nerf_embedder(jnp.asarray(x.numpy()), 3))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestRays:
    def test_ray_dirs_center_pixel(self):
        c2w = jnp.eye(4)
        rays_o, rays_d = get_rays(4, 4, focal=2.0, c2w=c2w, cx=2.0, cy=2.0)
        assert rays_o.shape == (4, 4, 3) and rays_d.shape == (4, 4, 3)
        # pixel (2,2) looks straight down -z
        np.testing.assert_allclose(
            np.asarray(rays_d[2, 2]), [0.0, 0.0, -1.0], atol=1e-6
        )
        # pixel to the right has +x component, pixel below has -y (y flip)
        assert rays_d[2, 3, 0] > 0
        assert rays_d[3, 2, 1] < 0

    def test_rays_for_pixels_matches_grid(self):
        key = jax.random.PRNGKey(0)
        c2w = jnp.eye(4).at[:3, 3].set(jnp.array([0.1, -0.2, 0.5]))
        H = W = 8
        rays_o, rays_d = get_rays(H, W, 3.0, c2w, cx=3.5, cy=4.5)
        coords = jax.random.randint(key, (16, 2), 0, 8)
        ro, rd = rays_for_pixels(coords, 3.0, c2w, cx=3.5, cy=4.5)
        np.testing.assert_allclose(
            np.asarray(ro), np.asarray(rays_o[coords[:, 0], coords[:, 1]]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(rd), np.asarray(rays_d[coords[:, 0], coords[:, 1]]), atol=1e-6
        )

    @needs_reference
    def test_matches_reference_get_rays(self):
        add_reference_to_path()
        import torch
        import run_nerf_helpers as rh

        c2w_np = np.array(
            [
                [0.9, -0.1, 0.2, 0.05],
                [0.1, 0.95, -0.05, -0.3],
                [-0.2, 0.05, 0.97, 0.8],
            ],
            dtype=np.float32,
        )
        ref_o, ref_d = rh.get_rays(6, 8, 5.0, torch.tensor(c2w_np), cx=4.1, cy=2.9)
        ours_o, ours_d = get_rays(6, 8, 5.0, jnp.asarray(c2w_np), cx=4.1, cy=2.9)
        np.testing.assert_allclose(np.asarray(ours_o), ref_o.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ours_d), ref_d.numpy(), atol=1e-5)


class TestSampling:
    def test_stratified_linspace(self):
        z = stratified_z_vals(0.3, 0.9, 4, 5)
        assert z.shape == (4, 5)
        np.testing.assert_allclose(
            np.asarray(z[0]), np.linspace(0.3, 0.9, 5), rtol=1e-6
        )

    def test_stratified_jitter_in_bounds(self):
        z = stratified_z_vals(0.3, 0.9, 128, 16, key=jax.random.PRNGKey(1))
        assert float(z.min()) >= 0.3 and float(z.max()) <= 0.9
        assert bool(jnp.all(jnp.diff(z, axis=-1) > 0))

    def test_sample_pdf_det_concentrates(self):
        # all weight in one bin -> samples land in that bin
        bins = jnp.linspace(0.0, 1.0, 6)[None, :]  # 5 bins
        weights = jnp.array([[0.0, 0.0, 10.0, 0.0, 0.0]])
        s = sample_pdf(bins, weights, 100, det=True)
        frac_in_bin = float(jnp.mean((s >= 0.4) & (s <= 0.6)))
        assert frac_in_bin > 0.97

    @needs_reference
    def test_sample_pdf_matches_reference_det(self):
        add_reference_to_path()
        import torch
        import run_nerf_helpers as rh

        rng = np.random.RandomState(3)
        bins = np.sort(rng.rand(4, 9).astype(np.float32), axis=-1)
        weights = rng.rand(4, 8).astype(np.float32)
        ref = rh.sample_pdf(
            torch.tensor(bins), torch.tensor(weights), 16, det=True
        ).numpy()
        ours = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 16, det=True))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestCompositing:
    def test_weights_match_numpy_oracle(self):
        rng = np.random.RandomState(0)
        z = np.sort(rng.rand(2, 8, 16).astype(np.float32), axis=-1)
        rd = rng.randn(2, 8, 3).astype(np.float32)
        sig = rng.randn(2, 8, 16).astype(np.float32)
        ours = np.asarray(calc_volume_weights(jnp.asarray(z), jnp.asarray(rd), jnp.asarray(sig)))
        ref = np_volume_weights(z, rd, sig)
        # fp32 exp/cumprod ordering noise: tight absolute, loose relative
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=5e-5)

    def test_weights_sum_below_one(self):
        z = jnp.broadcast_to(jnp.linspace(0.3, 0.9, 64), (4, 64))
        rd = jnp.ones((4, 3))
        sig = jnp.full((4, 64), 100.0)
        w = calc_volume_weights(z, rd, sig)
        assert bool(jnp.all(w.sum(-1) <= 1.0 + 1e-5))
        # opaque volume: nearly all weight lands early
        assert float(w[:, 0].min()) > 0.5

    def test_composite_two_fields(self):
        rng = np.random.RandomState(1)
        sigma = np.abs(rng.randn(2, 3, 8, 16)).astype(np.float32)
        feat = rng.rand(2, 3, 8, 16, 3).astype(np.float32)
        s_sum, f_w = composite_fields(jnp.asarray(sigma), jnp.asarray(feat))
        np.testing.assert_allclose(np.asarray(s_sum), sigma.sum(0), rtol=1e-5)
        denom = sigma.sum(0, keepdims=True)
        denom[denom == 0] = 1e-4
        expected = (feat * (sigma / denom)[..., None]).sum(0)
        np.testing.assert_allclose(np.asarray(f_w), expected, rtol=1e-4, atol=1e-6)

    def test_composite_single_field_identity(self):
        sigma = jnp.ones((1, 4, 8))
        feat = jnp.ones((1, 4, 8, 3)) * 0.5
        s, f = composite_fields(sigma, feat)
        assert s.shape == (4, 8) and f.shape == (4, 8, 3)


class TestGeometry:
    def test_euler_roundtrip_via_pose(self):
        # build c2w-style matrices from the reference euler convention and
        # check rot_to_euler(pose_to_euler) self-consistency on the rotation
        # actually used by the trainer (pose_to_euler_trans of c2w poses).
        rng = np.random.RandomState(2)
        e = rng.uniform(-0.5, 0.5, (6, 3)).astype(np.float32)
        R = euler2rot(jnp.asarray(e))
        assert R.shape == (6, 3, 3)
        # rotation matrices: orthonormal, det 1
        eye = jnp.einsum("bij,bkj->bik", R, R)
        np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(3), (6, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), np.ones(6), atol=1e-5)

    @needs_reference
    def test_euler2rot_matches_reference(self):
        import sys, os
        from conftest import REFERENCE_ROOT

        sys.path.insert(0, os.path.join(REFERENCE_ROOT, "data_util", "face_tracking_ba"))
        import torch
        import util as ref_util

        e = np.random.RandomState(4).uniform(-1, 1, (5, 3)).astype(np.float32)
        ref = ref_util.euler2rot(torch.tensor(e)).numpy()
        ours = np.asarray(euler2rot(jnp.asarray(e)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_pose_to_euler_trans(self):
        pose = jnp.eye(4)[None]
        et = pose_to_euler_trans(pose)
        assert et.shape == (1, 6)
        # identity rotation under the trainer's convention:
        # e2 = atan2(1, 0) = pi/2, e1 = asin(0) = 0, e0 = atan2(1, 0) = pi/2
        np.testing.assert_allclose(
            np.asarray(et[0]), [np.pi / 2, 0.0, np.pi / 2, 0, 0, 0], atol=1e-6
        )
