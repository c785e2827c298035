"""Photometric 3DMM refinement (pipeline/photometric.py) — the TPU
equivalent of the reference's unshipped render_util photometric path
(face_tracking_ba/render_land.py:59-150)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfanerf_tpu.pipeline.face3dmm import make_synthetic_3dmm
from dfanerf_tpu.pipeline.photometric import (
    compute_tri_normal,
    photometric_loss,
    refine_photometric,
    sh9_basis,
    vertex_visibility,
)


def _mesh_setup(point_num=64):
    """A forward-facing vertex sheet with a synthetic 3DMM over it: mean
    geometry is a z=0 grid spanning +-1 so the splat covers the frame."""
    from dfanerf_tpu.pipeline.face3dmm import Face3DMM

    g = int(np.sqrt(point_num))
    yy, xx = np.meshgrid(np.linspace(-1, 1, g), np.linspace(-1, 1, g),
                         indexing="ij")
    mu = np.stack([xx, yy, 0.05 * np.sin(3 * xx) * np.cos(3 * yy)],
                  -1).reshape(-1).astype(np.float32)
    base = make_synthetic_3dmm(jax.random.PRNGKey(3), point_num=point_num)
    model = Face3DMM(
        base_id=base.base_id, base_exp=base.base_exp, mu=jnp.asarray(mu),
        base_tex=base.base_tex, mu_tex=base.mu_tex, sig_id=base.sig_id,
        sig_exp=base.sig_exp, sig_tex=base.sig_tex,
        lands_info=np.arange(point_num, dtype=np.int32),
    )
    # triangulate the g x g grid
    tris = []
    for r in range(g - 1):
        for c in range(g - 1):
            a, b = r * g + c, r * g + c + 1
            d, e = (r + 1) * g + c, (r + 1) * g + c + 1
            tris += [[a, d, b], [b, d, e]]
    tris = jnp.asarray(np.array(tris, np.int32))
    # vert_tris: one adjacent triangle per vertex (reference contract)
    vt = np.zeros(point_num, np.int32)
    for ti, t in enumerate(np.asarray(tris)):
        for v in t:
            vt[v] = ti
    return model, tris, jnp.asarray(vt)


class TestPieces:
    def test_tri_normal_unit_and_orientation(self):
        geo = jnp.asarray([[0., 0., 0.], [1., 0., 0.], [0., 1., 0.]])
        n = compute_tri_normal(geo, jnp.asarray([[0, 1, 2]]))
        np.testing.assert_allclose(np.asarray(n), [[0., 0., 1.]], atol=1e-6)

    def test_sh9_constant_term(self):
        n = jnp.asarray([[0., 0., 1.], [1., 0., 0.]])
        b = sh9_basis(n)
        assert b.shape == (2, 9)
        np.testing.assert_allclose(np.asarray(b[:, 0]), 0.282095, atol=1e-6)

    def test_visibility_front_vs_back(self):
        # a point in front of the camera (z < 0), normal toward camera
        p = jnp.asarray([[0., 0., -1.0]])
        toward = jnp.asarray([[0., 0., 1.0]])
        away = jnp.asarray([[0., 0., -1.0]])
        assert float(vertex_visibility(p, toward)[0]) == 1.0
        assert float(vertex_visibility(p, away)[0]) == 0.0


class TestRefinement:
    @pytest.mark.slow
    def test_recovers_lighting_and_texture(self):
        model, tris, vert_tris = _mesh_setup()
        H = W = 32
        focal, cxy = 40.0, (W / 2.0, H / 2.0)
        key = jax.random.PRNGKey(0)
        id_p = 0.1 * jax.random.normal(key, (model.base_id.shape[0],))
        F = 2
        exp_p = jnp.zeros((F, model.base_exp.shape[0]))
        euler = jnp.zeros((F, 3))
        trans = jnp.asarray([[0.0, 0.0, -4.0]] * F)

        # ground-truth appearance: a fixed texture + directional-ish light
        tex_gt = 0.5 * jax.random.normal(jax.random.PRNGKey(1),
                                         (model.base_tex.shape[0],))
        light_gt = jnp.zeros((9, 3)).at[0].set(2.5).at[2].set(0.8)

        from dfanerf_tpu.pipeline.photometric import PhotoLoss  # noqa: F401

        def render_target(f):
            # use the loss's own forward model to produce the target image
            from dfanerf_tpu.core.geometry import euler2rot, rot_trans_pts
            from dfanerf_tpu.ops.splat import splat_points
            from dfanerf_tpu.pipeline.face3dmm import forward_geo, forward_tex
            from dfanerf_tpu.pipeline.photometric import (
                compute_tri_normal, sh9_basis, vertex_visibility,
            )

            geo = forward_geo(model, id_p[None], exp_p[f][None])[0]
            tex = forward_tex(model, tex_gt[None])[0]
            rott = rot_trans_pts(geo[None], euler2rot(euler[f][None]),
                                 trans[f][None])[0]
            tri_n = compute_tri_normal(rott, tris)
            vert_n = tri_n[vert_tris]
            vis = vertex_visibility(rott, vert_n)
            shaded = tex * (sh9_basis(vert_n) @ light_gt)
            rv = rott * vis[:, None] + (1 - vis[:, None]) * jnp.asarray(
                [0., 0., -1e3])
            img, _, _ = splat_points(rv, shaded, focal, cxy, (H, W))
            return img

        images = jnp.stack([render_target(f) for f in range(F)])

        out = refine_photometric(
            model, tris, vert_tris, id_p, exp_p, euler, trans, focal, cxy,
            images, n_iters=150, lr=5e-2,
        )
        # the refined appearance must reproduce the target images far
        # better than the zero-init starting point
        l0 = photometric_loss(model, tris, vert_tris, id_p, exp_p[0],
                              jnp.zeros_like(tex_gt),
                              jnp.zeros((9, 3)).at[0].set(3.0),
                              euler[0], trans[0], focal, cxy, images[0])
        l1 = photometric_loss(model, tris, vert_tris, id_p, exp_p[0],
                              out["tex"], out["light"],
                              out["euler"][0], out["trans"][0],
                              focal, cxy, images[0])
        assert float(l1.color) < 0.3 * float(l0.color)
