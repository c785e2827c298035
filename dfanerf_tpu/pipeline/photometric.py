"""Photometric 3DMM refinement — the TPU equivalent of the reference's
UNSHIPPED photometric tracking path.

The reference wraps a CUDA rasterizer (`render_util`, absent from the
repo) into `Render_Face`/`Render_RGB` and a `Render_Land.cal_loss_rgb`
loss (face_tracking_ba/render_land.py:59-150): project the 3DMM mesh,
shade per-triangle with a 9-term spherical-harmonics lighting model
applied to triangle normals (`normal_base_forward` + `nbl = tri_nb @
light`, render_land.py:23-41,135), rasterize against the frame, and
minimize mean per-pixel color distance over covered pixels plus the
landmark distance (render_land.py:140-150). The shipped pipeline never
imports it (face_tracker.py is landmark-only), so this module is the
optional photometric *refinement* entry point on top of the landmark fit.

TPU-native formulation (everything jit/grad-compatible, static shapes):

- triangle normals / per-vertex normals / visibility exactly as
  render_land.py:8-20,44-57 (vertex normal = its `vert_tris` triangle's
  normal; visible iff -(n . normalize(p)) >= 0.01);
- the standard real SH-9 irradiance basis stands in for the unshipped
  `normal_base_forward` (the 9-coefficient basis is the universal
  formulation for this lighting model); shading = (SH9(n) @ light[9,3]);
- rendering by differentiable point splatting (ops/splat.py) of the
  shaded VISIBLE vertices with a soft z-buffer, instead of triangle
  rasterization — invisible vertices contribute zero splat weight, and
  the photometric loss masks to covered pixels exactly like the
  reference's `pixel_valid` mean (render_land.py:144-146);
- landmarks use the model's static `lands_info` vertex indexing (the
  reference's dynamic `update_contour` visibility-walk lives in the
  unshipped extension; the static 68-set is what the shipped tracker
  uses everywhere else).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dfanerf_tpu.core.geometry import euler2rot, rot_trans_pts
from dfanerf_tpu.ops.splat import splat_points
from dfanerf_tpu.pipeline.face3dmm import (
    Face3DMM,
    forward_geo,
    forward_tex,
)


def compute_tri_normal(geometry: jnp.ndarray, tris: jnp.ndarray) -> jnp.ndarray:
    """Per-triangle unit normals. geometry [N, 3]; tris [T, 3] int.
    Cross-product orientation matches render_land.py:8-20."""
    v1 = geometry[tris[:, 0]]
    v2 = geometry[tris[:, 1]]
    v3 = geometry[tris[:, 2]]
    n = jnp.cross(v2 - v1, v3 - v1)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


def sh9_basis(normals: jnp.ndarray) -> jnp.ndarray:
    """Real spherical-harmonics basis (l<=2, 9 terms) of unit normals
    [N, 3] -> [N, 9] — the lighting basis the reference's unshipped
    `normal_base_forward` provides to `nbl = basis @ light`."""
    x, y, z = normals[..., 0], normals[..., 1], normals[..., 2]
    return jnp.stack([
        jnp.full_like(x, 0.282095),
        0.488603 * y,
        0.488603 * z,
        0.488603 * x,
        1.092548 * x * y,
        1.092548 * y * z,
        0.315392 * (3.0 * z * z - 1.0),
        1.092548 * x * z,
        0.546274 * (x * x - y * y),
    ], axis=-1)


def vertex_visibility(rott_geo: jnp.ndarray, vert_normals: jnp.ndarray
                      ) -> jnp.ndarray:
    """render_land.py:52-54: visible iff -(n . normalize(p)) >= 0.01.
    Returns a float mask [N] (1 visible, 0 back-facing)."""
    p = rott_geo / jnp.maximum(
        jnp.linalg.norm(rott_geo, axis=-1, keepdims=True), 1e-12)
    vis = -jnp.sum(vert_normals * p, axis=-1)
    return (vis >= 0.01).astype(jnp.float32)


class PhotoLoss(NamedTuple):
    color: jnp.ndarray     # mean masked color distance (render_land.py:144-146)
    landmark: jnp.ndarray  # mean landmark distance (render_land.py:147-149)


def photometric_loss(
    model: Face3DMM,
    tris: jnp.ndarray,
    vert_tris: jnp.ndarray,
    id_para: jnp.ndarray,
    exp_para: jnp.ndarray,
    tex_para: jnp.ndarray,
    light: jnp.ndarray,
    euler: jnp.ndarray,
    trans: jnp.ndarray,
    focal,
    cxy,
    image: jnp.ndarray,
    lands_gt: Optional[jnp.ndarray] = None,
    land_index: Optional[jnp.ndarray] = None,
) -> PhotoLoss:
    """cal_loss_rgb (render_land.py:131-150) for one frame.

    image: [H, W, 3] float in [0, 255] (reference feeds raw uint8 frames).
    light: [9, 3] SH lighting. Returns (color_dis, land_dis).
    """
    H, W = image.shape[:2]
    geo = forward_geo(model, id_para[None], exp_para[None])[0]     # [N, 3]
    tex = forward_tex(model, tex_para[None])[0]                    # [N, 3]
    rott = rot_trans_pts(geo[None], euler2rot(euler[None]), trans[None])[0]
    tri_n = compute_tri_normal(rott, tris)
    vert_n = tri_n[vert_tris]                                      # [N, 3]
    vis = vertex_visibility(rott, vert_n)
    shading = sh9_basis(vert_n) @ light                            # [N, 3]
    shaded = tex * shading
    # splat VISIBLE shaded vertices: back-facing ones are pushed far along
    # -z (depth 1e3), where the splat's soft z-buffer weight underflows to
    # zero — a static-shape visibility mask
    rott_vis = rott * vis[:, None] \
        + (1.0 - vis[:, None]) * jnp.array([0.0, 0.0, -1e3])
    color_img, _, weight_img = splat_points(
        rott_vis, shaded, focal, cxy, (H, W),
    )
    valid = (weight_img > 1e-4).astype(jnp.float32)
    # eps-guarded norm: a bare norm() has a NaN gradient at exactly-zero
    # residuals (empty pixels), and 0 * NaN still poisons the masked mean
    col_minus = jnp.sqrt(
        jnp.sum((color_img - image) ** 2, axis=-1) + 1e-12)
    color_dis = jnp.sum(col_minus * valid) / (jnp.sum(valid) + 1e-5)

    if lands_gt is not None:
        if land_index is None:
            land_index = jnp.asarray(model.lands_info)
        from dfanerf_tpu.core.geometry import proj_pts

        proj = proj_pts(rott[None], jnp.asarray(focal, jnp.float32),
                        jnp.asarray(cxy, jnp.float32))[0]
        proj_land = proj[land_index][:, :2]
        land_dis = jnp.mean(jnp.linalg.norm(proj_land - lands_gt, axis=-1))
    else:
        land_dis = jnp.zeros(())
    return PhotoLoss(color=color_dis, landmark=land_dis)


def refine_photometric(
    model: Face3DMM,
    tris: jnp.ndarray,
    vert_tris: jnp.ndarray,
    id_para: jnp.ndarray,
    exp_para: jnp.ndarray,
    euler: jnp.ndarray,
    trans: jnp.ndarray,
    focal,
    cxy,
    images: jnp.ndarray,
    lands_gt: Optional[jnp.ndarray] = None,
    n_iters: int = 200,
    lr: float = 1e-2,
    w_land: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """Photometric refinement on top of the landmark fit: optimize
    (tex_para, light, euler, trans) against the frames with Adam while
    id/exp stay fixed — the role `render_land.py` plays for the
    reference's (unshipped) photometric tracking stage.

    images: [F, H, W, 3]; euler/trans/exp_para: [F, ...] per frame.
    Returns the refined parameter dict (+ final per-term losses).
    """
    from dfanerf_tpu.train.optim import adam_init, adam_update

    F = images.shape[0]
    params = {
        "tex": jnp.zeros((model.base_tex.shape[0],)),
        "light": jnp.zeros((9, 3)).at[0].set(3.0),
        "euler": jnp.asarray(euler),
        "trans": jnp.asarray(trans),
    }

    def total_loss(p):
        def frame_loss(f):
            pl = photometric_loss(
                model, tris, vert_tris, id_para, exp_para[f], p["tex"],
                p["light"], p["euler"][f], p["trans"][f], focal, cxy,
                images[f],
                None if lands_gt is None else lands_gt[f],
            )
            return pl.color + w_land * pl.landmark

        return jnp.mean(jax.vmap(frame_loss)(jnp.arange(F)))

    opt = adam_init(params)

    @jax.jit
    def step(params, opt):
        loss, grads = jax.value_and_grad(total_loss)(params)
        params, opt = adam_update(opt, grads, params, jnp.float32(lr),
                                  jnp.int32(1))
        return params, opt, loss

    loss = jnp.inf
    for _ in range(n_iters):
        params, opt, loss = step(params, opt)
    params["loss"] = loss
    return params
