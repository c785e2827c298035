"""Fused head+torso volume-render kernel (Pallas TPU) + XLA reference.

One kernel invocation renders a full ray batch through BOTH conditioned
NeRF fields and composites in-register:

- all decoder weights (packed + frame-folded by ops/pack.py, ~2.3 MB bf16)
  stay VMEM-resident across the whole grid;
- the grid is (ray_tiles, sample_slabs): for each tile of R_T rays the
  kernel marches S_SLAB samples at a time, carrying per-ray transmittance
  for the head-only and composite stacks in VMEM scratch — activations
  never touch HBM;
- matmuls run in bf16 on the MXU with fp32 accumulation; densities, alphas
  and the transmittance recurrences are fp32 (the numerics contract of
  core/compositing.py);
- the reference's background-concat semantics (replace the head field's
  last-sample color with the background pixel, zero the torso's last
  density, +1e-6 bumps per stack — run_nerf_com_trainExpLater.py:863-886)
  are applied at the final (tile, slab) step from a per-ray aux input.

The slab march carries two skip mechanisms (both bounded-error, both able
to skip a slab's entire field evaluation): early ray termination on the
carried transmittances (ert_eps) and caller-provided per-(tile, slab)
occupancy flags delivered via scalar prefetch (see conservative_occupancy
for the geometry-conservative flag construction and its caveats).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dfanerf_tpu.core.posenc import sincos_posenc

R_T = 256      # rays per tile
# samples marched per grid step (16 compiles pathologically slowly; 4
# halves the wasted samples per occupied pair on sharp baked fields at
# the cost of smaller kernel programs — env-tunable for serving sweeps)
S_SLAB = int(os.environ.get("DFANERF_S_SLAB", "8"))
PE_PAD = 64


def _interp(flag):
    """Resolve a pallas interpret flag: explicit wins; otherwise the
    DFANERF_PALLAS_INTERPRET env var (so CPU tests can exercise the
    serving renderer paths without TPU hardware).

    LATCHED AT FIRST TRACE: these calls sit inside jitted closures, so
    the env var is read when the enclosing program first traces and the
    resolved value is baked into the compiled artifact. Flipping the env
    var later in the same process does NOT retrace already-compiled
    programs — set it before building any renderer (tests set it in
    conftest, before imports trigger tracing)."""
    if flag is None:
        return bool(int(os.environ.get("DFANERF_PALLAS_INTERPRET", "0")))
    return flag


# ---------------------------------------------------------------------------
# Packed-weights forward in plain XLA — the semantics reference for the
# kernel (tested against apply_decoder) and the CPU fallback.
# ---------------------------------------------------------------------------


def _trunk_xla(pw: Dict[str, jnp.ndarray], pe, dtype):
    """Shared trunk: pe [N, 64] -> (sigma [N,1], feat_view [N,256])."""

    def mm(x, w):
        return jax.lax.dot(
            x.astype(dtype), w.astype(dtype), preferred_element_type=jnp.float32
        )

    h = jax.nn.relu(mm(pe, pw["w_in"]) + pw["b_in"])
    for i in range(pw["w_blocks"].shape[0]):
        h = jax.nn.relu(mm(h, pw["w_blocks"][i]) + pw["b_blocks"][i])
        if i == 3:
            h = h + mm(pe, pw["w_skip"]) + pw["b_skip"]
    sf = mm(h, pw["w_sf"]) + pw["b_sf"]
    return sf[:, 0:1], sf[:, 128:384]


def _deform_xla(pw, pe, dtype):
    """Torso deformation (packed block-diag): pe [N,64] -> p' [N,128]."""

    def mm(x, w):
        return jax.lax.dot(
            x.astype(dtype), w.astype(dtype), preferred_element_type=jnp.float32
        )

    h = jax.nn.relu(mm(pe, pw["d_w1"]) + pw["d_b1"])
    for i in range(pw["d_wk"].shape[0]):
        h = jax.nn.relu(mm(h, pw["d_wk"][i]) + pw["d_bk"][i])
        if i == 2:
            h = h + mm(pe, pw["d_wskip"]) + pw["d_bskip"]
    d = mm(h, pw["d_wout"]) + pw["d_bout"]
    pe128 = jnp.concatenate([pe, jnp.zeros_like(pe)], axis=-1).astype(jnp.float32)
    return d + pw["sig_pad"] + pe128


def packed_field_xla(
    pw: Dict[str, jnp.ndarray],
    pts: jnp.ndarray,
    view_bias: jnp.ndarray,
    branch: str,
    dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate one packed field. pts [N,3]; view_bias [N,256] (fc_view of
    the per-ray dirs, broadcast by caller). Returns rgb [N,3], sigma [N]."""
    pe = sincos_posenc(pts.astype(jnp.float32), 10, 2.0)
    pe = jnp.concatenate(
        [pe, jnp.zeros((pe.shape[0], PE_PAD - pe.shape[1]), pe.dtype)], axis=-1
    )
    if branch == "torso":
        p2 = _deform_xla(pw, pe, dtype)
        sigma, featv = _trunk_xla(pw, p2, dtype)
    else:
        sigma, featv = _trunk_xla(pw, pe, dtype)
    net = jax.nn.relu(featv + view_bias)
    rgb = jax.lax.dot(
        net.astype(dtype), pw["w_out"].astype(dtype),
        preferred_element_type=jnp.float32,
    ) + pw["b_out"]
    return jax.nn.sigmoid(rgb[:, :3]), sigma[:, 0]


def view_bias(pw: Dict[str, jnp.ndarray], rays_d: jnp.ndarray) -> jnp.ndarray:
    """Per-ray fc_view(PE(normalized dir)) + b — computed once per ray."""
    d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    enc = sincos_posenc(d.astype(jnp.float32), 4, 2.0)
    return enc @ pw["w_view"] + pw["b_view"]


# ---------------------------------------------------------------------------
# The Pallas kernel
# ---------------------------------------------------------------------------


def _mm(x, w):
    return jax.lax.dot(
        x, w, preferred_element_type=jnp.float32
    )


def density_act(x: jnp.ndarray, act: str = "relu") -> jnp.ndarray:
    """Density activation applied to the decoder's raw sigma output.

    "relu" is the reference's semantics (run_nerf_com_trainExpLater.py:
    865-871); "softplus" (stable max+log1p form, Pallas-safe) is the
    opt-in training/serving mode that removes the dead-ReLU head-collapse
    trap: with relu, once the head field's raw sigma goes negative along
    its rays the photometric gradient is EXACTLY zero and the torso
    billboard basin is absorbing (measured raw sigma driven to -800, see
    docs/SERVING.md); with softplus the head loss's counterforce never
    vanishes, so regularized training (distortion/sparsity) cannot
    silently kill the field. Weights trained under one activation must be
    rendered under the same one."""
    if act == "softplus":
        return jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.maximum(x, 0.0)


def _render_kernel(
    # per-(tile, slab) data
    occ_ref, dists_h_ref, dists_t_ref, z_ref,
    # per-tile data
    o_h_ref, d_h_ref, o_t_ref, d_t_ref, vr_h_ref, vr_t_ref, aux_ref,
    # PE constants
    freq_ref, phase_ref,
    # head weights
    hw_in, hb_in, hw_blocks, hb_blocks, hw_skip, hb_skip, hw_sf, hb_sf,
    hw_out, hb_out,
    # torso weights
    tw_in, tb_in, tw_blocks, tb_blocks, tw_skip, tb_skip, tw_sf, tb_sf,
    tw_out, tb_out,
    # torso deform weights
    d_w1, d_b1, d_wk, d_bk, d_wskip, d_bskip, d_wout, d_bout, sig_pad,
    # outputs
    out_head_ref, out_com_ref,
    # scratch: transmittances, accumulators
    t_head, t_com, acc_head, acc_com,
    *, n_slabs: int, ert_eps: float, bg_in_kernel: bool = True,
    eval_head: bool = True, eval_torso: bool = True, act: str = "relu",
):
    t = pl.program_id(0)
    j = pl.program_id(1)
    rows = S_SLAB * R_T
    is_last = j == n_slabs - 1

    @pl.when(j == 0)
    def _init():
        t_head[:] = jnp.ones_like(t_head)
        t_com[:] = jnp.ones_like(t_com)
        acc_head[:] = jnp.zeros_like(acc_head)
        acc_com[:] = jnp.zeros_like(acc_com)

    def trunk(pe_bf, w_in, b_in, w_blocks, b_blocks, w_skip, b_skip, w_sf, b_sf):
        h = jnp.maximum(_mm(pe_bf, w_in[:]) + b_in[:], 0.0).astype(jnp.bfloat16)
        for i in range(7):
            h = jnp.maximum(_mm(h, w_blocks[i]) + b_blocks[i], 0.0)
            if i == 3:
                h = h + _mm(pe_bf, w_skip[:]) + b_skip[:]
            h = h.astype(jnp.bfloat16)
        return _mm(h, w_sf[:]) + b_sf[:]  # [rows, 384] f32

    def encode(o_ref, d_ref):
        """In-kernel positional encoding: the caller pre-replicates ray
        origins/dirs into the 64 PE slots (slot c holds coordinate c%3),
        so enc = sin((o + d*z) * freq + phase) — one VPU transcendental
        per element, fp32 phases, no HBM-resident encodings."""
        o = o_ref[:]
        d = d_ref[:]
        freq = freq_ref[:]
        ph = phase_ref[:]
        encs = []
        for s in range(S_SLAB):  # static unroll; sample-major row order
            pts = o + d * z_ref[0, 0, s]
            encs.append(jnp.sin(pts * freq + ph))
        return jnp.concatenate(encs, axis=0).astype(jnp.bfloat16)

    # Slab skipping, two independent conditions (the final slab always runs —
    # it carries the background-concat sample, whose composite catch-all
    # mixes by the head field's raw far-plane sigma, so both fields must
    # genuinely evaluate there):
    # 1. early ray termination: every ray in this tile has exhausted its
    #    transmittance in BOTH stacks — remaining slabs contribute at most
    #    ert_eps per channel (ert_eps == 0.0 disables exactly: t is clamped
    #    above 0 by the 1e-10 recurrence floor until f32 underflow, where
    #    contributions are exactly 0);
    # 2. occupancy: the caller's conservative per-(tile, slab) flag says
    #    NEITHER field reaches the density threshold anywhere in this slab's
    #    frustum chunk — alphas are bounded by thresh * dist (all-ones
    #    disables).
    # The whole slab body must stay ONE predicated region: splitting the two
    # field evaluations into separate pl.when / lax.cond regions measured
    # 1.7x slower end-to-end (Mosaic stops pipelining weight reuse across
    # duplicated heavy regions), which is why the flags are joint rather
    # than per-field.
    alive = (
        jnp.maximum(jnp.max(t_head[:]), jnp.max(t_com[:])) > ert_eps
    ) & (occ_ref[t, j] != 0)
    if bg_in_kernel:
        alive = alive | is_last

    def head_eval():
        pe_h = encode(o_h_ref, d_h_ref)
        sf_h = trunk(pe_h, hw_in, hb_in, hw_blocks, hb_blocks, hw_skip, hb_skip,
                     hw_sf, hb_sf)
        vr_h = jnp.broadcast_to(vr_h_ref[:][None], (S_SLAB, R_T, 256)).reshape(rows, 256)
        net_h = jnp.maximum(sf_h[:, 128:384] + vr_h.astype(jnp.float32), 0.0)
        rgb_h = jax.nn.sigmoid(
            _mm(net_h.astype(jnp.bfloat16), hw_out[:]) + hb_out[:]
        )  # [rows, 128]; cols 0:3 valid
        return density_act(sf_h[:, 0:1], act), rgb_h

    def torso_eval():
        # deform then trunk
        pe_t = encode(o_t_ref, d_t_ref)
        dh = jnp.maximum(_mm(pe_t, d_w1[:]) + d_b1[:], 0.0).astype(jnp.bfloat16)
        for i in range(4):
            dh = jnp.maximum(_mm(dh, d_wk[i]) + d_bk[i], 0.0)
            if i == 2:
                dh = dh + _mm(pe_t, d_wskip[:]) + d_bskip[:]
            dh = dh.astype(jnp.bfloat16)
        d_out = _mm(dh, d_wout[:]) + d_bout[:]  # [rows, 128] f32
        pe_t128 = jnp.concatenate([pe_t.astype(jnp.float32),
                                   jnp.zeros_like(pe_t, jnp.float32)], axis=-1)
        p2 = (d_out + sig_pad[:] + pe_t128).astype(jnp.bfloat16)
        sf_t = trunk(p2, tw_in, tb_in, tw_blocks, tb_blocks, tw_skip, tb_skip,
                     tw_sf, tb_sf)
        vr_t = jnp.broadcast_to(vr_t_ref[:][None], (S_SLAB, R_T, 256)).reshape(rows, 256)
        net_t = jnp.maximum(sf_t[:, 128:384] + vr_t.astype(jnp.float32), 0.0)
        rgb_t = jax.nn.sigmoid(
            _mm(net_t.astype(jnp.bfloat16), tw_out[:]) + tb_out[:]
        )
        return density_act(sf_t[:, 0:1], act), rgb_t

    def composite(sigma_h, rgb_h, sigma_t, rgb_t):
        # in-register compositing, sample by sample
        bc = aux_ref[:].astype(jnp.float32)  # [R_T, 128]; cols 0:3 = bg pixel
        th = t_head[:]
        tc = t_com[:]
        ah = acc_head[:]
        ac = acc_com[:]
        for s in range(S_SLAB):
            sel = slice(s * R_T, (s + 1) * R_T)
            sh = sigma_h[sel] if sigma_h is not None else 0.0
            st = sigma_t[sel] if sigma_t is not None else 0.0
            ch = rgb_h[sel] if rgb_h is not None else 0.0
            ct = rgb_t[sel] if rgb_t is not None else 0.0
            dh_s = dists_h_ref[0, s, :][:, None]
            dt_s = dists_t_ref[0, s, :][:, None]
            if bg_in_kernel:
                last_sample = is_last & (s == S_SLAB - 1)
                lastf = last_sample.astype(jnp.float32)
                # bg-concat: head color at the last sample is the bg pixel
                ch = ch * (1.0 - lastf) + bc * lastf
                # head-only stack: +1e-6 bump on the last head density
                sh_head = sh + 1e-6 * lastf
                # composite stack: torso last density := 0 then +1e-6 bump
                st_com = st * (1.0 - lastf) + 1e-6 * lastf
            else:
                # background handled by the caller's per-ray epilogue
                sh_head, st_com = sh, st

            alpha_h = 1.0 - jnp.exp(-(sh_head + 1e-6) * dh_s)
            ah = ah + (alpha_h * th) * ch
            th = th * (1.0 - alpha_h + 1e-10)

            ssum = sh + st_com
            denom = jnp.where(ssum == 0.0, 1e-4, ssum)
            c_mix = (sh * ch + st_com * ct) / denom
            alpha_c = 1.0 - jnp.exp(-(ssum + 1e-6) * dt_s)
            ac = ac + (alpha_c * tc) * c_mix
            tc = tc * (1.0 - alpha_c + 1e-10)
        t_head[:] = th
        t_com[:] = tc
        acc_head[:] = ah
        acc_com[:] = ac

    # Single-field variants (eval_head/eval_torso static): the skipped
    # field contributes sigma=0 / rgb=0 to both stacks — the same bounded
    # approximation the occupancy flags already make per slab, applied at
    # tile granularity by the caller's per-field tile classes. Each variant
    # still has exactly ONE heavy region (the Mosaic pipelining rule).
    @pl.when(alive)
    def _slab_body():
        sh, ch = head_eval() if eval_head else (None, None)
        st, ct = torso_eval() if eval_torso else (None, None)
        composite(sh, ch, st, ct)

    @pl.when(is_last)
    def _write():
        if bg_in_kernel:
            out_head_ref[:] = acc_head[:]
            out_com_ref[:] = acc_com[:]
        else:
            # rgb accumulators in lanes 0:3; carried transmittance in lane 3
            # (lane 3 is c_mix garbage otherwise) for the bg epilogue
            lane = jax.lax.broadcasted_iota(jnp.int32, acc_head.shape, 1)
            out_head_ref[:] = jnp.where(lane == 3, t_head[:], acc_head[:])
            out_com_ref[:] = jnp.where(lane == 3, t_com[:], acc_com[:])


def spatial_tile_permutation(H: int, W: int, block_h: int = 16, block_w: int = 16):
    """Flat pixel indices reordered into 16x16 spatial blocks, one block per
    kernel ray tile (block_h*block_w == R_T), so slab skipping sees
    spatially coherent rays instead of scanline strips. Edge blocks clamp
    coordinates (duplicate edge rays render identically; the inverse scatter
    is therefore well-defined).

    Returns perm [Hp*Wp] int32 — position k in tile order reads flat pixel
    perm[k]; invert with out_flat.at[perm].set(out_tiled).
    """
    import numpy as np

    hb = -(-H // block_h)
    wb = -(-W // block_w)
    by, bx = np.meshgrid(np.arange(hb), np.arange(wb), indexing="ij")
    iy, ix = np.meshgrid(np.arange(block_h), np.arange(block_w), indexing="ij")
    y = np.minimum(
        by[:, :, None, None] * block_h + iy[None, None], H - 1
    )
    x = np.minimum(
        bx[:, :, None, None] * block_w + ix[None, None], W - 1
    )
    return jnp.asarray((y * W + x).reshape(-1), jnp.int32)


def packed_sigma_xla(pw: Dict[str, jnp.ndarray], pts: jnp.ndarray,
                     branch: str, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Density-only packed forward (occupancy estimation): pts [N,3] ->
    [N] RAW sigma (pre-activation; callers apply density_act — for relu,
    thresholding raw sigma at t > 0 is equivalent)."""
    pe = sincos_posenc(pts.astype(jnp.float32), 10, 2.0)
    pe = jnp.concatenate(
        [pe, jnp.zeros((pe.shape[0], PE_PAD - pe.shape[1]), pe.dtype)], axis=-1
    )
    if branch == "torso":
        pe = _deform_xla(pw, pe, dtype)
    sigma, _ = _trunk_xla(pw, pe, dtype)
    return sigma[:, 0]


def _occupancy_sat(pw, branch, lo, span, grid_res, sigma_thresh,
                   supersample: int = 2, act: str = "relu"):
    """Dilated density-occupancy grid -> 3D summed-area table [G+1]^3.

    The grid node at index (iz, iy, ix) covers position
    lo + (ix, iy, iz)/(G-1) * span. Density is SAMPLED on a finer
    (G*supersample)^3 node grid and max-pooled down to G^3: sharply baked
    fields carry sub-voxel density shells that a 1x node grid walks
    straight past (measured 0.12 max pixel error at G=48 on the
    sparsity-baked benchmark scene; halving the node spacing halves it).
    Fine nodes test at sigma_thresh * 0.25 (margin for shells crossing the
    threshold between even the fine nodes) and the pooled grid is dilated
    3^3 before the SAT, so a query box inherits a one-coarse-node
    conservatism margin in every direction.

    The fine grid is evaluated in z-slices via lax.map to bound the trunk
    intermediate ([Gf^2 * chunk, 384]) instead of materializing all Gf^3.
    """
    gf = grid_res * supersample
    g_fine = jnp.linspace(0.0, 1.0, gf)
    gy, gx = jnp.meshgrid(g_fine, g_fine, indexing="ij")
    # z-slabs of 8 slices per map step: one [8*gf^2, 384] trunk batch is
    # ~100 MB of intermediate at G=48*2 (bounded), while per-slice mapping
    # is dispatch-serial and ~25x slower end to end
    zc = 8 if gf % 8 == 0 else 4

    def slab_occ(z_group):  # [zc]
        pts = lo + jnp.stack(
            [jnp.broadcast_to(gx, (zc,) + gx.shape),
             jnp.broadcast_to(gy, (zc,) + gy.shape),
             jnp.broadcast_to(z_group[:, None, None], (zc,) + gx.shape)],
            -1,
        ).reshape(-1, 3) * span
        sig = density_act(packed_sigma_xla(pw, pts, branch), act)
        return (sig > sigma_thresh * 0.25).reshape(zc, gf, gf)

    occ_fine = jax.lax.map(
        slab_occ, g_fine.reshape(gf // zc, zc)
    ).reshape(gf, gf, gf)  # [z, y, x]
    occ = jax.lax.reduce_window(
        occ_fine.astype(jnp.int32), 0, jax.lax.max,
        (supersample,) * 3, (supersample,) * 3, "valid",
    ) if supersample > 1 else occ_fine.astype(jnp.int32)
    occ = jax.lax.reduce_window(
        occ, 0, jax.lax.max, (3, 3, 3), (1, 1, 1), [(1, 1)] * 3,
    )
    sat = jnp.pad(occ, ((1, 0), (1, 0), (1, 0)))
    return jnp.cumsum(jnp.cumsum(jnp.cumsum(sat, 0), 1), 2)


def _sat_box_any(sat, i_lo, i_hi):
    """Any-occupied query over inclusive node boxes. i_lo/i_hi [..., 3] in
    (x, y, z) coordinate order; SAT axes are (z, y, x)."""
    a0, a1 = i_lo[..., 2], i_hi[..., 2] + 1
    b0, b1 = i_lo[..., 1], i_hi[..., 1] + 1
    c0, c1 = i_lo[..., 0], i_hi[..., 0] + 1
    s = lambda a, b, c: sat[a, b, c]
    count = (
        s(a1, b1, c1) - s(a0, b1, c1) - s(a1, b0, c1) - s(a1, b1, c0)
        + s(a0, b0, c1) + s(a0, b1, c0) + s(a1, b0, c0) - s(a0, b0, c0)
    )
    return count > 0


def tile_corner_rays(rays: jnp.ndarray, block_h: int = 16, block_w: int = 16):
    """Corner rays of each spatial tile: rays [n, 3] in spatial-tile order
    (spatial_tile_permutation layout: row-major block_h x block_w blocks)
    -> [n_tiles, 4, 3]. Because pinhole ray dirs are affine in pixel coords,
    every ray of a tile lies in the convex hull of its 4 corners."""
    n = rays.shape[0]
    assert n % R_T == 0 and block_h * block_w == R_T
    corners = jnp.array(
        [0, block_w - 1, (block_h - 1) * block_w, block_h * block_w - 1]
    )
    return rays.reshape(n // R_T, R_T, 3)[:, corners]


def occupancy_flags_dynamic_z(
    pw, branch,
    rays_o: jnp.ndarray, rays_d: jnp.ndarray,
    z_vals: jnp.ndarray,
    sigma_thresh: float,
    grid_res: int = 64,
    sat_cache=None,
    act: str = "relu",
) -> jnp.ndarray:
    """Per-(tile, slab) occupancy flags for PER-RAY depths (the
    hierarchical fine pass: importance-resampled z differ per ray).

    Same conservative construction as conservative_occupancy, with the
    slab z extent taken as the min/max over the tile's rays — every sample
    of a (tile, slab) then lies in the convex hull of the tile's 4 corner
    rays evaluated at [z_lo, z_hi], so the 8-corner AABB bounds it.

    rays must be in spatial-tile order; z_vals [n, S] per-ray sorted.
    ``sat_cache`` (from a previous call's ``.sat_cache`` attribute on the
    result — see below) reuses a built SAT when the FIELD is unchanged
    and the new query boxes lie inside the cached AABB (the hierarchical
    fine pass: fine depths are within the coarse [near, far], so the
    coarse pass's SAT serves both — one grid evaluation per frame, not
    two). Returns flags [n_tiles, n_slabs] int32 with a ``.sat_cache``
    aux available via the second return of occupancy_flags_and_sat.
    """
    flags, _ = occupancy_flags_and_sat(
        pw, branch, rays_o, rays_d, z_vals, sigma_thresh, grid_res,
        sat_cache, act,
    )
    return flags


def occupancy_flags_and_sat(
    pw, branch, rays_o, rays_d, z_vals, sigma_thresh, grid_res=64,
    sat_cache=None, act: str = "relu",
):
    """occupancy_flags_dynamic_z + the (sat, lo, span) cache for reuse."""
    n, S = z_vals.shape
    assert S % S_SLAB == 0 and n % R_T == 0
    n_slabs = S // S_SLAB
    n_tiles = n // R_T
    zt = z_vals.reshape(n_tiles, R_T, n_slabs, S_SLAB)
    z_lo = zt.min(axis=(1, 3))  # [T, J]
    z_hi = zt.max(axis=(1, 3))
    o_c, d_c = tile_corner_rays(rays_o), tile_corner_rays(rays_d)
    z_ends = jnp.stack([z_lo, z_hi], axis=-1)  # [T, J, 2]
    # [T, J, 2, 4, 3]
    pts = o_c[:, None, None] + d_c[:, None, None] * z_ends[..., None, None]
    if sat_cache is None:
        allp = pts.reshape(-1, 3)
        lo = allp.min(0)
        span = jnp.maximum(allp.max(0) - lo, 1e-6)
        sat = _occupancy_sat(pw, branch, lo, span, grid_res, sigma_thresh,
                             act=act)
    else:
        sat, lo, span = sat_cache
    voxel = span / (grid_res - 1)
    ab_lo = pts.min(axis=(2, 3))
    ab_hi = pts.max(axis=(2, 3))
    i_lo = jnp.clip(jnp.ceil((ab_lo - lo) / voxel - 0.5).astype(jnp.int32),
                    0, grid_res - 1)
    i_hi = jnp.clip(jnp.floor((ab_hi - lo) / voxel + 0.5).astype(jnp.int32),
                    0, grid_res - 1)
    flags = _sat_box_any(sat, i_lo, i_hi).astype(jnp.int32)
    return flags, (sat, lo, span)


def conservative_occupancy(
    pw_h, pw_t,
    rays_o, rays_d, rays_o_t, rays_d_t,
    z_vals: jnp.ndarray,
    sigma_thresh: float,
    grid_res: int = 64,
    act: str = "relu",
    s_slab: int = None,
) -> jnp.ndarray:
    """Per-(field, tile, slab) occupancy flags for the fused kernel.

    Geometry-conservative formulation: for each (tile, slab) the frustum
    chunk's sample points all lie inside the convex hull of the tile's 4
    corner rays evaluated at the slab's z extremes (ray positions are affine
    in pixel coordinates and linear in z), so the AABB of those 8 corner
    points bounds every sample. The flag is then an O(1) summed-area-table
    query: does any occupied voxel of the (dilated) density grid intersect
    that AABB (expanded by the half-voxel nearest-node radius)?

    Density is still *sampled* on a G^3 node grid, so conservatism w.r.t.
    the continuous field rests on the thresh/4 node margin + 1-voxel
    dilation; benchmarks must report the measured error vs a no-skip render.

    Cost: two [G^3] sigma-only forwards (~0.6 GFLOP total at G=64) + O(T*J)
    table lookups — no per-sample gathers. Rays must be in spatial-tile
    order. Returns [2, n_tiles, n_slabs] int32 (0=head, 1=torso).
    """
    S = z_vals.shape[0]
    sp = S_SLAB if s_slab is None else s_slab
    n_slabs = S // sp
    z_ends = jnp.stack(
        [z_vals.reshape(n_slabs, sp)[:, 0],
         z_vals.reshape(n_slabs, sp)[:, -1]], axis=1
    )  # [J, 2]

    def corner_pts(ro, rd):
        o_c, d_c = tile_corner_rays(ro), tile_corner_rays(rd)
        # [T, J, 2, 4, 3]
        return o_c[:, None, None] + d_c[:, None, None] * z_ends[None, :, :, None, None]

    pts_h = corner_pts(rays_o, rays_d)
    pts_t = corner_pts(rays_o_t, rays_d_t)

    allp = jnp.concatenate([pts_h.reshape(-1, 3), pts_t.reshape(-1, 3)])
    lo = allp.min(0)
    span = jnp.maximum(allp.max(0) - lo, 1e-6)
    voxel = span / (grid_res - 1)

    def field_flags(pw, branch, pts):
        sat = _occupancy_sat(pw, branch, lo, span, grid_res, sigma_thresh,
                             act=act)
        ab_lo = pts.min(axis=(2, 3))  # [T, J, 3]
        ab_hi = pts.max(axis=(2, 3))
        i_lo = jnp.clip(
            jnp.ceil((ab_lo - lo) / voxel - 0.5).astype(jnp.int32), 0, grid_res - 1
        )
        i_hi = jnp.clip(
            jnp.floor((ab_hi - lo) / voxel + 0.5).astype(jnp.int32), 0, grid_res - 1
        )
        return _sat_box_any(sat, i_lo, i_hi)

    occ_h = field_flags(pw_h, "head", pts_h)
    occ_t = field_flags(pw_t, "torso", pts_t)
    # NOTE: the final slab needs no forcing here — the kernel always runs it
    # (its bg-concat catch-all mixes by the head field's raw far-plane
    # sigma, so both fields genuinely evaluate there).
    return jnp.stack([occ_h, occ_t]).astype(jnp.int32)


def _full(shape=None):
    """Whole-array block (weights: same block for every grid step);
    grid-arity-agnostic index map."""
    return pl.BlockSpec(shape, lambda *_: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def fused_render_rays(
    packed_h: Dict[str, jnp.ndarray],
    packed_t: Dict[str, jnp.ndarray],
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    rays_o_t: jnp.ndarray,
    rays_d_t: jnp.ndarray,
    z_vals: jnp.ndarray,
    bc_rgb: jnp.ndarray,
    last_dist: float = 1e10,
    interpret: bool = None,
    ert_eps: float = 0.0,
    occupancy: "jnp.ndarray" = None,
    bg_epilogue: bool = False,
    fields: str = "both",
    act: str = "relu",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render n rays through both packed fields with the fused kernel.

    Args:
        packed_h/packed_t: pack_field_weights outputs for head/torso.
        rays_*: [n, 3]; z_vals: [S] (shared across rays, the shipped
            deterministic linspace); bc_rgb: [n, 3] background pixels.
        bg_epilogue: handle the background-concat catch-all sample in a
            per-ray XLA epilogue instead of inside the kernel. Same math
            (the sample's alpha/mix expressions on the head field's
            far-plane sigma and the torso's far-plane color), but the
            kernel's final slab is no longer forced to run both fields for
            every tile — with occupancy flags this removes the dominant
            fixed cost (one full slab = 1/n_slabs of the whole frame). The
            epilogue costs two S-times-smaller single-point field passes.
        fields: 'both' (default), 'head' or 'torso' — single-field
            variants treat the other field as sigma=0/rgb=0 in BOTH
            stacks. Used by the renderer's per-field tile classes: a tile
            whose torso flags are all clear wastes nothing on torso
            evaluation (and vice versa), at the same bounded error the
            slab flags already carry.
    Returns:
        rgb_head [n, 3], rgb_com [n, 3] (fp32).
    """
    n = rays_o.shape[0]
    S = z_vals.shape[0]
    assert S % S_SLAB == 0, f"n_samples={S} must be a multiple of {S_SLAB}"
    n_slabs = S // S_SLAB
    n_tiles = -(-n // R_T)
    n_pad = n_tiles * R_T

    def padded(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((n_pad - n,) + x.shape[1:], fill, x.dtype)], axis=0
        )

    rays_o, rays_d = padded(rays_o), padded(rays_d)
    rays_o_t, rays_d_t = padded(rays_o_t), padded(rays_d_t)
    bc_rgb = padded(bc_rgb)

    # PE-slot replication: slot c of the 64-wide padded encoding reads
    # coordinate c % 3 at frequency pi*2^(c//6)/downscale with a +pi/2
    # phase on the cos half of each frequency block — so the kernel's
    # entire positional encoding is one fused sin() on (o + d*z).
    coord_idx = jnp.arange(PE_PAD) % 3
    slot_valid = (jnp.arange(PE_PAD) < 60).astype(jnp.float32)

    def replicate(r):
        return (r[:, coord_idx] * slot_valid).astype(jnp.float32)

    o_h, d_h = replicate(rays_o), replicate(rays_d)
    o_t, d_t = replicate(rays_o_t), replicate(rays_d_t)
    freqs = (jnp.pi * (2.0 ** (jnp.arange(PE_PAD) // 6)) / 2.0) * slot_valid
    phase = jnp.where((jnp.arange(PE_PAD) % 6) >= 3, jnp.pi / 2.0, 0.0) * slot_valid
    freq_row = freqs[None].astype(jnp.float32)
    phase_row = phase[None].astype(jnp.float32)
    # z values live in row 0 of an (8, 128) tile per slab (Mosaic block rule)
    z_rows = jnp.zeros((n_slabs, 8, 128), jnp.float32).at[:, 0, :S_SLAB].set(
        z_vals.astype(jnp.float32).reshape(n_slabs, S_SLAB)
    )

    def dists_for(rd):
        # in epilogue mode the S-th sample is the bg catch-all handled
        # outside the kernel; its in-kernel dist is 0 (exact no-op: alpha =
        # 1 - exp(0) = 0 whatever the field evaluates to there)
        tail = 0.0 if bg_epilogue else last_dist
        diffs = jnp.concatenate(
            [z_vals[1:] - z_vals[:-1], jnp.array([tail], z_vals.dtype)]
        )  # [S]
        d = diffs[None, :] * jnp.linalg.norm(
            rd.astype(jnp.float32), axis=-1, keepdims=True
        )  # [n_pad, S]
        return d.reshape(n_pad, n_slabs, S_SLAB).transpose(1, 2, 0)

    dists_h = dists_for(rays_d)
    dists_t = dists_for(rays_d_t)

    vr_h = view_bias(packed_h, rays_d).astype(jnp.bfloat16)
    vr_t = view_bias(packed_t, rays_d_t).astype(jnp.bfloat16)
    aux = jnp.zeros((n_pad, 128), jnp.float32).at[:, 0:3].set(bc_rgb)

    grid = (n_tiles, n_slabs)

    def slab_spec(lane):
        return pl.BlockSpec(
            (1, S_SLAB, R_T) + ((lane,) if lane else ()),
            (lambda t, j, *_: (j, 0, t) + ((0,) if lane else ())),
            memory_space=pltpu.VMEM,
        )

    def tile_spec(lane):
        return pl.BlockSpec(
            (R_T, lane), lambda t, j, *_: (t, 0), memory_space=pltpu.VMEM
        )

    hw = packed_h
    tw = packed_t
    weight_ops = [
        hw["w_in"], hw["b_in"][None], hw["w_blocks"], hw["b_blocks"],
        hw["w_skip"], hw["b_skip"][None], hw["w_sf"], hw["b_sf"][None],
        hw["w_out"], hw["b_out"][None],
        tw["w_in"], tw["b_in"][None], tw["w_blocks"], tw["b_blocks"],
        tw["w_skip"], tw["b_skip"][None], tw["w_sf"], tw["b_sf"][None],
        tw["w_out"], tw["b_out"][None],
        tw["d_w1"], tw["d_b1"][None], tw["d_wk"], tw["d_bk"],
        tw["d_wskip"], tw["d_bskip"][None], tw["d_wout"], tw["d_bout"][None],
        tw["sig_pad"][None],
    ]
    weight_specs = [_full(op.shape) for op in weight_ops]

    if occupancy is None:
        occupancy = jnp.ones((n_tiles, n_slabs), jnp.int32)
    elif occupancy.ndim == 3:
        # per-field [2, T, J] flags (conservative_occupancy) -> joint: the
        # kernel keeps ONE predicated region (see _render_kernel), so a slab
        # runs when EITHER field is occupied.
        occupancy = occupancy.max(axis=0)
    z_spec = pl.BlockSpec(
        (1, 8, 128), lambda t, j, *_: (j, 0, 0), memory_space=pltpu.VMEM
    )
    const_spec = pl.BlockSpec(
        (1, PE_PAD), lambda t, j, *_: (0, 0), memory_space=pltpu.VMEM
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # occupancy flags, indexable by program ids
        grid=grid,
        in_specs=[
            slab_spec(0),       # dists_h
            slab_spec(0),       # dists_t
            z_spec,             # z_vals rows
            tile_spec(PE_PAD),  # o_h
            tile_spec(PE_PAD),  # d_h
            tile_spec(PE_PAD),  # o_t
            tile_spec(PE_PAD),  # d_t
            tile_spec(256),     # vr_h
            tile_spec(256),     # vr_t
            tile_spec(128),     # aux
            const_spec,         # freq
            const_spec,         # phase
        ] + weight_specs,
        out_specs=(
            pl.BlockSpec((R_T, 128), lambda t, j, *_: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, 128), lambda t, j, *_: (t, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((R_T, 1), jnp.float32),    # t_head
            pltpu.VMEM((R_T, 1), jnp.float32),    # t_com
            pltpu.VMEM((R_T, 128), jnp.float32),  # acc_head
            pltpu.VMEM((R_T, 128), jnp.float32),  # acc_com
        ],
    )
    out = pl.pallas_call(
        functools.partial(_render_kernel, n_slabs=n_slabs, ert_eps=ert_eps,
                          bg_in_kernel=not bg_epilogue,
                          eval_head=fields in ("both", "head"),
                          eval_torso=fields in ("both", "torso"), act=act),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
        ),
        interpret=_interp(interpret),
    )(occupancy.astype(jnp.int32), dists_h, dists_t, z_rows,
      o_h, d_h, o_t, d_t, vr_h, vr_t, aux, freq_row, phase_row, *weight_ops)

    out_head, out_com = out
    if not bg_epilogue:
        return out_head[:n, 0:3], out_com[:n, 0:3]
    return _bg_epilogue(
        packed_h, packed_t,
        rays_o[:n], rays_d[:n], rays_o_t[:n], rays_d_t[:n],
        z_vals, bc_rgb[:n], last_dist,
        out_head[:n, 0:3], out_com[:n, 0:3],
        out_head[:n, 3:4], out_com[:n, 3:4],
        act=act,
    )


def _bg_epilogue(pw_h, pw_t, rays_o, rays_d, rays_o_t, rays_d_t, z_vals,
                 bc_rgb, last_dist, acc_head, acc_com, t_head, t_com,
                 act="relu"):
    """The background-concat catch-all sample as a per-ray XLA pass —
    bit-for-bit the expressions the kernel's final sample applies
    (run_nerf_com_trainExpLater.py:863-886): head stack adds the bg pixel
    at alpha(sigma_h_far + bumps); composite stack mixes bg vs the torso's
    far-plane color by raw-sigma ratio with the torso density zeroed then
    bumped to 1e-6."""
    far = z_vals[-1]
    pts_h = rays_o + rays_d * far
    pts_t = rays_o_t + rays_d_t * far
    # match the kernel's compute dtype (set by how the weights were packed)
    dtype = pw_h["w_blocks"].dtype
    sh = density_act(
        packed_sigma_xla(pw_h, pts_h, "head", dtype=dtype), act
    )[:, None]
    vb_t = view_bias(pw_t, rays_d_t).astype(jnp.bfloat16)
    ct, _ = packed_field_xla(pw_t, pts_t, vb_t, "torso", dtype=dtype)  # [n, 3]
    return bg_blend(sh, ct, rays_d, rays_d_t, bc_rgb, last_dist,
                    acc_head, acc_com, t_head, t_com)


# ---------------------------------------------------------------------------
# Sigma-only head kernel — the COARSE pass of the hierarchical path: one
# trunk forward per sample, densities written to HBM [n, S] (they become
# importance weights via core.compositing), with occupancy flags skipping
# empty slabs (sigma := 0 there — the same bounded approximation the render
# kernels make; zero density = zero importance weight).
# ---------------------------------------------------------------------------


def _sigma_kernel(
    occ_ref, z_ref, o_ref, d_ref, freq_ref, phase_ref,
    hw_in, hb_in, hw_blocks, hb_blocks, hw_skip, hb_skip, hw_sf, hb_sf,
    out_ref, *, act: str = "relu",
):
    t = pl.program_id(0)
    j = pl.program_id(1)

    def trunk(pe_bf):
        h = jnp.maximum(_mm(pe_bf, hw_in[:]) + hb_in[:], 0.0).astype(jnp.bfloat16)
        for i in range(7):
            h = jnp.maximum(_mm(h, hw_blocks[i]) + hb_blocks[i], 0.0)
            if i == 3:
                h = h + _mm(pe_bf, hw_skip[:]) + hb_skip[:]
            h = h.astype(jnp.bfloat16)
        return _mm(h, hw_sf[:]) + hb_sf[:]

    @pl.when(occ_ref[t, j] != 0)
    def _body():
        o = o_ref[:]
        d = d_ref[:]
        freq = freq_ref[:]
        ph = phase_ref[:]
        encs = []
        for s in range(S_SLAB):
            pts = o + d * z_ref[0, 0, s]
            encs.append(jnp.sin(pts * freq + ph))
        pe = jnp.concatenate(encs, axis=0).astype(jnp.bfloat16)
        sigma = density_act(trunk(pe)[:, 0:1], act)  # [rows, 1]
        out_ref[0] = sigma.reshape(S_SLAB, R_T).T

    @pl.when(occ_ref[t, j] == 0)
    def _zero():
        out_ref[0] = jnp.zeros_like(out_ref[0])


def fused_sigma_head(
    packed_h: Dict[str, jnp.ndarray],
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_vals: jnp.ndarray,
    interpret: bool = None,
    occupancy: "jnp.ndarray" = None,
    act: str = "relu",
) -> jnp.ndarray:
    """Density-only head forward: rays [n, 3], z_vals [S] shared ->
    sigma [n, S] fp32 (density_act applied). Occupancy flags [T, J] zero
    whole slabs."""
    n = rays_o.shape[0]
    S = z_vals.shape[0]
    assert S % S_SLAB == 0
    n_slabs = S // S_SLAB
    n_tiles = -(-n // R_T)
    n_pad = n_tiles * R_T

    def padded(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((n_pad - n,) + x.shape[1:], fill, x.dtype)], axis=0
        )

    rays_o, rays_d = padded(rays_o), padded(rays_d)
    coord_idx = jnp.arange(PE_PAD) % 3
    slot_valid = (jnp.arange(PE_PAD) < 60).astype(jnp.float32)

    def replicate(r):
        return (r[:, coord_idx] * slot_valid).astype(jnp.float32)

    o_r, d_r = replicate(rays_o), replicate(rays_d)
    freqs = (jnp.pi * (2.0 ** (jnp.arange(PE_PAD) // 6)) / 2.0) * slot_valid
    phase = jnp.where((jnp.arange(PE_PAD) % 6) >= 3, jnp.pi / 2.0, 0.0) * slot_valid
    z_rows = jnp.zeros((n_slabs, 8, 128), jnp.float32).at[:, 0, :S_SLAB].set(
        z_vals.astype(jnp.float32).reshape(n_slabs, S_SLAB)
    )
    if occupancy is None:
        occupancy = jnp.ones((n_tiles, n_slabs), jnp.int32)

    hw = packed_h
    weight_ops = [
        hw["w_in"], hw["b_in"][None], hw["w_blocks"], hw["b_blocks"],
        hw["w_skip"], hw["b_skip"][None], hw["w_sf"], hw["b_sf"][None],
    ]
    weight_specs = [_full(op.shape) for op in weight_ops]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, n_slabs),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda t, j, *_: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, PE_PAD), lambda t, j, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, PE_PAD), lambda t, j, *_: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PE_PAD), lambda t, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PE_PAD), lambda t, j, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + weight_specs,
        # slab-major out buffer [J, n_pad, S_SLAB]: the trailing block
        # dims (R_T, S_SLAB) satisfy Mosaic's (8-divisible, full-dim) rule,
        # which a [n_pad, S] layout with (R_T, S_SLAB) blocks would not
        out_specs=pl.BlockSpec(
            (1, R_T, S_SLAB), lambda t, j, *_: (j, t, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(_sigma_kernel, act=act),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_slabs, n_pad, S_SLAB), jnp.float32),
        interpret=_interp(interpret),
    )(occupancy.astype(jnp.int32), z_rows, o_r, d_r,
      freqs[None].astype(jnp.float32), phase[None].astype(jnp.float32),
      *weight_ops)
    return out.transpose(1, 0, 2).reshape(n_pad, S)[:n]


# ---------------------------------------------------------------------------
# Pair-compacted field evaluation — the serving fast path.
#
# Instead of a (tiles, slabs) grid predicating skipped slabs with pl.when
# (each skipped slab still pays a grid step + block fetches, and bucketing
# whole tiles overpays wherever a tile has 1 occupied slab out of 8), the
# grid here is EXACTLY the occupied (tile, slab) pairs of ONE field,
# delivered as scalar-prefetched index arrays. Every grid step is a full
# 2048-sample field evaluation — zero predication, zero skipped-step
# overhead, and padding waste only up to the pair-count bucket.
#
# Compositing is deferred: the kernel writes per-sample (sigma, rgb) into a
# dense [J, (T+1)*R_T, 4*S_SLAB] buffer (lane = s*4 + channel; tile row T
# is a dummy target for bucket-padding pairs) and a plain-XLA pass
# composites both fields' buffers exactly like _render_kernel's in-register
# march. Blocks of unoccupied pairs are never written: the composite masks
# every (tile, slab) with the SAME occupancy flags that built the pair
# list, so uninitialized memory (even NaN) cannot reach the output.
# ---------------------------------------------------------------------------


def _pair_field_kernel(
    t_idx, j_idx, z_ref, o_ref, d_ref, vr_ref, freq_ref, phase_ref,
    w_in, b_in, w_blocks, b_blocks, w_skip, b_skip, w_sf, b_sf,
    w_out, b_out,
    d_w1, d_b1, d_wk, d_bk, d_wskip, d_bskip, d_wout, d_bout, sig_pad,
    sig_out, r_out, g_out, b_out_ref, *, branch: str, act: str = "relu",
    sp: int = None,
):
    sp = S_SLAB if sp is None else sp
    rows = sp * R_T

    o = o_ref[:]
    d = d_ref[:]
    freq = freq_ref[:]
    ph = phase_ref[:]
    encs = []
    for s in range(sp):
        pts = o + d * z_ref[0, 0, s]
        encs.append(jnp.sin(pts * freq + ph))
    pe = jnp.concatenate(encs, axis=0).astype(jnp.bfloat16)

    # NOTE precision structure (measured): the 9-layer dependent matmul
    # chain is MXU-bound at ~55% utilization; running the inter-layer
    # bias/relu epilogues in bf16 measured ZERO end-to-end gain (and
    # Mosaic requires 32-bit matmul accumulators), so the epilogues stay
    # f32-accurate.
    if branch == "torso":
        dh = jnp.maximum(_mm(pe, d_w1[:]) + d_b1[:],
                         0.0).astype(jnp.bfloat16)
        for i in range(4):
            dh = jnp.maximum(_mm(dh, d_wk[i]) + d_bk[i], 0.0)
            if i == 2:
                dh = dh + _mm(pe, d_wskip[:]) + d_bskip[:]
            dh = dh.astype(jnp.bfloat16)
        d_out = _mm(dh, d_wout[:]) + d_bout[:]
        pe128 = jnp.concatenate([pe.astype(jnp.float32),
                                 jnp.zeros_like(pe, jnp.float32)],
                                axis=-1)
        pe = (d_out + sig_pad[:] + pe128).astype(jnp.bfloat16)
    h = jnp.maximum(_mm(pe, w_in[:]) + b_in[:], 0.0).astype(jnp.bfloat16)
    for i in range(7):
        h = jnp.maximum(_mm(h, w_blocks[i]) + b_blocks[i], 0.0)
        if i == 3:
            h = h + _mm(pe, w_skip[:]) + b_skip[:]
        h = h.astype(jnp.bfloat16)
    sf = _mm(h, w_sf[:]) + b_sf[:]  # [rows, 384] f32

    sigma = density_act(sf[:, 0:1], act)
    vr = jnp.broadcast_to(
        vr_ref[:][None], (sp, R_T, 256)
    ).reshape(rows, 256)
    net = jnp.maximum(sf[:, 128:384] + vr.astype(jnp.float32), 0.0)
    rgb = jax.nn.sigmoid(_mm(net.astype(jnp.bfloat16), w_out[:]) + b_out[:])

    # transpose-free epilogue: each channel's rows are already s-major, so
    # a [S_SLAB, R_T]-shaped output block takes the reshape directly.
    # (A reshape(S_SLAB, R_T, 4).transpose(1, 0, 2) assembly hits an
    # unsupported Mosaic vector reshape; a concat of four transposes
    # wedges the compiler; 8 per-slab 4-lane concats into one 32-lane
    # block cost ~10us/step of VPU shuffles.) rgb is stored bf16 (the
    # composite's precision contract keeps sigma/alphas fp32; colors are
    # sigmoid-bounded and bf16-safe), halving the buffer traffic.
    sig_out[0] = sigma[:, 0].reshape(sp, R_T)
    r_out[0] = rgb[:, 0].reshape(sp, R_T).astype(jnp.bfloat16)
    g_out[0] = rgb[:, 1].reshape(sp, R_T).astype(jnp.bfloat16)
    b_out_ref[0] = rgb[:, 2].reshape(sp, R_T).astype(jnp.bfloat16)


def pe_replicate(rays: jnp.ndarray) -> jnp.ndarray:
    """PE-slot replication for the fused kernels: [n, 3] -> [n, PE_PAD]
    fp32, slot c holding coordinate c % 3 (zeroed past the 60 valid
    slots). Callers that prep kernel operands in a separate XLA program
    (the serving fast path) apply this once instead of per kernel."""
    coord_idx = jnp.arange(PE_PAD) % 3
    slot_valid = (jnp.arange(PE_PAD) < 60).astype(jnp.float32)
    return (rays[:, coord_idx] * slot_valid).astype(jnp.float32)


def pe_freq_phase() -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The [1, PE_PAD] frequency/phase rows matching pe_replicate."""
    slot_valid = (jnp.arange(PE_PAD) < 60).astype(jnp.float32)
    freqs = (jnp.pi * (2.0 ** (jnp.arange(PE_PAD) // 6)) / 2.0) * slot_valid
    phase = jnp.where(
        (jnp.arange(PE_PAD) % 6) >= 3, jnp.pi / 2.0, 0.0
    ) * slot_valid
    return freqs[None].astype(jnp.float32), phase[None].astype(jnp.float32)


def pair_field_eval(
    pw: Dict[str, jnp.ndarray],
    branch: str,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_vals: jnp.ndarray,
    t_idx: jnp.ndarray,
    j_idx: jnp.ndarray,
    interpret: bool = None,
    act: str = "relu",
    s_slab: int = None,
) -> jnp.ndarray:
    """Evaluate one packed field on K occupied (tile, slab) pairs.

    rays_o/rays_d [n, 3] in spatial-tile order (n a multiple of R_T);
    z_vals [S] shared; t_idx/j_idx [K] int32 pair coordinates — padding
    pairs use t_idx == n_tiles (the dummy tile row).

    Returns a 4-tuple of dense per-sample channel buffers (relu sigma
    fp32; sigmoid r, g, b bf16), each [n_slabs, S_SLAB, (n_tiles+1)*R_T].
    Only listed pairs' blocks are written — callers MUST mask reads with
    the occupancy flags that built the list (deferred_composite does).
    """
    n = rays_o.shape[0]
    S = z_vals.shape[0]
    sp = S_SLAB if s_slab is None else s_slab
    assert S % sp == 0 and n % R_T == 0

    o_r, d_r = pe_replicate(rays_o), pe_replicate(rays_d)
    # dummy tile row for padding pairs
    o_r = jnp.concatenate([o_r, jnp.zeros((R_T, PE_PAD), o_r.dtype)])
    d_r = jnp.concatenate([d_r, jnp.zeros((R_T, PE_PAD), d_r.dtype)])
    vr = view_bias(pw, rays_d).astype(jnp.bfloat16)
    vr = jnp.concatenate([vr, jnp.zeros((R_T, 256), vr.dtype)])
    return pair_field_eval_prepped(pw, branch, o_r, d_r, vr, z_vals,
                                   t_idx, j_idx, interpret=_interp(interpret),
                                   act=act, s_slab=sp)


def pair_field_eval_prepped(
    pw: Dict[str, jnp.ndarray],
    branch: str,
    o_r: jnp.ndarray,
    d_r: jnp.ndarray,
    vr: jnp.ndarray,
    z_vals: jnp.ndarray,
    t_idx: jnp.ndarray,
    j_idx: jnp.ndarray,
    interpret: bool = None,
    act: str = "relu",
    s_slab: int = None,
) -> jnp.ndarray:
    """pair_field_eval given pre-prepped operands (the serving fast path:
    pe_replicate / view_bias / the dummy row live in the caller's one
    merged XLA prep program instead of being re-derived inside every
    kernel program). o_r/d_r [(n_tiles+1)*R_T, PE_PAD] fp32 (pe_replicate
    output + dummy tile row); vr [(n_tiles+1)*R_T, 256] bf16."""
    S = z_vals.shape[0]
    sp = S_SLAB if s_slab is None else s_slab
    assert S % sp == 0 and o_r.shape[0] % R_T == 0
    n_slabs = S // sp
    n_tiles = o_r.shape[0] // R_T - 1
    if t_idx.shape[0] == 0:
        # nothing occupied for this field this frame — the composite masks
        # every slab off, so any buffer contents work; zeros are cheapest
        return tuple(
            jnp.zeros((n_slabs, sp, (n_tiles + 1) * R_T),
                      jnp.float32 if c == 0 else jnp.bfloat16)
            for c in range(4)
        )

    freqs, phase = pe_freq_phase()
    z_rows = jnp.zeros((n_slabs, 8, 128), jnp.float32).at[:, 0, :sp].set(
        z_vals.astype(jnp.float32).reshape(n_slabs, sp)
    )

    weight_ops = [
        pw["w_in"], pw["b_in"][None], pw["w_blocks"], pw["b_blocks"],
        pw["w_skip"], pw["b_skip"][None], pw["w_sf"], pw["b_sf"][None],
        pw["w_out"], pw["b_out"][None],
    ]
    if branch == "torso":
        weight_ops += [
            pw["d_w1"], pw["d_b1"][None], pw["d_wk"], pw["d_bk"],
            pw["d_wskip"], pw["d_bskip"][None], pw["d_wout"],
            pw["d_bout"][None], pw["sig_pad"][None],
        ]
    else:
        # head has no deformation net: bind tiny placeholders so the kernel
        # signature stays fixed (the branch-static trace never touches them)
        zero = jnp.zeros((1, 1), jnp.bfloat16)
        weight_ops += [zero] * 9
    weight_specs = [_full(op.shape) for op in weight_ops]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # t_idx, j_idx
        grid=(t_idx.shape[0],),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda k, ti, ji: (ji[k], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, PE_PAD), lambda k, ti, ji: (ti[k], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, PE_PAD), lambda k, ti, ji: (ti[k], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, 256), lambda k, ti, ji: (ti[k], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PE_PAD), lambda k, ti, ji: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PE_PAD), lambda k, ti, ji: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + weight_specs,
        out_specs=tuple(
            pl.BlockSpec(
                (1, sp, R_T), lambda k, ti, ji: (ji[k], 0, ti[k]),
                memory_space=pltpu.VMEM,
            ) for _ in range(4)
        ),
    )
    return pl.pallas_call(
        functools.partial(_pair_field_kernel, branch=branch, act=act,
                          sp=sp),
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct(
                (n_slabs, sp, (n_tiles + 1) * R_T),
                jnp.float32 if c == 0 else jnp.bfloat16,
            ) for c in range(4)
        ),
        interpret=_interp(interpret),
    )(t_idx.astype(jnp.int32), j_idx.astype(jnp.int32), z_rows,
      o_r, d_r, vr, freqs, phase, *weight_ops)


def _pair2_field_kernel(
    tA, jA, tB, jB, zA_ref, zB_ref, oA_ref, dA_ref, oB_ref, dB_ref,
    vrA_ref, vrB_ref, freq_ref, phase_ref,
    w_in, b_in, w_blocks, b_blocks, w_skip, b_skip, w_sf, b_sf,
    w_out, b_out,
    d_w1, d_b1, d_wk, d_bk, d_wskip, d_bskip, d_wout, d_bout, sig_pad,
    sigA_out, rA_out, gA_out, bA_out,
    sigB_out, rB_out, gB_out, bB_out,
    *, branch: str, act: str = "relu", sp: int = 4,
):
    """_pair_field_kernel evaluating TWO (tile, slab) pairs per grid step.

    At sp=4 a single pair is only 1024 MXU rows — half the measured
    2048-row sweet spot — so the kernel batches pair 2k (the "A" slot)
    and pair 2k+1 ("B") through one shared trunk: finer slab granularity
    (the occupancy flags skip ~18% more samples at sp=4 on the serving
    scene) at full matmul width. A-slot outputs land in their own buffer
    quartet, B in another; the (tile, slab) partitions are disjoint by
    construction, so deferred_composite merges them with a masked sum.
    """
    half = sp * R_T

    freq = freq_ref[:]
    ph = phase_ref[:]
    encs = []
    for o_ref, d_ref, z_ref in ((oA_ref, dA_ref, zA_ref),
                                (oB_ref, dB_ref, zB_ref)):
        o = o_ref[:]
        d = d_ref[:]
        for s in range(sp):
            pts = o + d * z_ref[0, 0, s]
            encs.append(jnp.sin(pts * freq + ph))
    pe = jnp.concatenate(encs, axis=0).astype(jnp.bfloat16)

    if branch == "torso":
        dh = jnp.maximum(_mm(pe, d_w1[:]) + d_b1[:],
                         0.0).astype(jnp.bfloat16)
        for i in range(4):
            dh = jnp.maximum(_mm(dh, d_wk[i]) + d_bk[i], 0.0)
            if i == 2:
                dh = dh + _mm(pe, d_wskip[:]) + d_bskip[:]
            dh = dh.astype(jnp.bfloat16)
        d_out = _mm(dh, d_wout[:]) + d_bout[:]
        pe128 = jnp.concatenate([pe.astype(jnp.float32),
                                 jnp.zeros_like(pe, jnp.float32)],
                                axis=-1)
        pe = (d_out + sig_pad[:] + pe128).astype(jnp.bfloat16)
    h = jnp.maximum(_mm(pe, w_in[:]) + b_in[:], 0.0).astype(jnp.bfloat16)
    for i in range(7):
        h = jnp.maximum(_mm(h, w_blocks[i]) + b_blocks[i], 0.0)
        if i == 3:
            h = h + _mm(pe, w_skip[:]) + b_skip[:]
        h = h.astype(jnp.bfloat16)
    sf = _mm(h, w_sf[:]) + b_sf[:]  # [2*half, 384] f32

    sigma = density_act(sf[:, 0:1], act)
    vr = jnp.concatenate([
        jnp.broadcast_to(r[:][None], (sp, R_T, 256)).reshape(half, 256)
        for r in (vrA_ref, vrB_ref)
    ], axis=0)
    net = jnp.maximum(sf[:, 128:384] + vr.astype(jnp.float32), 0.0)
    rgb = jax.nn.sigmoid(_mm(net.astype(jnp.bfloat16), w_out[:]) + b_out[:])

    sigA_out[0] = sigma[:half, 0].reshape(sp, R_T)
    rA_out[0] = rgb[:half, 0].reshape(sp, R_T).astype(jnp.bfloat16)
    gA_out[0] = rgb[:half, 1].reshape(sp, R_T).astype(jnp.bfloat16)
    bA_out[0] = rgb[:half, 2].reshape(sp, R_T).astype(jnp.bfloat16)
    sigB_out[0] = sigma[half:, 0].reshape(sp, R_T)
    rB_out[0] = rgb[half:, 0].reshape(sp, R_T).astype(jnp.bfloat16)
    gB_out[0] = rgb[half:, 1].reshape(sp, R_T).astype(jnp.bfloat16)
    bB_out[0] = rgb[half:, 2].reshape(sp, R_T).astype(jnp.bfloat16)


def pair2_field_eval_prepped(
    pw: Dict[str, jnp.ndarray],
    branch: str,
    o_r: jnp.ndarray,
    d_r: jnp.ndarray,
    vr: jnp.ndarray,
    z_vals: jnp.ndarray,
    tA: jnp.ndarray,
    jA: jnp.ndarray,
    tB: jnp.ndarray,
    jB: jnp.ndarray,
    interpret: bool = None,
    act: str = "relu",
    s_slab: int = 4,
) -> Tuple[Tuple[jnp.ndarray, ...], Tuple[jnp.ndarray, ...]]:
    """Packed-2 pair evaluation (see _pair2_field_kernel): the A pair
    list (tA, jA) and B list (tB, jB) must be equal-length DISJOINT
    partitions of the field's occupied pairs (padding pairs target the
    dummy tile row). Returns (bufs_A, bufs_B) — two pair_field_eval-style
    channel quartets; composite with deferred_composite(..., buf_?2=,
    occ2=) using the matching flag partitions."""
    S = z_vals.shape[0]
    sp = s_slab
    assert S % sp == 0 and o_r.shape[0] % R_T == 0
    assert tA.shape == tB.shape and jA.shape == jB.shape
    n_slabs = S // sp
    n_tiles = o_r.shape[0] // R_T - 1
    if tA.shape[0] == 0:
        return tuple(
            tuple(
                jnp.zeros((n_slabs, sp, (n_tiles + 1) * R_T),
                          jnp.float32 if c == 0 else jnp.bfloat16)
                for c in range(4)
            ) for _ in range(2)
        )

    freqs, phase = pe_freq_phase()
    z_rows = jnp.zeros((n_slabs, 8, 128), jnp.float32).at[:, 0, :sp].set(
        z_vals.astype(jnp.float32).reshape(n_slabs, sp)
    )

    weight_ops = [
        pw["w_in"], pw["b_in"][None], pw["w_blocks"], pw["b_blocks"],
        pw["w_skip"], pw["b_skip"][None], pw["w_sf"], pw["b_sf"][None],
        pw["w_out"], pw["b_out"][None],
    ]
    if branch == "torso":
        weight_ops += [
            pw["d_w1"], pw["d_b1"][None], pw["d_wk"], pw["d_bk"],
            pw["d_wskip"], pw["d_bskip"][None], pw["d_wout"],
            pw["d_bout"][None], pw["sig_pad"][None],
        ]
    else:
        zero = jnp.zeros((1, 1), jnp.bfloat16)
        weight_ops += [zero] * 9
    weight_specs = [_full(op.shape) for op in weight_ops]

    def zspec(which):
        return pl.BlockSpec(
            (1, 8, 128),
            (lambda k, ta, ja, tb, jb: (ja[k], 0, 0)) if which == 0
            else (lambda k, ta, ja, tb, jb: (jb[k], 0, 0)),
            memory_space=pltpu.VMEM,
        )

    def rspec(width, which):
        return pl.BlockSpec(
            (R_T, width),
            (lambda k, ta, ja, tb, jb: (ta[k], 0)) if which == 0
            else (lambda k, ta, ja, tb, jb: (tb[k], 0)),
            memory_space=pltpu.VMEM,
        )

    def ospec(which):
        return pl.BlockSpec(
            (1, sp, R_T),
            (lambda k, ta, ja, tb, jb: (ja[k], 0, ta[k])) if which == 0
            else (lambda k, ta, ja, tb, jb: (jb[k], 0, tb[k])),
            memory_space=pltpu.VMEM,
        )

    const = lambda k, ta, ja, tb, jb: (0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # tA, jA, tB, jB
        grid=(tA.shape[0],),
        in_specs=[
            zspec(0), zspec(1),
            rspec(PE_PAD, 0), rspec(PE_PAD, 0),
            rspec(PE_PAD, 1), rspec(PE_PAD, 1),
            rspec(256, 0), rspec(256, 1),
            pl.BlockSpec((1, PE_PAD), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PE_PAD), const, memory_space=pltpu.VMEM),
        ] + weight_specs,
        out_specs=tuple(ospec(0) for _ in range(4))
        + tuple(ospec(1) for _ in range(4)),
    )
    outs = pl.pallas_call(
        functools.partial(_pair2_field_kernel, branch=branch, act=act,
                          sp=sp),
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct(
                (n_slabs, sp, (n_tiles + 1) * R_T),
                jnp.float32 if c % 4 == 0 else jnp.bfloat16,
            ) for c in range(8)
        ),
        interpret=_interp(interpret),
    )(tA.astype(jnp.int32), jA.astype(jnp.int32),
      tB.astype(jnp.int32), jB.astype(jnp.int32), z_rows, z_rows,
      o_r, d_r, o_r, d_r, vr, vr, freqs, phase, *weight_ops)
    return outs[:4], outs[4:]


def _far_kernel(
    ph_ref, pt_ref, vr_t_ref, freq_ref, phase_ref,
    hw_in, hb_in, hw_blocks, hb_blocks, hw_skip, hb_skip, hw_sf, hb_sf,
    tw_in, tb_in, tw_blocks, tb_blocks, tw_skip, tb_skip, tw_sf, tb_sf,
    tw_out, tb_out,
    d_w1, d_b1, d_wk, d_bk, d_wskip, d_bskip, d_wout, d_bout, sig_pad,
    sig_out, r_out, g_out, b_out_ref, *, act: str = "relu",
):
    """Far-plane catch-all evals for the bg epilogue: one point per ray —
    head sigma + torso rgb — as a single MXU pass instead of an XLA
    forward whose [N, 384] intermediates round-trip HBM (measured 8.8 ms
    -> ~2.5 ms at 450p)."""

    def trunk(pe, w_in, b_in, w_blocks, b_blocks, w_skip, b_skip, w_sf, b_sf):
        h = jnp.maximum(_mm(pe, w_in[:]) + b_in[:], 0.0).astype(jnp.bfloat16)
        for i in range(7):
            h = jnp.maximum(_mm(h, w_blocks[i]) + b_blocks[i], 0.0)
            if i == 3:
                h = h + _mm(pe, w_skip[:]) + b_skip[:]
            h = h.astype(jnp.bfloat16)
        return _mm(h, w_sf[:]) + b_sf[:]

    pe_h = jnp.sin(ph_ref[:] * freq_ref[:] + phase_ref[:]).astype(jnp.bfloat16)
    sf_h = trunk(pe_h, hw_in, hb_in, hw_blocks, hb_blocks, hw_skip, hb_skip,
                 hw_sf, hb_sf)
    rows = pe_h.shape[0]
    sig_out[:] = jnp.broadcast_to(
        density_act(sf_h[:, 0:1], act), (rows, 8))

    pe_t = jnp.sin(pt_ref[:] * freq_ref[:] + phase_ref[:]).astype(jnp.bfloat16)
    dh = jnp.maximum(_mm(pe_t, d_w1[:]) + d_b1[:], 0.0).astype(jnp.bfloat16)
    for i in range(4):
        dh = jnp.maximum(_mm(dh, d_wk[i]) + d_bk[i], 0.0)
        if i == 2:
            dh = dh + _mm(pe_t, d_wskip[:]) + d_bskip[:]
        dh = dh.astype(jnp.bfloat16)
    d_out = _mm(dh, d_wout[:]) + d_bout[:]
    pe128 = jnp.concatenate([pe_t.astype(jnp.float32),
                             jnp.zeros_like(pe_t, jnp.float32)], axis=-1)
    p2 = (d_out + sig_pad[:] + pe128).astype(jnp.bfloat16)
    sf_t = trunk(p2, tw_in, tb_in, tw_blocks, tb_blocks, tw_skip, tb_skip,
                 tw_sf, tb_sf)
    net = jnp.maximum(sf_t[:, 128:384] + vr_t_ref[:].astype(jnp.float32), 0.0)
    rgb = jax.nn.sigmoid(_mm(net.astype(jnp.bfloat16), tw_out[:]) + tb_out[:])
    r_out[:] = jnp.broadcast_to(rgb[:, 0:1], (rows, 8))
    g_out[:] = jnp.broadcast_to(rgb[:, 1:2], (rows, 8))
    b_out_ref[:] = jnp.broadcast_to(rgb[:, 2:3], (rows, 8))


def fused_far_eval(
    pw_h: Dict[str, jnp.ndarray],
    pw_t: Dict[str, jnp.ndarray],
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    rays_o_t: jnp.ndarray,
    rays_d_t: jnp.ndarray,
    far,
    interpret: bool = None,
    act: str = "relu",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Kernel-evaluated far-plane quantities for _bg_epilogue:
    (sigma_h(far) [n, 1] relu'd, rgb_t(far) [n, 3])."""
    n = rays_o.shape[0]
    # 1024-row blocks: both fields' weights + two PE blocks + fp32 [rows,
    # 384] trunk outputs exceed the 16 MB scoped-vmem limit at 2048 rows
    ROWS = int(os.environ.get("DFANERF_FAR_ROWS", "1024"))
    n_blk = -(-n // ROWS)
    n_pad = n_blk * ROWS

    def padded(x):
        return jnp.concatenate(
            [x, jnp.zeros((n_pad - n,) + x.shape[1:], x.dtype)], axis=0
        )

    coord_idx = jnp.arange(PE_PAD) % 3
    slot_valid = (jnp.arange(PE_PAD) < 60).astype(jnp.float32)

    def replicate(r):
        return (r[:, coord_idx] * slot_valid).astype(jnp.float32)

    ph = padded(replicate(rays_o + rays_d * far))
    pt = padded(replicate(rays_o_t + rays_d_t * far))
    vr_t = padded(view_bias(pw_t, rays_d_t).astype(jnp.bfloat16))
    freqs = (jnp.pi * (2.0 ** (jnp.arange(PE_PAD) // 6)) / 2.0) * slot_valid
    phase = jnp.where(
        (jnp.arange(PE_PAD) % 6) >= 3, jnp.pi / 2.0, 0.0
    ) * slot_valid

    hw, tw = pw_h, pw_t
    weight_ops = [
        hw["w_in"], hw["b_in"][None], hw["w_blocks"], hw["b_blocks"],
        hw["w_skip"], hw["b_skip"][None], hw["w_sf"], hw["b_sf"][None],
        tw["w_in"], tw["b_in"][None], tw["w_blocks"], tw["b_blocks"],
        tw["w_skip"], tw["b_skip"][None], tw["w_sf"], tw["b_sf"][None],
        tw["w_out"], tw["b_out"][None],
        tw["d_w1"], tw["d_b1"][None], tw["d_wk"], tw["d_bk"],
        tw["d_wskip"], tw["d_bskip"][None], tw["d_wout"], tw["d_bout"][None],
        tw["sig_pad"][None],
    ]
    weight_specs = [_full(op.shape) for op in weight_ops]

    def row_spec(lane):
        return pl.BlockSpec((ROWS, lane), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_far_kernel, act=act),
        grid=(n_blk,),
        in_specs=[
            row_spec(PE_PAD), row_spec(PE_PAD), row_spec(256),
            pl.BlockSpec((1, PE_PAD), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PE_PAD), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + weight_specs,
        out_specs=tuple(row_spec(8) for _ in range(4)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_pad, 8), jnp.float32) for _ in range(4)
        ),
        interpret=_interp(interpret),
    )(ph, pt, vr_t, freqs[None].astype(jnp.float32),
      phase[None].astype(jnp.float32), *weight_ops)
    sig_h = outs[0][:n, 0:1]
    rgb_t = jnp.stack([o[:n, 0] for o in outs[1:]], axis=-1)
    return sig_h, rgb_t


def _far_head_kernel(
    ph_ref, freq_ref, phase_ref,
    hw_in, hb_in, hw_blocks, hb_blocks, hw_skip, hb_skip, hw_sf, hb_sf,
    sig_out, *, act: str = "relu",
):
    """Head half of the far-plane catch-all: sigma only. w_sf arrives
    SLICED to its first 128 lanes (sigma is column 0) — the head far pass
    never needs the 384-wide feature tail, which saves ~15% of its MACs
    and enough VMEM to run 2048-row blocks."""
    pe = jnp.sin(ph_ref[:] * freq_ref[:] + phase_ref[:]).astype(jnp.bfloat16)
    h = jnp.maximum(_mm(pe, hw_in[:]) + hb_in[:], 0.0).astype(jnp.bfloat16)
    for i in range(7):
        h = jnp.maximum(_mm(h, hw_blocks[i]) + hb_blocks[i], 0.0)
        if i == 3:
            h = h + _mm(pe, hw_skip[:]) + hb_skip[:]
        h = h.astype(jnp.bfloat16)
    sf = _mm(h, hw_sf[:]) + hb_sf[:]
    rows = pe.shape[0]
    sig_out[:] = jnp.broadcast_to(density_act(sf[:, 0:1], act), (rows, 8))


def _far_torso_kernel(
    pt_ref, vr_t_ref, freq_ref, phase_ref,
    tw_in, tb_in, tw_blocks, tb_blocks, tw_skip, tb_skip, tw_sf, tb_sf,
    tw_out, tb_out,
    d_w1, d_b1, d_wk, d_bk, d_wskip, d_bskip, d_wout, d_bout, sig_pad,
    r_out, g_out, b_out_ref, *, act: str = "relu",
):
    """Torso half of the far-plane catch-all: rgb only (deform + trunk +
    view head). Splitting the two fields into separate programs halves the
    resident weights per kernel, which fits 2048-row blocks under the
    16 MB scoped-VMEM ceiling (the joint kernel capped at 1024 rows)."""
    pe_t = jnp.sin(pt_ref[:] * freq_ref[:] + phase_ref[:]).astype(jnp.bfloat16)
    dh = jnp.maximum(_mm(pe_t, d_w1[:]) + d_b1[:], 0.0).astype(jnp.bfloat16)
    for i in range(4):
        dh = jnp.maximum(_mm(dh, d_wk[i]) + d_bk[i], 0.0)
        if i == 2:
            dh = dh + _mm(pe_t, d_wskip[:]) + d_bskip[:]
        dh = dh.astype(jnp.bfloat16)
    d_out = _mm(dh, d_wout[:]) + d_bout[:]
    pe128 = jnp.concatenate([pe_t.astype(jnp.float32),
                             jnp.zeros_like(pe_t, jnp.float32)], axis=-1)
    p2 = (d_out + sig_pad[:] + pe128).astype(jnp.bfloat16)
    h = jnp.maximum(_mm(p2, tw_in[:]) + tb_in[:], 0.0).astype(jnp.bfloat16)
    for i in range(7):
        h = jnp.maximum(_mm(h, tw_blocks[i]) + tb_blocks[i], 0.0)
        if i == 3:
            h = h + _mm(p2, tw_skip[:]) + tb_skip[:]
        h = h.astype(jnp.bfloat16)
    sf_t = _mm(h, tw_sf[:]) + tb_sf[:]
    net = jnp.maximum(sf_t[:, 128:384] + vr_t_ref[:].astype(jnp.float32), 0.0)
    rgb = jax.nn.sigmoid(_mm(net.astype(jnp.bfloat16), tw_out[:]) + tb_out[:])
    rows = pe_t.shape[0]
    r_out[:] = jnp.broadcast_to(rgb[:, 0:1], (rows, 8))
    g_out[:] = jnp.broadcast_to(rgb[:, 1:2], (rows, 8))
    b_out_ref[:] = jnp.broadcast_to(rgb[:, 2:3], (rows, 8))


def fused_far_eval_split(
    pw_h: Dict[str, jnp.ndarray],
    pw_t: Dict[str, jnp.ndarray],
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    rays_o_t: jnp.ndarray,
    rays_d_t: jnp.ndarray,
    far,
    interpret: bool = None,
    act: str = "relu",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """fused_far_eval as TWO single-field programs (identical math): the
    head pass evaluates only sigma with a lane-sliced w_sf, the torso pass
    only rgb; each runs 2048-row blocks (vs 1024 joint) for better MXU
    pipelining."""
    ph = pe_replicate(rays_o + rays_d * far)
    pt = pe_replicate(rays_o_t + rays_d_t * far)
    vr_t = view_bias(pw_t, rays_d_t).astype(jnp.bfloat16)
    return fused_far_eval_split_prepped(pw_h, pw_t, ph, pt, vr_t,
                                        interpret=_interp(interpret), act=act)


def fused_far_eval_split_prepped(
    pw_h: Dict[str, jnp.ndarray],
    pw_t: Dict[str, jnp.ndarray],
    ph: jnp.ndarray,
    pt: jnp.ndarray,
    vr_t: jnp.ndarray,
    interpret: bool = None,
    act: str = "relu",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """fused_far_eval_split given pre-replicated far-plane points
    ph/pt [n, PE_PAD] (pe_replicate of o + d*far) and the torso view bias
    vr_t [n, 256] bf16 — the serving fast path preps these in its merged
    XLA program (possibly on a SUBSAMPLED ray grid; sh/ct are spatially
    smooth at the far plane, and the realized upsampling error is covered
    by the benchmarks' max-error-vs-noskip discipline)."""
    n = ph.shape[0]
    ROWS = min(int(os.environ.get("DFANERF_FAR_ROWS", "2048")), 8 * (-(-n // 8)))
    n_blk = -(-n // ROWS)
    n_pad = n_blk * ROWS

    def padded(x):
        return jnp.concatenate(
            [x, jnp.zeros((n_pad - n,) + x.shape[1:], x.dtype)], axis=0
        )

    ph, pt, vr_t = padded(ph), padded(pt), padded(vr_t)
    freqs, phase = pe_freq_phase()

    def row_spec(lane):
        return pl.BlockSpec((ROWS, lane), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)

    const_spec = pl.BlockSpec((1, PE_PAD), lambda b: (0, 0),
                              memory_space=pltpu.VMEM)

    hw = pw_h
    head_ops = [
        hw["w_in"], hw["b_in"][None], hw["w_blocks"], hw["b_blocks"],
        hw["w_skip"], hw["b_skip"][None],
        hw["w_sf"][:, :128], hw["b_sf"][None, :128],
    ]
    sig = pl.pallas_call(
        functools.partial(_far_head_kernel, act=act),
        grid=(n_blk,),
        in_specs=[row_spec(PE_PAD), const_spec, const_spec]
        + [_full(op.shape) for op in head_ops],
        out_specs=row_spec(8),
        out_shape=jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
        interpret=_interp(interpret),
    )(ph, freqs, phase, *head_ops)

    tw = pw_t
    torso_ops = [
        tw["w_in"], tw["b_in"][None], tw["w_blocks"], tw["b_blocks"],
        tw["w_skip"], tw["b_skip"][None], tw["w_sf"], tw["b_sf"][None],
        tw["w_out"], tw["b_out"][None],
        tw["d_w1"], tw["d_b1"][None], tw["d_wk"], tw["d_bk"],
        tw["d_wskip"], tw["d_bskip"][None], tw["d_wout"], tw["d_bout"][None],
        tw["sig_pad"][None],
    ]
    outs = pl.pallas_call(
        functools.partial(_far_torso_kernel, act=act),
        grid=(n_blk,),
        in_specs=[row_spec(PE_PAD), row_spec(256), const_spec, const_spec]
        + [_full(op.shape) for op in torso_ops],
        out_specs=tuple(row_spec(8) for _ in range(3)),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_pad, 8), jnp.float32) for _ in range(3)
        ),
        interpret=_interp(interpret),
    )(pt, vr_t, freqs, phase, *torso_ops)
    rgb_t = jnp.stack([o[:n, 0] for o in outs], axis=-1)
    return sig[:n, 0:1], rgb_t


def bg_blend(sh, ct, rays_d, rays_d_t, bc_rgb, last_dist,
             acc_head, acc_com, t_head, t_com):
    """The catch-all blend expressions of _bg_epilogue given the far-plane
    field values sh = relu(sigma_h(far)) [n, 1] and ct = rgb_t(far)
    [n, 3] (run_nerf_com_trainExpLater.py:863-886 last-sample math)."""
    dh_l = last_dist * jnp.linalg.norm(rays_d.astype(jnp.float32), axis=-1,
                                       keepdims=True)
    dt_l = last_dist * jnp.linalg.norm(rays_d_t.astype(jnp.float32), axis=-1,
                                       keepdims=True)
    bc = bc_rgb.astype(jnp.float32)

    sh_head = sh + 1e-6
    alpha_h = 1.0 - jnp.exp(-(sh_head + 1e-6) * dh_l)
    head = acc_head + (alpha_h * t_head) * bc

    st_com = 1e-6
    ssum = sh + st_com
    denom = jnp.where(ssum == 0.0, 1e-4, ssum)
    c_mix = (sh * bc + st_com * ct) / denom
    alpha_c = 1.0 - jnp.exp(-(ssum + 1e-6) * dt_l)
    com = acc_com + (alpha_c * t_com) * c_mix
    return head, com


def bg_epilogue_fused(pw_h, pw_t, rays_o, rays_d, rays_o_t, rays_d_t,
                      z_vals, bc_rgb, last_dist, acc_head, acc_com,
                      t_head, t_com, interpret: bool = False):
    """_bg_epilogue with the two field evaluations done by fused_far_eval
    (same math; the blend expressions are unchanged)."""
    sh, ct = fused_far_eval(pw_h, pw_t, rays_o, rays_d, rays_o_t, rays_d_t,
                            z_vals[-1], interpret=interpret)
    return bg_blend(sh, ct, rays_d, rays_d_t, bc_rgb, last_dist,
                    acc_head, acc_com, t_head, t_com)


def deferred_composite(
    buf_h: jnp.ndarray,
    buf_t: jnp.ndarray,
    occ: jnp.ndarray,
    rays_d: jnp.ndarray,
    rays_d_t: jnp.ndarray,
    z_vals: jnp.ndarray,
    with_diagnostics: bool = True,
    buf_h2: jnp.ndarray = None,
    buf_t2: jnp.ndarray = None,
    occ2: jnp.ndarray = None,
    s_slab: int = None,
    with_ray_diag: bool = False,
    ray_err_bc: jnp.ndarray = None,
    with_keys: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Composite two pair_field_eval buffers — the same per-sample math as
    _render_kernel's in-register march (bg_epilogue mode: the catch-all
    sample is the caller's _bg_epilogue), vectorized over [n, S] in XLA.

    buf_h/buf_t are pair_field_eval 4-tuples ([J, S_SLAB, NT]; sigma fp32,
    rgb bf16). occ [2, T, J] masks every (tile, slab) a pair list may have
    skipped (where(flag, x, 0) also stops NaN garbage from unwritten
    blocks). Returns (acc_head [n,3], acc_com [n,3], t_head [n,1],
    t_com [n,1], tile_trans_head [T,J], tile_trans_com [T,J],
    contrib_head [T,J], contrib_torso [T,J]).

    With ``with_diagnostics=False`` only the first four outputs are
    computed — the per-frame serving composite skips the [T, J] reduction
    work entirely (the prune diagnostics are only consumed at refresh
    time).

    The contrib outputs are per-(tile, slab) PER-FIELD visibility: the max
    over the tile's rays of the slab's summed compositing-weight
    contribution of that field across both stacks (head stack weight +
    composite weight x that field's density-mix fraction). A pair whose
    contrib is below eps changes any ray of any stack by at most
    ~n_slabs*eps per channel if skipped — the lever behind the pair
    renderer's occ_prune_contrib: junk floaters on background rays keep
    transmittance 1 but have near-zero alpha, so transmittance pruning
    misses them and contribution pruning catches them.

    The whole pass runs in the buffers' NATIVE [S, n] orientation — no
    [n, S] transpose is ever materialized (the two 220 MB transposes of
    the ray-major formulation dominated its runtime); the cumprods scan
    the leading sample axis over [n]-vectors.
    """
    J = buf_h[0].shape[0]
    NT = buf_h[0].shape[2]
    n = rays_d.shape[0]
    S = z_vals.shape[0]
    T = n // R_T
    sp = S_SLAB if s_slab is None else s_slab

    def unpack(bufs, occ_f):
        # [S, n] per channel; flag [T, J] -> [J, sp, T, R_T] broadcast
        flag = occ_f.astype(bool).T[:, None, :, None]

        def chan(buf):
            x = buf.reshape(J, sp, NT // R_T, R_T)[:, :, :T]
            x = jnp.where(flag, x.astype(jnp.float32), 0.0)
            return x.reshape(S, n)

        sigma = chan(bufs[0])
        rgbs = tuple(chan(b) for b in bufs[1:])  # 3 x [S, n]
        return sigma, rgbs

    sig_h, rgb_h = unpack(buf_h, occ[0])
    sig_t, rgb_t = unpack(buf_t, occ[1])
    if buf_h2 is not None:
        # packed-2 kernels split each field's pairs over two buffers
        # (grid-step slots write disjoint (tile, slab) blocks); the flag
        # partition occ/occ2 makes the masked unpacks disjoint, so a sum
        # merges them exactly
        s_h2, r_h2 = unpack(buf_h2, occ2[0])
        s_t2, r_t2 = unpack(buf_t2, occ2[1])
        sig_h = sig_h + s_h2
        sig_t = sig_t + s_t2
        rgb_h = tuple(a + b for a, b in zip(rgb_h, r_h2))
        rgb_t = tuple(a + b for a, b in zip(rgb_t, r_t2))

    # bg-epilogue-mode dists: tail 0 (the catch-all sample is external)
    diffs = jnp.concatenate(
        [z_vals[1:] - z_vals[:-1], jnp.zeros((1,), z_vals.dtype)]
    )

    def dists_for(rd):
        return diffs[:, None] * jnp.linalg.norm(
            rd.astype(jnp.float32), axis=-1
        )[None, :]

    d_h = dists_for(rays_d)  # [S, n]
    d_t = dists_for(rays_d_t)

    def march(alpha, colors):
        # transmittance scan along the leading sample axis; returns the
        # accumulated color [n, 3], final transmittance [n, 1], the
        # per-slab-start transmittances [J, n], and the per-sample
        # compositing weights [S, n]
        t = jnp.cumprod(1.0 - alpha + 1e-10, axis=0)
        t_prev = jnp.concatenate([jnp.ones((1, n)), t[:-1]], axis=0)
        w = alpha * t_prev
        acc = jnp.stack([(w * c).sum(axis=0) for c in colors], axis=-1)
        return acc, t[-1:].T, t_prev[0:S:sp], w

    alpha_h = 1.0 - jnp.exp(-(sig_h + 1e-6) * d_h)
    acc_head, tl_h, starts_h, w_h = march(alpha_h, rgb_h)

    ssum = sig_h + sig_t
    denom = jnp.where(ssum == 0.0, 1e-4, ssum)
    c_mix = tuple(
        (sig_h * ch + sig_t * ct) / denom
        for ch, ct in zip(rgb_h, rgb_t)
    )
    alpha_c = 1.0 - jnp.exp(-(ssum + 1e-6) * d_t)
    acc_com, tl_c, starts_c, w_c = march(alpha_c, c_mix)

    if with_keys:
        # occ_live_keys fast-path mode: the frame's own per-(tile, slab)
        # per-field prune keys, [T, J] each — tile-max slab-start
        # transmittances (the trans prune's input) and the tile-max
        # first-order color-error estimate of dropping the pair (the
        # budget prune's input; same math as the with_ray_diag color
        # branch below, reduced over rays in place — a handful of
        # HBM-bound [S, n] reductions, ~1% of the frame). Falls back to
        # raw mass keys when ray_err_bc is None (mass-budget mode).
        frac_h_k = sig_h / denom

        def slab_sum(x):  # [S, n] -> [J, T, R_T]
            return x.reshape(J, sp, T, R_T).sum(axis=1)

        def tile_max(x):  # [J, T, R_T] -> [T, J]
            return x.max(axis=2).T

        m_hs = slab_sum(w_h)
        m_ch = slab_sum(w_c * frac_h_k)
        m_ct = slab_sum(w_c * (1.0 - frac_h_k))
        if ray_err_bc is None:
            e_h, e_t = m_hs + m_ch, m_ct
        else:
            bc_r = ray_err_bc.astype(jnp.float32).T.reshape(3, T, R_T)
            tlh = tl_h[:, 0].reshape(T, R_T)
            tlc = tl_c[:, 0].reshape(T, R_T)

            def behind(slab_x, tail):
                rev = jnp.cumsum(slab_x[::-1], axis=0)[::-1]
                return jnp.concatenate(
                    [rev[1:], jnp.zeros_like(rev[:1])]) + tail

            bm_h = behind(m_hs, tlh)
            bm_c = behind(m_ch + m_ct, tlc)
            e_h = jnp.zeros_like(m_hs)
            e_t = jnp.zeros_like(m_ct)
            for c in range(3):
                col_hs = slab_sum(w_h * rgb_h[c])
                col_ch = slab_sum(w_c * frac_h_k * rgb_h[c])
                col_ct = slab_sum(w_c * (1.0 - frac_h_k) * rgb_t[c])
                cb_h = behind(col_hs, tlh * bc_r[c]) / jnp.maximum(
                    bm_h, 1e-8)
                cb_c = behind(col_ch + col_ct, tlc * bc_r[c]) / jnp.maximum(
                    bm_c, 1e-8)
                e_h = jnp.maximum(e_h, jnp.abs(col_hs - m_hs * cb_h))
                e_h = jnp.maximum(e_h, jnp.abs(col_ch - m_ch * cb_c))
                e_t = jnp.maximum(e_t, jnp.abs(col_ct - m_ct * cb_c))
        keys = (tile_max(starts_h.reshape(J, T, R_T)),
                tile_max(starts_c.reshape(J, T, R_T)),
                tile_max(e_h), tile_max(e_t))
        return acc_head, acc_com, tl_h, tl_c, keys

    if not with_diagnostics:
        return acc_head, acc_com, tl_h, tl_c

    # per-(tile, slab) transmittance maxima at slab starts: the caller's
    # refresh MAY use them to prune pairs behind saturated opacity (on
    # scenes whose tiles fully saturate; silhouette tiles always carry a
    # T=1 background ray, so this is scene-dependent)
    def tile_trans(starts):  # [J, n]
        return starts.reshape(J, T, R_T).max(axis=2).T

    def tile_contrib(w):  # [S, n] -> [T, J]: max-ray summed slab weight
        return w.reshape(J, sp, T, R_T).sum(axis=1).max(axis=2).T

    frac_h = sig_h / denom
    mass_h = w_h + w_c * frac_h
    mass_t = w_c * (1.0 - frac_h)
    contrib_h = tile_contrib(mass_h)
    contrib_t = tile_contrib(mass_t)

    out = (acc_head, acc_com, tl_h, tl_c,
           tile_trans(starts_h), tile_trans(starts_c),
           contrib_h, contrib_t)
    if with_ray_diag:
        # per-RAY slab mass [J, T, R_T] per field — the budgeted prune's
        # input (see RenderConfig.occ_prune_budget): unlike the max-ray
        # contrib reduction above, this keeps enough resolution for the
        # refresh to account for masses of MULTIPLE dropped slabs
        # accumulating on one ray
        def ray_mass(m):  # [S, n] -> [J, T, R_T]
            return m.reshape(J, sp, T, R_T).sum(axis=1)

        if ray_err_bc is None:
            out = out + (ray_mass(mass_h), ray_mass(mass_t))
            return out

        # COLOR-aware budget keys (RenderConfig.occ_budget_color):
        # first-order pixel-error estimate of dropping each (tile, slab)
        # pair on each ray. Dropping a pair removes its color-weighted
        # mass and renormalizes the remaining transmittance onto what lies
        # BEHIND it (later samples + the bg catch-all), so the realized
        # change is ~ |sum w c  -  (sum w) * c_behind| per channel — far
        # below the raw mass wherever the pair's color matches its
        # replacement (torso interiors, dark regions). c_behind is exact
        # at first order: a reverse cumulative sum over slabs plus the
        # final-transmittance bg term. ray_err_bc [n, 3] = the bg pixel.
        bc = ray_err_bc.astype(jnp.float32)  # [n, 3]
        bc_r = bc.T.reshape(3, T, R_T)

        def slab_sum(x):  # [S, n] -> [J, T, R_T]
            return x.reshape(J, sp, T, R_T).sum(axis=1)

        def behind(slab_x, tail):  # [J,T,R] -> sum over slabs j' > j + tail
            rev = jnp.cumsum(slab_x[::-1], axis=0)[::-1]
            return jnp.concatenate([rev[1:], jnp.zeros_like(rev[:1])]) + tail

        frac_t = 1.0 - frac_h
        m_hs = slab_sum(w_h)                  # head-stack mass of head pairs
        m_ch = slab_sum(w_c * frac_h)         # com-stack mass, head share
        m_ct = slab_sum(w_c * frac_t)         # com-stack mass, torso share
        tlh = tl_h[:, 0].reshape(T, R_T)
        tlc = tl_c[:, 0].reshape(T, R_T)
        bm_h = behind(m_hs, tlh)              # replacement mass behind pair
        bm_c = behind(m_ch + m_ct, tlc)
        e_h = jnp.zeros_like(m_hs)
        e_t = jnp.zeros_like(m_ct)
        for c in range(3):
            col_hs = slab_sum(w_h * rgb_h[c])
            col_ch = slab_sum(w_c * frac_h * rgb_h[c])
            col_ct = slab_sum(w_c * frac_t * rgb_t[c])
            cb_h = behind(col_hs, tlh * bc_r[c]) / jnp.maximum(bm_h, 1e-8)
            cb_c = behind(col_ch + col_ct,
                          tlc * bc_r[c]) / jnp.maximum(bm_c, 1e-8)
            e_h = jnp.maximum(e_h, jnp.abs(col_hs - m_hs * cb_h))
            e_h = jnp.maximum(e_h, jnp.abs(col_ch - m_ch * cb_c))
            e_t = jnp.maximum(e_t, jnp.abs(col_ct - m_ct * cb_c))
        out = out + (e_h, e_t)
    return out


# ---------------------------------------------------------------------------
# Head-only kernel with PER-RAY z values — the fused fine pass of the
# hierarchical (--N_importance) path. Same trunk/encode/compositing as the
# head stack of the two-field kernel, but z arrives as a per-(tile, slab)
# [S_SLAB, R_T] block (importance-resampled depths differ per ray).
# ---------------------------------------------------------------------------


def _head_kernel(
    occ_ref, dists_ref, z_ref,
    o_ref, d_ref, vr_ref, aux_ref,
    freq_ref, phase_ref,
    hw_in, hb_in, hw_blocks, hb_blocks, hw_skip, hb_skip, hw_sf, hb_sf,
    hw_out, hb_out,
    out_ref,
    t_acc, acc,
    *, n_slabs: int, ert_eps: float, act: str = "relu",
):
    t = pl.program_id(0)
    j = pl.program_id(1)
    rows = S_SLAB * R_T
    is_last = j == n_slabs - 1

    @pl.when(j == 0)
    def _init():
        t_acc[:] = jnp.ones_like(t_acc)
        acc[:] = jnp.zeros_like(acc)

    def trunk(pe_bf):
        h = jnp.maximum(_mm(pe_bf, hw_in[:]) + hb_in[:], 0.0).astype(jnp.bfloat16)
        for i in range(7):
            h = jnp.maximum(_mm(h, hw_blocks[i]) + hb_blocks[i], 0.0)
            if i == 3:
                h = h + _mm(pe_bf, hw_skip[:]) + hb_skip[:]
            h = h.astype(jnp.bfloat16)
        return _mm(h, hw_sf[:]) + hb_sf[:]

    alive = (jnp.max(t_acc[:]) > ert_eps) & (occ_ref[t, j] != 0) | is_last

    @pl.when(alive)
    def _slab_body():
        o = o_ref[:]
        d = d_ref[:]
        freq = freq_ref[:]
        ph = phase_ref[:]
        encs = []
        for s in range(S_SLAB):
            z_s = z_ref[0, s, :][:, None]  # per-ray depth
            encs.append(jnp.sin((o + d * z_s) * freq + ph))
        pe = jnp.concatenate(encs, axis=0).astype(jnp.bfloat16)
        sf = trunk(pe)
        vr = jnp.broadcast_to(vr_ref[:][None], (S_SLAB, R_T, 256)).reshape(rows, 256)
        net = jnp.maximum(sf[:, 128:384] + vr.astype(jnp.float32), 0.0)
        rgb = jax.nn.sigmoid(_mm(net.astype(jnp.bfloat16), hw_out[:]) + hb_out[:])
        sigma = density_act(sf[:, 0:1], act)

        bc = aux_ref[:].astype(jnp.float32)
        tc = t_acc[:]
        ac = acc[:]
        for s in range(S_SLAB):
            sel = slice(s * R_T, (s + 1) * R_T)
            sh = sigma[sel]
            ch = rgb[sel]
            d_s = dists_ref[0, s, :][:, None]
            lastf = (is_last & (s == S_SLAB - 1)).astype(jnp.float32)
            # bg-concat on the union's final sample
            ch = ch * (1.0 - lastf) + bc * lastf
            sh = sh + 1e-6 * lastf
            alpha = 1.0 - jnp.exp(-(sh + 1e-6) * d_s)
            ac = ac + (alpha * tc) * ch
            tc = tc * (1.0 - alpha + 1e-10)
        t_acc[:] = tc
        acc[:] = ac

    @pl.when(is_last)
    def _write():
        out_ref[:] = acc[:]


def fused_render_head(
    packed_h: Dict[str, jnp.ndarray],
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_vals: jnp.ndarray,
    bc_rgb: jnp.ndarray,
    last_dist: float = 1e10,
    interpret: bool = None,
    ert_eps: float = 0.0,
    occupancy: "jnp.ndarray" = None,
    act: str = "relu",
) -> jnp.ndarray:
    """Head-field render with PER-RAY depths through the fused kernel.

    z_vals: [n, S] per-ray sorted depths (the hierarchical union) or [S]
    shared (broadcast). Returns rgb [n, 3]. Semantics = the head stack of
    fused_render_rays (bg-concat at the final sample; +1e-6 bumps;
    run_nerf_helpers sample handling) — the fine pass of BASELINE config 2.
    """
    n = rays_o.shape[0]
    if z_vals.ndim == 1:
        z_vals = jnp.broadcast_to(z_vals[None], (n, z_vals.shape[0]))
    S = z_vals.shape[1]
    assert S % S_SLAB == 0, f"n_samples={S} must be a multiple of {S_SLAB}"
    n_slabs = S // S_SLAB
    n_tiles = -(-n // R_T)
    n_pad = n_tiles * R_T

    def padded(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((n_pad - n,) + x.shape[1:], fill, x.dtype)], axis=0
        )

    rays_o, rays_d = padded(rays_o), padded(rays_d)
    bc_rgb = padded(bc_rgb)
    z_vals = padded(z_vals, fill=1.0)

    coord_idx = jnp.arange(PE_PAD) % 3
    slot_valid = (jnp.arange(PE_PAD) < 60).astype(jnp.float32)

    def replicate(r):
        return (r[:, coord_idx] * slot_valid).astype(jnp.float32)

    o_r, d_r = replicate(rays_o), replicate(rays_d)
    freqs = (jnp.pi * (2.0 ** (jnp.arange(PE_PAD) // 6)) / 2.0) * slot_valid
    phase = jnp.where((jnp.arange(PE_PAD) % 6) >= 3, jnp.pi / 2.0, 0.0) * slot_valid

    # per-ray z and dists, slab-blocked [n_slabs, S_SLAB, n_pad]
    z_blocks = z_vals.astype(jnp.float32).reshape(n_pad, n_slabs, S_SLAB)
    z_blocks = z_blocks.transpose(1, 2, 0)
    diffs = jnp.concatenate(
        [z_vals[:, 1:] - z_vals[:, :-1],
         jnp.full((n_pad, 1), last_dist, z_vals.dtype)], axis=1
    )
    dists = (
        diffs * jnp.linalg.norm(rays_d.astype(jnp.float32), axis=-1,
                                keepdims=True)
    ).reshape(n_pad, n_slabs, S_SLAB).transpose(1, 2, 0)

    vr = view_bias(packed_h, rays_d).astype(jnp.bfloat16)
    aux = jnp.zeros((n_pad, 128), jnp.float32).at[:, 0:3].set(bc_rgb)

    def slab_spec():
        return pl.BlockSpec(
            (1, S_SLAB, R_T), lambda t, j, *_: (j, 0, t),
            memory_space=pltpu.VMEM,
        )

    def tile_spec(lane):
        return pl.BlockSpec(
            (R_T, lane), lambda t, j, *_: (t, 0), memory_space=pltpu.VMEM
        )

    const_spec = pl.BlockSpec(
        (1, PE_PAD), lambda t, j, *_: (0, 0), memory_space=pltpu.VMEM
    )
    hw = packed_h
    weight_ops = [
        hw["w_in"], hw["b_in"][None], hw["w_blocks"], hw["b_blocks"],
        hw["w_skip"], hw["b_skip"][None], hw["w_sf"], hw["b_sf"][None],
        hw["w_out"], hw["b_out"][None],
    ]
    weight_specs = [_full(op.shape) for op in weight_ops]
    if occupancy is None:
        occupancy = jnp.ones((n_tiles, n_slabs), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles, n_slabs),
        in_specs=[
            slab_spec(),        # dists
            slab_spec(),        # z (per-ray)
            tile_spec(PE_PAD),  # o
            tile_spec(PE_PAD),  # d
            tile_spec(256),     # vr
            tile_spec(128),     # aux
            const_spec,         # freq
            const_spec,         # phase
        ] + weight_specs,
        out_specs=pl.BlockSpec(
            (R_T, 128), lambda t, j, *_: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((R_T, 1), jnp.float32),    # transmittance
            pltpu.VMEM((R_T, 128), jnp.float32),  # accumulator
        ],
    )
    out = pl.pallas_call(
        functools.partial(_head_kernel, n_slabs=n_slabs, ert_eps=ert_eps,
                          act=act),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
        interpret=_interp(interpret),
    )(occupancy.astype(jnp.int32), dists, z_blocks,
      o_r, d_r, vr, aux, freqs[None].astype(jnp.float32),
      phase[None].astype(jnp.float32), *weight_ops)
    return out[:n, 0:3]


# ---------------------------------------------------------------------------
# Pair-compacted hierarchical path (BASELINE config 2 serving). The
# (T, J)-grid hierarchical kernels above predicate skipped slabs with
# pl.when, which still pays a grid step per (tile, slab) — at 450p that is
# ~20k steps/frame for the fine pass, most of them background. These pair
# variants run a grid of EXACTLY the occupied pairs (scalar-prefetched
# lists, like pair_field_eval) and defer compositing to XLA:
#   - pair_sigma_eval: sigma-only trunk on shared z (the coarse pass; a
#     skipped pair reads as sigma = 0, which is EXACT for the importance
#     resample — zero weight);
#   - pair_field_eval_perz: the full field on PER-RAY depths delivered as
#     a [J, S_SLAB, NT] buffer indexed like the outputs (the fine pass on
#     the sorted coarse+fine union);
#   - deferred_composite_head: head-only composite with per-ray dists.
#     With last_dist >= 1e8 the catch-all alpha is EXACTLY 1.0 in f32
#     (exp(-2e-6 * 1e10) underflows), so head = acc + t_final * bc needs
#     NO field value at the far sample — the (T, J) kernel's forced
#     last-slab evaluation was pure waste for background tiles.
# ---------------------------------------------------------------------------


def _pair_sigma_kernel(
    t_idx, j_idx, z_ref, o_ref, d_ref, freq_ref, phase_ref,
    w_in, b_in, w_blocks, b_blocks, w_skip, b_skip, w_sf, b_sf,
    sig_out, *, act: str = "relu", per_ray_z: bool = False,
):
    o = o_ref[:]
    d = d_ref[:]
    freq = freq_ref[:]
    ph = phase_ref[:]
    encs = []
    for s in range(S_SLAB):
        z_s = z_ref[0, s, :][:, None] if per_ray_z else z_ref[0, 0, s]
        encs.append(jnp.sin((o + d * z_s) * freq + ph))
    pe = jnp.concatenate(encs, axis=0).astype(jnp.bfloat16)
    h = jnp.maximum(_mm(pe, w_in[:]) + b_in[:], 0.0).astype(jnp.bfloat16)
    for i in range(7):
        h = jnp.maximum(_mm(h, w_blocks[i]) + b_blocks[i], 0.0)
        if i == 3:
            h = h + _mm(pe, w_skip[:]) + b_skip[:]
        h = h.astype(jnp.bfloat16)
    sigma = density_act((_mm(h, w_sf[:]) + b_sf[:])[:, 0:1], act)
    sig_out[0] = sigma[:, 0].reshape(S_SLAB, R_T)


def pair_sigma_eval(
    pw: Dict[str, jnp.ndarray],
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_vals: jnp.ndarray,
    t_idx: jnp.ndarray,
    j_idx: jnp.ndarray,
    interpret: bool = None,
    act: str = "relu",
) -> jnp.ndarray:
    """Sigma-only pair-compacted head forward (hierarchical coarse pass).

    rays [n, 3] in tile order (n % R_T == 0), z_vals [S] shared. Returns
    a dense [n_slabs, S_SLAB, (n_tiles+1)*R_T] fp32 sigma buffer; only
    listed pairs' blocks are written — callers MUST mask reads with the
    flags that built the list."""
    n = rays_o.shape[0]
    S = z_vals.shape[0]
    assert S % S_SLAB == 0 and n % R_T == 0
    n_slabs = S // S_SLAB
    n_tiles = n // R_T
    if t_idx.shape[0] == 0:
        return jnp.zeros((n_slabs, S_SLAB, (n_tiles + 1) * R_T),
                         jnp.float32)
    o_r = jnp.concatenate(
        [pe_replicate(rays_o), jnp.zeros((R_T, PE_PAD), jnp.float32)])
    d_r = jnp.concatenate(
        [pe_replicate(rays_d), jnp.zeros((R_T, PE_PAD), jnp.float32)])
    freqs, phase = pe_freq_phase()
    z_rows = jnp.zeros((n_slabs, 8, 128), jnp.float32).at[:, 0, :S_SLAB].set(
        z_vals.astype(jnp.float32).reshape(n_slabs, S_SLAB)
    )
    weight_ops = [
        pw["w_in"], pw["b_in"][None], pw["w_blocks"], pw["b_blocks"],
        pw["w_skip"], pw["b_skip"][None], pw["w_sf"], pw["b_sf"][None],
    ]
    weight_specs = [_full(op.shape) for op in weight_ops]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_idx.shape[0],),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda k, ti, ji: (ji[k], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, PE_PAD), lambda k, ti, ji: (ti[k], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, PE_PAD), lambda k, ti, ji: (ti[k], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PE_PAD), lambda k, ti, ji: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PE_PAD), lambda k, ti, ji: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + weight_specs,
        out_specs=pl.BlockSpec(
            (1, S_SLAB, R_T), lambda k, ti, ji: (ji[k], 0, ti[k]),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(_pair_sigma_kernel, act=act),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_slabs, S_SLAB, (n_tiles + 1) * R_T), jnp.float32),
        interpret=_interp(interpret),
    )(t_idx.astype(jnp.int32), j_idx.astype(jnp.int32), z_rows,
      o_r, d_r, freqs, phase, *weight_ops)


def _pair_field_perz_kernel(
    t_idx, j_idx, z_ref, o_ref, d_ref, vr_ref, freq_ref, phase_ref,
    w_in, b_in, w_blocks, b_blocks, w_skip, b_skip, w_sf, b_sf,
    w_out, b_out,
    sig_out, r_out, g_out, b_out_ref, *, act: str = "relu",
):
    rows = S_SLAB * R_T
    o = o_ref[:]
    d = d_ref[:]
    freq = freq_ref[:]
    ph = phase_ref[:]
    encs = []
    for s in range(S_SLAB):
        z_s = z_ref[0, s, :][:, None]  # per-ray depth
        encs.append(jnp.sin((o + d * z_s) * freq + ph))
    pe = jnp.concatenate(encs, axis=0).astype(jnp.bfloat16)
    h = jnp.maximum(_mm(pe, w_in[:]) + b_in[:], 0.0).astype(jnp.bfloat16)
    for i in range(7):
        h = jnp.maximum(_mm(h, w_blocks[i]) + b_blocks[i], 0.0)
        if i == 3:
            h = h + _mm(pe, w_skip[:]) + b_skip[:]
        h = h.astype(jnp.bfloat16)
    sf = _mm(h, w_sf[:]) + b_sf[:]
    sigma = density_act(sf[:, 0:1], act)
    vr = jnp.broadcast_to(
        vr_ref[:][None], (S_SLAB, R_T, 256)).reshape(rows, 256)
    net = jnp.maximum(sf[:, 128:384] + vr.astype(jnp.float32), 0.0)
    rgb = jax.nn.sigmoid(_mm(net.astype(jnp.bfloat16), w_out[:]) + b_out[:])
    sig_out[0] = sigma[:, 0].reshape(S_SLAB, R_T)
    r_out[0] = rgb[:, 0].reshape(S_SLAB, R_T).astype(jnp.bfloat16)
    g_out[0] = rgb[:, 1].reshape(S_SLAB, R_T).astype(jnp.bfloat16)
    b_out_ref[0] = rgb[:, 2].reshape(S_SLAB, R_T).astype(jnp.bfloat16)


def pair_field_eval_perz(
    pw: Dict[str, jnp.ndarray],
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    z_buf: jnp.ndarray,
    t_idx: jnp.ndarray,
    j_idx: jnp.ndarray,
    interpret: bool = None,
    act: str = "relu",
) -> Tuple[jnp.ndarray, ...]:
    """Head-field pair evaluation with PER-RAY depths (hierarchical fine
    pass). z_buf [n_slabs, S_SLAB, (n_tiles+1)*R_T] fp32 holds the sorted
    union depths in the same (slab, tile) blocking as the outputs.
    Returns the pair_field_eval 4-tuple of channel buffers."""
    n = rays_o.shape[0]
    assert n % R_T == 0
    n_slabs = z_buf.shape[0]
    n_tiles = n // R_T
    assert z_buf.shape == (n_slabs, S_SLAB, (n_tiles + 1) * R_T)
    if t_idx.shape[0] == 0:
        return tuple(
            jnp.zeros((n_slabs, S_SLAB, (n_tiles + 1) * R_T),
                      jnp.float32 if c == 0 else jnp.bfloat16)
            for c in range(4)
        )
    o_r = jnp.concatenate(
        [pe_replicate(rays_o), jnp.zeros((R_T, PE_PAD), jnp.float32)])
    d_r = jnp.concatenate(
        [pe_replicate(rays_d), jnp.zeros((R_T, PE_PAD), jnp.float32)])
    vr = view_bias(pw, rays_d).astype(jnp.bfloat16)
    vr = jnp.concatenate([vr, jnp.zeros((R_T, 256), vr.dtype)])
    freqs, phase = pe_freq_phase()
    weight_ops = [
        pw["w_in"], pw["b_in"][None], pw["w_blocks"], pw["b_blocks"],
        pw["w_skip"], pw["b_skip"][None], pw["w_sf"], pw["b_sf"][None],
        pw["w_out"], pw["b_out"][None],
    ]
    weight_specs = [_full(op.shape) for op in weight_ops]
    pair_spec = pl.BlockSpec(
        (1, S_SLAB, R_T), lambda k, ti, ji: (ji[k], 0, ti[k]),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_idx.shape[0],),
        in_specs=[
            pair_spec,  # per-ray z
            pl.BlockSpec((R_T, PE_PAD), lambda k, ti, ji: (ti[k], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, PE_PAD), lambda k, ti, ji: (ti[k], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R_T, 256), lambda k, ti, ji: (ti[k], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PE_PAD), lambda k, ti, ji: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PE_PAD), lambda k, ti, ji: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + weight_specs,
        out_specs=tuple(
            pl.BlockSpec(
                (1, S_SLAB, R_T), lambda k, ti, ji: (ji[k], 0, ti[k]),
                memory_space=pltpu.VMEM,
            ) for _ in range(4)
        ),
    )
    return pl.pallas_call(
        functools.partial(_pair_field_perz_kernel, act=act),
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct(
                (n_slabs, S_SLAB, (n_tiles + 1) * R_T),
                jnp.float32 if c == 0 else jnp.bfloat16,
            ) for c in range(4)
        ),
        interpret=_interp(interpret),
    )(t_idx.astype(jnp.int32), j_idx.astype(jnp.int32), z_buf,
      o_r, d_r, vr, freqs, phase, *weight_ops)


def deferred_composite_head(
    buf: Tuple[jnp.ndarray, ...],
    occ: jnp.ndarray,
    dists: jnp.ndarray,
    bc_rgb: jnp.ndarray,
) -> jnp.ndarray:
    """Head-only composite of a pair buffer with PER-RAY dists [S, n]
    (tail dist 0), closed by the exact background catch-all: with
    last_dist >= 1e8 the catch-all alpha saturates to exactly 1.0 in f32,
    so head = acc + t_final * bc with no far-plane field value needed
    (run_nerf_com_trainExpLater.py:863-886 head-stack last-sample math).

    buf: pair_field_eval 4-tuple [J, S_SLAB, NT]; occ [T, J] the flags
    that built the pair list; bc_rgb [n, 3]."""
    J = buf[0].shape[0]
    NT = buf[0].shape[2]
    S, n = dists.shape
    T = n // R_T
    assert S == J * S_SLAB

    flag = occ.astype(bool).T[:, None, :, None]

    def chan(b):
        x = b.reshape(J, S_SLAB, NT // R_T, R_T)[:, :, :T]
        x = jnp.where(flag, x.astype(jnp.float32), 0.0)
        return x.reshape(S, n)

    sigma = chan(buf[0])
    rgbs = tuple(chan(b) for b in buf[1:])
    alpha = 1.0 - jnp.exp(-(sigma + 1e-6) * dists)
    t = jnp.cumprod(1.0 - alpha + 1e-10, axis=0)
    t_prev = jnp.concatenate([jnp.ones((1, n)), t[:-1]], axis=0)
    w = alpha * t_prev
    acc = jnp.stack([(w * c).sum(axis=0) for c in rgbs], axis=-1)
    return acc + t[-1:, :].T * bc_rgb.astype(jnp.float32)
