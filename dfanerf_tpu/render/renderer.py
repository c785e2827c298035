"""Full-frame renderer: HBM-resident tiled rendering.

The reference renders a frame as ~99 Python-loop chunks of 2048 rays with a
host round-trip per chunk (run_nerf_com_trainExpLater.py:653-659). Here the
whole frame is one jitted program: rays are reshaped into fixed-size tiles
and swept with ``lax.map`` — sequential on-device execution, zero host
involvement, one compilation. (The fused Pallas kernel in ops/ replaces the
per-tile body for the speed-of-light path.)
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dfanerf_tpu.config import ExperimentConfig
from dfanerf_tpu.core.rays import get_rays
from dfanerf_tpu.core.sampling import stratified_z_vals
from dfanerf_tpu.render.fields import render_ray_batch
from dfanerf_tpu.train.signals import encode_signal, encode_signal_torso


def budget_drop_masks(wr_h: np.ndarray, wr_t: np.ndarray,
                      cand: np.ndarray, budget: float,
                      base: np.ndarray = None) -> np.ndarray:
    """Greedy budgeted pair-drop decision (RenderConfig.occ_prune_budget).

    wr_h/wr_t [J, K, R] — per-ray drop cost of each field's (tile, slab)
    pair on each of the tile's rays: raw compositing mass, or the
    first-order color-error estimate under occ_budget_color (both from
    deferred_composite with_ray_diag); cand [2, K, J] bool — pairs
    eligible to drop. Per tile, candidates from BOTH fields are dropped
    in ascending order of max-ray cost while the ACCUMULATED dropped cost
    on every ray stays <= budget (the greedy prefix over sorted
    candidates — feasibility is monotone in the prefix since costs are
    nonnegative). Returns drop [2, K, J] bool, always a subset of cand.
    Pure host-side numpy: K tiles x 2J candidates, vectorized over
    tiles."""
    J = wr_h.shape[0]
    # [K, R, 2J]: both fields in one per-ray ledger
    W = np.concatenate([wr_h.transpose(1, 2, 0),
                        wr_t.transpose(1, 2, 0)], axis=2)
    c = cand.transpose(1, 0, 2).reshape(W.shape[0], 2 * J)
    key = np.where(c, W.max(axis=1), np.inf)  # non-candidates sort last
    Wm = np.where(c[:, None, :], W, 0.0)
    order = np.argsort(key, axis=1)
    Ws = np.take_along_axis(Wm, order[:, None, :], axis=2)
    feas = np.take_along_axis(key, order, axis=1) < np.inf
    cum = Ws.cumsum(axis=2)
    if base is not None:
        # iterative refinement (occ_budget_iters): seed each ray's ledger
        # with the REALIZED error of the previous drop round, so this
        # round's first-order keys extend a measured baseline instead of
        # compounding estimates
        cum = cum + base[:, :, None]
    ok = (cum.max(axis=1) <= budget) & feas
    drop_sorted = np.cumprod(ok, axis=1).astype(bool)
    drop = np.zeros_like(ok)
    np.put_along_axis(drop, order, drop_sorted, axis=1)
    return drop.reshape(-1, 2, J).transpose(1, 0, 2)


def make_frame_renderer(cfg: ExperimentConfig, hwfcxy, near: float, far: float):
    """Build a jitted full-frame renderer.

    Returns render_frame(params, z_shape, z_app, pose, pose_torso, signal,
    signal_torso, bc_img_u8) -> (rgb_head [H,W,3], rgb_com [H,W,3]) floats.
    """
    H, W, focal, cx, cy = hwfcxy
    H, W = int(H), int(W)
    rcfg, dcfg = cfg.render, cfg.decoder
    tile = min(rcfg.tile_rays, H * W)
    n_pix = H * W
    n_tiles = -(-n_pix // tile)
    n_pad = n_tiles * tile - n_pix

    if rcfg.use_fused_kernel:
        from dfanerf_tpu.ops.fused_render import (
            R_T,
            _bg_epilogue,
            conservative_occupancy,
            fused_render_rays,
            spatial_tile_permutation,
        )
        from dfanerf_tpu.ops.pack import pack_field_weights

        assert rcfg.concate_bg and rcfg.n_samples % 8 == 0
        # spatially-coherent tiles: one 16x16 pixel block per kernel tile so
        # slab skipping (ERT / occupancy) sees solid regions, not scanlines
        act = cfg.decoder.density_activation
        use_tiles = rcfg.spatial_tiles or rcfg.occ_sigma_thresh > 0
        perm = spatial_tile_permutation(H, W) if use_tiles else None
        z_vals_c = jnp.linspace(near, far, rcfg.n_samples)
        # 16x16 block grid of the spatial permutation: the perm is block-
        # structured (edge-clamped), so tiling and untiling are pure
        # pad+reshape+transpose — a per-ROW gather/scatter with the flat
        # perm indices pays ~100x write amplification on TPU (each 3-lane
        # row touches a full (8,128) tile); measured 5+ ms per frame
        hb, wb = -(-H // 16), -(-W // 16)

        def tile_order(img):
            """[H, W, C] -> [T*R_T, C] in spatial-tile order (equals
            x.reshape(-1, C)[perm]; edge pad = the perm's index clamp)."""
            v = jnp.pad(img, ((0, hb * 16 - H), (0, wb * 16 - W), (0, 0)),
                        mode="edge")
            return v.reshape(hb, 16, wb, 16, -1).transpose(
                0, 2, 1, 3, 4).reshape(hb * wb * 256, -1)

        if perm is not None:
            # camera-space dirs for the tiled (edge-clamped) pixel grid,
            # built once: per-frame ray generation is then one [n, 3] x
            # [3, 3] rotation with no transposes (get_rays + tile_order
            # was ~2 ms/frame of pure layout churn). Same pixel math as
            # core.rays.get_rays (run_nerf_helpers.py:451 grid).
            import numpy as _np
            _cx = W * 0.5 if cx is None else cx
            _cy = H * 0.5 if cy is None else cy
            _iy = _np.minimum(_np.arange(hb * 16), H - 1)
            _ix = _np.minimum(_np.arange(wb * 16), W - 1)
            _ii, _jj = _np.meshgrid(_ix, _iy, indexing="xy")
            _dirs = _np.stack(
                [(_ii - _cx) / focal, -(_jj - _cy) / focal,
                 -_np.ones_like(_ii, _np.float32)], axis=-1
            ).astype(_np.float32)
            dirs_tiled = jnp.asarray(
                _dirs.reshape(hb, 16, wb, 16, 3).transpose(
                    0, 2, 1, 3, 4).reshape(hb * wb * 256, 3))

            def tiled_rays(pose):
                # elementwise rotation: the [n,3]x[3,3] einsum lowers to a
                # lane-padded matmul costing ~3.5 ms/frame at 450p; three
                # broadcast mul-adds are pure VPU (fp32 exact, fixed order)
                R = pose[:3, :3]
                rd = (dirs_tiled[:, 0:1] * R[:, 0][None]
                      + dirs_tiled[:, 1:2] * R[:, 1][None]
                      + dirs_tiled[:, 2:3] * R[:, 2][None])
                return jnp.broadcast_to(pose[:3, -1], rd.shape), rd

        # kernel weight dtype follows compute_dtype (bf16 on TPU; f32 for
        # the CPU interpret-mode tests — CPU dots reject bf16 x bf16)
        pdt = (jnp.bfloat16 if rcfg.compute_dtype == "bfloat16"
               else jnp.float32)

        def frame_inputs(params, z_shape, z_app, pose, pose_torso,
                         signal, signal_torso, bc_img):
            bc = bc_img.astype(jnp.float32) / 255.0
            if perm is not None:
                ro, rd = tiled_rays(pose)
                ro_t, rd_t = tiled_rays(pose_torso)
                bc_p = tile_order(bc)
            else:
                rays_o, rays_d = get_rays(H, W, focal, pose, cx, cy)
                rays_o_t, rays_d_t = get_rays(H, W, focal, pose_torso,
                                              cx, cy)
                ro = rays_o.reshape(-1, 3)
                rd = rays_d.reshape(-1, 3)
                ro_t = rays_o_t.reshape(-1, 3)
                rd_t = rays_d_t.reshape(-1, 3)
                bc_p = bc.reshape(-1, 3)
            pw_h = pack_field_weights(
                params["decoder"], dcfg, signal, z_shape[0], z_app[0],
                "head", param_dtype=pdt,
            )
            pw_t = pack_field_weights(
                params["decoder"], dcfg, signal_torso, z_shape[1], z_app[1],
                "torso", param_dtype=pdt,
            )
            return pw_h, pw_t, ro, rd, ro_t, rd_t, bc_p

        def unpermute(rgb_head_p, rgb_com_p):
            if perm is not None:
                def inv(v):
                    return v.reshape(hb, wb, 16, 16, 3).transpose(
                        0, 2, 1, 3, 4).reshape(hb * 16, wb * 16, 3)[:H, :W]

                return inv(rgb_head_p), inv(rgb_com_p)
            return (rgb_head_p.reshape(H, W, 3),
                    rgb_com_p.reshape(H, W, 3))

        if rcfg.occ_sigma_thresh <= 0:
            @jax.jit
            def render_frame_fused(params, z_shape, z_app, pose, pose_torso,
                                   signal, signal_torso, bc_img):
                pw_h, pw_t, ro, rd, ro_t, rd_t, bc_p = frame_inputs(
                    params, z_shape, z_app, pose, pose_torso, signal,
                    signal_torso, bc_img,
                )
                rgb_head_p, rgb_com_p = fused_render_rays(
                    pw_h, pw_t, ro, rd, ro_t, rd_t, z_vals_c, bc_p,
                    last_dist=rcfg.last_dist, ert_eps=rcfg.ert_eps, act=act,
                )
                return unpermute(rgb_head_p, rgb_com_p)

            return render_frame_fused

        if rcfg.occ_pair_compaction:
            return _make_pair_compaction_renderer(
                cfg, rcfg, perm, z_vals_c, frame_inputs, unpermute,
                tiled_rays, tile_order)

        if not rcfg.occ_tile_compaction:
            # occupancy serving path (flags refreshed every
            # occ_refresh_every frames; the bg catch-all runs as a per-ray
            # epilogue so the final slab is not forced)
            @jax.jit
            def occ_inputs_fn(params, z_shape, z_app, pose, pose_torso,
                              signal, signal_torso, bc_img):
                return frame_inputs(params, z_shape, z_app, pose, pose_torso,
                                    signal, signal_torso, bc_img)

            @jax.jit
            def occ_flags_fn(inputs):
                pw_h, pw_t, ro, rd, ro_t, rd_t, bc_p = inputs
                return conservative_occupancy(
                    pw_h, pw_t, ro, rd, ro_t, rd_t, z_vals_c,
                    rcfg.occ_sigma_thresh, grid_res=rcfg.occ_grid_res,
                    act=act,
                )

            @jax.jit
            def occ_render_fn(inputs, occ):
                pw_h, pw_t, ro, rd, ro_t, rd_t, bc_p = inputs
                rgb_head_p, rgb_com_p = fused_render_rays(
                    pw_h, pw_t, ro, rd, ro_t, rd_t, z_vals_c, bc_p,
                    last_dist=rcfg.last_dist, ert_eps=rcfg.ert_eps,
                    occupancy=occ, bg_epilogue=True, act=act,
                )
                return unpermute(rgb_head_p, rgb_com_p)

            cache = {"occ": None, "age": 0}

            def render_frame_occ_plain(params, z_shape, z_app, pose,
                                       pose_torso, signal, signal_torso,
                                       bc_img):
                inputs = occ_inputs_fn(params, z_shape, z_app, pose,
                                       pose_torso, signal, signal_torso,
                                       bc_img)
                if (cache["occ"] is None
                        or cache["age"] >= max(rcfg.occ_refresh_every, 1)):
                    cache["occ"] = occ_flags_fn(inputs)
                    cache["age"] = 0
                cache["age"] += 1
                return occ_render_fn(inputs, cache["occ"])

            return render_frame_occ_plain

        # --- occupancy serving path: per-field tile classes ---------------
        # The per-field flags partition the frame's tiles into four classes:
        #   both   — head AND torso occupied somewhere: two-field kernel
        #   head   — only the head field occupied: head-only kernel variant
        #   torso  — only the torso field occupied: torso-only variant
        #   none   — background-only: just the per-ray bg epilogue
        # Head and torso occupy mostly DISJOINT screen regions (the head
        # sits above the torso), so the joint-flag formulation wastes ~2x
        # evaluating both fields wherever either is present; the class
        # split removes that while each kernel variant keeps exactly ONE
        # heavy Mosaic region (per-field pl.when regions measured 1.7x
        # slower — see ops/fused_render.py).
        #
        # The tile gather, each Pallas kernel, and the bg-epilogue +
        # scatter run as SEPARATE jit programs: composing a gather with
        # the kernel in one XLA program trips a TPU runtime kernel fault
        # on this toolchain even though the kernel alone is clean at every
        # grid size. Intermediates stay on device across the jit
        # boundaries, so the split costs only a few extra dispatches.
        #
        # Class sizes are data-dependent; the host sync (~27 KB of flags,
        # every occ_refresh_every frames) buckets each to a static K.
        # Segment padding borrows only tiles a variant handles correctly:
        # the both-segment can absorb any tile; head/torso segments absorb
        # none-tiles with all-zero flags (skipped entirely, grid overhead
        # only).
        T = len(perm) // R_T

        @jax.jit
        def inputs_fn(params, z_shape, z_app, pose, pose_torso,
                      signal, signal_torso, bc_img):
            return frame_inputs(params, z_shape, z_app, pose, pose_torso,
                                signal, signal_torso, bc_img)

        @jax.jit
        def occ_pf_fn(inputs):
            pw_h, pw_t, ro, rd, ro_t, rd_t, bc_p = inputs
            return conservative_occupancy(
                pw_h, pw_t, ro, rd, ro_t, rd_t, z_vals_c,
                rcfg.occ_sigma_thresh, grid_res=rcfg.occ_grid_res,
                act=act,
            )  # per-field [2, T, J]

        def _tiles(x, idx):
            return x.reshape(T, R_T, -1)[idx].reshape(-1, x.shape[-1])

        gather_cache = {}

        def make_gather(ks):
            @jax.jit
            def gather_k(inputs, order):
                pw_h, pw_t, ro, rd, ro_t, rd_t, bc_p = inputs
                segs, lo = [], 0
                for k in ks + (T - sum(ks),):
                    sel = jax.lax.dynamic_slice_in_dim(order, lo, k)
                    lo += k
                    segs.append([_tiles(x, sel)
                                 for x in (ro, rd, ro_t, rd_t, bc_p)])
                return segs

            return gather_k

        kernel_cache = {}

        def make_kernel(k, fields):
            @jax.jit
            def kernel_k(pw_h, pw_t, ro, rd, ro_t, rd_t, bc, occ_sel):
                return fused_render_rays(
                    pw_h, pw_t, ro, rd, ro_t, rd_t, z_vals_c, bc,
                    last_dist=rcfg.last_dist, ert_eps=rcfg.ert_eps,
                    occupancy=occ_sel, bg_epilogue=True, fields=fields,
                    act=act,
                )

            return kernel_k

        scatter_cache = {}

        def make_scatter(ks):
            n_rest = (T - sum(ks)) * R_T

            @jax.jit
            def scatter_k(pw_h, pw_t, rest, outs, order):
                ro, rd, ro_t, rd_t, bc = rest
                h_r, c_r = _bg_epilogue(
                    pw_h, pw_t, ro, rd, ro_t, rd_t, z_vals_c, bc,
                    rcfg.last_dist,
                    jnp.zeros((n_rest, 3)), jnp.zeros((n_rest, 3)),
                    jnp.ones((n_rest, 1)), jnp.ones((n_rest, 1)),
                    act=act,
                )
                hs = [h for h, _ in outs] + [h_r]
                cs = [c for _, c in outs] + [c_r]
                head = jnp.zeros((T, R_T, 3)).at[order].set(
                    jnp.concatenate(hs).reshape(T, R_T, 3)
                ).reshape(-1, 3)
                com = jnp.zeros((T, R_T, 3)).at[order].set(
                    jnp.concatenate(cs).reshape(T, R_T, 3)
                ).reshape(-1, 3)
                return unpermute(head, com)

            return scatter_k

        buckets = [k for k in (0, 64, 128, 256, 384, 512, 768) if k < T] + [T]

        def bucket(n):
            return next(k for k in buckets if k >= n)

        cache = {"order": None, "ks": None, "occs": None, "age": 0}
        import os as _os

        def refresh_flags(inputs):
            occ_np = np.asarray(occ_pf_fn(inputs))  # [2, T, J]
            th = occ_np[0].max(axis=1) > 0
            tt = occ_np[1].max(axis=1) > 0
            idx_both = np.nonzero(th & tt)[0]
            idx_head = np.nonzero(th & ~tt)[0]
            idx_torso = np.nonzero(tt & ~th)[0]
            idx_none = np.nonzero(~th & ~tt)[0]
            if _os.environ.get("DFANERF_DEBUG_COMPACTION"):
                print(f"[classes] T={T} both={len(idx_both)} "
                      f"head={len(idx_head)} torso={len(idx_torso)} "
                      f"none={len(idx_none)} "
                      f"head_dens={occ_np[0].mean():.4f} "
                      f"torso_dens={occ_np[1].mean():.4f}", flush=True)
            # bucket each class; borrow padding tiles (both <- head/torso/
            # none; head/torso <- none, with zeroed flags)
            pool = [list(idx_head), list(idx_torso), list(idx_none)]
            kb = min(bucket(len(idx_both)), T)
            seg_b = list(idx_both)
            borrowed_b = []
            for p in pool:
                while len(seg_b) + len(borrowed_b) < kb and p:
                    borrowed_b.append(p.pop())
            kb = len(seg_b) + len(borrowed_b)
            idx_head, idx_torso, idx_none = (np.array(p, np.int64)
                                             for p in pool)

            def pad_from_none(seg, none_list):
                k = min(bucket(len(seg)), T)
                pad = []
                while len(seg) + len(pad) < k and none_list:
                    pad.append(none_list.pop())
                return list(seg), pad

            none_list = list(idx_none)
            seg_h, pad_h = pad_from_none(idx_head, none_list)
            seg_t, pad_t = pad_from_none(idx_torso, none_list)
            kh, kt = len(seg_h) + len(pad_h), len(seg_t) + len(pad_t)

            def seg_flags(tiles_main, tiles_pad, fl):
                f = np.zeros((len(tiles_main) + len(tiles_pad),
                              occ_np.shape[2]), np.int32)
                if tiles_main:
                    f[:len(tiles_main)] = fl[np.array(tiles_main, np.int64)]
                return f

            joint = occ_np.max(axis=0)
            order = np.concatenate([
                np.array(seg_b + borrowed_b, np.int64),
                np.array(seg_h + pad_h, np.int64),
                np.array(seg_t + pad_t, np.int64),
                np.array(none_list, np.int64),
            ]).astype(np.int32)
            occs = (
                jnp.asarray(np.concatenate([
                    joint[np.array(seg_b, np.int64)] if seg_b else
                    np.zeros((0, occ_np.shape[2]), np.int32),
                    # borrowed tiles keep their own joint flags (the both
                    # kernel handles any class correctly)
                    joint[np.array(borrowed_b, np.int64)] if borrowed_b
                    else np.zeros((0, occ_np.shape[2]), np.int32),
                ]).astype(np.int32)) if kb else None,
                jnp.asarray(seg_flags(seg_h, pad_h, occ_np[0])) if kh else None,
                jnp.asarray(seg_flags(seg_t, pad_t, occ_np[1])) if kt else None,
            )
            cache.update(order=jnp.asarray(order), ks=(kb, kh, kt),
                         occs=occs, age=0)

        def render_frame_occ(params, z_shape, z_app, pose, pose_torso,
                             signal, signal_torso, bc_img):
            inputs = inputs_fn(params, z_shape, z_app, pose, pose_torso,
                               signal, signal_torso, bc_img)
            if (cache["order"] is None
                    or cache["age"] >= max(rcfg.occ_refresh_every, 1)):
                refresh_flags(inputs)
            cache["age"] += 1
            ks = cache["ks"]
            if ks not in gather_cache:
                gather_cache[ks] = make_gather(ks)
                scatter_cache[ks] = make_scatter(ks)
            segs = gather_cache[ks](inputs, cache["order"])
            pw_h, pw_t = inputs[0], inputs[1]
            outs = []
            for k, fields, seg, occ_sel in zip(
                    ks, ("both", "head", "torso"), segs[:3], cache["occs"]):
                if k == 0:
                    outs.append((jnp.zeros((0, 3)), jnp.zeros((0, 3))))
                    continue
                ck = (k, fields)
                if ck not in kernel_cache:
                    kernel_cache[ck] = make_kernel(k, fields)
                outs.append(kernel_cache[ck](pw_h, pw_t, *seg, occ_sel))
            return scatter_cache[ks](pw_h, pw_t, segs[3], outs,
                                     cache["order"])

        return render_frame_occ

    @jax.jit
    def render_frame(
        params: Dict[str, Any],
        z_shape: jnp.ndarray,
        z_app: jnp.ndarray,
        pose: jnp.ndarray,
        pose_torso: jnp.ndarray,
        signal: jnp.ndarray,
        signal_torso: jnp.ndarray,
        bc_img: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        rays_o, rays_d = get_rays(H, W, focal, pose, cx, cy)
        rays_o_t, rays_d_t = get_rays(H, W, focal, pose_torso, cx, cy)
        bc = bc_img.reshape(-1, 3).astype(jnp.float32) / 255.0

        def pad_tile(x):
            x = x.reshape(n_pix, -1)
            x = jnp.concatenate([x, jnp.zeros((n_pad, x.shape[-1]), x.dtype)], 0)
            return x.reshape(n_tiles, tile, -1)

        ro, rd = pad_tile(rays_o), pad_tile(rays_d)
        ro_t, rd_t = pad_tile(rays_o_t), pad_tile(rays_d_t)
        bc = pad_tile(bc)
        z_vals = stratified_z_vals(near, far, tile, rcfg.n_samples)

        def tile_body(args):
            o, d, ot, dt, b = args
            return render_ray_batch(
                params["decoder"], dcfg, rcfg,
                o, d, ot, dt, z_vals,
                signal, signal_torso,
                z_shape[0], z_app[0], z_shape[1], z_app[1],
                b,
            )

        rgb_head, rgb_com = jax.lax.map(tile_body, (ro, rd, ro_t, rd_t, bc))
        rgb_head = rgb_head.reshape(-1, 3)[:n_pix].reshape(H, W, 3)
        rgb_com = rgb_com.reshape(-1, 3)[:n_pix].reshape(H, W, 3)
        return rgb_head, rgb_com

    return render_frame


def _make_pair_compaction_renderer(cfg, rcfg, perm, z_vals_c, frame_inputs,
                                   unpermute, tiled_rays, tile_order):
    """The (tile, slab)-pair-compacted serving path.

    Per frame: each field's Pallas kernel runs a grid of EXACTLY its
    occupied (tile, slab) pairs (bucketed to a static K at flag refreshes)
    and writes per-sample (sigma, rgb) to a dense buffer; one XLA program
    then composites both buffers + the bg catch-all epilogue. Compared to
    the tile-class path this wastes nothing on predicated-off slabs or on
    whole-tile bucket padding — the work is proportional to the occupied
    pair count (~9% of the no-skip evaluation on the dense benchmark
    scene).

    Steady-state frames run FOUR jit programs (the per-call dispatch on
    the remote-TPU toolchain is ~1-3 ms, so program count is a first-order
    serving cost):
      1. prep  — one merged XLA program: signal folding (ops/pack), tiled
         ray generation (elementwise rotation — the [n,3]x[3,3] einsum
         lowering cost ~3.5 ms), bc tiling, the occupied-tile gather,
         pe_replicate + view_bias kernel operands, and the (optionally
         2x2-subsampled, rcfg.far_subsample) far-plane point prep;
      2. kernels — the two pair Pallas kernels (one program, nothing else
         in it per the composed-program kernel-fault rule);
      3. far — the two far-plane Pallas kernels;
      4. finish — deferred composite + far upsample + bg blend +
         tile-blocked scatter + unpermute.

    Refreshes every occ_refresh_every frames re-sync ~27 KB of flags to
    the host to rebuild the concrete pair lists (running the legacy
    multi-program path once for the prune diagnostics).
    ``render.refresh_union`` can be called with a list of already-prepped
    frame inputs to make the flags the UNION over a window of
    (pose, signal) pairs — exactly conservative for every frame in the
    window (offline rendering knows its window; live serving relies on
    the occupancy grid's dilation margin instead).
    """
    import numpy as np

    from dfanerf_tpu.ops.fused_render import (
        R_T, S_SLAB, bg_blend, conservative_occupancy,
        deferred_composite, fused_far_eval_split,
        fused_far_eval_split_prepped, pair2_field_eval_prepped,
        pair_field_eval, pair_field_eval_prepped, pe_replicate, view_bias,
    )
    from dfanerf_tpu.ops.pack import pack_field_weights

    act = cfg.decoder.density_activation
    dcfg = cfg.decoder
    pdt = (jnp.bfloat16 if rcfg.compute_dtype == "bfloat16"
           else jnp.float32)

    T = len(perm) // R_T
    # slab granularity: 4-sample half-slabs under occ_pack2 (see config)
    sp = 4 if rcfg.occ_pack2 else S_SLAB
    assert rcfg.n_samples % sp == 0
    J = rcfg.n_samples // sp

    inputs_fn = jax.jit(frame_inputs)

    @jax.jit
    def occ_fn(inputs):
        pw_h, pw_t, ro, rd, ro_t, rd_t, bc_p = inputs
        return conservative_occupancy(
            pw_h, pw_t, ro, rd, ro_t, rd_t, z_vals_c,
            rcfg.occ_sigma_thresh, grid_res=rcfg.occ_grid_res, act=act,
            s_slab=sp,
        )  # [2, T, J]

    kernel_cache = {}

    def make_kernel(branch):
        @jax.jit
        def kern(pw, ro, rd, t_idx, j_idx):
            return pair_field_eval(pw, branch, ro, rd, z_vals_c,
                                   t_idx, j_idx, act=act, s_slab=sp)

        return kern

    # the catch-all far-plane field evals run as their own Pallas programs
    # (fused_far_eval_split: ~3.5x the XLA forward, whose [N, 384]
    # intermediates round-trip HBM; split per field for 2048-row blocks);
    # the composite and the final blend+unpermute are XLA-only programs on
    # either side of it
    @jax.jit
    def far_fn(inputs):
        pw_h, pw_t, ro, rd, ro_t, rd_t, bc_p = inputs
        return fused_far_eval_split(pw_h, pw_t, ro, rd, ro_t, rd_t,
                                    z_vals_c[-1], act=act)

    # --- tile compaction: kernels and the deferred composite run only on
    # the union-occupied tiles (a refresh-time host decision, bucketed for
    # compile reuse); the full-frame work per frame is just the far-plane
    # pass and the final scatter+bg_blend. On the serving scenes ~70% of
    # tiles are background-only, which this removes from the composite's
    # [S, n] cumprod traffic entirely.
    @jax.jit
    def gather_fn(inputs, tiles_sel):
        pw_h, pw_t, ro, rd, ro_t, rd_t, bc_p = inputs
        sel = lambda x: x.reshape(T, R_T, 3)[tiles_sel].reshape(-1, 3)
        return sel(ro), sel(rd), sel(ro_t), sel(rd_t), sel(bc_p)

    @jax.jit
    def composite_fn(rd_g, rd_t_g, buf_h, buf_t, occ_sub):
        # per-frame serving composite: no [T, J] prune diagnostics
        return deferred_composite(buf_h, buf_t, occ_sub, rd_g, rd_t_g,
                                  z_vals_c, with_diagnostics=False,
                                  s_slab=sp)

    # one switch for every refresh-time prune decision (trans / per-pair
    # contrib / budgeted); the budget prune needs per-ray diag masses
    prune_on = (rcfg.occ_prune_trans > 0 or rcfg.occ_prune_contrib > 0
                or rcfg.occ_prune_budget > 0)
    budget_on = rcfg.occ_prune_budget > 0

    @jax.jit
    def composite_diag_fn(rd_g, rd_t_g, buf_h, buf_t, occ_sub, bc_g):
        return deferred_composite(
            buf_h, buf_t, occ_sub, rd_g, rd_t_g, z_vals_c, s_slab=sp,
            with_ray_diag=budget_on,
            ray_err_bc=bc_g if rcfg.occ_budget_color else None)

    @jax.jit
    def blend_fn(inputs, far_vals, ah, ac, t_h, t_c, tiles_scatter):
        pw_h, pw_t, ro, rd, ro_t, rd_t, bc_p = inputs
        n = T * R_T

        def scatter(x, fill):
            # tile-BLOCKED scatter: whole [R_T, C] blocks (a per-row
            # scatter of 1-3-lane rows pays (8,128)-tile write
            # amplification — measured 5+ ms for these four arrays);
            # padding entries all land on the sliced-off dummy tile T
            full = jnp.full((T + 1, R_T, x.shape[-1]), fill)
            full = full.at[tiles_scatter].set(
                x.reshape(-1, R_T, x.shape[-1]))
            return full[:T].reshape(n, x.shape[-1])

        sh, ct = far_vals
        head, com = bg_blend(
            sh, ct, rd, rd_t, bc_p, rcfg.last_dist,
            scatter(ah, 0.0), scatter(ac, 0.0),
            scatter(t_h, 1.0), scatter(t_c, 1.0),
        )
        return unpermute(head, com)

    @jax.jit
    def blend_nofar_fn(inputs, ah, ac, t_h, t_c, tiles_scatter):
        """blend_fn with the catch-all elided (far_skip_tol): both far
        alphas are exactly 1.0 (see config.far_skip_tol) and c_mix is
        replaced by the background pixel, so no far-plane field eval is
        needed — head is EXACT, com is off by the measured c_mix
        deviation."""
        pw_h, pw_t, ro, rd, ro_t, rd_t, bc_p = inputs
        n = T * R_T

        def scatter(x, fill):
            full = jnp.full((T + 1, R_T, x.shape[-1]), fill)
            full = full.at[tiles_scatter].set(
                x.reshape(-1, R_T, x.shape[-1]))
            return full[:T].reshape(n, x.shape[-1])

        bc = bc_p.astype(jnp.float32)
        head = scatter(ah, 0.0) + scatter(t_h, 1.0) * bc
        com = scatter(ac, 0.0) + scatter(t_c, 1.0) * bc
        return unpermute(head, com)

    @jax.jit
    def cmix_err_fn(far_vals, bc_p):
        """Exact max deviation of bg_blend's com catch-all color from the
        background pixel, |c_mix - bc| (the ONLY far-dependent term when
        last_dist saturates the far alphas — the t_com <= 1 factor is
        dropped, conservative)."""
        sh, ct = far_vals
        bc = bc_p.astype(jnp.float32)
        ssum = sh + 1e-6
        denom = jnp.where(ssum == 0.0, 1e-4, ssum)
        c_mix = (sh * bc + 1e-6 * ct) / denom
        return jnp.max(jnp.abs(c_mix - bc))

    def update_far_skip(window_inputs, into=None):
        """Refresh-time far_skip decision: measure the exact c_mix
        deviation on each prepped frame; skip the per-frame far programs
        for the window only if every measured frame is under tolerance
        (live serving measures the one refresh frame; window staleness is
        covered by the benchmarks' max-error discipline)."""
        st = cache if into is None else into
        if rcfg.far_skip_tol <= 0 or rcfg.last_dist < 1e8:
            st["far_skip"] = False
            return
        err = max(
            float(cmix_err_fn(far_fn(inp), inp[6])) for inp in window_inputs
        )
        st["far_cmix_err"] = err
        st["far_skip"] = err <= rcfg.far_skip_tol
        if os.environ.get("DFANERF_DEBUG_COMPACTION"):
            print(f"[pairs:far_skip] cmix_err={err:.2e} "
                  f"skip={st['far_skip']}", flush=True)

    # pair-count ladder: step-32 rungs through the serving range (each
    # padding pair costs a full 2048-sample kernel step ~25 us, so at
    # ~600 pairs a 128-wide rung wastes up to 10% of the kernel; distinct
    # rungs cost one compile each, amortized by the compilation cache)
    buckets = ([0, 128, 192, 256, 320, 384]
               + list(range(416, 1025, 32))
               + [1280, 1536, 2048, 2560, 3072, 4096, T * J])
    if rcfg.occ_async_refresh:
        # live mode pads to COARSER rungs: novel driving signals drift the
        # occupied-pair counts every refresh, and each first-seen
        # (pairs_h, pairs_t, k_u) class costs the async worker seconds of
        # host-side tracing — on the one host core that tracing starves
        # the serving thread's dispatch loop (the round-4 novel-audio
        # cliff: 5.7 fps vs 32.9 on the cycled window whose classes were
        # all warm). 64-wide rungs bound the class count at ~1.5 ms of
        # padding per frame.
        buckets = ([0] + list(range(128, 1537, 64))
                   + [2048, 2560, 3072, 4096, T * J])
    tile_buckets = [64, 128, 192, 256, 320, 416, 512, 672, T]

    def bucket(c, ladder=buckets):
        return next(b for b in ladder if b >= c)

    cache = {"age": 0, "lists": None, "occ": None}

    def set_flags(occ, tag="flags", into=None, min_tiles=0,
                  min_pairs=(0, 0)):
        """min_tiles / min_pairs (per field, in the active list's units —
        A-list length under occ_pack2, full pair count otherwise) force
        the padding buckets up to at least those rungs: the class-clamp
        path uses them to land a refresh on an already-executed program
        class (see config.occ_class_clamp)."""
        st = cache if into is None else into
        occ_np = np.asarray(occ)
        if os.environ.get("DFANERF_DEBUG_COMPACTION"):
            print(f"[pairs:{tag}] head={int(occ_np[0].sum())} "
                  f"torso={int(occ_np[1].sum())}", flush=True)
        # union-occupied tiles, compacted and bucketed
        tiles_u = np.nonzero(occ_np.max(axis=(0, 2)))[0]
        k_u = bucket(max(len(tiles_u), min_tiles), tile_buckets)
        tiles_pad = np.concatenate(
            [tiles_u, np.zeros(k_u - len(tiles_u))]).astype(np.int32)
        pos_of = np.full(T + 1, k_u, np.int32)  # full tile -> compact pos
        pos_of[tiles_u] = np.arange(len(tiles_u))
        # blend-time scatter targets (tile-blocked): real tiles go to
        # their row, every padding entry to the sliced-off dummy tile T
        tiles_scatter = tiles_pad.copy()
        tiles_scatter[len(tiles_u):] = T
        occ_sub = occ_np[:, tiles_pad, :]
        occ_sub[:, len(tiles_u):] = 0
        lists = []
        lists2 = []
        occ_a = np.zeros_like(occ_sub)
        occ_b = np.zeros_like(occ_sub)
        for f in range(2):
            t_i, j_i = np.nonzero(occ_np[f])
            order = np.lexsort((j_i, t_i))  # tile-major: consecutive pairs
            # of one tile reuse the same ray blocks without a re-fetch
            t_i, j_i = t_i[order], j_i[order]
            t_i = pos_of[t_i]  # compacted tile coordinates
            if rcfg.occ_pack2:
                # disjoint A/B partitions for the packed-2 kernel (the
                # even/odd split of the tile-major order keeps both slots
                # of a grid step usually on the same or adjacent tiles)
                tA, jA = t_i[0::2], j_i[0::2]
                tB, jB = t_i[1::2], j_i[1::2]
                occ_a[f][tA, jA] = occ_sub[f][tA, jA]
                occ_b[f][tB, jB] = occ_sub[f][tB, jB]
                kb = bucket(max(len(tA), min_pairs[f]))
                def _pad(t, j, kb=kb):
                    return (
                        np.concatenate(
                            [t, np.full(kb - len(t), k_u)]).astype(np.int32),
                        np.concatenate(
                            [j, np.zeros(kb - len(j))]).astype(np.int32),
                    )
                tA, jA = _pad(tA, jA)
                tB, jB = _pad(tB, jB)
                lists2.append(tuple(
                    jnp.asarray(x) for x in (tA, jA, tB, jB)))
            pad = bucket(max(
                len(t_i), 0 if rcfg.occ_pack2 else min_pairs[f],
            )) - len(t_i)
            t_i = np.concatenate([t_i, np.full(pad, k_u)]).astype(np.int32)
            j_i = np.concatenate([j_i, np.zeros(pad)]).astype(np.int32)
            lists.append((jnp.asarray(t_i), jnp.asarray(j_i)))
        st.update(
            age=0, lists=lists, occ=jnp.asarray(occ_np),
            tiles_u=tiles_u, tiles_sel=jnp.asarray(tiles_pad),
            occ_sub=jnp.asarray(occ_sub),
            tiles_scatter=jnp.asarray(tiles_scatter),
        )
        if rcfg.occ_pack2:
            st.update(lists2=lists2, occ_sub_a=jnp.asarray(occ_a),
                      occ_sub_b=jnp.asarray(occ_b))

    def run_pipeline(inputs, diag=False, st=None):
        """Gather occupied tiles + kernels + compacted composite + full-
        frame blend under the flag lists of ``st`` (default: the live
        cache; each stage its own jit program per the composed-program
        kernel-fault rule). Returns imgs, or with ``diag=True``
        (refresh-time) (imgs, tm_h, tm_c, contrib_h, contrib_t) — the
        diagnostics in COMPACTED tile coordinates (st['tiles_u'] maps
        back)."""
        st = cache if st is None else st
        ro_g, rd_g, ro_t_g, rd_t_g, bc_g = gather_fn(inputs,
                                                     st["tiles_sel"])
        bufs = []
        for pw, o, d, branch, (ti, ji) in (
                (inputs[0], ro_g, rd_g, "head", st["lists"][0]),
                (inputs[1], ro_t_g, rd_t_g, "torso", st["lists"][1])):
            ck = (int(ti.shape[0]), int(ro_g.shape[0]), branch)
            kern = _get_or_make(kernel_cache, ck,
                                lambda b=branch: make_kernel(b))
            bufs.append(kern(pw, o, d, ti, ji))
        far_skip = st.get("far_skip", False)
        far_vals = None if far_skip else far_fn(inputs)
        if diag:
            ah, ac, t_h, t_c, *diags = composite_diag_fn(
                rd_g, rd_t_g, bufs[0], bufs[1], st["occ_sub"], bc_g)
        else:
            diags = ()
            ah, ac, t_h, t_c = composite_fn(
                rd_g, rd_t_g, bufs[0], bufs[1], st["occ_sub"])
        if far_skip:
            imgs = blend_nofar_fn(inputs, ah, ac, t_h, t_c,
                                  st["tiles_scatter"])
        else:
            imgs = blend_fn(inputs, far_vals, ah, ac, t_h, t_c,
                            st["tiles_scatter"])
        return (imgs, *diags) if diag else imgs

    def expand_tiles(x_sub, st=None):
        """[K_u, J] compacted diagnostic -> [T, J] full (zeros off-U)."""
        st = cache if st is None else st
        full = np.zeros((T, x_sub.shape[1]), np.float32)
        tiles_u = st["tiles_u"]
        full[tiles_u] = np.asarray(x_sub)[:len(tiles_u)]
        return full

    def prune_flags(tm_h, tm_c, cb_h, cb_t, wr_h=None, wr_t=None, st=None,
                    base_led=None, hist=None):
        """Keep-masks [T, J] from one frame's composite diagnostics
        (compacted coordinates, expanded here): drop pairs saturated
        behind opacity (occ_prune_trans, tile-max transmittance) or
        invisible to every stack (occ_prune_contrib, max-ray summed
        compositing weight — the junk-floater killer: bg rays keep
        transmittance 1, so only the contribution test sees them).

        With occ_prune_budget > 0 the visibility prune is BUDGETED
        instead (wr_h/wr_t = per-ray slab masses [J, K_u, R_T] from
        deferred_composite with_ray_diag): per tile, candidates from BOTH
        fields are dropped greedily (ascending max-ray mass) only while
        every ray's accumulated dropped mass stays under the budget — the
        exact bound the per-pair eps cannot give when several dropped
        slabs stack on one ray.

        ``hist`` (live mode, occ_prune_hist_decay > 0): a dict this call
        READS and UPDATES in place — per-key running maxima over refresh
        cycles in FULL tile coordinates. The derivation then uses
        max(current, decay * history) for the trans transmittances and
        the budget's per-(pair, ray) costs, so a pair visible on any
        recent frame keeps its key even when the current snapshot's
        estimate is ~0 (the round-4 live-error driver: stale color-keyed
        drops realized 0.034 while flags alone were 10x tighter). The
        offline per-slot prep passes hist=None (slots are pinned to
        their own frame; no staleness to guard)."""
        keep_h = np.ones((T, J), bool)
        keep_t = np.ones((T, J), bool)
        dk = rcfg.occ_prune_hist_decay

        def _histmax(name, full):
            if hist is None or dk <= 0:
                return full
            if name in hist:
                full = np.maximum(full, hist[name] * dk)
            hist[name] = full
            return full

        if rcfg.occ_prune_trans > 0:
            eps = rcfg.occ_prune_trans
            tm_h_f = _histmax("tm_h", expand_tiles(tm_h, st))
            tm_c_f = _histmax("tm_c", expand_tiles(tm_c, st))
            keep_h &= np.maximum(tm_h_f, tm_c_f) > eps
            keep_t &= tm_c_f > eps
        if budget_on and wr_h is not None:
            stc = cache if st is None else st
            tiles_u = stc["tiles_u"]
            k_u = len(tiles_u)
            K = np.asarray(wr_h).shape[1]
            if hist is not None and dk > 0:
                # history at PER-PAIR granularity (max over the tile's
                # rays, [J, T] per field): a per-(pair, ray) history costs
                # ~30 ms of host numpy per derive on the one host core —
                # measured as a 1.5 fps serving hit at derive-every-3.
                # Flooring every ray of a pair at the pair's historical
                # max-ray cost overestimates multi-drop stacking, i.e. is
                # conservative (fewer drops), and measured the same
                # steady-state error.
                wr_h = np.asarray(wr_h).copy()
                wr_t = np.asarray(wr_t).copy()
                for name, w in (("wr_h", wr_h), ("wr_t", wr_t)):
                    cur = np.zeros((J, T), np.float32)
                    cur[:, tiles_u] = w[:, :k_u].max(axis=2)
                    # floor at the DECAYED history only — flooring at the
                    # current frame's own max-ray value would flatten the
                    # fresh per-ray detail the ledger needs
                    old = (hist[name] * dk if name in hist
                           else np.zeros_like(cur))
                    hist[name] = np.maximum(cur, old)
                    w[:, :k_u] = np.maximum(w[:, :k_u],
                                            old[:, tiles_u, None])
            # candidates: occupied pairs that survived the trans prune
            # (trans-dropped pairs sit behind saturated opacity — they are
            # dropped regardless and must not consume budget)
            cand = np.asarray(stc["occ_sub"]).astype(bool)  # [2, K, J]
            kc = np.ones((2, K, J), bool)
            kc[0, :k_u] = keep_h[tiles_u]
            kc[1, :k_u] = keep_t[tiles_u]
            base = None
            if base_led is not None:
                base = np.zeros((K, R_T), np.float32)
                base[:k_u] = base_led[tiles_u]
            drop = budget_drop_masks(np.asarray(wr_h), np.asarray(wr_t),
                                     cand & kc, rcfg.occ_prune_budget,
                                     base=base)
            full = np.zeros((2, T, J), bool)
            full[:, tiles_u] = drop[:, :k_u]
            keep_h &= ~full[0]
            keep_t &= ~full[1]
        elif rcfg.occ_prune_contrib > 0:
            eps = rcfg.occ_prune_contrib
            keep_h &= expand_tiles(cb_h, st) > eps
            keep_t &= expand_tiles(cb_t, st) > eps
        return keep_h, keep_t

    _SLOT_KEYS = ("lists", "occ", "tiles_u", "tiles_sel", "occ_sub",
                  "tiles_scatter", "far_skip", "far_cmix_err",
                  "lists2", "occ_sub_a", "occ_sub_b")

    @jax.jit
    def err_led_fn(h0, c0, h1, c1):
        """Realized per-ray error of a pruned render vs the unpruned one
        (max over channels and both output images), in tile-ray order
        [T, R_T] — the iterative budget refinement's measured ledger."""
        e = jnp.maximum(jnp.abs(h1 - h0).max(-1), jnp.abs(c1 - c0).max(-1))
        return tile_order(e[..., None])[:, 0].reshape(T, R_T)

    def refresh_union(window_inputs, per_slot=False):
        """Serving prep over a window of prepped frame inputs (each an
        inputs_fn result): union occupancy flags over the window's
        (pose, signal) pairs — exactly conservative for every window
        frame — then, if contribution/transmittance pruning is on, render
        each window frame under the union flags and drop every pair that
        no frame's composite can see. Pins the result: subsequent
        render() calls skip the per-window refresh entirely (the offline /
        stream-start serving mode; call again to re-prep). The pruning
        thresholds' realized error is measured by the benchmarks'
        max-error-vs-noskip discipline across the whole window.

        With ``per_slot=True`` the prep ADDITIONALLY builds per-frame flag
        states (each window frame's own conservative flags + its own
        prune): render(..., window_slot=i) then serves frame i under its
        own pair lists — the union's ~10-20% pair inflation is avoided.
        The union state remains the default for slot-less render calls."""
        slots = []
        if per_slot:
            iters = (max(int(rcfg.occ_budget_iters), 1) if budget_on
                     else 1)
            for inp in window_inputs:
                set_flags(occ_fn(inp))
                update_far_skip([inp])
                if prune_on:
                    imgs0, tm_h, tm_c, cb_h, cb_t, *wr = run_pipeline(
                        inp, diag=True)
                    kh, kt = prune_flags(tm_h, tm_c, cb_h, cb_t, *wr)
                    occ_np = np.asarray(cache["occ"])
                    set_flags(np.stack([occ_np[0] * kh, occ_np[1] * kt]),
                              tag="pruned-slot")
                    for it in range(iters - 1):
                        imgs1, tm1, tc1, cb1, ct1, *wr1 = run_pipeline(
                            inp, diag=True)
                        led = np.asarray(err_led_fn(
                            imgs0[0], imgs0[1], imgs1[0], imgs1[1]))
                        kh2, kt2 = prune_flags(tm1, tc1, cb1, ct1, *wr1,
                                               base_led=led)
                        kh_new, kt_new = kh & kh2, kt & kt2
                        set_flags(
                            np.stack([occ_np[0] * kh_new,
                                      occ_np[1] * kt_new]),
                            tag="pruned-slot")
                        # VERIFY-AND-REVERT: the first-order keys break
                        # down on mid-alpha pairs (a single surface pair
                        # can realize 4x its estimate); re-render under
                        # the refined flags, measure the realized per-tile
                        # error, and restore this round's drops in every
                        # tile whose realized error grew by more than the
                        # budget — the refinement then never costs more
                        # than ~budget per tile over the measured round-1
                        # error, whatever the estimates missed
                        imgs2 = run_pipeline(inp)
                        led2 = np.asarray(err_led_fn(
                            imgs0[0], imgs0[1], imgs2[0], imgs2[1]))
                        bad = (led2.max(1) > led.max(1)
                               + rcfg.occ_prune_budget)
                        if os.environ.get("DFANERF_DEBUG_COMPACTION"):
                            print(f"[pairs:iter{it + 1}] led_max="
                                  f"{led.max():.4f} led2_max="
                                  f"{led2.max():.4f} extra_drops="
                                  f"{int((kh & ~kh2).sum())}+"
                                  f"{int((kt & ~kt2).sum())} "
                                  f"reverted_tiles={int(bad.sum())}",
                                  flush=True)
                        if bad.any():
                            kh_new[bad] = kh[bad]
                            kt_new[bad] = kt[bad]
                            set_flags(
                                np.stack([occ_np[0] * kh_new,
                                          occ_np[1] * kt_new]),
                                tag="pruned-slot")
                        kh, kt = kh_new, kt_new
                slots.append({k: cache.get(k) for k in _SLOT_KEYS})
        occ = occ_fn(window_inputs[0])
        for inp in window_inputs[1:]:
            occ = jnp.maximum(occ, occ_fn(inp))
        set_flags(occ)
        update_far_skip(window_inputs)
        if prune_on:
            keeps = None
            for inp in window_inputs:
                _, tm_h, tm_c, cb_h, cb_t, *wr = run_pipeline(inp, diag=True)
                kh, kt = prune_flags(tm_h, tm_c, cb_h, cb_t, *wr)
                keeps = (kh, kt) if keeps is None else (keeps[0] | kh,
                                                        keeps[1] | kt)
            occ_np = np.asarray(cache["occ"])
            set_flags(np.stack([occ_np[0] * keeps[0],
                                occ_np[1] * keeps[1]]), tag="pruned")
        cache["pinned"] = True
        cache["slots"] = slots

    # ------------------- steady-state fast path ---------------------------
    # Four programs per frame (see the class docstring): prep (merged XLA),
    # the two pair kernels (one program), the two far kernels (one
    # program), finish (composite + blend + scatter). The refresh frames
    # keep the legacy multi-program path (it produces the prune
    # diagnostics).
    far_ss = max(int(rcfg.far_subsample), 1)
    assert 16 % far_ss == 0
    far = z_vals_c[-1]

    def _sub_tiles(x):
        """[T*256, C] tile-order -> in-tile (16/ss)^2 CELL-CENTER subgrid
        (pixel ss/2 + i*ss in each direction — centers halve the max
        pixel-to-sample distance vs corner sampling)."""
        c = x.shape[-1]
        v = x.reshape(T, 16, 16, c)[:, far_ss // 2::far_ss,
                                    far_ss // 2::far_ss, :]
        return v.reshape(T * (16 // far_ss) ** 2, c)

    # bilinear inverse of _sub_tiles: out[x] interpolates the two nearest
    # cell centers (edge-clamped at tile borders), separably per axis via
    # one precomputed [16, m] matrix. sh/ct are spatially smooth at the
    # far plane, so this cuts the subsample's max error ~4x vs nearest
    # neighbor at the same kernel cost; the realized error is covered by
    # the benchmarks' max-error-vs-noskip discipline.
    def _up_matrix():
        m = 16 // far_ss
        centers = (far_ss // 2 + np.arange(m) * far_ss).astype(np.float64)
        A = np.zeros((16, m), np.float32)
        for x in range(16):
            i = np.clip(np.searchsorted(centers, x) - 1, 0, m - 2)
            w = np.clip((x - centers[i]) / (centers[i + 1] - centers[i]),
                        0.0, 1.0) if m > 1 else 0.0
            A[x, i] = 1.0 - w
            A[x, min(i + 1, m - 1)] += w
        return jnp.asarray(A)

    _up_A = _up_matrix() if far_ss > 1 else None

    def _up_tiles(x):
        if far_ss == 1:
            return x
        c = x.shape[-1]
        m = 16 // far_ss
        v = x.reshape(T, m, m, c)
        v = jnp.einsum("xj,tjkc,yk->txyc", _up_A, v, _up_A)
        return v.reshape(T * 256, c)

    prep_cache = {}

    def make_prep():
        @jax.jit
        def prep(params, z_shape, z_app, pose, pose_torso, signal,
                 signal_torso, bc_img, tiles_sel):
            from dfanerf_tpu.ops.fused_render import PE_PAD

            pw_h = pack_field_weights(params["decoder"], dcfg, signal,
                                      z_shape[0], z_app[0], "head",
                                      param_dtype=pdt)
            pw_t = pack_field_weights(params["decoder"], dcfg,
                                      signal_torso, z_shape[1], z_app[1],
                                      "torso", param_dtype=pdt)
            ro, rd = tiled_rays(pose)
            ro_t, rd_t = tiled_rays(pose_torso)
            bc_p = tile_order(bc_img.astype(jnp.float32) / 255.0)
            sel = lambda x: x.reshape(T, R_T, 3)[tiles_sel].reshape(-1, 3)
            ro_g, rd_g = sel(ro), sel(rd)
            ro_t_g, rd_t_g = sel(ro_t), sel(rd_t)

            def kern_ops(pw, o, d):
                o_r = jnp.concatenate(
                    [pe_replicate(o), jnp.zeros((R_T, PE_PAD))])
                d_r = jnp.concatenate(
                    [pe_replicate(d), jnp.zeros((R_T, PE_PAD))])
                vr = jnp.concatenate(
                    [view_bias(pw, d).astype(jnp.bfloat16),
                     jnp.zeros((R_T, 256), jnp.bfloat16)])
                return o_r, d_r, vr

            oh, dh, vh = kern_ops(pw_h, ro_g, rd_g)
            ot, dt, vt = kern_ops(pw_t, ro_t_g, rd_t_g)
            # far-plane prep on the (subsampled) full frame
            rd_s, rd_t_s = _sub_tiles(rd), _sub_tiles(rd_t)
            ph = pe_replicate(_sub_tiles(ro) + rd_s * far)
            pt = pe_replicate(_sub_tiles(ro_t) + rd_t_s * far)
            vrtf = view_bias(pw_t, rd_t_s).astype(jnp.bfloat16)
            return (pw_h, pw_t, oh, dh, vh, ot, dt, vt, rd_g, rd_t_g,
                    ph, pt, vrtf, rd, rd_t, bc_p)

        return prep

    kern2_cache = {}

    def make_kern2(with_far):
        """One program holding ALL the frame's Pallas calls (the two pair
        kernels + the two far kernels) — nothing else in it, per the
        composed-program kernel-fault rule. with_far=False when the
        catch-all is elided (far_skip)."""
        if rcfg.occ_pack2:
            @jax.jit
            def kern2(pw_h, pw_t, oh, dh, vh, ot, dt, vt, lh, lt, ph, pt,
                      vrtf):
                buf_h = pair2_field_eval_prepped(
                    pw_h, "head", oh, dh, vh, z_vals_c, *lh, act=act,
                    s_slab=sp)
                buf_t = pair2_field_eval_prepped(
                    pw_t, "torso", ot, dt, vt, z_vals_c, *lt, act=act,
                    s_slab=sp)
                if not with_far:
                    return buf_h, buf_t, None
                far_vals = fused_far_eval_split_prepped(pw_h, pw_t, ph, pt,
                                                        vrtf, act=act)
                return buf_h, buf_t, far_vals

            return kern2

        @jax.jit
        def kern2(pw_h, pw_t, oh, dh, vh, ot, dt, vt, ti_h, ji_h,
                  ti_t, ji_t, ph, pt, vrtf):
            buf_h = pair_field_eval_prepped(pw_h, "head", oh, dh, vh,
                                            z_vals_c, ti_h, ji_h, act=act)
            buf_t = pair_field_eval_prepped(pw_t, "torso", ot, dt, vt,
                                            z_vals_c, ti_t, ji_t, act=act)
            if not with_far:
                return buf_h, buf_t, None
            far_vals = fused_far_eval_split_prepped(pw_h, pw_t, ph, pt,
                                                    vrtf, act=act)
            return buf_h, buf_t, far_vals

        return kern2

    finish_cache = {}

    # occ_live_keys: the fast-path composite also emits the frame's own
    # per-(tile, slab) prune keys (see config.occ_live_keys) — the async
    # worker then derives keep-masks from served frames instead of
    # re-rendering the snapshot at unpruned counts
    live_keys = (rcfg.occ_async_refresh and rcfg.occ_live_keys
                 and (rcfg.occ_prune_trans > 0 or rcfg.occ_prune_budget > 0))

    def make_finish(with_far):
        def body(rd_g, rd_t_g, buf_h, buf_t, occ_sub, rd, rd_t, bc_p,
                 tiles_scatter, far_vals=None):
            kw = {}
            if live_keys:
                kw["with_keys"] = True
                if rcfg.occ_budget_color:
                    kw["ray_err_bc"] = bc_p.reshape(T, R_T, 3)[
                        jnp.clip(tiles_scatter, 0, T - 1)].reshape(-1, 3)
            if rcfg.occ_pack2:
                # occ_sub is the (A, B) flag-partition pair; the buffers
                # are (bufs_A, bufs_B) pairs from the packed-2 kernel
                occ_a, occ_b = occ_sub
                ah, ac, t_h, t_c, *keys = deferred_composite(
                    buf_h[0], buf_t[0], occ_a, rd_g, rd_t_g, z_vals_c,
                    with_diagnostics=False, buf_h2=buf_h[1],
                    buf_t2=buf_t[1], occ2=occ_b, s_slab=sp, **kw)
            else:
                ah, ac, t_h, t_c, *keys = deferred_composite(
                    buf_h, buf_t, occ_sub, rd_g, rd_t_g, z_vals_c,
                    with_diagnostics=False, **kw)
            n = T * R_T

            def scatter(x, fill):
                full = jnp.full((T + 1, R_T, x.shape[-1]), fill)
                full = full.at[tiles_scatter].set(
                    x.reshape(-1, R_T, x.shape[-1]))
                return full[:T].reshape(n, x.shape[-1])

            if with_far:
                sh_s, ct_s = far_vals
                head, com = bg_blend(
                    _up_tiles(sh_s), _up_tiles(ct_s), rd, rd_t, bc_p,
                    rcfg.last_dist,
                    scatter(ah, 0.0), scatter(ac, 0.0),
                    scatter(t_h, 1.0), scatter(t_c, 1.0),
                )
            else:
                bc = bc_p.astype(jnp.float32)
                head = scatter(ah, 0.0) + scatter(t_h, 1.0) * bc
                com = scatter(ac, 0.0) + scatter(t_c, 1.0) * bc
            out = unpermute(head, com)
            return (*out, keys[0]) if live_keys else out

        if with_far:
            @jax.jit
            def finish(rd_g, rd_t_g, buf_h, buf_t, occ_sub, far_vals, rd,
                       rd_t, bc_p, tiles_scatter):
                return body(rd_g, rd_t_g, buf_h, buf_t, occ_sub, rd, rd_t,
                            bc_p, tiles_scatter, far_vals)
        else:
            @jax.jit
            def finish(rd_g, rd_t_g, buf_h, buf_t, occ_sub, rd, rd_t,
                       bc_p, tiles_scatter):
                return body(rd_g, rd_t_g, buf_h, buf_t, occ_sub, rd, rd_t,
                            bc_p, tiles_scatter)

        return finish

    # kern2+finish in ONE jit program: the Pallas calls feed the composite
    # epilogue directly, saving a dispatch round trip and ~1.5 ms of
    # inter-program latency per frame (measured; see probe_r4 MERGE rows).
    # The historical composed-program kernel fault needed a GATHER in
    # front of the kernels in the same program — kernels + epilogue alone
    # run clean. DFANERF_NO_MERGE_FINISH=1 restores the split programs.
    merged_cache = {}
    merge_finish = not os.environ.get("DFANERF_NO_MERGE_FINISH")

    def make_kern2_finish(with_far):
        # calling the jitted stages inside the outer jit traces through
        # them — one fused XLA program, no nested dispatch
        kern2 = make_kern2(with_far)
        fin = make_finish(with_far)

        if rcfg.occ_pack2:
            @jax.jit
            def merged(pw_h, pw_t, oh, dh, vh, ot, dt, vt, lh, lt, ph, pt,
                       vrtf, rd_g, rd_t_g, occ_a, occ_b, rd, rd_t, bc_p,
                       tiles_scatter):
                buf_h, buf_t, far_vals = kern2(pw_h, pw_t, oh, dh, vh, ot,
                                               dt, vt, lh, lt, ph, pt,
                                               vrtf)
                a = (rd_g, rd_t_g, buf_h, buf_t, (occ_a, occ_b))
                if with_far:
                    return fin(*a, far_vals, rd, rd_t, bc_p, tiles_scatter)
                return fin(*a, rd, rd_t, bc_p, tiles_scatter)

            return merged

        @jax.jit
        def merged(pw_h, pw_t, oh, dh, vh, ot, dt, vt, ti_h, ji_h, ti_t,
                   ji_t, ph, pt, vrtf, rd_g, rd_t_g, occ_sub, rd, rd_t,
                   bc_p, tiles_scatter):
            buf_h, buf_t, far_vals = kern2(pw_h, pw_t, oh, dh, vh, ot, dt,
                                           vt, ti_h, ji_h, ti_t, ji_t, ph,
                                           pt, vrtf)
            a = (rd_g, rd_t_g, buf_h, buf_t, occ_sub)
            if with_far:
                return fin(*a, far_vals, rd, rd_t, bc_p, tiles_scatter)
            return fin(*a, rd, rd_t, bc_p, tiles_scatter)

        return merged

    # jit-cache dicts are touched from BOTH the serving thread and the
    # async refresh worker: insertions go through _get_or_make under one
    # lock (concurrent first-touch of a key would build duplicate jit
    # wrappers and compile twice). Calling an already-inserted jitted
    # function concurrently is fine — JAX dispatch/compilation is
    # thread-safe; the lock only guards the dict bookkeeping.
    import threading as _threading
    from collections import deque as _deque

    _cache_lock = _threading.Lock()

    def _get_or_make(d, key, factory):
        with _cache_lock:
            if key not in d:
                d[key] = factory()
            return d[key]

    def run_fast(params, z_shape, z_app, pose, pose_torso, signal,
                 signal_torso, bc_img, st=None):
        st = st if st is not None else cache
        out = _run_fast_inner(params, z_shape, z_app, pose, pose_torso,
                              signal, signal_torso, bc_img, st)
        if live_keys:
            # stash the frame's self-reported prune keys (device arrays,
            # fetched by the async worker off the serving thread) with
            # the tile map that positions them in full coordinates
            out, keys = out[:2], out[2]
            with _cache_lock:
                kf = cache.setdefault("key_frames", _deque(maxlen=12))
                kf.append((keys, st["tiles_u"]))
        # mark the program class as executed only AFTER the dispatch
        # returned (jit compiles synchronously at the first call, so
        # reaching here means the compile succeeded) — marking at entry
        # left a failed async compile's class marked, making a later swap
        # to it skip the off-stream precompile and stall the stream
        with _cache_lock:
            executed_cks.add(_ck_of(st))
        return out

    def _run_fast_inner(params, z_shape, z_app, pose, pose_torso, signal,
                        signal_torso, bc_img, st):
        k_u = int(st["tiles_sel"].shape[0])
        prep = _get_or_make(prep_cache, k_u, make_prep)
        (pw_h, pw_t, oh, dh, vh, ot, dt, vt, rd_g, rd_t_g, ph, pt, vrtf,
         rd, rd_t, bc_p) = prep(
            params, z_shape, z_app, pose, pose_torso, signal,
            signal_torso, bc_img, st["tiles_sel"])
        far_skip = bool(st.get("far_skip", False))
        if rcfg.occ_pack2:
            lh, lt = st["lists2"]
            ck = (int(lh[0].shape[0]), int(lt[0].shape[0]), k_u, far_skip)
            if merge_finish:
                merged = _get_or_make(merged_cache, ck,
                                      lambda: make_kern2_finish(not far_skip))
                return merged(
                    pw_h, pw_t, oh, dh, vh, ot, dt, vt, lh, lt, ph, pt,
                    vrtf, rd_g, rd_t_g, st["occ_sub_a"], st["occ_sub_b"],
                    rd, rd_t, bc_p, st["tiles_scatter"])
            kern2 = _get_or_make(kern2_cache, ck,
                                 lambda: make_kern2(not far_skip))
            buf_h, buf_t, far_vals = kern2(
                pw_h, pw_t, oh, dh, vh, ot, dt, vt, lh, lt, ph, pt, vrtf)
            occ_sub = (st["occ_sub_a"], st["occ_sub_b"])
        else:
            ti_h, ji_h = st["lists"][0]
            ti_t, ji_t = st["lists"][1]
            ck = (int(ti_h.shape[0]), int(ti_t.shape[0]), k_u, far_skip)
            if merge_finish:
                merged = _get_or_make(merged_cache, ck,
                                      lambda: make_kern2_finish(not far_skip))
                return merged(
                    pw_h, pw_t, oh, dh, vh, ot, dt, vt, ti_h, ji_h, ti_t,
                    ji_t, ph, pt, vrtf, rd_g, rd_t_g, st["occ_sub"],
                    rd, rd_t, bc_p, st["tiles_scatter"])
            kern2 = _get_or_make(kern2_cache, ck,
                                 lambda: make_kern2(not far_skip))
            buf_h, buf_t, far_vals = kern2(
                pw_h, pw_t, oh, dh, vh, ot, dt, vt, ti_h, ji_h, ti_t,
                ji_t, ph, pt, vrtf)
            occ_sub = st["occ_sub"]
        fk = (far_skip, k_u)
        fin = _get_or_make(finish_cache, fk,
                           lambda: make_finish(not far_skip))
        if far_skip:
            return fin(rd_g, rd_t_g, buf_h, buf_t, occ_sub, rd, rd_t,
                       bc_p, st["tiles_scatter"])
        return fin(rd_g, rd_t_g, buf_h, buf_t, occ_sub, far_vals, rd,
                   rd_t, bc_p, st["tiles_scatter"])

    # ---------------- async (double-buffered) live refresh ----------------
    # The stream never waits for a refresh: a worker thread builds the next
    # flag state (occupancy sync + host bucketing + far_skip measurement +
    # prune diagnostics + fast-path compiles for first-seen pair counts)
    # against a snapshot of one frame's inputs, then render() swaps it in
    # between frames. JAX dispatch is thread-safe; the worker's device work
    # (one occ probe + at most one diagnostic render per cycle) shares the
    # chip with serving, which costs a bounded slice of throughput instead
    # of a multi-second stall every occ_refresh_every frames.
    import threading as _threading

    worker = {"thread": None, "result": None, "error": None, "fails": 0}
    executed_cks = set()  # program classes run_fast has actually executed

    def _ck_of(st):
        k_u = int(st["tiles_sel"].shape[0])
        lists = st["lists2"] if rcfg.occ_pack2 else st["lists"]
        return (int(lists[0][0].shape[0]), int(lists[1][0].shape[0]),
                k_u, bool(st.get("far_skip", False)))

    def _derive_keeps_from_keys(occ_np):
        """occ_live_keys derive: keep-masks from the running max of the
        prune keys the RECENT SERVED FRAMES self-reported (fast-path
        composite with_keys) plus the decayed history — no diagnostic
        render. Pairs the window never evaluated fall back to history;
        pairs never measured at all (new geometry) are kept. Returns
        (keep_h, keep_t) or None when no key frames exist yet."""
        with _cache_lock:
            frames = list(cache.get("key_frames", ()))
        if not frames:
            return None
        agg = [np.zeros((T, J), np.float32) for _ in range(4)]
        for keys_dev, tiles_u_f in frames:
            k_f = len(tiles_u_f)
            for a, x in zip(agg, keys_dev):
                # fancy indexing yields a copy — assign the max back
                a[tiles_u_f] = np.maximum(a[tiles_u_f],
                                          np.asarray(x)[:k_f])
        dk = max(rcfg.occ_prune_hist_decay, 0.0)
        hist = cache.setdefault("hist", {})
        for name, a in zip(("ktm_h", "ktm_c", "ke_h", "ke_t"), agg):
            if dk > 0 and name in hist:
                np.maximum(a, hist[name] * dk, out=a)
            hist[name] = a
        tm_h_k, tm_c_k, e_h_k, e_t_k = agg
        keep_h = np.ones((T, J), bool)
        keep_t = np.ones((T, J), bool)
        if rcfg.occ_prune_trans > 0:
            eps = rcfg.occ_prune_trans
            keep_h &= np.maximum(tm_h_k, tm_c_k) > eps
            keep_t &= tm_c_k > eps
        if budget_on:
            cand = occ_np.astype(bool).copy()
            cand[0] &= keep_h
            cand[1] &= keep_t
            # never-measured pairs (new geometry) are not candidates
            em = cache.get("ever_measured")
            if em is not None:
                cand &= em
            # per-pair greedy: every ray floored at the pair's max-ray
            # key, so the per-ray ledger reduces to the per-tile summed
            # key (budget_drop_masks with R=1) — coarser than the full
            # per-ray ledger (fewer drops), measured equivalent error
            drop = budget_drop_masks(
                e_h_k.T[:, :, None].astype(np.float32),
                e_t_k.T[:, :, None].astype(np.float32),
                cand, rcfg.occ_prune_budget)  # [2, T, J]
            keep_h &= ~drop[0]
            keep_t &= ~drop[1]
        return keep_h, keep_t

    def _clamp_to_executed(st):
        """config.occ_class_clamp: if the freshly-built state's program
        class was never executed, re-pad it onto the cheapest EXECUTED
        class that dominates it (more padding pairs / tiles, never
        fewer; a far_skip state may land on a with-far class). Output is
        bit-identical — padded pairs hit the dummy tile row and padded
        tiles are flag-masked — so the only cost is padding kernel time,
        and the worker never traces a new program mid-stream."""
        ck = _ck_of(st)
        with _cache_lock:
            execd = list(executed_cks)
        if ck in execd:
            return
        fs = bool(st.get("far_skip", False))
        cands = [e for e in execd
                 if e[0] >= ck[0] and e[1] >= ck[1] and e[2] >= ck[2]
                 and (not e[3] or fs)]
        if not cands:
            return
        # padding cost: ~1 kernel grid step per padded pair; a padded
        # tile adds R_T rays through prep + composite (~2 pairs' worth)
        e = min(cands, key=lambda c: (c[0] - ck[0]) + (c[1] - ck[1])
                + 2 * (c[2] - ck[2]))
        st2 = {}
        set_flags(np.asarray(st["occ"]), tag="clamped-async", into=st2,
                  min_tiles=e[2], min_pairs=(e[0], e[1]))
        st2["far_skip"] = bool(e[3])
        if "far_cmix_err" in st:
            st2["far_cmix_err"] = st["far_cmix_err"]
        if _ck_of(st2) == e:
            st.clear()
            st.update(st2)
        elif os.environ.get("DFANERF_DEBUG_COMPACTION"):
            print(f"[pairs:clamp] rebuild missed {e} (got {_ck_of(st2)});"
                  f" keeping {ck}", flush=True)

    def _refresh_async(inputs, keeps, keep_age, raw_args):
        try:
            st = {}
            occ = occ_fn(inputs)
            carry = (prune_on and rcfg.occ_prune_carry > 0
                     and keeps is not None
                     and keep_age < rcfg.occ_prune_carry)
            if carry:
                occ_np = np.asarray(occ)
                kh, kt = keeps
                set_flags(np.stack([occ_np[0] * kh, occ_np[1] * kt]),
                          tag="pruned-carry-async", into=st)
                update_far_skip([inputs], into=st)
                keep_age += 1
            else:
                set_flags(occ, tag="async", into=st)
                update_far_skip([inputs], into=st)
                if prune_on:
                    kk = None
                    occ_np = np.asarray(st["occ"])
                    if live_keys:
                        n_der = cache.get("derive_ct", 0)
                        cache["derive_ct"] = n_der + 1
                        rm = rcfg.occ_live_remeasure
                        if rm <= 0 or n_der % rm != 0:
                            kk = _derive_keeps_from_keys(occ_np)
                    if kk is None:
                        # full diagnostic derive: render the snapshot at
                        # unpruned counts and measure every pair (the
                        # occ_live_keys re-measure / non-keys path)
                        _, tm_h, tm_c, cb_h, cb_t, *wr = run_pipeline(
                            inputs, diag=True, st=st)
                        kh, kt = prune_flags(
                            tm_h, tm_c, cb_h, cb_t, *wr, st=st,
                            hist=cache.setdefault("hist", {}))
                        em = cache.get("ever_measured")
                        if em is None:
                            em = np.zeros_like(occ_np, bool)
                        cache["ever_measured"] = em | (occ_np > 0)
                    else:
                        kh, kt = kk
                    keeps, keep_age = (kh, kt), 0
                    pruned = np.stack([occ_np[0] * kh, occ_np[1] * kt])
                    if live_keys:
                        em = cache.get("ever_measured")
                        if em is None:
                            em = np.zeros_like(occ_np, bool)
                        cache["ever_measured"] = em | (pruned > 0)
                    set_flags(pruned, tag="pruned-async", into=st)
            if rcfg.occ_class_clamp:
                _clamp_to_executed(st)
            # first-seen pair-count COMPILES happen here, off the stream:
            # building the jit wrappers is not enough (compilation fires
            # at the first call), so a genuinely new program class renders
            # one throwaway frame against the snapshot inputs — the swap
            # stalls on the compile, the served frames never do
            fast_parts(st)
            with _cache_lock:
                seen = _ck_of(st) in executed_cks
            if not seen:
                # run_fast marks the class executed after the blocked
                # dispatch succeeds; a compile failure propagates here and
                # leaves the class unmarked for the next attempt
                jax.block_until_ready(run_fast(*raw_args, st=st))
            worker["result"] = (st, keeps, keep_age)
        except Exception as e:  # noqa: BLE001 — surfaced via _poll_worker
            worker["error"] = e

    def _poll_worker():
        th = worker["thread"]
        if th is None or th.is_alive():
            return
        worker["thread"] = None
        if worker["error"] is not None:
            err, worker["error"] = worker["error"], None
            worker["fails"] += 1
            if worker["fails"] >= 3:
                raise err
            if os.environ.get("DFANERF_DEBUG_COMPACTION"):
                print(f"[pairs:async] refresh failed (retrying next "
                      f"cycle): {err}", flush=True)
            return  # transient (e.g. remote-compile hiccup): serve stale
        st, keeps, keep_age = worker["result"]
        worker["result"] = None
        worker["fails"] = 0
        cache.update({k: st.get(k) for k in _SLOT_KEYS})
        cache["keeps"] = keeps
        cache["keep_age"] = keep_age
        cache["age"] = 1
        # observability: landed-swap count (benchmarks read render.cache
        # to verify the async worker isn't starved — a frozen swap count
        # across a serving window means every frame served stale flags)
        cache["swaps"] = cache.get("swaps", 0) + 1

    def render(params, z_shape, z_app, pose, pose_torso, signal,
               signal_torso, bc_img, window_slot=None):
        if window_slot is not None and cache.get("slots"):
            # pinned per-slot serving (refresh_union(..., per_slot=True)):
            # each window frame renders under ITS OWN pruned flags — no
            # union inflation of the pair lists
            return run_fast(params, z_shape, z_app, pose, pose_torso,
                            signal, signal_torso, bc_img,
                            st=cache["slots"][window_slot
                                              % len(cache["slots"])])
        if (rcfg.occ_async_refresh and cache["lists"] is not None
                and not cache.get("pinned")):
            _poll_worker()
            cache["age"] += 1
            # deterministic trigger jitter (0/1/2 extra frames, cycling
            # per launch): without it the trigger period (refresh_every +
            # 1 + worker latency) can phase-lock against a periodic pose/
            # signal trajectory, so every derive snapshots the SAME
            # phase and the prune history never sees the frames it is
            # applied to (measured: the 8-frame window locked at period
            # 8 and the live error pinned at 0.034 regardless of knobs)
            if (cache["age"] > max(rcfg.occ_refresh_every, 1)
                    + cache.get("rjit", 0)
                    and worker["thread"] is None):
                cache["rjit"] = (cache.get("rjit", 0) + 1) % 3
                inputs = inputs_fn(params, z_shape, z_app, pose,
                                   pose_torso, signal, signal_torso,
                                   bc_img)
                worker["thread"] = _threading.Thread(
                    target=_refresh_async,
                    args=(inputs, cache.get("keeps"),
                          cache.get("keep_age", 0),
                          (params, z_shape, z_app, pose, pose_torso,
                           signal, signal_torso, bc_img)),
                    daemon=True,
                )
                worker["thread"].start()
            return run_fast(params, z_shape, z_app, pose, pose_torso,
                            signal, signal_torso, bc_img)
        refreshed = (cache["lists"] is None
                     or (not cache.get("pinned")
                         and cache["age"] >= max(rcfg.occ_refresh_every, 1)))
        if not refreshed:
            cache["age"] += 1
            return run_fast(params, z_shape, z_app, pose, pose_torso,
                            signal, signal_torso, bc_img)
        inputs = inputs_fn(params, z_shape, z_app, pose, pose_torso,
                           signal, signal_torso, bc_img)
        occ = occ_fn(inputs)
        carry = (prune_on and rcfg.occ_prune_carry > 0
                 and cache.get("keeps") is not None
                 and cache.get("keep_age", 0) < rcfg.occ_prune_carry)
        if carry:
            # cheap refresh: fresh conservative flags AND the carried
            # keep-masks (see config.occ_prune_carry); the refresh frame
            # itself renders on the fast path under the pruned lists
            keep_h, keep_t = cache["keeps"]
            occ_np = np.asarray(occ)
            set_flags(np.stack([occ_np[0] * keep_h, occ_np[1] * keep_t]),
                      tag="pruned-carry")
            cache["keep_age"] += 1
            update_far_skip([inputs])
            cache["age"] = 1
            return run_fast(params, z_shape, z_app, pose, pose_torso,
                            signal, signal_torso, bc_img)
        set_flags(occ)
        update_far_skip([inputs])
        if prune_on:
            # full refresh: prune for the rest of the window from this
            # frame's own composite (live-serving mode: no lookahead)
            imgs, tm_h, tm_c, cb_h, cb_t, *wr = run_pipeline(inputs,
                                                             diag=True)
            keep_h, keep_t = prune_flags(tm_h, tm_c, cb_h, cb_t, *wr,
                                         hist=cache.setdefault("hist", {}))
            cache["keeps"] = (keep_h, keep_t)
            cache["keep_age"] = 0
            occ_np = np.asarray(cache["occ"])
            pruned = np.stack([occ_np[0] * keep_h, occ_np[1] * keep_t])
            set_flags(pruned, tag="pruned")
        else:
            imgs = run_pipeline(inputs)
        cache["age"] = 1  # this frame consumed the refresh
        return imgs

    def fast_parts(st):
        """Diagnostics hook AND async-refresh precompile: the fast-path
        programs for a given flag state. Builds whatever run_fast will
        actually dispatch — the MERGED kern2+finish program when
        merge_finish is on (so the async worker's first-seen pair counts
        compile off the stream), plus the split programs for the stage
        benchmarks. Returns (prep, kern2, finish) split handles."""
        k_u = int(st["tiles_sel"].shape[0])
        prep = _get_or_make(prep_cache, k_u, make_prep)
        if rcfg.occ_pack2:
            ti_h, ti_t = st["lists2"][0][0], st["lists2"][1][0]
        else:
            ti_h, ti_t = st["lists"][0][0], st["lists"][1][0]
        far_skip = bool(st.get("far_skip", False))
        ck = (int(ti_h.shape[0]), int(ti_t.shape[0]), k_u, far_skip)
        if merge_finish:
            _get_or_make(merged_cache, ck,
                         lambda: make_kern2_finish(not far_skip))
        kern2 = _get_or_make(kern2_cache, ck,
                             lambda: make_kern2(not far_skip))
        fk = (far_skip, k_u)
        fin = _get_or_make(finish_cache, fk,
                           lambda: make_finish(not far_skip))
        return prep, kern2, fin

    def precompile_headroom(params, z_shape, z_app, pose, pose_torso,
                            signal, signal_torso, bc_img,
                            scale=1.4, scale_tiles=1.2):
        """Server-start cost: build AND execute one 'headroom' program
        class whose rungs dominate the current state's by the given
        scales (far_skip=False, so it can serve any far state). With
        occ_class_clamp, later refreshes whose drifted pair counts have
        no executed class land here instead of tracing a new program
        mid-stream — the steady-state serving loop then never loses the
        host core to jit tracing (the residual novel-audio cliff).
        Returns the executed class, or None before the first refresh."""
        if cache.get("lists") is None:
            return None
        ck = _ck_of(cache)
        mh = bucket(min(int(np.ceil(ck[0] * scale)), T * J))
        mt_p = bucket(min(int(np.ceil(ck[1] * scale)), T * J))
        mk = bucket(min(int(np.ceil(ck[2] * scale_tiles)), T),
                    tile_buckets)
        st = {}
        set_flags(np.asarray(cache["occ"]), tag="headroom", into=st,
                  min_tiles=mk, min_pairs=(mh, mt_p))
        st["far_skip"] = False
        fast_parts(st)
        jax.block_until_ready(run_fast(
            params, z_shape, z_app, pose, pose_torso, signal,
            signal_torso, bc_img, st=st))
        return _ck_of(st)

    render.inputs_fn = inputs_fn
    render.refresh_union = refresh_union
    render.cache = cache
    render.fast_parts = fast_parts
    render.worker = worker  # async-refresh state (tests/diagnostics)
    render.precompile_headroom = precompile_headroom
    return render


def make_head_hierarchical_renderer(
    cfg: ExperimentConfig, hwfcxy, near: float, far: float
):
    """Head-only coarse+fine full-frame renderer (BASELINE config 2:
    64 coarse + n_importance fine samples, --N_importance path).

    Returns render(params, z_shape, z_app, pose, signal, bc_img_u8)
    -> rgb [H, W, 3]."""
    from dfanerf_tpu.render.fields import render_head_hierarchical

    H, W, focal, cx, cy = hwfcxy
    H, W = int(H), int(W)
    rcfg, dcfg = cfg.render, cfg.decoder
    assert rcfg.n_importance > 0
    tile = min(rcfg.tile_rays, H * W)
    n_pix = H * W
    n_tiles = -(-n_pix // tile)
    n_pad = n_tiles * tile - n_pix

    if (rcfg.use_fused_kernel and rcfg.occ_pair_compaction
            and rcfg.occ_sigma_thresh > 0):
        return _make_hier_pair_renderer(cfg, hwfcxy, near, far)

    if rcfg.use_fused_kernel:
        from dfanerf_tpu.core.compositing import volume_render
        from dfanerf_tpu.core.sampling import hierarchical_z_vals
        from dfanerf_tpu.ops.fused_render import (
            fused_render_head,
            fused_sigma_head,
            occupancy_flags_and_sat,
            spatial_tile_permutation,
        )
        from dfanerf_tpu.ops.pack import pack_field_weights

        assert rcfg.concate_bg
        # the fine pass marches the sorted coarse+fine union
        assert rcfg.n_samples % 8 == 0
        assert (rcfg.n_samples + rcfg.n_importance) % 8 == 0

        # Both passes run as Pallas kernels over spatially-coherent 16x16
        # ray tiles with conservative per-(tile, slab) occupancy flags
        # (+ ERT on the fine march):
        #   coarse — the sigma-only kernel (trunk forward, no rgb/view
        #     work); empty slabs skip the trunk entirely, writing sigma=0,
        #     which is EXACT for the resample (zero importance weight);
        #   fine  — the per-ray-z head kernel; tiles whose importance
        #     samples all land in empty space (background rays: zero
        #     coarse weights spread the det resample uniformly) skip
        #     whole slabs of full field evaluation.
        # Five jit programs with device-resident intermediates: the
        # Pallas calls stay alone in theirs (composed-program kernel-fault
        # rule, see ops/fused_render.py) and no stage needs a host sync —
        # the flags feed scalar prefetch as device arrays.
        perm = spatial_tile_permutation(H, W)
        n_perm = int(perm.shape[0])
        z_c = jnp.linspace(near, far, rcfg.n_samples)

        @jax.jit
        def prep_fn(params, z_shape, z_app, pose, signal, bc_img):
            rays_o, rays_d = get_rays(H, W, focal, pose, cx, cy)
            ro = rays_o.reshape(-1, 3)[perm]
            rd = rays_d.reshape(-1, 3)[perm]
            bc = (bc_img.reshape(-1, 3).astype(jnp.float32) / 255.0)[perm]
            pw = pack_field_weights(
                params["decoder"], dcfg, signal, z_shape[0], z_app[0],
                "head",
                param_dtype=(jnp.bfloat16
                             if rcfg.compute_dtype == "bfloat16"
                             else jnp.float32),
            )
            return pw, ro, rd, bc

        @jax.jit
        def coarse_flags_fn(pw, ro, rd):
            if rcfg.occ_sigma_thresh <= 0:
                return None, None
            zb = jnp.broadcast_to(z_c, (n_perm, rcfg.n_samples))
            return occupancy_flags_and_sat(
                pw, "head", ro, rd, zb, rcfg.occ_sigma_thresh,
                grid_res=rcfg.occ_grid_res,
                act=cfg.decoder.density_activation,
            )

        @jax.jit
        def sigma_fn(pw, ro, rd, occ):
            return fused_sigma_head(pw, ro, rd, z_c, occupancy=occ,
                                    act=cfg.decoder.density_activation)

        @jax.jit
        def resample_fn(pw, ro, rd, sigma_c, sat_cache):
            # coarse weights -> det inverse-CDF fine depths (render_rays'
            # 'fine' branch keeps only the fine rgb,
            # run_nerf_com_trainExpLater.py:122-124) -> fine-pass flags
            # (reusing the coarse pass's SAT: same field, fine depths
            # inside the same [near, far] AABB)
            sigma_c = sigma_c.at[:, -1].add(1e-6)  # bg-concat density bump
            z_b = jnp.broadcast_to(z_c, (n_perm, rcfg.n_samples))
            _, weights = volume_render(
                z_b, rd, sigma_c[None],
                jnp.zeros((1, n_perm, rcfg.n_samples, 3)),
                last_dist=rcfg.last_dist,
            )
            z_fine = hierarchical_z_vals(
                z_b, weights, rcfg.n_importance, det=True
            )
            occ_f = occupancy_flags_and_sat(
                pw, "head", ro, rd, z_fine, rcfg.occ_sigma_thresh,
                grid_res=rcfg.occ_grid_res, sat_cache=sat_cache,
                act=cfg.decoder.density_activation,
            )[0] if rcfg.occ_sigma_thresh > 0 else None
            return z_fine, occ_f

        @jax.jit
        def fine_fn(pw, ro, rd, z_fine, bc, occ_f):
            return fused_render_head(
                pw, ro, rd, z_fine, bc, last_dist=rcfg.last_dist,
                ert_eps=rcfg.ert_eps, occupancy=occ_f,
                act=cfg.decoder.density_activation,
            )

        @jax.jit
        def finish_fn(rgb_p):
            return jnp.zeros((H * W, 3)).at[perm].set(rgb_p).reshape(H, W, 3)

        def render_fused(params, z_shape, z_app, pose, signal, bc_img):
            pw, ro, rd, bc = prep_fn(
                params, z_shape, z_app, pose, signal, bc_img)
            occ_c, sat_cache = coarse_flags_fn(pw, ro, rd)
            sigma_c = sigma_fn(pw, ro, rd, occ_c)
            z_fine, occ_f = resample_fn(pw, ro, rd, sigma_c, sat_cache)
            rgb_p = fine_fn(pw, ro, rd, z_fine, bc, occ_f)
            return finish_fn(rgb_p)

        return render_fused

    @jax.jit
    def render(params, z_shape, z_app, pose, signal, bc_img):
        rays_o, rays_d = get_rays(H, W, focal, pose, cx, cy)
        bc = bc_img.reshape(-1, 3).astype(jnp.float32) / 255.0

        def pad_tile(x):
            x = x.reshape(n_pix, -1)
            x = jnp.concatenate([x, jnp.zeros((n_pad, x.shape[-1]), x.dtype)], 0)
            return x.reshape(n_tiles, tile, -1)

        ro, rd, bcp = pad_tile(rays_o), pad_tile(rays_d), pad_tile(bc)
        z_vals = stratified_z_vals(near, far, tile, rcfg.n_samples)

        def body(args):
            o, d, b = args
            return render_head_hierarchical(
                params["decoder"], dcfg, rcfg, o, d, z_vals,
                signal, z_shape[0], z_app[0], b,
            )

        rgb = jax.lax.map(body, (ro, rd, bcp))
        return rgb.reshape(-1, 3)[:n_pix].reshape(H, W, 3)

    return render


def _make_hier_pair_renderer(cfg: ExperimentConfig, hwfcxy, near: float,
                             far: float):
    """Pair-compacted hierarchical serving path (BASELINE config 2).

    The (T, J)-grid hierarchical kernels predicate skipped slabs with
    pl.when — at 450p that is ~7k coarse + ~20k fine grid steps per frame,
    most of them background, and every background tile still runs a full
    final-slab field evaluation for the bg catch-all. Here both passes run
    pair-compacted (ops/fused_render.py pair_sigma_eval /
    pair_field_eval_perz), compositing is deferred to XLA with per-ray
    dists, and the catch-all costs nothing: with last_dist >= 1e8 its
    alpha is exactly 1.0 in f32, so head = acc + t_final * bc
    (deferred_composite_head). Tiles with no coarse occupancy anywhere
    output the background pixel directly — sound, because the fine depths
    lie in the same [near, far] frustum the coarse SAT test cleared.

    Per frame: prep -> coarse flags+SAT -> [host sync ~7 KB: union tiles +
    coarse pair list] -> gather + sigma pair kernel -> resample (weights,
    fine union z, fine flags via the SAME SAT) -> [host sync ~20 KB: fine
    pair list] -> fine pair kernel -> composite+scatter. Pair/tile counts
    are bucketed so steady state reuses a handful of compiled programs.
    """
    from dfanerf_tpu.core.compositing import calc_volume_weights
    from dfanerf_tpu.core.sampling import hierarchical_z_vals
    from dfanerf_tpu.ops.fused_render import (
        R_T, S_SLAB, deferred_composite_head, occupancy_flags_and_sat,
        pair_field_eval_perz, pair_sigma_eval, spatial_tile_permutation,
    )
    from dfanerf_tpu.ops.pack import pack_field_weights

    H, W, focal, cx, cy = hwfcxy
    H, W = int(H), int(W)
    rcfg, dcfg = cfg.render, cfg.decoder
    act = dcfg.density_activation
    pdt = (jnp.bfloat16 if rcfg.compute_dtype == "bfloat16"
           else jnp.float32)
    S_c = rcfg.n_samples
    S_f = S_c + rcfg.n_importance
    assert S_c % S_SLAB == 0 and S_f % S_SLAB == 0
    J_c, J_f = S_c // S_SLAB, S_f // S_SLAB
    perm = spatial_tile_permutation(H, W)
    n_perm = int(perm.shape[0])
    T = n_perm // R_T
    hb, wb = -(-H // 16), -(-W // 16)
    z_c = jnp.linspace(near, far, S_c)

    # tiled ray generation + bc tiling (same construction as the pair
    # serving path: elementwise rotation of precomputed camera-space dirs)
    _cx = W * 0.5 if cx is None else cx
    _cy = H * 0.5 if cy is None else cy
    _iy = np.minimum(np.arange(hb * 16), H - 1)
    _ix = np.minimum(np.arange(wb * 16), W - 1)
    _ii, _jj = np.meshgrid(_ix, _iy, indexing="xy")
    _dirs = np.stack(
        [(_ii - _cx) / focal, -(_jj - _cy) / focal,
         -np.ones_like(_ii, np.float32)], axis=-1
    ).astype(np.float32)
    dirs_tiled = jnp.asarray(
        _dirs.reshape(hb, 16, wb, 16, 3).transpose(
            0, 2, 1, 3, 4).reshape(hb * wb * 256, 3))

    def tiled_rays(pose):
        R = pose[:3, :3]
        rd = (dirs_tiled[:, 0:1] * R[:, 0][None]
              + dirs_tiled[:, 1:2] * R[:, 1][None]
              + dirs_tiled[:, 2:3] * R[:, 2][None])
        return jnp.broadcast_to(pose[:3, -1], rd.shape), rd

    def tile_order(img):
        v = jnp.pad(img, ((0, hb * 16 - H), (0, wb * 16 - W), (0, 0)),
                    mode="edge")
        return v.reshape(hb, 16, wb, 16, -1).transpose(
            0, 2, 1, 3, 4).reshape(hb * wb * 256, -1)

    def unpermute(v):
        return v.reshape(hb, wb, 16, 16, 3).transpose(
            0, 2, 1, 3, 4).reshape(hb * 16, wb * 16, 3)[:H, :W]

    @jax.jit
    def prep_fn(params, z_shape, z_app, pose, signal, bc_img):
        pw = pack_field_weights(
            params["decoder"], dcfg, signal, z_shape[0], z_app[0], "head",
            param_dtype=pdt,
        )
        ro, rd = tiled_rays(pose)
        bc_p = tile_order(bc_img.astype(jnp.float32) / 255.0)
        return pw, ro, rd, bc_p

    @jax.jit
    def coarse_flags_fn(pw, ro, rd):
        zb = jnp.broadcast_to(z_c, (n_perm, S_c))
        return occupancy_flags_and_sat(
            pw, "head", ro, rd, zb, rcfg.occ_sigma_thresh,
            grid_res=rcfg.occ_grid_res, act=act,
        )

    gather_cache = {}

    def get_gather(k_u):
        if k_u not in gather_cache:
            @jax.jit
            def g(ro, rd, bc_p, tiles_sel):
                sel = lambda x: x.reshape(T, R_T, 3)[tiles_sel].reshape(
                    -1, 3)
                return sel(ro), sel(rd), sel(bc_p)

            gather_cache[k_u] = g
        return gather_cache[k_u]

    sigma_cache = {}

    def get_sigma(kp, k_u):
        key = (kp, k_u)
        if key not in sigma_cache:
            @jax.jit
            def f(pw, ro_g, rd_g, ti, ji):
                return pair_sigma_eval(pw, ro_g, rd_g, z_c, ti, ji, act=act)

            sigma_cache[key] = f
        return sigma_cache[key]

    resample_cache = {}

    def get_resample(k_u):
        if k_u not in resample_cache:
            n_u = k_u * R_T

            @jax.jit
            def f(pw, ro_g, rd_g, sig_buf, occ_sub, sat, lo, span):
                flag = occ_sub.astype(bool).T[:, None, :, None]
                x = sig_buf.reshape(J_c, S_SLAB, k_u + 1, R_T)[:, :, :k_u]
                x = jnp.where(flag, x, 0.0).reshape(S_c, n_u)
                sigma_c = x.T.at[:, -1].add(1e-6)  # bg-concat density bump
                z_b = jnp.broadcast_to(z_c, (n_u, S_c))
                # weights only (volume_render with a zero feature map just
                # wastes an [n, S, 3] accumulate); same math bit for bit
                weights = calc_volume_weights(z_b, rd_g, sigma_c,
                                              last_dist=rcfg.last_dist)
                z_fine = hierarchical_z_vals(
                    z_b, weights, rcfg.n_importance, det=True)  # [n_u, S_f]
                occ_f, _ = occupancy_flags_and_sat(
                    pw, "head", ro_g, rd_g, z_fine, rcfg.occ_sigma_thresh,
                    grid_res=rcfg.occ_grid_res, sat_cache=(sat, lo, span),
                    act=act,
                )
                # The geometric flags have no notion of visibility, and the
                # sorted union's index-slabs hug the surface (tight AABBs),
                # so nearly every union-tile slab tests occupied. Two
                # coarse-march prunes (the fine-pass analogue of the
                # serving path's occ_prune_* levers; VERDICT r3 #3):
                #  - transmittance: drop fine slabs whose tile-max coarse
                #    transmittance at the slab's earliest depth is below
                #    occ_prune_trans (everything behind the saturated
                #    surface; T_prev = 1 - cumsum(weights) exactly);
                #  - contribution: drop whole tiles whose max-ray summed
                #    coarse weight (catch-all excluded) is below
                #    occ_prune_contrib — conservative-dilation tiles where
                #    the coarse march found nothing render as background.
                # Both are tile-max/min bounds (conservative across the
                # tile's rays); realized error is covered by the
                # benchmarks' max-error-vs-noskip discipline.
                if rcfg.occ_prune_trans > 0:
                    t_prev = 1.0 - jnp.concatenate(
                        [jnp.zeros((n_u, 1)),
                         jnp.cumsum(weights, axis=1)[:, :-1]], axis=1)
                    t_tile = t_prev.reshape(k_u, R_T, S_c).max(1)
                    z0 = z_fine[:, ::S_SLAB]
                    z0_tile = z0.reshape(k_u, R_T, J_f).min(1)
                    # T at the first coarse sample >= z0 (T is monotone
                    # decreasing, so a masked max selects exactly it)
                    t_at = jnp.where(
                        z_c[None, None, :] >= z0_tile[:, :, None],
                        t_tile[:, None, :], 0.0,
                    ).max(-1)
                    occ_f = occ_f * (t_at > rcfg.occ_prune_trans)
                if rcfg.occ_prune_contrib > 0:
                    # per-(tile, slab) coarse-mass prune: the compositing
                    # mass the coarse march found inside the fine slab's
                    # z-range (catch-all weight excluded) bounds what the
                    # fine march can composite there. Mass is distributed
                    # piecewise-uniformly over each coarse bin
                    # [z_k, z_{k+1}] (the same CDF model sample_pdf
                    # inverts) — an importance-cluster slab NARROWER than
                    # the coarse spacing then gets its overlap fraction of
                    # the surface bin's weight, not a spurious zero.
                    # Tile-max over rays keeps the bound conservative per
                    # tile. The drop is BUDGETED, not thresholded: a
                    # per-slab threshold lets J_f individually-small slabs
                    # lose O(J_f * eps) total mass (measured 0.025 at
                    # eps=3e-3); instead drop the largest set of
                    # smallest-mass slabs whose summed tile-max mass stays
                    # under occ_prune_contrib, so the realized per-tile
                    # composite error is bounded by the budget itself.
                    w_bins = weights[:, :-1]  # [n_u, S_c-1] bin weights
                    z_lo_s = z_fine[:, ::S_SLAB]          # [n_u, J_f]
                    z_hi_s = z_fine[:, S_SLAB - 1::S_SLAB]
                    zb0, zb1 = z_c[:-1], z_c[1:]
                    ov = (jnp.minimum(z_hi_s[:, :, None], zb1[None, None])
                          - jnp.maximum(z_lo_s[:, :, None],
                                        zb0[None, None]))
                    frac = jnp.clip(
                        ov / (zb1 - zb0)[None, None], 0.0, 1.0)
                    mass = (w_bins[:, None, :] * frac).sum(-1)  # [n_u,J_f]
                    mass_tile = mass.reshape(k_u, R_T, J_f).max(1)
                    # already-dropped slabs (geometric miss / trans prune)
                    # must not eat the budget
                    mass_tile = jnp.where(occ_f > 0, mass_tile, 0.0)
                    order = jnp.argsort(mass_tile, axis=1)
                    cum = jnp.cumsum(
                        jnp.take_along_axis(mass_tile, order, axis=1),
                        axis=1)
                    drop = jnp.zeros(
                        (k_u, J_f), bool
                    ).at[jnp.arange(k_u)[:, None], order].set(
                        cum <= rcfg.occ_prune_contrib)
                    occ_f = occ_f * (~drop)
                zf = z_fine.astype(jnp.float32)
                z_buf = zf.reshape(k_u, R_T, J_f, S_SLAB).transpose(
                    2, 3, 0, 1).reshape(J_f, S_SLAB, n_u)
                z_buf = jnp.concatenate(
                    [z_buf, jnp.zeros((J_f, S_SLAB, R_T))], axis=2)
                diffs = jnp.concatenate(
                    [zf[:, 1:] - zf[:, :-1], jnp.zeros((n_u, 1))], axis=1)
                dists = (diffs * jnp.linalg.norm(
                    rd_g.astype(jnp.float32), axis=-1, keepdims=True)).T
                return z_buf, dists, occ_f

            resample_cache[k_u] = f
        return resample_cache[k_u]

    fine_cache = {}

    def get_fine(kp, k_u):
        key = (kp, k_u)
        if key not in fine_cache:
            @jax.jit
            def f(pw, ro_g, rd_g, z_buf, ti, ji):
                return pair_field_eval_perz(pw, ro_g, rd_g, z_buf, ti, ji,
                                            act=act)

            fine_cache[key] = f
        return fine_cache[key]

    finish_cache = {}

    def get_finish(k_u):
        if k_u not in finish_cache:
            @jax.jit
            def f(buf, occ_f, list_mask, dists, bc_g, bc_p, tiles_scatter):
                # effective composite mask: the FRESH per-frame fine flags
                # (device-resident — no host sync) AND the pair list the
                # kernel actually ran (padding tile rows are zero in
                # list_mask): reads of unwritten buffer blocks stay
                # masked, and pairs the stale list missed render as if
                # pruned (the carry staleness the benchmarks measure)
                occ_dev = occ_f * list_mask
                head_u = deferred_composite_head(buf, occ_dev, dists, bc_g)
                base = bc_p.reshape(T, R_T, 3)
                full = jnp.concatenate(
                    [base, jnp.zeros((1, R_T, 3))], axis=0)
                full = full.at[tiles_scatter].set(
                    head_u.reshape(-1, R_T, 3))
                return unpermute(full[:T].reshape(-1, 3))

            finish_cache[k_u] = f
        return finish_cache[k_u]

    tile_ladder = [k for k in (64, 128, 192, 256, 320, 416, 512, 672)
                   if k < T] + [T]
    pair_ladder = ([0, 128, 256] + list(range(320, 2049, 64))
                   + list(range(2304, 8193, 256)) + [T * J_f])

    def bucket(c, ladder):
        return next(b for b in ladder if b >= c)

    def pair_list(occ_np, k_u):
        """Bucketed (tile, slab) pair lists in COMPACT tile coords from
        [k_u, J] numpy flags (padding rows already zeroed); padding pairs
        target the dummy tile row k_u."""
        t_i, j_i = np.nonzero(occ_np)
        order = np.lexsort((j_i, t_i))
        t_i, j_i = t_i[order], j_i[order]
        pad = bucket(len(t_i), pair_ladder) - len(t_i)
        t_i = np.concatenate([t_i, np.full(pad, k_u)]).astype(np.int32)
        j_i = np.concatenate([j_i, np.zeros(pad)]).astype(np.int32)
        return jnp.asarray(t_i), jnp.asarray(j_i)

    # refresh-carry state (rcfg.occ_refresh_every, same staleness
    # discipline as the serving path): the host-synced artifacts — union
    # tiles, coarse pair list, the SAT, and the FINE pair list — are
    # rebuilt every N frames; in between the frame runs with ZERO host
    # syncs (prep -> sigma -> resample -> fine -> finish, all async
    # dispatch), compositing under the fresh device-side fine flags ANDed
    # with the carried pair list. Importance mass that moves OUTSIDE the
    # carried list within a window renders as pruned; the benchmarks'
    # max-error-vs-noskip discipline measures exactly that staleness.
    hcache = {"age": 0}

    def _refresh(pw, ro, rd, bc_p):
        occ_c, (sat, lo, span) = coarse_flags_fn(pw, ro, rd)
        occ_c_np = np.asarray(occ_c)  # host sync ~7 KB
        tiles_u = np.nonzero(occ_c_np.max(axis=1))[0]
        if len(tiles_u) == 0:
            hcache.clear()
            hcache.update(age=0, empty=True)
            return
        k_u = bucket(len(tiles_u), tile_ladder)
        tiles_sel = np.concatenate(
            [tiles_u, np.zeros(k_u - len(tiles_u))]).astype(np.int32)
        tiles_scatter = tiles_sel.copy()
        tiles_scatter[len(tiles_u):] = T  # dummy row for padding tiles
        occ_sub = occ_c_np[tiles_sel]
        occ_sub[len(tiles_u):] = 0
        ti_c, ji_c = pair_list(occ_sub, k_u)
        ro_g, rd_g, bc_g = get_gather(k_u)(ro, rd, bc_p,
                                           jnp.asarray(tiles_sel))
        sig_buf = get_sigma(int(ti_c.shape[0]), k_u)(
            pw, ro_g, rd_g, ti_c, ji_c)
        z_buf, dists, occ_f = get_resample(k_u)(
            pw, ro_g, rd_g, sig_buf, jnp.asarray(occ_sub), sat, lo, span)
        occ_f_np = np.array(occ_f)  # host sync ~20 KB (writable copy)
        occ_f_np[len(tiles_u):] = 0
        ti_f, ji_f = pair_list(occ_f_np > 0, k_u)
        if os.environ.get("DFANERF_DEBUG_HIER"):
            print(f"[hier] tiles_u={len(tiles_u)} k_u={k_u} "
                  f"coarse_pairs={int(occ_sub.sum())} "
                  f"fine_pairs={int((occ_f_np > 0).sum())} "
                  f"(buckets {int(ti_c.shape[0])}/{int(ti_f.shape[0])})",
                  flush=True)
        hcache.update(
            age=0, empty=False, k_u=k_u, n_real=len(tiles_u),
            sat=(sat, lo, span),
            tiles_sel=jnp.asarray(tiles_sel),
            tiles_scatter=jnp.asarray(tiles_scatter),
            occ_sub=jnp.asarray(occ_sub),
            ti_c=ti_c, ji_c=ji_c, ti_f=ti_f, ji_f=ji_f,
            list_mask=jnp.asarray((occ_f_np > 0).astype(np.float32)),
            # the refresh frame's own device intermediates: its render
            # reuses them instead of re-running gather/sigma/resample
            frame0=(ro_g, rd_g, bc_g, z_buf, dists, occ_f),
        )

    def render(params, z_shape, z_app, pose, signal, bc_img):
        trace = []
        if os.environ.get("DFANERF_DEBUG_HIER_T"):
            import time as _time

            def _mark(tag, out):
                jax.block_until_ready(out)
                trace.append((tag, _time.time()))

            _mark("start", ())
        else:
            def _mark(tag, out):
                pass
        pw, ro, rd, bc_p = prep_fn(params, z_shape, z_app, pose, signal,
                                   bc_img)
        _mark("prep", bc_p)
        refresh_n = max(int(rcfg.occ_refresh_every), 1)
        if "empty" not in hcache or hcache["age"] >= refresh_n:
            _refresh(pw, ro, rd, bc_p)
            _mark("refresh", bc_p)
        hcache["age"] += 1
        if hcache["empty"]:
            # nothing occupied anywhere: every ray is t=1 background
            return unpermute(bc_p)
        k_u = hcache["k_u"]
        if hcache.get("frame0") is not None:
            # this IS the refresh frame: reuse its intermediates
            ro_g, rd_g, bc_g, z_buf, dists, occ_f = hcache.pop("frame0")
            _mark("sigma_kernel", ())
            _mark("resample", ())
        else:
            sat, lo, span = hcache["sat"]
            ro_g, rd_g, bc_g = get_gather(k_u)(ro, rd, bc_p,
                                               hcache["tiles_sel"])
            sig_buf = get_sigma(int(hcache["ti_c"].shape[0]), k_u)(
                pw, ro_g, rd_g, hcache["ti_c"], hcache["ji_c"])
            _mark("sigma_kernel", sig_buf)
            z_buf, dists, occ_f = get_resample(k_u)(
                pw, ro_g, rd_g, sig_buf, hcache["occ_sub"], sat, lo, span)
            _mark("resample", occ_f)
        buf = get_fine(int(hcache["ti_f"].shape[0]), k_u)(
            pw, ro_g, rd_g, z_buf, hcache["ti_f"], hcache["ji_f"])
        _mark("fine_kernel", buf)
        out = get_finish(k_u)(buf, occ_f, hcache["list_mask"], dists,
                              bc_g, bc_p, hcache["tiles_scatter"])
        if trace:
            _mark("finish", out)
            msg = " ".join(
                f"{tag}={1e3 * (t1 - t0):.1f}ms"
                for (_, t0), (tag, t1) in zip(trace, trace[1:]))
            print(f"[hier:t] {msg}", flush=True)
        return out

    return render


def encode_frame_signals(
    params,
    auds: jnp.ndarray,
    exps: jnp.ndarray,
    poses: jnp.ndarray,
    img_i,
    n_valid: int,
    cfg: ExperimentConfig,
    use_smoothing: bool,
):
    """Host-callable helper: conditioning signals for one frame (jitted)."""
    img_i = jnp.asarray(img_i, jnp.int32)
    sig = encode_signal(
        params, auds, exps, img_i, jnp.int32(n_valid), cfg.signal.smo_size,
        jnp.asarray(use_smoothing), cfg.signal.audio_net, cfg.signal.win_size,
    )
    sig_t = encode_signal_torso(
        params, poses, img_i, jnp.int32(n_valid), cfg.signal.smo_torso_size,
        jnp.asarray(use_smoothing), cfg.signal.et_multires,
    )
    return sig, sig_t


def render_video_frames(
    state,
    data: Dict[str, jnp.ndarray],
    cfg: ExperimentConfig,
    hwfcxy,
    near: float,
    far: float,
    frame_indices,
    pose_body: Optional[jnp.ndarray] = None,
    use_smoothing: bool = True,
) -> np.ndarray:
    """Render a sequence of frames (the --render_person path).

    The torso camera is pinned to ``pose_body`` (the reference uses the
    first TRAIN frame's pose for every rendered frame, :460,:644-646).
    Returns uint8 composite frames [T, H, W, 3] and head-only frames
    [T, H, W, 3] (the reference writes both render_com/ and render_head/,
    run_nerf_com_trainExpLater.py:717-723).
    """
    render = make_frame_renderer(cfg, hwfcxy, near, far)
    sig_fn = jax.jit(
        lambda p, i: encode_frame_signals(
            p, data["auds"], data["exps"], data["poses"], i,
            data["auds"].shape[0], cfg, use_smoothing,
        )
    )
    if pose_body is None:
        pose_body = data["poses"][0]
    out_com, out_head = [], []
    for i in frame_indices:
        sig, sig_t = sig_fn(state["params"], jnp.int32(i))
        rgb_head, rgb_com = render(
            state["params"], state["z_shape"], state["z_app"],
            data["poses"][i], pose_body, sig, sig_t, data["bc_img"],
        )
        out_com.append(np.asarray(jnp.clip(rgb_com, 0, 1) * 255).astype(np.uint8))
        out_head.append(np.asarray(jnp.clip(rgb_head, 0, 1) * 255).astype(np.uint8))
    return np.stack(out_com), np.stack(out_head)
