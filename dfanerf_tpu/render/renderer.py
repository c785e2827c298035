"""Full-frame renderer: HBM-resident tiled rendering.

The reference renders a frame as ~99 Python-loop chunks of 2048 rays with a
host round-trip per chunk (run_nerf_com_trainExpLater.py:653-659). Here the
whole frame is one jitted program: rays are reshaped into fixed-size tiles
and swept with ``lax.map`` — sequential on-device execution, zero host
involvement, one compilation. (The fused Pallas kernel in ops/ replaces the
per-tile body for the speed-of-light path.)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dfanerf_tpu.config import ExperimentConfig
from dfanerf_tpu.core.rays import get_rays
from dfanerf_tpu.core.sampling import stratified_z_vals
from dfanerf_tpu.render.fields import render_ray_batch
from dfanerf_tpu.train.signals import encode_signal, encode_signal_torso


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
        use_tiles = rcfg.spatial_tiles or rcfg.occ_sigma_thresh > 0
        perm = spatial_tile_permutation(H, W) if use_tiles else None
        z_vals_c = jnp.linspace(near, far, rcfg.n_samples)

        def frame_inputs(params, z_shape, z_app, pose, pose_torso,
                         signal, signal_torso, bc_img):
            rays_o, rays_d = get_rays(H, W, focal, pose, cx, cy)
            rays_o_t, rays_d_t = get_rays(H, W, focal, pose_torso, cx, cy)
            bc = bc_img.reshape(-1, 3).astype(jnp.float32) / 255.0

            def maybe_perm(x):
                return x[perm] if perm is not None else x

            ro = maybe_perm(rays_o.reshape(-1, 3))
            rd = maybe_perm(rays_d.reshape(-1, 3))
            ro_t = maybe_perm(rays_o_t.reshape(-1, 3))
            rd_t = maybe_perm(rays_d_t.reshape(-1, 3))
            bc_p = maybe_perm(bc)
            pw_h = pack_field_weights(
                params["decoder"], dcfg, signal, z_shape[0], z_app[0], "head"
            )
            pw_t = pack_field_weights(
                params["decoder"], dcfg, signal_torso, z_shape[1], z_app[1],
                "torso",
            )
            return pw_h, pw_t, ro, rd, ro_t, rd_t, bc_p

        def unpermute(rgb_head_p, rgb_com_p):
            if perm is not None:
                rgb_head = jnp.zeros((H * W, 3)).at[perm].set(rgb_head_p)
                rgb_com = jnp.zeros((H * W, 3)).at[perm].set(rgb_com_p)
            else:
                rgb_head, rgb_com = rgb_head_p, rgb_com_p
            return rgb_head.reshape(H, W, 3), rgb_com.reshape(H, W, 3)

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
                    last_dist=rcfg.last_dist, ert_eps=rcfg.ert_eps,
                )
                return unpermute(rgb_head_p, rgb_com_p)

            return render_frame_fused

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
                )

            @jax.jit
            def occ_render_fn(inputs, occ):
                pw_h, pw_t, ro, rd, ro_t, rd_t, bc_p = inputs
                rgb_head_p, rgb_com_p = fused_render_rays(
                    pw_h, pw_t, ro, rd, ro_t, rd_t, z_vals_c, bc_p,
                    last_dist=rcfg.last_dist, ert_eps=rcfg.ert_eps,
                    occupancy=occ, bg_epilogue=True,
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

        # --- occupancy serving path: flags -> tile compaction -> kernel ---
        # The kernel pays a fixed per-grid-step cost even for fully skipped
        # slabs; compacting the grid to just the occupied tiles (bg-only
        # tiles need nothing but the per-ray bg epilogue) removes it. The
        # occupied-tile count is data-dependent, so the caller picks a
        # static bucket K per frame from a one-scalar host sync.
        #
        # The tile gather, the Pallas kernel, and the bg-epilogue + scatter
        # each run as a SEPARATE jit program: composing them into one XLA
        # program trips a TPU runtime kernel fault on this toolchain even
        # though the kernel program alone is clean at every grid size.
        # Intermediates stay on device across the jit boundaries, so the
        # split costs only a few extra dispatches per frame.
        T = len(perm) // R_T

        @jax.jit
        def inputs_fn(params, z_shape, z_app, pose, pose_torso,
                      signal, signal_torso, bc_img):
            return frame_inputs(params, z_shape, z_app, pose, pose_torso,
                                signal, signal_torso, bc_img)

        @jax.jit
        def occ_joint_fn(inputs):
            pw_h, pw_t, ro, rd, ro_t, rd_t, bc_p = inputs
            return conservative_occupancy(
                pw_h, pw_t, ro, rd, ro_t, rd_t, z_vals_c,
                rcfg.occ_sigma_thresh, grid_res=rcfg.occ_grid_res,
            ).max(axis=0)  # joint [T, J]

        def make_parts(K):
            @jax.jit
            def gather_k(inputs, order):
                # order [T] (occupied tiles first) arrives CONCRETE from
                # the host sync; the gather runs in its own XLA program
                pw_h, pw_t, ro, rd, ro_t, rd_t, bc_p = inputs
                sel, rest = order[:K], order[K:]

                def tiles(x, idx):
                    return x.reshape(T, R_T, -1)[idx].reshape(-1, x.shape[-1])

                return ([tiles(x, sel) for x in (ro, rd, ro_t, rd_t, bc_p)],
                        [tiles(x, rest) for x in (ro, rd, ro_t, rd_t, bc_p)])

            @jax.jit
            def kernel_k(pw_h, pw_t, ro, rd, ro_t, rd_t, bc, occ_sel):
                # the Pallas program, alone in its jit (the known-good
                # standalone shape)
                return fused_render_rays(
                    pw_h, pw_t, ro, rd, ro_t, rd_t, z_vals_c, bc,
                    last_dist=rcfg.last_dist, ert_eps=rcfg.ert_eps,
                    occupancy=occ_sel, bg_epilogue=True,
                )

            @jax.jit
            def scatter_k(pw_h, pw_t, rest, h_c, c_c, order):
                # background-only tiles: nothing reaches the kernel — their
                # whole render IS the bg catch-all sample (t=1, acc=0)
                ro, rd, ro_t, rd_t, bc = rest
                n_rest = (T - K) * R_T
                h_r, c_r = _bg_epilogue(
                    pw_h, pw_t, ro, rd, ro_t, rd_t, z_vals_c, bc,
                    rcfg.last_dist,
                    jnp.zeros((n_rest, 3)), jnp.zeros((n_rest, 3)),
                    jnp.ones((n_rest, 1)), jnp.ones((n_rest, 1)),
                )
                head = jnp.zeros((T, R_T, 3)).at[order].set(
                    jnp.concatenate([h_c.reshape(K, R_T, 3),
                                     h_r.reshape(T - K, R_T, 3)])
                ).reshape(-1, 3)
                com = jnp.zeros((T, R_T, 3)).at[order].set(
                    jnp.concatenate([c_c.reshape(K, R_T, 3),
                                     c_r.reshape(T - K, R_T, 3)])
                ).reshape(-1, 3)
                return unpermute(head, com)

            return gather_k, kernel_k, scatter_k

        buckets = [k for k in (64, 128, 256, 512) if k < T] + [T]
        parts_cache = {}
        cache = {"order": None, "K": None, "occ_sel": None, "age": 0}

        def render_frame_occ(params, z_shape, z_app, pose, pose_torso,
                             signal, signal_torso, bc_img):
            inputs = inputs_fn(params, z_shape, z_app, pose, pose_torso,
                               signal, signal_torso, bc_img)
            if (cache["order"] is None
                    or cache["age"] >= max(rcfg.occ_refresh_every, 1)):
                # host sync (~27 KB): pick the bucket and fix the tile
                # order so the kernel's scalar-prefetch flags are concrete
                occ_np = np.asarray(occ_joint_fn(inputs))
                tile_on = occ_np.max(axis=1)
                count = int((tile_on > 0).sum())
                K = next(k for k in buckets if k >= count)
                import os as _os
                if _os.environ.get("DFANERF_DEBUG_COMPACTION"):
                    print(f"[compaction] T={T} occupied={count} K={K} "
                          f"slab_density={occ_np.mean():.4f}", flush=True)
                order = np.argsort(-tile_on, kind="stable").astype(np.int32)
                cache.update(order=jnp.asarray(order), K=K,
                             occ_sel=jnp.asarray(occ_np[order[:K]]), age=0)
            cache["age"] += 1
            K = cache["K"]
            if K not in parts_cache:
                parts_cache[K] = make_parts(K)
            gather_k, kernel_k, scatter_k = parts_cache[K]
            pw_h, pw_t = inputs[0], inputs[1]
            sel, rest = gather_k(inputs, cache["order"])
            h_c, c_c = kernel_k(pw_h, pw_t, *sel, cache["occ_sel"])
            return scatter_k(pw_h, pw_t, rest, h_c, c_c, cache["order"])

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

    if rcfg.use_fused_kernel:
        from dfanerf_tpu.core.compositing import volume_render
        from dfanerf_tpu.core.sampling import hierarchical_z_vals
        from dfanerf_tpu.ops.fused_render import (
            fused_render_head,
            packed_sigma_xla,
        )
        from dfanerf_tpu.ops.pack import pack_field_weights

        assert rcfg.concate_bg
        assert (rcfg.n_samples + rcfg.n_importance) % 8 == 0

        @jax.jit
        def render_fused(params, z_shape, z_app, pose, signal, bc_img):
            rays_o, rays_d = get_rays(H, W, focal, pose, cx, cy)
            ro = rays_o.reshape(-1, 3)
            rd = rays_d.reshape(-1, 3)
            bc = bc_img.reshape(-1, 3).astype(jnp.float32) / 255.0
            pw = pack_field_weights(
                params["decoder"], dcfg, signal, z_shape[0], z_app[0], "head"
            )
            # coarse pass: density only — compositing weights are all the
            # fine resample needs (render_rays' 'fine' branch keeps only
            # the fine rgb, run_nerf_com_trainExpLater.py:122-124).
            # Swept in fixed ray tiles with lax.map: the trunk's [N, 384]
            # intermediate at full 450p coarse resolution would be ~20 GB.
            z_c = jnp.linspace(near, far, rcfg.n_samples)
            ctile = 4096
            n_ct = -(-n_pix // ctile)
            ro_t_ = jnp.concatenate(
                [ro, jnp.zeros((n_ct * ctile - n_pix, 3))]
            ).reshape(n_ct, ctile, 3)
            rd_t_ = jnp.concatenate(
                [rd, jnp.ones((n_ct * ctile - n_pix, 3))]
            ).reshape(n_ct, ctile, 3)

            def sigma_tile(args):
                o, d = args
                pts = o[:, None, :] + d[:, None, :] * z_c[None, :, None]
                return packed_sigma_xla(pw, pts.reshape(-1, 3), "head").reshape(
                    ctile, rcfg.n_samples
                )

            sigma_c = jax.lax.map(sigma_tile, (ro_t_, rd_t_)).reshape(
                n_ct * ctile, rcfg.n_samples
            )[:n_pix]
            sigma_c = jax.nn.relu(sigma_c)
            sigma_c = sigma_c.at[:, -1].add(1e-6)  # bg-concat density bump
            z_b = jnp.broadcast_to(z_c, (n_pix, rcfg.n_samples))
            _, weights = volume_render(
                z_b, rd, sigma_c[None],
                jnp.zeros((1, n_pix, rcfg.n_samples, 3)),
                last_dist=rcfg.last_dist,
            )
            z_fine = hierarchical_z_vals(
                z_b, weights, rcfg.n_importance, det=True
            )
            rgb = fused_render_head(
                pw, ro, rd, z_fine, bc, last_dist=rcfg.last_dist,
                ert_eps=rcfg.ert_eps,
            )
            return rgb.reshape(H, W, 3)

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
