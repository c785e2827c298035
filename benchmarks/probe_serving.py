"""Serving-lever diagnostics on the TRAINED dense-regime model.

Loads the state cached by ``DFANERF_STATE_CACHE`` (see serve_trained.py;
run that first) and times every jit program of the pair-compacted serving
path separately, prints the concrete pair counts, and measures live-mode
vs pinned-window (refresh_union) fps. Not a committed-benchmark entry
point; see serve_trained.py for the headline number.

    DFANERF_STATE_CACHE=/tmp/serve_state_450.npz python benchmarks/probe_serving.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from dfanerf_tpu.config import ExperimentConfig, RenderConfig, TrainConfig
from dfanerf_tpu.models.decoder import DecoderConfig
from dfanerf_tpu.data import make_synthetic_dataset
from dfanerf_tpu.render.renderer import encode_frame_signals, make_frame_renderer
from dfanerf_tpu.train import dataset_to_device, init_train_state
from dfanerf_tpu.train.checkpoint import load_checkpoint

H = W = 450


def timed(name, fn, n=20):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    ms = (time.time() - t0) / n * 1e3
    print(f"  {name:28s} {ms:8.2f} ms")
    return ms, out


def main():
    cache = os.environ.get("DFANERF_STATE_CACHE", "/tmp/serve_state_450.npz")
    occ_thresh = float(os.environ.get("DFANERF_OCC_THRESH", "2.0"))
    prune = float(os.environ.get("DFANERF_PRUNE", "6e-3"))
    fss = int(os.environ.get("DFANERF_FSS", "1"))
    grid = int(os.environ.get("DFANERF_OCC_GRID", "48"))
    carry = int(os.environ.get("DFANERF_CARRY", "0"))
    dec = DecoderConfig(density_activation="softplus")
    base = dict(n_samples=64, use_fused_kernel=True,
                compute_dtype="bfloat16")
    cfg1 = ExperimentConfig(
        decoder=dec,
        render=RenderConfig(**base, ert_eps=1e-4, spatial_tiles=True,
                            occ_sigma_thresh=occ_thresh, occ_grid_res=grid,
                            occ_refresh_every=8, occ_pair_compaction=True,
                            occ_prune_contrib=prune, far_subsample=fss,
                            occ_prune_carry=carry),
        train=TrainConfig(n_rand=2048),
    )
    ds = make_synthetic_dataset(n_frames=8, H=H, W=W, n_samples_gt=64)
    state = init_train_state(jax.random.PRNGKey(0), cfg1)
    state = load_checkpoint(cache, state)
    data = dataset_to_device(ds)
    print(f"loaded {cache}; occ_thresh={occ_thresh} prune={prune}",
          file=sys.stderr)

    render = make_frame_renderer(cfg1, ds.hwfcxy, ds.near, ds.far)
    sig_fn = jax.jit(
        lambda p, i: encode_frame_signals(
            p, data["auds"], data["exps"], data["poses"], i,
            data["auds"].shape[0], cfg1, True,
        )
    )

    def frame_inputs(i):
        sig, sig_t = sig_fn(state["params"], jnp.int32(i % ds.n_frames))
        return render.inputs_fn(
            state["params"], state["z_shape"], state["z_app"],
            data["poses"][i % ds.n_frames], data["poses"][0],
            sig, sig_t, data["bc_img"],
        )

    def frame(i):
        sig, sig_t = sig_fn(state["params"], jnp.int32(i % ds.n_frames))
        return render(
            state["params"], state["z_shape"], state["z_app"],
            data["poses"][i % ds.n_frames], data["poses"][0],
            sig, sig_t, data["bc_img"],
        )[1]

    os.environ["DFANERF_DEBUG_COMPACTION"] = "1"
    # live-mode warmup (runs a refresh with prune diag)
    frame(0).block_until_ready()
    os.environ.pop("DFANERF_DEBUG_COMPACTION")

    cache_d = render.cache
    lists = cache_d["lists"]
    print(f"pair counts (post-prune, bucketed): "
          f"head={int(lists[0][0].shape[0])} "
          f"torso={int(lists[1][0].shape[0])} "
          f"tiles_u={len(cache_d['tiles_u'])} "
          f"T={int(np.asarray(cache_d['tiles_scatter']).max())}")

    # --- per-stage timing under the current (pruned) flags ---------------
    inputs = frame_inputs(0)
    jax.block_until_ready(inputs)

    from dfanerf_tpu.render import renderer as rmod  # noqa
    print("stage timings:")
    timed("inputs_fn", lambda: frame_inputs(0))
    gather = None
    # reach into the closure machinery by re-running pieces via render
    # internals: simplest is to time the public pipeline minus stages by
    # toggling; instead reconstruct the stage calls exactly as run_pipeline
    # does, via the bound attributes.
    # (renderer exposes inputs_fn/refresh_union/cache; the rest live in
    # closures — re-create equivalent jitted calls here)
    from dfanerf_tpu.ops.fused_render import (
        R_T, conservative_occupancy, deferred_composite,
        fused_far_eval_split, pair_field_eval, spatial_tile_permutation,
    )

    act = dec.density_activation
    perm = spatial_tile_permutation(H, W)
    T = len(perm) // R_T
    z_vals_c = jnp.linspace(ds.near, ds.far, 64)

    @jax.jit
    def occ_fn(inputs):
        pw_h, pw_t, ro, rd, ro_t, rd_t, bc_p = inputs
        return conservative_occupancy(
            pw_h, pw_t, ro, rd, ro_t, rd_t, z_vals_c, occ_thresh,
            grid_res=grid, act=act)

    @jax.jit
    def gather_fn(inputs, tiles_sel):
        pw_h, pw_t, ro, rd, ro_t, rd_t, bc_p = inputs
        sel = lambda x: x.reshape(T, R_T, 3)[tiles_sel].reshape(-1, 3)
        return sel(ro), sel(rd), sel(ro_t), sel(rd_t)

    kern_h = jax.jit(lambda pw, o, d, ti, ji: pair_field_eval(
        pw, "head", o, d, z_vals_c, ti, ji, act=act))
    kern_t = jax.jit(lambda pw, o, d, ti, ji: pair_field_eval(
        pw, "torso", o, d, z_vals_c, ti, ji, act=act))

    @jax.jit
    def far_fn(inputs):
        pw_h, pw_t, ro, rd, ro_t, rd_t, bc_p = inputs
        return fused_far_eval_split(pw_h, pw_t, ro, rd, ro_t, rd_t,
                                    z_vals_c[-1], act=act)

    @jax.jit
    def composite_fn(rd_g, rd_t_g, buf_h, buf_t, occ_sub):
        return deferred_composite(buf_h, buf_t, occ_sub, rd_g, rd_t_g,
                                  z_vals_c, with_diagnostics=False)

    timed("occ_fn (refresh only)", lambda: occ_fn(inputs))
    _, g = timed("gather_fn",
                 lambda: gather_fn(inputs, cache_d["tiles_sel"]))
    ro_g, rd_g, ro_t_g, rd_t_g = g
    ti_h, ji_h = lists[0]
    ti_t, ji_t = lists[1]
    _, buf_h = timed(f"head kernel (K={ti_h.shape[0]})",
                     lambda: kern_h(inputs[0], ro_g, rd_g, ti_h, ji_h))
    _, buf_t = timed(f"torso kernel (K={ti_t.shape[0]})",
                     lambda: kern_t(inputs[1], ro_t_g, rd_t_g, ti_t, ji_t))
    timed("far_fn", lambda: far_fn(inputs))
    _, comp = timed("composite_fn", lambda: composite_fn(
        rd_g, rd_t_g, buf_h, buf_t, cache_d["occ_sub"]))

    # --- end-to-end: live mode vs pinned window ---------------------------
    def bench(fn, n=20):
        # warm a FULL refresh cycle (refresh frame + fast-path frames):
        # the fast-path programs compile on the first non-refresh frame
        for i in range(9):
            out = fn(i)
        out.block_until_ready()
        t0 = time.time()
        for i in range(n):
            out = fn(i)
        out.block_until_ready()
        return n / (time.time() - t0)

    fps_live = bench(frame)
    print(f"fps live-mode (refresh every 8): {fps_live:.2f}")

    window = [frame_inputs(i) for i in range(ds.n_frames)]
    render.refresh_union(window)
    fps_pinned = bench(frame)
    print(f"fps pinned (refresh_union over the 8-frame window): "
          f"{fps_pinned:.2f}")
    print(f"union pair counts: head={int(render.cache['lists'][0][0].shape[0])} "
          f"torso={int(render.cache['lists'][1][0].shape[0])}")

    render.refresh_union(window, per_slot=True)

    def frame_slot(i):
        sig, sig_t = sig_fn(state["params"], jnp.int32(i % ds.n_frames))
        return render(
            state["params"], state["z_shape"], state["z_app"],
            data["poses"][i % ds.n_frames], data["poses"][0],
            sig, sig_t, data["bc_img"], window_slot=i % ds.n_frames,
        )[1]

    fps_slot = bench(frame_slot)
    print(f"fps per-slot pinned (each frame its own pruned lists): "
          f"{fps_slot:.2f}")
    print(json.dumps({"fps_live": round(fps_live, 3),
                      "fps_pinned": round(fps_pinned, 3),
                      "fps_slot": round(fps_slot, 3)}))


if __name__ == "__main__":
    main()
