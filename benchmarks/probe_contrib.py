"""Contribution-distribution probe: how much of the pruned visible pair
set is LOW-contribution (candidates for stride-2 LOD evaluation)?

Loads the cached trained state, derives the per-(tile, slab) per-field
contribution diagnostics at the serving flags, and prints the histogram
of contrib values over the KEPT pairs (contrib > occ_prune_contrib).

    DFANERF_STATE_CACHE=... python benchmarks/probe_contrib.py
"""

import os
import sys

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


def main():
    cache_path = os.environ.get(
        "DFANERF_STATE_CACHE", "/root/repo/.cache/serve_state.ckpt")
    dec = DecoderConfig(density_activation="softplus")
    cfg = ExperimentConfig(
        decoder=dec,
        render=RenderConfig(n_samples=64, use_fused_kernel=True,
                            compute_dtype="bfloat16", ert_eps=1e-4,
                            spatial_tiles=True, occ_sigma_thresh=2.0,
                            occ_grid_res=96, occ_refresh_every=8,
                            occ_pair_compaction=True,
                            occ_prune_contrib=6e-3, far_subsample=4),
        train=TrainConfig(n_rand=2048),
    )
    ds = make_synthetic_dataset(n_frames=8, H=H, W=W, n_samples_gt=64)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    state = load_checkpoint(cache_path, state)
    data = dataset_to_device(ds)

    render = make_frame_renderer(cfg, ds.hwfcxy, ds.near, ds.far)
    sig_fn = jax.jit(
        lambda p, i: encode_frame_signals(
            p, data["auds"], data["exps"], data["poses"], i,
            data["auds"].shape[0], cfg, True,
        )
    )
    # one live-mode frame triggers the full refresh-with-diagnostics; the
    # keep-masks + pruned flag state land in render.cache
    sig, sig_t = sig_fn(state["params"], jnp.int32(0))
    render(state["params"], state["z_shape"], state["z_app"],
           data["poses"][0], data["poses"][0], sig, sig_t,
           data["bc_img"])[1].block_until_ready()

    # re-derive the diagnostics on the PRUNED state to histogram contribs
    inputs = render.inputs_fn(
        state["params"], state["z_shape"], state["z_app"],
        data["poses"][0], data["poses"][0], sig, sig_t, data["bc_img"])
    from dfanerf_tpu.ops.fused_render import (
        R_T, deferred_composite, pair_field_eval,
    )

    st = render.cache
    T = int(np.asarray(st["tiles_scatter"]).max())
    tiles_sel = st["tiles_sel"]

    @jax.jit
    def gather(inputs, sel):
        pw_h, pw_t, ro, rd, ro_t, rd_t, bc_p = inputs
        f = lambda x: x.reshape(T, R_T, 3)[sel].reshape(-1, 3)
        return f(ro), f(rd), f(ro_t), f(rd_t)

    ro_g, rd_g, ro_t_g, rd_t_g = gather(inputs, tiles_sel)
    z = jnp.linspace(ds.near, ds.far, 64)
    bufs = []
    for pw, o, d, br, (ti, ji) in ((inputs[0], ro_g, rd_g, "head",
                                    st["lists"][0]),
                                   (inputs[1], ro_t_g, rd_t_g, "torso",
                                    st["lists"][1])):
        bufs.append(jax.jit(
            lambda pw, o, d, ti, ji, br=br: pair_field_eval(
                pw, br, o, d, z, ti, ji, act="softplus"))(pw, o, d, ti, ji))

    comp = jax.jit(lambda *a: deferred_composite(*a, z))(
        bufs[0], bufs[1], st["occ_sub"], rd_g, rd_t_g)
    _, _, _, _, tm_h, tm_c, cb_h, cb_t = comp
    occ = np.asarray(st["occ_sub"])
    for name, cb, f in (("head", np.asarray(cb_h), 0),
                        ("torso", np.asarray(cb_t), 1)):
        kept = cb[occ[f] > 0]
        qs = np.percentile(kept, [10, 25, 50, 75, 90])
        print(f"{name}: kept_pairs={kept.size} "
              f"contrib p10/p25/p50/p75/p90 = "
              + "/".join(f"{q:.4f}" for q in qs), flush=True)
        for thr in (0.02, 0.05, 0.1, 0.2):
            print(f"  {name} pairs with contrib < {thr}: "
                  f"{(kept < thr).mean() * 100:.1f}%", flush=True)


if __name__ == "__main__":
    main()
