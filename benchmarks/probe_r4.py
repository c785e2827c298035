"""Round-4 serving probes on the TRAINED dense-regime model.

Loads the state cached by ``DFANERF_STATE_CACHE`` (run serve_trained.py
first) and answers the round-4 perf questions:

1. Where do the steady-state milliseconds go? Times the three fast-path
   programs (prep / kern2 / finish) separately plus the composed frame,
   so program-count (dispatch) overhead is visible as the difference.
2. Can the programs be fused? Tries jit(prep+kern2), jit(kern2+finish)
   and jit(all three) — the known TPU runtime kernel fault was the
   4-stage gather+kernel+epilogue+scatter composition; these pairwise
   merges were never probed. Each is guarded: a runtime fault is caught
   and reported, the helper recovers on the next request.
3. Knob sweep hooks: DFANERF_S_SLAB / DFANERF_FSS / DFANERF_OCC_GRID /
   DFANERF_PRUNE env overrides (S_SLAB is read by ops/fused_render at
   import time).

Not a committed-benchmark entry point; serve_trained.py owns the
artifact numbers.

    DFANERF_STATE_CACHE=/root/repo/.cache/serve_state.ckpt \
        python benchmarks/probe_r4.py
"""

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


def timed(name, fn, n=30):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    ms = (time.time() - t0) / n * 1e3
    print(f"  {name:34s} {ms:8.2f} ms", flush=True)
    return ms, out


def main():
    cache_path = os.environ.get(
        "DFANERF_STATE_CACHE", "/root/repo/.cache/serve_state.ckpt")
    occ_thresh = float(os.environ.get("DFANERF_OCC_THRESH", "2.0"))
    prune = float(os.environ.get("DFANERF_PRUNE", "6e-3"))
    budget = float(os.environ.get("DFANERF_BUDGET", "0"))
    trans = float(os.environ.get("DFANERF_TRANS", "1e-3"))
    fss = int(os.environ.get("DFANERF_FSS", "4"))
    grid = int(os.environ.get("DFANERF_OCC_GRID", "48"))
    dec = DecoderConfig(density_activation="softplus")
    base = dict(n_samples=64, use_fused_kernel=True,
                compute_dtype="bfloat16")
    cfg = ExperimentConfig(
        decoder=dec,
        render=RenderConfig(**base, ert_eps=1e-4, spatial_tiles=True,
                            occ_sigma_thresh=occ_thresh, occ_grid_res=grid,
                            occ_refresh_every=8, occ_pair_compaction=True,
                            occ_prune_contrib=prune, far_skip_tol=2e-3,
                            occ_prune_budget=budget,
                            occ_budget_color=budget > 0,
                            occ_prune_trans=trans,
                            far_subsample=fss, occ_prune_carry=3),
        train=TrainConfig(n_rand=2048),
    )
    ds = make_synthetic_dataset(n_frames=8, H=H, W=W, n_samples_gt=64)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    state = load_checkpoint(cache_path, state)
    data = dataset_to_device(ds)
    from dfanerf_tpu.ops import fused_render as fr
    print(f"S_SLAB={fr.S_SLAB} fss={fss} grid={grid} prune={prune}",
          flush=True)

    render = make_frame_renderer(cfg, ds.hwfcxy, ds.near, ds.far)
    sig_fn = jax.jit(
        lambda p, i: encode_frame_signals(
            p, data["auds"], data["exps"], data["poses"], i,
            data["auds"].shape[0], cfg, True,
        )
    )

    def frame_inputs(i):
        sig, sig_t = sig_fn(state["params"], jnp.int32(i % ds.n_frames))
        return render.inputs_fn(
            state["params"], state["z_shape"], state["z_app"],
            data["poses"][i % ds.n_frames], data["poses"][0],
            sig, sig_t, data["bc_img"],
        )

    def frame(i, slot=None):
        sig, sig_t = sig_fn(state["params"], jnp.int32(i % ds.n_frames))
        return render(
            state["params"], state["z_shape"], state["z_app"],
            data["poses"][i % ds.n_frames], data["poses"][0],
            sig, sig_t, data["bc_img"],
            **({"window_slot": slot} if slot is not None else {}),
        )[1]

    # offline per-slot prep (the headline mode)
    os.environ["DFANERF_DEBUG_COMPACTION"] = "1"
    frame(0).block_until_ready()
    t0 = time.time()
    window = [frame_inputs(i) for i in range(ds.n_frames)]
    render.refresh_union(window, per_slot=True)
    print(f"prep_s={time.time() - t0:.1f}", flush=True)
    os.environ.pop("DFANERF_DEBUG_COMPACTION")

    st = render.cache["slots"][0]
    ks = (int(st["lists"][0][0].shape[0]), int(st["lists"][1][0].shape[0]),
          int(st["tiles_sel"].shape[0]))
    print(f"slot0 pairs: head={ks[0]} torso={ks[1]} tiles_u={ks[2]} "
          f"far_skip={st.get('far_skip')}", flush=True)

    prep, kern2, finish = render.fast_parts(st)
    args0 = (state["params"], state["z_shape"], state["z_app"],
             data["poses"][0], data["poses"][0])
    sig, sig_t = sig_fn(state["params"], jnp.int32(0))
    prep_args = args0 + (sig, sig_t, data["bc_img"], st["tiles_sel"])

    print("stage timings (slot 0):", flush=True)
    _, pre = timed("prep", lambda: prep(*prep_args))
    (pw_h, pw_t, oh, dh, vh, ot, dt, vt, rd_g, rd_t_g, ph, pt, vrtf,
     rd, rd_t, bc_p) = pre
    ti_h, ji_h = st["lists"][0]
    ti_t, ji_t = st["lists"][1]
    far_skip = bool(st.get("far_skip", False))
    k2_args = (pw_h, pw_t, oh, dh, vh, ot, dt, vt, ti_h, ji_h, ti_t, ji_t,
               ph, pt, vrtf)
    _, k2 = timed("kern2", lambda: kern2(*k2_args))
    buf_h, buf_t, far_vals = k2
    if far_skip:
        fin_args = (rd_g, rd_t_g, buf_h, buf_t, st["occ_sub"], rd, rd_t,
                    bc_p, st["tiles_scatter"])
    else:
        fin_args = (rd_g, rd_t_g, buf_h, buf_t, st["occ_sub"], far_vals,
                    rd, rd_t, bc_p, st["tiles_scatter"])
    timed("finish", lambda: finish(*fin_args))

    def full():
        p = prep(*prep_args)
        b_h, b_t, fv = kern2(p[0], p[1], *p[2:8], ti_h, ji_h, ti_t, ji_t,
                             *p[10:13])
        if far_skip:
            return finish(p[8], p[9], b_h, b_t, st["occ_sub"], p[13],
                          p[14], p[15], st["tiles_scatter"])
        return finish(p[8], p[9], b_h, b_t, st["occ_sub"], fv, p[13],
                      p[14], p[15], st["tiles_scatter"])

    timed("full (3 dispatches)", full)
    timed("render() slot path", lambda: frame(0, slot=0))

    # ---- merged-program probes (kernel-fault boundary) -------------------
    def probe(name, fn, args):
        try:
            jfn = jax.jit(fn)
            out = jfn(*args)
            jax.block_until_ready(out)
        except Exception as e:  # noqa: BLE001
            print(f"  MERGE {name}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:160]})", flush=True)
            return None
        ms, _ = timed(f"MERGE {name}", lambda: jfn(*args))
        return ms

    def m_prep_kern(*a):
        p = prep(*a[:-4])
        return p, kern2(p[0], p[1], *p[2:8], *a[-4:], *p[10:13])

    probe("prep+kern2", m_prep_kern, prep_args + (ti_h, ji_h, ti_t, ji_t))

    def m_kern_finish(*a):
        b_h, b_t, fv = kern2(*a[:15])
        rest = a[15:]
        if far_skip:
            return finish(rest[0], rest[1], b_h, b_t, rest[2], rest[3],
                          rest[4], rest[5], rest[6])
        return finish(rest[0], rest[1], b_h, b_t, rest[2], fv, rest[3],
                      rest[4], rest[5], rest[6])

    probe("kern2+finish", m_kern_finish,
          k2_args + (rd_g, rd_t_g, st["occ_sub"], rd, rd_t, bc_p,
                     st["tiles_scatter"]))

    def m_all(*a):
        p = prep(*a[:9])
        b_h, b_t, fv = kern2(p[0], p[1], *p[2:8], *a[9:13], *p[10:13])
        if far_skip:
            return finish(p[8], p[9], b_h, b_t, a[13], p[13], p[14], p[15],
                          a[14])
        return finish(p[8], p[9], b_h, b_t, a[13], fv, p[13], p[14], p[15],
                      a[14])

    probe("all-in-one", m_all,
          prep_args + (ti_h, ji_h, ti_t, ji_t, st["occ_sub"],
                       st["tiles_scatter"]))

    # ---- end-to-end offline fps ------------------------------------------
    def bench(fn, n=20, passes=3, warm=9):
        for i in range(warm):
            out = fn(i)
        out.block_until_ready()
        rates = []
        for _ in range(passes):
            t0 = time.time()
            for i in range(n):
                out = fn(i)
            out.block_until_ready()
            rates.append(n / (time.time() - t0))
        return float(np.median(rates)), float(max(rates))

    med, mx = bench(lambda i: frame(i, slot=i % ds.n_frames))
    print(f"offline per-slot fps: median={med:.2f} max={mx:.2f}",
          flush=True)


if __name__ == "__main__":
    main()
