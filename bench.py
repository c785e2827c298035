"""Benchmark: audio-driven talking-head rendering throughput on one chip.

Measures the shipped DFA-NeRF inference path (BASELINE config 3) END TO
END: trains the synthetic 450p scene on-chip (softplus density +
distortion prior, then a distortion-off polish), then renders with the
fused pair kernels + conservative occupancy + contribution pruning — the
same work run_nerf_com_trainExpLater.py:590-734 does with ~99 host-looped
2048-ray chunks per frame. Also measures the random-init no-skip render
(kernel speed of light, no algorithmic skipping) and training throughput.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "fps", "vs_baseline": fps/30}
vs_baseline is against the 30 fps north-star target (the reference repo
publishes no numbers — BASELINE.md). extra carries the no-skip fps, the
max pixel error of the skipped render vs no-skip, val PSNR before/after
the bake, and train steps/sec.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dfanerf_tpu.config import ExperimentConfig, RenderConfig, TrainConfig
    from dfanerf_tpu.data import make_synthetic_dataset
    from dfanerf_tpu.render.renderer import encode_frame_signals, make_frame_renderer
    from dfanerf_tpu.train import dataset_to_device, init_train_state

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    H = W = 450
    n_frames_bench = 20
    on_tpu = jax.default_backend() == "tpu"
    cfg = ExperimentConfig(
        render=RenderConfig(
            n_samples=64,
            tile_rays=2048,
            concate_bg=True,
            # the fused Pallas kernel is the TPU serving path; CPU falls
            # back to the tiled XLA renderer
            use_fused_kernel=on_tpu,
            compute_dtype="bfloat16" if on_tpu else "float32",
        ),
        train=TrainConfig(),
    )
    # tiny synthetic dataset only to supply poses/signals/background at 450p
    ds = make_synthetic_dataset(n_frames=8, H=H, W=W, n_samples_gt=8)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    data = dataset_to_device(ds)

    render = make_frame_renderer(cfg, ds.hwfcxy, ds.near, ds.far)
    sig_fn = jax.jit(
        lambda p, i: encode_frame_signals(
            p, data["auds"], data["exps"], data["poses"], i,
            data["auds"].shape[0], cfg, True,
        )
    )

    def frame(i):
        sig, sig_t = sig_fn(state["params"], jnp.int32(i % ds.n_frames))
        rgb_head, rgb_com = render(
            state["params"], state["z_shape"], state["z_app"],
            data["poses"][i % ds.n_frames], data["poses"][0],
            sig, sig_t, data["bc_img"],
        )
        return rgb_com

    # warmup / compile
    frame(0).block_until_ready()

    t0 = time.time()
    out = None
    for i in range(n_frames_bench):
        out = frame(i)
    out.block_until_ready()
    dt = time.time() - t0

    # training throughput: the shipped schedule is 600k steps of 2048 rays
    # x 64 samples x 2 fields — steps/sec decides wall-clock to a trained
    # model (the reference runs this single-GPU for days)
    from dfanerf_tpu.train import make_train_step

    step = make_train_step(cfg, ds)
    key = jax.random.PRNGKey(7)
    st = init_train_state(jax.random.PRNGKey(1), cfg)
    key, sub = jax.random.split(key)
    st, m = step(st, data, sub)  # compile
    jax.block_until_ready(m["loss"])
    t1 = time.time()
    n_steps = 100
    for _ in range(n_steps):
        key, sub = jax.random.split(key)
        st, m = step(st, data, sub)
    jax.block_until_ready(m["loss"])
    steps_per_sec = n_steps / (time.time() - t1)

    fps = n_frames_bench / dt

    # insurance line: if the trained-serving phase is cut short by a run
    # budget, the artifact still carries the no-skip measurement (the
    # driver keeps the LAST printed JSON line)
    print(json.dumps({
        "metric": "450x450 audio-driven head+torso render "
                  "(64 samples/ray, 2 fields, random init, no skipping)",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 4),
    }), flush=True)

    # the honest serving number: trained + baked model with the skip levers
    # (ERT + conservative occupancy + bg epilogue); random-init weights make
    # every skip mechanism a no-op, so the fps above is the no-skip floor
    trained = None
    if on_tpu:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "benchmarks"))
        import serve_trained

        trained = serve_trained.run()

    headline = trained["value"] if trained else fps
    mrays = headline * H * W / 1e6  # rays/frame through the 2-field pipeline
    result = {
        "metric": "450x450 audio-driven head+torso serving fps "
                  "(trained+baked, fused kernel, ERT+occupancy)"
                  if trained else
                  "450x450 audio-driven head+torso render (64 samples/ray, 2 fields)",
        "value": round(headline, 3),
        "unit": "fps",
        "vs_baseline": round(headline / 30.0, 4),
        "extra": {
            "Mrays_per_sec_per_chip": round(mrays, 3),
            "fps_random_init_noskip": round(fps, 3),
            "train_steps_per_sec_2048rays": round(steps_per_sec, 2),
            "shipped_600k_schedule_hours": round(600_000 / steps_per_sec / 3600, 2),
            "device": str(jax.devices()[0]),
            "n_frames": n_frames_bench,
            **({"trained_serving": trained["extra"]} if trained else {}),
        },
    }
    print(json.dumps(result))
    sys.stdout.flush()
    sys.stderr.flush()
    # hard-exit: the axon tunnel client's C++ teardown can abort
    # (SIGABRT, "terminate called after throwing an instance of ''") when
    # the process exits with the async-refresh worker's device handles
    # still live. The JSON line above is the bench contract and is
    # already flushed; skip interpreter teardown so a runtime destructor
    # can't turn a successful measurement into a nonzero exit.
    os._exit(0)


if __name__ == "__main__":
    main()
