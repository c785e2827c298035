"""Clipped convergence curve (QUALITY.md dip-fix evidence).

The noclip 4000-step curve (benchmarks/results/convergence_4000_noclip.json)
localizes both transient val-PSNR dips to single-batch gradient spikes
4069x / 1776x the window median. This driver demonstrates the fix the
diagnosis implies: measure the steady-state gradient norm over a short
unclipped warmup, set TrainConfig.grad_clip to 10x the median (far above
every ordinary step, far below the spikes), and regenerate the full curve.
Writes benchmarks/results/convergence_4000_clip.json.

    python benchmarks/convergence_clip.py [n_steps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np

from quality_report import convergence_curve


def measure_median_norm(n_warm=400):
    """Median global grad norm over n_warm unclipped steps of the SAME
    config convergence_curve uses (fresh throwaway state)."""
    import jax.numpy as jnp

    from dfanerf_tpu.config import ExperimentConfig, RenderConfig, TrainConfig
    from dfanerf_tpu.data import make_synthetic_dataset
    from dfanerf_tpu.train import (
        dataset_to_device, init_train_state, make_train_step,
    )

    on_tpu = jax.default_backend() == "tpu"
    cfg = ExperimentConfig(
        render=RenderConfig(n_samples=64, use_fused_kernel=on_tpu,
                            compute_dtype="bfloat16" if on_tpu else "float32"),
        train=TrainConfig(n_rand=2048),
    )
    ds = make_synthetic_dataset(n_frames=16, H=256, W=256, n_samples_gt=64)
    state = init_train_state(jax.random.PRNGKey(0), cfg)
    data = dataset_to_device(ds)
    step = make_train_step(cfg, ds)
    key = jax.random.PRNGKey(1)
    norms = []
    for _ in range(n_warm):
        key, sub = jax.random.split(key)
        state, m = step(state, data, sub)
        norms.append(m["grad_norm"])
    norms = np.asarray(jnp.stack(norms))
    # skip the init transient: the first ~50 steps have legitimately large
    # norms while the field forms; the clip targets the converged regime
    return float(np.median(norms[50:])), float(norms[50:].max())


def main(n_steps=4000):
    t0 = time.time()
    med, mx = measure_median_norm()
    clip = round(10.0 * med, 4)
    print(f"[clip] median grad norm {med:.4f} (warmup max {mx:.4f}); "
          f"grad_clip = 10x median = {clip}", file=sys.stderr, flush=True)
    out = convergence_curve(n_steps=n_steps, grad_clip=clip)
    out["grad_clip"] = clip
    out["warmup_median_grad_norm"] = round(med, 4)
    out["seconds"] = round(time.time() - t0, 1)
    rdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")
    path = os.path.join(rdir, "convergence_4000_clip.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"path": path, "grad_clip": clip,
                      "curve": out["val_psnr_curve"]}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4000)
