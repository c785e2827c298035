"""Hierarchical-path (BASELINE config 2) knob sweep on a CACHED trained
state — dev iteration for the fps/error trade (VERDICT r4 #4: >=10 fps at
max err <= 0.005 in the same artifact).

Requires DFANERF_STATE_CACHE pointing at a serve_trained.py checkpoint
(the bench saves one when the env var is set). Each row re-measures
hierarchical_fps with RenderConfig overrides applied to the skip config;
the no-skip reference renders once per sweep. In-situ timings only — set
DFANERF_DEBUG_HIER_T=1 for the per-stage trace of each frame.

    DFANERF_STATE_CACHE=... python benchmarks/probe_hier.py '{"occ_refresh_every": 2}' ...
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(rows):
    import serve_trained as stb

    from dfanerf_tpu.config import ExperimentConfig, RenderConfig, TrainConfig
    from dfanerf_tpu.data import make_synthetic_dataset
    from dfanerf_tpu.models.decoder import DecoderConfig
    from dfanerf_tpu.train import dataset_to_device, init_train_state
    from dfanerf_tpu.train.checkpoint import load_checkpoint

    cache_path = os.environ.get("DFANERF_STATE_CACHE", "")
    assert cache_path and (os.path.exists(cache_path)
                           or os.path.exists(cache_path + ".npz")), \
        "probe_hier needs DFANERF_STATE_CACHE from a serve_trained run"
    dec = DecoderConfig(density_activation="softplus")
    cfg0 = ExperimentConfig(
        decoder=dec,
        render=RenderConfig(n_samples=64, use_fused_kernel=True,
                            compute_dtype="bfloat16"),
        train=TrainConfig(n_rand=2048),
    )
    ds = make_synthetic_dataset(n_frames=8, H=stb.H, W=stb.W,
                                n_samples_gt=64)
    state = init_train_state(jax.random.PRNGKey(0), cfg0)
    state = load_checkpoint(cache_path, state)
    data = dataset_to_device(ds)

    for kw in rows:
        r = stb.hierarchical_fps(ds, state, data, 2.0, dec=dec, skip_kw=kw)
        print(json.dumps({"skip_kw": kw, **r}), flush=True)


if __name__ == "__main__":
    main([json.loads(a) for a in sys.argv[1:]] or [{}])
