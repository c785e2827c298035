"""dfanerf_tpu — a TPU-native JAX framework for audio-driven talking-head NeRFs.

A from-scratch rebuild of the capabilities of DFA-NeRF (arXiv 2201.00791,
reference implementation ShunyuYao/DFA-NeRF) designed for TPU hardware:

- the compute path is pure JAX (jit / vmap / lax control flow) with fused
  Pallas kernels for the hot volume-rendering loop (``dfanerf_tpu.ops``);
- parallelism is expressed as shardings over a ``jax.sharding.Mesh``
  (``dfanerf_tpu.parallel``), not as a translation of any CUDA runtime;
- the preprocessing stack (audio frontends, 3DMM fitting, bundle adjustment,
  perception models) is reimplemented as jittable transforms
  (``dfanerf_tpu.pipeline``).

Layout:
    core/      pure math: rays, positional encodings, sampling, compositing
    models/    conditioned NeRF decoder + audio/expression/attention encoders
    ops/       Pallas TPU kernels (fused ray-march renderer) + XLA fallbacks
    data/      dataset manifest contract, device-resident frame cache, samplers
    train/     jitted train step, staged optimizers, checkpointing
    render/    full-frame tiled renderer and video rendering
    parallel/  device mesh setup and ray-sharded training
    pipeline/  preprocessing DAG (audio features, tracking, parsing, ...)
    compat/    PyTorch reference checkpoint converters
"""

__version__ = "0.1.0"
