"""Pair-kernel cost anatomy: time _pair_field_kernel-shaped variants with
pieces removed (PE, biases, relu, rgb head) to find the non-MXU share.
Synthetic weights — timing only, no semantics.

WARNING — SYNTHETIC TIMINGS, DO NOT TUNE AGAINST THIS PROBE. Its
standalone variants have repeatedly disagreed with in-situ measurement
of the real serving kernel (different grid sizes, no prep/finish
neighbors competing for VMEM/HBM, different Mosaic scheduling): round-4
notes measured deltas here that did NOT reproduce when the same change
was applied to ops/fused_render.py, and vice versa. Treat the output as
a hypothesis generator only; validate every candidate change by timing
benchmarks/serve_trained.py stages in place.

    python benchmarks/probe_kernel_parts.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R_T = 256
S_SLAB = int(os.environ.get("DFANERF_S_SLAB", "8"))
PE_PAD = 64
K = int(os.environ.get("K", "640"))
T = 512
J = 64 // S_SLAB


def _mm(x, w):
    return jax.lax.dot(x, w, preferred_element_type=jnp.float32)


def kernel(t_idx, j_idx, z_ref, o_ref, d_ref, vr_ref, freq_ref, phase_ref,
           w_in, b_in, w_blocks, b_blocks, w_skip, b_skip, w_sf, b_sf,
           w_out, b_out,
           sig_out, r_out, g_out, b_out_ref, *, mode: str):
    rows = S_SLAB * R_T
    o = o_ref[:]
    d = d_ref[:]
    if mode == "nope":
        pe = jnp.concatenate([o.astype(jnp.bfloat16)] * S_SLAB, axis=0)
    else:
        freq = freq_ref[:]
        ph = phase_ref[:]
        encs = []
        for s in range(S_SLAB):
            pts = o + d * z_ref[0, 0, s]
            encs.append(jnp.sin(pts * freq + ph))
        pe = jnp.concatenate(encs, axis=0).astype(jnp.bfloat16)

    if mode == "nobias":
        h = jnp.maximum(_mm(pe, w_in[:]), 0.0).astype(jnp.bfloat16)
        for i in range(7):
            h = jnp.maximum(_mm(h, w_blocks[i]), 0.0)
            if i == 3:
                h = h + _mm(pe, w_skip[:])
            h = h.astype(jnp.bfloat16)
        sf = _mm(h, w_sf[:])
    elif mode == "norelu":
        h = (_mm(pe, w_in[:]) + b_in[:]).astype(jnp.bfloat16)
        for i in range(7):
            h = _mm(h, w_blocks[i]) + b_blocks[i]
            if i == 3:
                h = h + _mm(pe, w_skip[:]) + b_skip[:]
            h = h.astype(jnp.bfloat16)
        sf = _mm(h, w_sf[:]) + b_sf[:]
    elif mode == "bf16ep":
        h = jnp.maximum(
            _mm(pe, w_in[:]).astype(jnp.bfloat16) + b_in[:].astype(jnp.bfloat16), 0.0)
        for i in range(7):
            h = jnp.maximum(
                _mm(h, w_blocks[i]).astype(jnp.bfloat16)
                + b_blocks[i].astype(jnp.bfloat16), 0.0)
            if i == 3:
                h = h + (_mm(pe, w_skip[:]) + b_skip[:]).astype(jnp.bfloat16)
        sf = _mm(h, w_sf[:]) + b_sf[:]
    else:
        h = jnp.maximum(_mm(pe, w_in[:]) + b_in[:], 0.0).astype(jnp.bfloat16)
        for i in range(7):
            h = jnp.maximum(_mm(h, w_blocks[i]) + b_blocks[i], 0.0)
            if i == 3:
                h = h + _mm(pe, w_skip[:]) + b_skip[:]
            h = h.astype(jnp.bfloat16)
        sf = _mm(h, w_sf[:]) + b_sf[:]

    sigma = jnp.maximum(sf[:, 0:1], 0.0)
    if mode == "norgb":
        sig_out[0] = sigma[:, 0].reshape(S_SLAB, R_T)
        r_out[0] = jnp.zeros((S_SLAB, R_T), jnp.bfloat16)
        g_out[0] = jnp.zeros((S_SLAB, R_T), jnp.bfloat16)
        b_out_ref[0] = jnp.zeros((S_SLAB, R_T), jnp.bfloat16)
        return
    vr = jnp.broadcast_to(
        vr_ref[:][None], (S_SLAB, R_T, 256)).reshape(rows, 256)
    net = jnp.maximum(sf[:, 128:384] + vr.astype(jnp.float32), 0.0)
    rgb = jax.nn.sigmoid(_mm(net.astype(jnp.bfloat16), w_out[:]) + b_out[:])
    sig_out[0] = sigma[:, 0].reshape(S_SLAB, R_T)
    r_out[0] = rgb[:, 0].reshape(S_SLAB, R_T).astype(jnp.bfloat16)
    g_out[0] = rgb[:, 1].reshape(S_SLAB, R_T).astype(jnp.bfloat16)
    b_out_ref[0] = rgb[:, 2].reshape(S_SLAB, R_T).astype(jnp.bfloat16)


def run(mode):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    NT = (T + 1) * R_T
    o_r = jax.random.normal(ks[0], (NT, PE_PAD), jnp.float32)
    d_r = jax.random.normal(ks[1], (NT, PE_PAD), jnp.float32)
    vr = jax.random.normal(ks[2], (NT, 256)).astype(jnp.bfloat16)
    z_rows = jax.random.uniform(ks[3], (J, 8, 128), jnp.float32)
    freqs = jnp.ones((1, PE_PAD), jnp.float32)
    phase = jnp.zeros((1, PE_PAD), jnp.float32)
    w = dict(
        w_in=jax.random.normal(ks[4], (PE_PAD, 256)).astype(jnp.bfloat16) * 0.05,
        b_in=jnp.zeros((1, 256), jnp.float32),
        w_blocks=jax.random.normal(ks[5], (7, 256, 256)).astype(jnp.bfloat16) * 0.05,
        b_blocks=jnp.zeros((7, 256), jnp.float32),
        w_skip=jax.random.normal(ks[6], (PE_PAD, 256)).astype(jnp.bfloat16) * 0.05,
        b_skip=jnp.zeros((1, 256), jnp.float32),
        w_sf=jax.random.normal(ks[7], (256, 384)).astype(jnp.bfloat16) * 0.05,
        b_sf=jnp.zeros((1, 384), jnp.float32),
        w_out=jax.random.normal(ks[8], (256, 128)).astype(jnp.bfloat16) * 0.05,
        b_out=jnp.zeros((1, 128), jnp.float32),
    )
    t_idx = jnp.asarray(np.random.randint(0, T, K), jnp.int32)
    j_idx = jnp.asarray(np.random.randint(0, J, K), jnp.int32)

    def _full(shape):
        return pl.BlockSpec(shape, lambda *_: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    weight_ops = [w["w_in"], w["b_in"], w["w_blocks"], w["b_blocks"],
                  w["w_skip"], w["b_skip"], w["w_sf"], w["b_sf"],
                  w["w_out"], w["b_out"]]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K,),
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
        ] + [_full(op.shape) for op in weight_ops],
        out_specs=tuple(
            pl.BlockSpec((1, S_SLAB, R_T), lambda k, ti, ji: (ji[k], 0, ti[k]),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ),
    )
    fn = jax.jit(lambda *a: pl.pallas_call(
        functools.partial(kernel, mode=mode),
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((J, S_SLAB, NT),
                                 jnp.float32 if c == 0 else jnp.bfloat16)
            for c in range(4)
        ),
    )(*a))
    args = (t_idx, j_idx, z_rows, o_r, d_r, vr, freqs, phase, *weight_ops)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    n = 20
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / n * 1e3
    print(f"  {mode:8s} {ms:7.2f} ms  ({ms / K * 1e3:.1f} us/pair)",
          flush=True)
    return ms


if __name__ == "__main__":
    print(f"K={K} S_SLAB={S_SLAB} rows/step={S_SLAB * R_T}")
    for mode in ("full", "norgb", "nobias", "norelu", "bf16ep", "nope"):
        run(mode)
