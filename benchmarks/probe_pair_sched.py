"""Pair-kernel scheduling probe: can two pairs per grid step raise MXU
utilization?  The 9-matmul dependent chain serializes MXU work against
its VPU epilogues (bias+relu+cast); two INDEPENDENT chains in one kernel
body give Mosaic freedom to overlap A's epilogue with B's matmul.

Variants (all synthetic weights, timing only):
  single  - one sp=8 pair / step (the shipped kernel shape), K steps
  cat2    - two pairs CONCATENATED into 4096-row matmuls, K/2 steps
  ilv2    - two pairs as SEPARATE interleavable chains, K/2 steps
  ilv2bf  - ilv2 with bf16 epilogues

WARNING — SYNTHETIC TIMINGS, DO NOT TUNE AGAINST THIS PROBE. The
standalone kernel variants here have disagreed with in-situ timing of
the real serving path (round-4 notes: the packed-2 win this probe
predicted did not materialize at the measured size in
serve_trained.py). Use it to generate hypotheses only; accept or reject
a change by timing benchmarks/serve_trained.py stages in place.

    python benchmarks/probe_pair_sched.py
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
S_SLAB = 8
PE_PAD = 64
K = int(os.environ.get("K", "640"))  # pairs (must be even)
T = 512
J = 64 // S_SLAB


def _mm(x, w):
    return jax.lax.dot(x, w, preferred_element_type=jnp.float32)


def _pe(o, d, z_ref, freq, ph):
    encs = []
    for s in range(S_SLAB):
        pts = o + d * z_ref[0, 0, s]
        encs.append(jnp.sin(pts * freq + ph))
    return jnp.concatenate(encs, axis=0).astype(jnp.bfloat16)


def _trunk(pe, w, bf16ep=False):
    if bf16ep:
        h = jnp.maximum(
            _mm(pe, w[0]).astype(jnp.bfloat16) + w[1].astype(jnp.bfloat16),
            0.0)
        for i in range(7):
            h = jnp.maximum(
                _mm(h, w[2][i]).astype(jnp.bfloat16)
                + w[3][i].astype(jnp.bfloat16), 0.0)
            if i == 3:
                h = h + (_mm(pe, w[4]) + w[5]).astype(jnp.bfloat16)
        return _mm(h, w[6]) + w[7]
    h = jnp.maximum(_mm(pe, w[0]) + w[1], 0.0).astype(jnp.bfloat16)
    for i in range(7):
        h = jnp.maximum(_mm(h, w[2][i]) + w[3][i], 0.0)
        if i == 3:
            h = h + _mm(pe, w[4]) + w[5]
        h = h.astype(jnp.bfloat16)
    return _mm(h, w[6]) + w[7]


def _head(sf, vr_ref, w, rows):
    sigma = jnp.maximum(sf[:, 0:1], 0.0)
    vr = jnp.broadcast_to(
        vr_ref[:][None], (S_SLAB, R_T, 256)).reshape(rows, 256)
    net = jnp.maximum(sf[:, 128:384] + vr.astype(jnp.float32), 0.0)
    rgb = jax.nn.sigmoid(_mm(net.astype(jnp.bfloat16), w[8]) + w[9])
    return sigma, rgb


def kernel1(t_idx, j_idx, z_ref, o_ref, d_ref, vr_ref, freq_ref, phase_ref,
            *ops, mode):
    w = [op[:] for op in ops[:10]]
    outs = ops[10:]
    rows = S_SLAB * R_T
    pe = _pe(o_ref[:], d_ref[:], z_ref, freq_ref[:], phase_ref[:])
    sf = _trunk(pe, w)
    sigma, rgb = _head(sf, vr_ref, w, rows)
    outs[0][0] = sigma[:, 0].reshape(S_SLAB, R_T)
    outs[1][0] = rgb[:, 0].reshape(S_SLAB, R_T).astype(jnp.bfloat16)
    outs[2][0] = rgb[:, 1].reshape(S_SLAB, R_T).astype(jnp.bfloat16)
    outs[3][0] = rgb[:, 2].reshape(S_SLAB, R_T).astype(jnp.bfloat16)


def kernel2(tA, jA, tB, jB, zA, zB, oA, dA, oB, dB, vrA, vrB, freq_ref,
            phase_ref, *ops, mode):
    w = [op[:] for op in ops[:10]]
    outs = ops[10:]
    rows = S_SLAB * R_T
    bf = mode == "ilv2bf"
    freq, ph = freq_ref[:], phase_ref[:]
    peA = _pe(oA[:], dA[:], zA, freq, ph)
    peB = _pe(oB[:], dB[:], zB, freq, ph)
    if mode == "cat2":
        sf = _trunk(jnp.concatenate([peA, peB], axis=0), w)
        sfA, sfB = sf[:rows], sf[rows:]
    elif mode == "zip2":
        # layer-wise zip of the two independent chains: Mosaic schedules
        # in program order, so alternating A/B matmuls puts B's MXU work
        # in A's epilogue stalls (and vice versa)
        hA = jnp.maximum(_mm(peA, w[0]) + w[1], 0.0).astype(jnp.bfloat16)
        hB = jnp.maximum(_mm(peB, w[0]) + w[1], 0.0).astype(jnp.bfloat16)
        for i in range(7):
            nA = _mm(hA, w[2][i])
            nB = _mm(hB, w[2][i])
            hA = jnp.maximum(nA + w[3][i], 0.0)
            hB = jnp.maximum(nB + w[3][i], 0.0)
            if i == 3:
                hA = hA + _mm(peA, w[4]) + w[5]
                hB = hB + _mm(peB, w[4]) + w[5]
            hA = hA.astype(jnp.bfloat16)
            hB = hB.astype(jnp.bfloat16)
        sfA = _mm(hA, w[6]) + w[7]
        sfB = _mm(hB, w[6]) + w[7]
    else:
        sfA = _trunk(peA, w, bf16ep=bf)
        sfB = _trunk(peB, w, bf16ep=bf)
    sigA, rgbA = _head(sfA, vrA, w, rows)
    sigB, rgbB = _head(sfB, vrB, w, rows)
    outs[0][0] = sigA[:, 0].reshape(S_SLAB, R_T)
    outs[1][0] = rgbA[:, 0].reshape(S_SLAB, R_T).astype(jnp.bfloat16)
    outs[2][0] = rgbA[:, 1].reshape(S_SLAB, R_T).astype(jnp.bfloat16)
    outs[3][0] = rgbA[:, 2].reshape(S_SLAB, R_T).astype(jnp.bfloat16)
    outs[4][0] = sigB[:, 0].reshape(S_SLAB, R_T)
    outs[5][0] = rgbB[:, 0].reshape(S_SLAB, R_T).astype(jnp.bfloat16)
    outs[6][0] = rgbB[:, 1].reshape(S_SLAB, R_T).astype(jnp.bfloat16)
    outs[7][0] = rgbB[:, 2].reshape(S_SLAB, R_T).astype(jnp.bfloat16)


def make_weights():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    return [
        jax.random.normal(ks[4], (PE_PAD, 256)).astype(jnp.bfloat16) * 0.05,
        jnp.zeros((1, 256), jnp.float32),
        jax.random.normal(ks[5], (7, 256, 256)).astype(jnp.bfloat16) * 0.05,
        jnp.zeros((7, 256), jnp.float32),
        jax.random.normal(ks[6], (PE_PAD, 256)).astype(jnp.bfloat16) * 0.05,
        jnp.zeros((1, 256), jnp.float32),
        jax.random.normal(ks[7], (256, 384)).astype(jnp.bfloat16) * 0.05,
        jnp.zeros((1, 384), jnp.float32),
        jax.random.normal(ks[8], (256, 128)).astype(jnp.bfloat16) * 0.05,
        jnp.zeros((1, 128), jnp.float32),
    ]


def bench(fn, argsets, n=20):
    """Rotate across distinct input sets (identical-args re-dispatch has
    been observed to read ~0 ms on the axon tunnel — suspected
    duplicate-execution elision), block once at the end."""
    out = fn(*argsets[0])
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(n):
        out = fn(*argsets[i % len(argsets)])
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3


def run(mode):
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    NT = (T + 1) * R_T
    o_r = jax.random.normal(ks[0], (NT, PE_PAD), jnp.float32)
    d_r = jax.random.normal(ks[1], (NT, PE_PAD), jnp.float32)
    vr = jax.random.normal(ks[2], (NT, 256)).astype(jnp.bfloat16)
    z_rows = jax.random.uniform(ks[3], (J, 8, 128), jnp.float32)
    freqs = jnp.ones((1, PE_PAD), jnp.float32)
    phase = jnp.zeros((1, PE_PAD), jnp.float32)
    weight_ops = make_weights()
    rng = np.random.RandomState(0)
    t_np = rng.randint(0, T, K).astype(np.int32)
    j_np = rng.randint(0, J, K).astype(np.int32)

    def _full(shape):
        return pl.BlockSpec(shape, lambda *_: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    wspecs = [_full(op.shape) for op in weight_ops]
    if mode == "single":
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
            ] + wspecs,
            out_specs=tuple(
                pl.BlockSpec((1, S_SLAB, R_T),
                             lambda k, ti, ji: (ji[k], 0, ti[k]),
                             memory_space=pltpu.VMEM)
                for _ in range(4)
            ),
        )
        fn = jax.jit(lambda *a: pl.pallas_call(
            functools.partial(kernel1, mode=mode),
            grid_spec=grid_spec,
            out_shape=tuple(
                jax.ShapeDtypeStruct((J, S_SLAB, NT),
                                     jnp.float32 if c == 0 else jnp.bfloat16)
                for c in range(4)
            ),
        )(*a))
        argsets = [
            (jnp.asarray(t_np), jnp.asarray(j_np), z_rows, o_r * s, d_r, vr,
             freqs, phase, *weight_ops)
            for s in (1.0, 1.01, 1.02, 1.03)
        ]
    else:
        tA, jA = t_np[0::2], j_np[0::2]
        tB, jB = t_np[1::2], j_np[1::2]

        def zsp(which):
            return pl.BlockSpec(
                (1, 8, 128),
                (lambda k, ta, ja, tb, jb: (ja[k], 0, 0)) if which == 0
                else (lambda k, ta, ja, tb, jb: (jb[k], 0, 0)),
                memory_space=pltpu.VMEM)

        def rsp(width, which):
            return pl.BlockSpec(
                (R_T, width),
                (lambda k, ta, ja, tb, jb: (ta[k], 0)) if which == 0
                else (lambda k, ta, ja, tb, jb: (tb[k], 0)),
                memory_space=pltpu.VMEM)

        def osp(which):
            return pl.BlockSpec(
                (1, S_SLAB, R_T),
                (lambda k, ta, ja, tb, jb: (ja[k], 0, ta[k])) if which == 0
                else (lambda k, ta, ja, tb, jb: (jb[k], 0, tb[k])),
                memory_space=pltpu.VMEM)

        const = lambda k, ta, ja, tb, jb: (0, 0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(K // 2,),
            in_specs=[
                zsp(0), zsp(1),
                rsp(PE_PAD, 0), rsp(PE_PAD, 0),
                rsp(PE_PAD, 1), rsp(PE_PAD, 1),
                rsp(256, 0), rsp(256, 1),
                pl.BlockSpec((1, PE_PAD), const, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, PE_PAD), const, memory_space=pltpu.VMEM),
            ] + wspecs,
            out_specs=tuple(osp(0) for _ in range(4))
            + tuple(osp(1) for _ in range(4)),
        )
        fn = jax.jit(lambda *a: pl.pallas_call(
            functools.partial(kernel2, mode=mode),
            grid_spec=grid_spec,
            out_shape=tuple(
                jax.ShapeDtypeStruct(
                    (J, S_SLAB, NT),
                    jnp.float32 if c % 4 == 0 else jnp.bfloat16)
                for c in range(8)
            ),
        )(*a))
        argsets = [
            (jnp.asarray(tA), jnp.asarray(jA), jnp.asarray(tB),
             jnp.asarray(jB), z_rows, z_rows, o_r * s, d_r, o_r * s, d_r,
             vr, vr, freqs, phase, *weight_ops)
            for s in (1.0, 1.01, 1.02, 1.03)
        ]

    ms = bench(fn, argsets)
    chk = float(jnp.abs(fn(*argsets[0])[0]).sum())
    print(f"  {mode:8s} {ms:7.2f} ms  ({ms / K * 1e3:.1f} us/pair)"
          f"  chk={chk:.3e}", flush=True)
    return ms


if __name__ == "__main__":
    print(f"K={K} pairs, rows/pair={S_SLAB * R_T}")
    import sys
    modes = sys.argv[1:] or ("single", "cat2", "ilv2", "ilv2bf", "zip2")
    for mode in modes:
        run(mode)
