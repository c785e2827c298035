"""Non-maximum suppression: vectorized masked NMS (XLA/TPU) + C++ host path.

The reference ships a Cython CPU NMS and a CUDA bitmask kernel
(lib/nms/{cpu_nms.pyx, nms_kernel.cu}) used by the BlazeFace/HRNet face
detector. Detection counts here are tiny (a handful of face boxes per
frame), so the TPU-idiomatic implementation is a fixed-shape masked
formulation: one [N, N] IoU matrix plus a sequential suppression scan in
``lax.fori_loop`` — fully jittable, no dynamic shapes. The C++ extension
(native/nms.cpp) mirrors the reference's native CPU path for host-side
pipelines.

Both produce exactly the reference's keep-set semantics: score-descending
greedy suppression at IoU >= thresh with +1 pixel-inclusive box areas.
"""

from __future__ import annotations

import ctypes

import jax
import jax.numpy as jnp
import numpy as np


def iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """[N, 4] (x1, y1, x2, y2) -> [N, N] pairwise IoU (+1-inclusive area)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    w = jnp.maximum(0.0, xx2 - xx1 + 1.0)
    h = jnp.maximum(0.0, yy2 - yy1 + 1.0)
    inter = w * h
    return inter / (area[:, None] + area[None, :] - inter)


@jax.jit
def nms_mask(dets: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """Masked NMS: dets [N, 5] -> keep mask [N] bool (in ORIGINAL order).

    Greedy over the score-descending order: a box is kept iff no
    higher-scoring kept box overlaps it at IoU >= thresh.
    """
    n = dets.shape[0]
    order = jnp.argsort(-dets[:, 4])
    boxes_sorted = dets[order, :4]
    iou = iou_matrix(boxes_sorted)

    def body(i, keep_sorted):
        # suppressed iff an earlier (higher-score) KEPT box overlaps it
        earlier = jnp.arange(n) < i
        suppressed = jnp.any((iou[i] >= thresh) & keep_sorted & earlier)
        return keep_sorted.at[i].set(~suppressed)

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.zeros((n,), bool))
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def nms(dets: np.ndarray, thresh: float) -> list:
    """Reference-compatible API: returns kept indices in score order
    (cpu_nms semantics, lib/nms/nms.py:14-32)."""
    dets = np.asarray(dets, np.float32)
    keep = np.asarray(nms_mask(jnp.asarray(dets), thresh))
    order = np.argsort(-dets[:, 4], kind="stable")
    return [int(i) for i in order if keep[i]]


def nms_native(dets: np.ndarray, thresh: float) -> list:
    """C++ host NMS (native/nms.cpp) — same contract as ``nms``."""
    from dfanerf_tpu.native import load_library

    lib = load_library("nms")
    lib.nms_cpu.restype = ctypes.c_int32
    dets = np.ascontiguousarray(dets, np.float32)
    n = dets.shape[0]
    keep = np.zeros((max(n, 1),), np.int32)
    n_keep = lib.nms_cpu(
        dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int32(n),
        ctypes.c_float(thresh),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return keep[:n_keep].tolist()
