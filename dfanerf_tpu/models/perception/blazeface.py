"""BlazeFace 128x128 anchor-based face detector — functional JAX
reimplementation of third_party/BlazeFace-PyTorch/blazeface.py (the shipped
``blazeface.pth`` + ``anchors.npy`` convert directly).

Network: 5x5 stem + 16 depthwise-separable BlazeBlocks over two scales
(16x16 with 2 anchors/cell, 8x8 with 6), channel-padded residuals and the
TFLite-style asymmetric (0,2,0,2) padding on stride-2 blocks. Decoding and
the paper's weighted-blend NMS reproduce the reference post-processing,
including its quirk of thresholding RAW scores at 0.75 (the sigmoid is
commented out at blazeface.py:253-256).
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from dfanerf_tpu.models.perception.common import conv2d, conv_from_torch

Params = Dict[str, Any]

# (in, out, stride) per BlazeBlock, backbone1 then backbone2
BACKBONE1 = [
    (24, 24, 1), (24, 28, 1), (28, 32, 2), (32, 36, 1), (36, 42, 1),
    (42, 48, 2), (48, 56, 1), (56, 64, 1), (64, 72, 1), (72, 80, 1),
    (80, 88, 1),
]
BACKBONE2 = [(88, 96, 2), (96, 96, 1), (96, 96, 1), (96, 96, 1), (96, 96, 1)]

MIN_SCORE_THRESH = 0.75
MIN_SUPPRESSION_THRESHOLD = 0.3
SCALE = 128.0


def _blaze_block(p, x, stride):
    cin = x.shape[-1]
    if stride == 2:
        h = jnp.pad(x, ((0, 0), (0, 2), (0, 2), (0, 0)))
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
            [(0, 0), (0, 0), (0, 0), (0, 0)],
        )
        pad = 0
    else:
        h = x
        pad = 1
    cout = p["conv2"]["w"].shape[-1]
    if cout > cin:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cout - cin)))
    y = conv2d(p["conv1"], h, stride=stride, padding=pad, groups=cin)
    y = conv2d(p["conv2"], y)
    return jax.nn.relu(y + x)


def apply_blazeface(params: Params, x: jnp.ndarray):
    """x: [B, 128, 128, 3] in [-1, 1] -> (raw_boxes [B,896,16],
    raw_scores [B,896])."""
    b = x.shape[0]
    x = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)))  # TFLite stem padding
    x = jax.nn.relu(conv2d(params["stem"], x, stride=2, padding=0))
    for p, (_, _, stride) in zip(params["backbone1"], BACKBONE1):
        x = _blaze_block(p, x, stride)
    h = x
    for p, (_, _, stride) in zip(params["backbone2"], BACKBONE2):
        h = _blaze_block(p, h, stride)
    c1 = conv2d(params["classifier_8"], x).reshape(b, -1, 1)
    c2 = conv2d(params["classifier_16"], h).reshape(b, -1, 1)
    r1 = conv2d(params["regressor_8"], x).reshape(b, -1, 16)
    r2 = conv2d(params["regressor_16"], h).reshape(b, -1, 16)
    return (
        jnp.concatenate([r1, r2], axis=1),
        jnp.concatenate([c1, c2], axis=1)[..., 0],
    )


def generate_anchors() -> np.ndarray:
    """The 896 SSD anchors of the MediaPipe front-camera model
    ((x_center, y_center, w, h) normalized; w = h = 1):
    16x16 cells x2 then 8x8 cells x6 — matches the shipped anchors.npy."""
    anchors = []
    for grid, per_cell in ((16, 2), (8, 6)):
        for y in range(grid):
            for x in range(grid):
                cx = (x + 0.5) / grid
                cy = (y + 0.5) / grid
                anchors.extend([[cx, cy, 1.0, 1.0]] * per_cell)
    return np.asarray(anchors, np.float32)


def decode_boxes(raw_boxes: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """[.., 896, 16] raw regressions -> [ymin,xmin,ymax,xmax, 6x(kx,ky)]."""
    ax, ay, aw, ah = anchors[:, 0], anchors[:, 1], anchors[:, 2], anchors[:, 3]
    xc = raw_boxes[..., 0] / SCALE * aw + ax
    yc = raw_boxes[..., 1] / SCALE * ah + ay
    w = raw_boxes[..., 2] / SCALE * aw
    h = raw_boxes[..., 3] / SCALE * ah
    out = [yc - h / 2, xc - w / 2, yc + h / 2, xc + w / 2]
    for k in range(6):
        out.append(raw_boxes[..., 4 + 2 * k] / SCALE * aw + ax)
        out.append(raw_boxes[..., 5 + 2 * k] / SCALE * ah + ay)
    return jnp.stack(out, axis=-1)


def _iou(box: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """IoU of one [4] (ymin,xmin,ymax,xmax) box vs [N,4] (no +1 — SSD box
    utils semantics used by the reference's overlap_similarity)."""
    ymin = np.maximum(box[0], boxes[:, 0])
    xmin = np.maximum(box[1], boxes[:, 1])
    ymax = np.minimum(box[2], boxes[:, 2])
    xmax = np.minimum(box[3], boxes[:, 3])
    inter = np.clip(ymax - ymin, 0, None) * np.clip(xmax - xmin, 0, None)
    area = (box[2] - box[0]) * (box[3] - box[1])
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / np.maximum(area + areas - inter, 1e-10)


def weighted_nms(detections: np.ndarray, thresh=MIN_SUPPRESSION_THRESHOLD):
    """Blend-style NMS (blazeface.py:309-354): overlapping detections are
    averaged weighted by score; returned score is mean of the cluster."""
    if len(detections) == 0:
        return []
    out = []
    remaining = np.argsort(-detections[:, 16], kind="stable")
    while len(remaining) > 0:
        det = detections[remaining[0]].copy()
        ious = _iou(det[:4], detections[remaining, :4])
        mask = ious > thresh
        overlapping = remaining[mask]
        remaining = remaining[~mask]
        if len(overlapping) > 1:
            coords = detections[overlapping, :16]
            scores = detections[overlapping, 16:17]
            det[:16] = (coords * scores).sum(0) / scores.sum()
            det[16] = scores.sum() / len(overlapping)
        out.append(det)
    return out


def detect_faces(
    params: Params, anchors: np.ndarray, images_u8: np.ndarray
) -> List[np.ndarray]:
    """Full predict_on_batch path: [B,128,128,3] uint8 -> per-image arrays
    of [n, 17] (ymin,xmin,ymax,xmax, 6 keypoints, score), normalized."""
    x = jnp.asarray(images_u8, jnp.float32) / 127.5 - 1.0
    raw_boxes, raw_scores = jax.jit(apply_blazeface)(params, x)
    boxes = np.asarray(decode_boxes(raw_boxes, jnp.asarray(anchors)))
    scores = np.asarray(raw_scores)
    results = []
    for i in range(x.shape[0]):
        mask = scores[i] >= MIN_SCORE_THRESH
        dets = np.concatenate([boxes[i, mask], scores[i, mask, None]], axis=-1)
        faces = weighted_nms(dets)
        results.append(np.stack(faces) if faces else np.zeros((0, 17), np.float32))
    return results


# --- init / converter ---------------------------------------------------------


def init_blazeface(key: jax.Array) -> Params:
    import math

    ks = jax.random.split(key, 40)
    ki = iter(ks)

    def conv(cin, cout, k, groups=1):
        kk = next(ki)
        fan = (cin // groups) * k * k
        bound = 1.0 / math.sqrt(fan)
        k1, k2 = jax.random.split(kk)
        return {
            "w": jax.random.uniform(k1, (k, k, cin // groups, cout), jnp.float32, -bound, bound),
            "b": jax.random.uniform(k2, (cout,), jnp.float32, -bound, bound),
        }

    def block(cin, cout):
        return {"conv1": conv(cin, cin, 3, groups=cin), "conv2": conv(cin, cout, 1)}

    return {
        "stem": conv(3, 24, 5),
        "backbone1": [block(ci, co) for ci, co, _ in BACKBONE1],
        "backbone2": [block(ci, co) for ci, co, _ in BACKBONE2],
        "classifier_8": conv(88, 2, 1),
        "classifier_16": conv(96, 6, 1),
        "regressor_8": conv(88, 32, 1),
        "regressor_16": conv(96, 96, 1),
    }


def blazeface_from_torch(sd: Mapping[str, Any]) -> Params:
    """Convert the shipped blazeface.pth state_dict."""

    def block(prefix):
        return {
            "conv1": conv_from_torch(sd, f"{prefix}.convs.0"),
            "conv2": conv_from_torch(sd, f"{prefix}.convs.1"),
        }

    return {
        "stem": conv_from_torch(sd, "backbone1.0"),
        "backbone1": [block(f"backbone1.{i}") for i in range(2, 13)],
        "backbone2": [block(f"backbone2.{i}") for i in range(5)],
        "classifier_8": conv_from_torch(sd, "classifier_8"),
        "classifier_16": conv_from_torch(sd, "classifier_16"),
        "regressor_8": conv_from_torch(sd, "regressor_8"),
        "regressor_16": conv_from_torch(sd, "regressor_16"),
    }
