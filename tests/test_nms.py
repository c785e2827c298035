"""NMS: masked-XLA and C++ host paths vs the reference Cython semantics
(pure-python oracle transcribing the published greedy algorithm)."""

import numpy as np
import pytest

from dfanerf_tpu.ops.nms import nms, nms_native


def oracle_nms(dets, thresh):
    """Greedy IoU suppression, straight from the textbook definition."""
    x1, y1, x2, y2, scores = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = np.argsort(-scores, kind="stable")
    keep, suppressed = [], np.zeros(len(dets), bool)
    for a, i in enumerate(order):
        if suppressed[i]:
            continue
        keep.append(int(i))
        for j in order[a + 1:]:
            if suppressed[j]:
                continue
            xx1, yy1 = max(x1[i], x1[j]), max(y1[i], y1[j])
            xx2, yy2 = min(x2[i], x2[j]), min(y2[i], y2[j])
            inter = max(0, xx2 - xx1 + 1) * max(0, yy2 - yy1 + 1)
            if inter / (areas[i] + areas[j] - inter) >= thresh:
                suppressed[j] = True
    return keep


def random_dets(rng, n):
    x1 = rng.uniform(0, 200, n)
    y1 = rng.uniform(0, 200, n)
    w = rng.uniform(10, 100, n)
    h = rng.uniform(10, 100, n)
    s = rng.uniform(0, 1, n)
    return np.stack([x1, y1, x1 + w, y1 + h, s], 1).astype(np.float32)


@pytest.mark.parametrize("thresh", [0.3, 0.5, 0.7])
def test_xla_nms_matches_oracle(thresh):
    rng = np.random.RandomState(0)
    for trial in range(5):
        dets = random_dets(rng, 40)
        assert nms(dets, thresh) == oracle_nms(dets, thresh)


@pytest.mark.parametrize("thresh", [0.3, 0.5, 0.7])
def test_native_nms_matches_oracle(thresh):
    rng = np.random.RandomState(1)
    for trial in range(5):
        dets = random_dets(rng, 40)
        assert nms_native(dets, thresh) == oracle_nms(dets, thresh)


def test_edge_cases():
    assert nms_native(np.zeros((0, 5), np.float32), 0.5) == []
    one = np.array([[0, 0, 10, 10, 0.9]], np.float32)
    assert nms(one, 0.5) == [0]
    assert nms_native(one, 0.5) == [0]
    # identical boxes: keep exactly one
    same = np.tile(one, (5, 1))
    same[:, 4] = np.linspace(0.1, 0.9, 5)
    assert nms(same, 0.5) == [4]
