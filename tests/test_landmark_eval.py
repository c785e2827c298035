"""Benchmark-eval harness (pipeline/landmark_eval.py) vs the reference's
evaluate.py semantics — including a direct numeric check against the
reference's own compute_nme/dist_acc when the checkout is present."""

import numpy as np
import pytest

from dfanerf_tpu.pipeline.landmark_eval import (
    append_run_log,
    benchmark_report,
    compute_nme_benchmark,
    pck_accuracy,
)
from tests.conftest import reference_available


def test_nme_normalization_dispatch():
    rng = np.random.RandomState(0)
    for L in (29, 68, 98):
        gt = rng.rand(4, L, 2) * 100
        pred = gt + 1.0
        nme = compute_nme_benchmark(pred, gt)
        assert nme.shape == (4,)
        assert (nme > 0).all()
    # AFLW needs box sizes
    gt = rng.rand(2, 19, 2) * 100
    with pytest.raises(ValueError):
        compute_nme_benchmark(gt, gt)
    nme = compute_nme_benchmark(gt + 2.0, gt, box_size=np.array([50.0, 80.0]))
    # error = sum(||2,2||)/(box*L) exactly
    np.testing.assert_allclose(
        nme, np.sqrt(8.0) * 19 / (np.array([50.0, 80.0]) * 19), rtol=1e-6)


@pytest.mark.skipif(not reference_available(), reason="reference absent")
def test_nme_matches_reference_compute_nme():
    import sys, os
    sys.path.insert(0, "/root/reference/data_util/face-alignment/lib")
    import torch
    from core.evaluate import compute_nme as ref_nme

    rng = np.random.RandomState(1)
    gt = rng.rand(6, 68, 2).astype(np.float32) * 200
    pred = gt + rng.randn(6, 68, 2).astype(np.float32)
    ours = compute_nme_benchmark(pred, gt)
    theirs = ref_nme(torch.tensor(pred), {"pts": torch.tensor(gt)})
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_pck_invalid_landmarks_ignored():
    pred = np.zeros((2, 3, 2)) + 5.0
    gt = np.zeros((2, 3, 2)) + 5.0
    gt[:, 2] = 0.5  # invalid (<=1) -> ignored
    acc, avg, cnt = pck_accuracy(pred, gt, (64, 64))
    assert cnt == 2 and avg == 1.0 and acc[3] == -1.0


def test_benchmark_report_and_csv_log(tmp_path):
    rng = np.random.RandomState(2)
    gt = rng.rand(10, 68, 2) * 100
    imgs = np.zeros((10, 8, 8, 3))
    imgs[:, 0, 0, 0] = np.arange(10)  # identity channel for the stub

    report = benchmark_report(
        lambda b: gt[b[:, 0, 0, 0].astype(int)] + 0.5, imgs, gt, batch=4)
    assert report["n_images"] == 10
    assert 0 < report["nme_mean"] < 0.2
    assert set(report["failure_rates"]) == {"0.08", "0.10"}
    assert 0.0 <= report["auc@0.10"] <= 1.0

    p = append_run_log(str(tmp_path), {
        "Backbone": "hrnet", "Dataset": "300W", "Test Perf": report["nme_mean"],
    })
    p2 = append_run_log(str(tmp_path), {"Backbone": "u2net"})
    assert p == p2
    lines = open(p).read().strip().split("\n")
    assert len(lines) == 3 and lines[0].startswith("ID,Backbone")
