"""Step-2 landmark-stack DAG test: runs PipelineDriver.step_landmarks over a
synthetic "video" built from the reference's shipped face photo (real
BlazeFace weights drive detection; HRNet/eye nets are random-init via the
random:<seed> asset mode — the machinery, contracts, and temporal logic are
what's under test, not landmark accuracy).

Asserts the reference demo's on-disk semantics
(demo_face_eye_detectPerframe_save.py):
- dense frame ids: a no-face frame still gets a zero-landmark .lms (:660-690)
- pose pkl dicts with pose_mat/pose_np/steady_pose/face_landmarks_show
  (:1062-1076)
- eye landmark output per detected frame (the GhostNet eye pass, :854-943)
- the LK + Kalman chains run without touching placeholder frames
"""

import os
import pickle
from glob import glob

import numpy as np
import pytest

from conftest import REFERENCE_ROOT, reference_available

BF_PTH = os.path.join(
    REFERENCE_ROOT, "data_util", "face-alignment", "third_party",
    "BlazeFace-PyTorch", "blazeface.pth",
)
FACE_PNG = os.path.join(os.path.dirname(BF_PTH), "1face.png")

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


@needs_reference
def test_step_landmarks_dense_contract(tmp_path):
    import cv2

    from dfanerf_tpu.pipeline.driver import PipelineAssets, PipelineDriver

    img = cv2.imread(FACE_PNG)
    assert img is not None
    size = 256
    img = cv2.resize(img, (size, size))

    id_dir = tmp_path / "subject"
    (id_dir / "ori_imgs").mkdir(parents=True)
    n = 5
    blank_frame = 2  # this frame has no face -> zero-landmark placeholder
    for i in range(n):
        if i == blank_frame:
            frame = np.full((size, size, 3), 90, np.uint8)
        else:
            # small translation so LK has genuine inter-frame motion
            m = np.float32([[1, 0, 2 * i], [0, 1, -i]])
            frame = cv2.warpAffine(img, m, (size, size))
        cv2.imwrite(str(id_dir / "ori_imgs" / f"{i:06d}.jpg"), frame)

    assets = PipelineAssets(
        blazeface_pth=BF_PTH,
        hrnet_pth="random:0",
        eye_pth="random:1",
    )
    driver = PipelineDriver(str(id_dir), assets, dst_size=size)
    # smooth_lms=False so the zero placeholder is observable (the reference's
    # jaw smoothing pass runs over placeholders too and contaminates them —
    # process_data_ba.py:186-196 — which a separate check below covers)
    poses = driver.step_landmarks(score_thresh=-1e9, smooth_lms=False)

    # dense-frame contract: every frame id has a .lms, incl. the blank one
    lms_files = sorted(glob(str(id_dir / "ori_imgs" / "*.lms")))
    assert [int(os.path.basename(p).split(".")[0]) for p in lms_files] == list(range(n))
    blank = np.loadtxt(lms_files[blank_frame])
    assert blank.shape == (68, 2) and (blank == 0).all()
    for i in range(n):
        if i == blank_frame:
            continue
        lms = np.loadtxt(lms_files[i])
        assert lms.shape == (68, 2)
        assert np.isfinite(lms).all()
        # landmarks land inside the frame (affine uncrop sanity)
        assert (lms >= -size).all() and (lms <= 2 * size).all()

    # pose pkls for detected frames only; placeholder frame has none
    pkls = sorted(glob(str(id_dir / "pose_pkl" / "*.pkl")))
    assert [int(os.path.basename(p).split(".")[0]) for p in pkls] == [
        i for i in range(n) if i != blank_frame
    ]
    with open(pkls[0], "rb") as f:
        d = pickle.load(f)
    assert d["pose_mat"].shape == (3, 4)
    assert d["pose_np"].shape == (6,)
    assert d["steady_pose"].shape == (2, 3)
    assert d["face_landmarks_show"].shape == (56, 2)  # 68 - eye region 36:48

    # eye landmarks per detected frame (6 left + 6 right)
    eyes = sorted(glob(str(id_dir / "ori_imgs" / "*.eye")))
    assert len(eyes) == n - 1
    assert np.loadtxt(eyes[0]).shape == (12, 2)

    # returned pose matrices are rigid transforms for detected frames
    assert set(poses.keys()) == {i for i in range(n) if i != blank_frame}
    for m in poses.values():
        R = m[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


@needs_reference
def test_step_landmarks_low_score_skips_lms(tmp_path):
    """Low-score frames get NO .lms file but are listed in the QA file
    (demo...save.py:777-793) — an unreachable threshold makes every
    detected frame low-score regardless of the random net's magnitude."""
    import cv2

    from dfanerf_tpu.pipeline.driver import PipelineAssets, PipelineDriver

    img = cv2.resize(cv2.imread(FACE_PNG), (128, 128))
    id_dir = tmp_path / "s2"
    (id_dir / "ori_imgs").mkdir(parents=True)
    for i in range(2):
        cv2.imwrite(str(id_dir / "ori_imgs" / f"{i:06d}.jpg"), img)

    driver = PipelineDriver(
        str(id_dir),
        PipelineAssets(blazeface_pth=BF_PTH, hrnet_pth="random:0"),
        dst_size=128,
    )
    driver.step_landmarks(score_thresh=1e9, smooth_lms=False)
    assert glob(str(id_dir / "ori_imgs" / "*.lms")) == []
    qa = np.loadtxt(str(id_dir / "low_score_frames.txt"))
    assert qa.reshape(-1, 2).shape[0] == 2
