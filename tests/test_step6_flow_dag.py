"""Step-6 flow DAG test: driver.step_flow must follow the UNFaceFlow
test_flow crop contract (mask-bbox crops -> RAFT -> rescale/uncrop into the
source rect -> source-mask multiply), not a naive full-frame resize.

Uses a random-init RAFT (random:<seed> asset mode) on tiny synthetic frames:
flow VALUES are arbitrary, but the spatial contract — zeros outside the
source mask, zeros outside the source crop rect, correct artifact shapes —
is fully checkable. Reference: data_util/UNFaceFlow/test_flow.py:88-104,
data_test_flow/dd_dataset.py:52-64, models/network_test_flow.py:73-104.
"""

import os
from glob import glob

import numpy as np
import pytest


@pytest.fixture(scope="module")
def flow_dir(tmp_path_factory):
    import cv2

    from dfanerf_tpu.pipeline.driver import PipelineAssets, PipelineDriver

    tmp = tmp_path_factory.mktemp("flowdag")
    id_dir = tmp / "subj"
    (id_dir / "ori_imgs").mkdir(parents=True)
    (id_dir / "face_mask").mkdir()
    size = 128
    rng = np.random.RandomState(3)
    n = 3
    for i in range(n):
        img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        mask = np.zeros((size, size, 3), np.uint8)
        # face blob moves slightly per frame
        y0, x0 = 30 + 2 * i, 40 + 3 * i
        mask[y0 : y0 + 50, x0 : x0 + 44] = 255
        cv2.imwrite(str(id_dir / "ori_imgs" / f"{i:06d}.jpg"), img)
        cv2.imwrite(str(id_dir / "face_mask" / f"{i:06d}.png"), mask)
        np.savetxt(
            str(id_dir / "ori_imgs" / f"{i:06d}.lms"),
            rng.uniform(30, 90, (68, 2)), "%f",
        )
    driver = PipelineDriver(
        str(id_dir), PipelineAssets(raft_pth="random:0"), dst_size=size
    )
    driver.step_flow(ref_id=0)
    return id_dir, size, n


def test_flow_artifacts_and_mask_contract(flow_dir):
    id_dir, size, n = flow_dir
    flows = sorted(glob(str(id_dir / "flow_result" / "*.npy")))
    assert len(flows) == n
    # source (ref frame 0) mask/rect
    src_mask_y = slice(30, 80)
    src_mask_x = slice(40, 84)
    bound = 10
    y1, y2 = 30 - bound, 79 + bound   # mask bbox +- bound (max is inclusive idx)
    x1, x2 = 40 - bound, 83 + bound
    for p in flows:
        f = np.load(p)
        assert f.shape == (2, size, size)
        # zero outside the source crop rect (uncrop contract)
        outside = np.ones((size, size), bool)
        outside[y1:y2, x1:x2] = False
        assert (f[:, outside] == 0).all()
        # zero outside the source MASK (test_flow.py source-mask multiply)
        in_rect_off_mask = np.zeros((size, size), bool)
        in_rect_off_mask[y1:y2, x1:x2] = True
        in_rect_off_mask[src_mask_y, src_mask_x] = False
        assert (f[:, in_rect_off_mask] == 0).all()
        # real (nonzero) flow on the mask interior
        assert np.abs(f[:, src_mask_y, src_mask_x]).max() > 0

    # keypoint mining artifacts
    assert os.path.exists(str(id_dir / "keypoints.txt"))
    track = np.load(str(id_dir / "track_xys.npy"))
    assert track.ndim == 3 and track.shape[0] == n and track.shape[2] == 2
