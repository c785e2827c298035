"""Edge-map export (generate_edge_map.py port): label numerics and the
train_val loop quirk."""

import os

import numpy as np

from dfanerf_tpu.pipeline.edge_map import (
    BODY_LABEL,
    HEAD_LABEL,
    NECK_LABEL,
    body_seg_map,
    export_edge_maps,
)


def test_labels_are_parsing_color_lumas():
    """The reference's magic labels are the ITU-R 601 lumas of the parsing
    colors: red head -> 76, green neck -> 149.7~150, blue body -> 29."""
    red = np.zeros((1, 1, 3), np.uint8)
    red[..., 0] = 255
    green = np.zeros((1, 1, 3), np.uint8)
    green[..., 1] = 255
    blue = np.zeros((1, 1, 3), np.uint8)
    blue[..., 2] = 255
    from dfanerf_tpu.pipeline.edge_map import _grayscale

    assert int(_grayscale(red)) == BODY_LABEL       # 76
    assert int(_grayscale(green)) in (NECK_LABEL - 1, NECK_LABEL)
    assert int(_grayscale(blue)) == HEAD_LABEL      # 29


def test_body_seg_map_selects_label_pixels():
    parse = np.full((8, 8, 3), 255, np.uint8)  # bg white
    parse[2:4, 3:5] = (255, 0, 0)              # luma 76 == BODY_LABEL
    seg = body_seg_map(parse, input_size=8)
    assert seg.shape == (8, 8, 1)
    assert (seg[2:4, 3:5, 0] == 255).all()
    assert seg.sum() == 255 * 4


def test_export_train_val_quirk(tmp_path):
    """With the reference quirk on, rows below val_idx are skipped entirely;
    val rows get renumbered-from-zero inputs/gt/seg files."""
    import cv2

    inp = tmp_path / "inp"
    inp_val = tmp_path / "inp_val"
    gt = tmp_path / "gt"
    parse = tmp_path / "parse"
    save = tmp_path / "out"
    for d in (inp, inp_val, gt, parse):
        d.mkdir()
    n, val_idx = 6, 4
    for i in range(n):
        img = np.full((16, 16, 3), i * 10, np.uint8)
        cv2.imwrite(str(inp / f"{i:06d}.jpg"), img)
        cv2.imwrite(str(gt / f"{i:06d}.jpg"), img)
        p = np.full((16, 16, 3), 255, np.uint8)
        p[i : i + 2, :] = (0, 0, 255)  # BGR red on disk -> RGB (255,0,0)
        cv2.imwrite(str(parse / f"{i:06d}.png"), p)
    for c in range(n - val_idx):
        cv2.imwrite(str(inp_val / f"{c:06d}.jpg"),
                    np.full((16, 16, 3), 200 + c, np.uint8))

    written = export_edge_maps(
        str(inp), str(gt), str(parse), str(save),
        input_val_img_path=str(inp_val), mode="train_val",
        val_idx=val_idx, input_size=16,
    )
    assert written == n - val_idx
    # train dirs exist but are empty (reference dead-code quirk)
    assert os.listdir(save / "trainsets" / "input") == []
    assert sorted(os.listdir(save / "valsets" / "gt")) == [
        "000000.jpg", "000001.jpg"
    ]
    seg0 = cv2.imread(str(save / "seg_map_val" / "000000.png"))
    assert seg0 is not None and seg0.max() == 255
    # train rows become reachable with the quirk disabled
    written2 = export_edge_maps(
        str(inp), str(gt), str(parse), str(tmp_path / "out2"),
        input_val_img_path=str(inp_val), mode="train_val",
        val_idx=val_idx, input_size=16, skip_below_val_idx=False,
    )
    assert written2 == n
