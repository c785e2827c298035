"""BlazeFace: real-weight parity against the reference's shipped
blazeface.pth + anchors.npy, end-to-end on a shipped test photo."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import REFERENCE_ROOT, reference_available

from dfanerf_tpu.models.perception.blazeface import (
    apply_blazeface,
    blazeface_from_torch,
    decode_boxes,
    detect_faces,
    generate_anchors,
    init_blazeface,
)

BF_DIR = os.path.join(
    REFERENCE_ROOT, "data_util", "face-alignment", "third_party", "BlazeFace-PyTorch"
)
needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


class TestBlazeFace:
    def test_shapes(self):
        params = init_blazeface(jax.random.PRNGKey(0))
        x = jnp.zeros((2, 128, 128, 3))
        boxes, scores = apply_blazeface(params, x)
        assert boxes.shape == (2, 896, 16) and scores.shape == (2, 896)

    @needs_reference
    def test_generated_anchors_match_shipped(self):
        shipped = np.load(os.path.join(BF_DIR, "anchors.npy"))
        np.testing.assert_allclose(generate_anchors(), shipped, atol=1e-6)

    @needs_reference
    def test_real_weight_network_parity(self):
        import torch

        sd = torch.load(os.path.join(BF_DIR, "blazeface.pth"), map_location="cpu")
        params = blazeface_from_torch(sd)
        import sys

        sys.path.insert(0, BF_DIR)
        from blazeface import BlazeFace

        net = BlazeFace().eval()
        net.load_state_dict(sd)
        x = np.random.RandomState(0).rand(1, 128, 128, 3).astype(np.float32) * 2 - 1
        with torch.no_grad():
            r_ref, c_ref = net(torch.tensor(x.transpose(0, 3, 1, 2)))
        boxes, scores = apply_blazeface(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(boxes), r_ref.numpy(), atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(scores), c_ref.numpy()[..., 0], atol=2e-4, rtol=1e-3)

    @needs_reference
    def test_detects_face_on_shipped_photo(self):
        import imageio.v2 as imageio
        import torch
        import cv2

        sd = torch.load(os.path.join(BF_DIR, "blazeface.pth"), map_location="cpu")
        params = blazeface_from_torch(sd)
        img = imageio.imread(os.path.join(BF_DIR, "1face.png"))[..., :3]
        img = cv2.resize(np.asarray(img), (128, 128))
        dets = detect_faces(params, generate_anchors(), img[None])
        assert dets[0].shape[0] >= 1, "no face found on the 1-face test photo"
        y0, x0, y1, x1 = dets[0][0, :4]
        assert 0.0 < y0 < y1 < 1.1 and 0.0 < x0 < x1 < 1.1
        assert dets[0][0, 16] > 0.75
