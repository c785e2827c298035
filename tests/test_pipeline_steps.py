"""Pipeline step tests: array-level semantics + the full disk contract
roundtrip (driver writes -> dataset loader reads)."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfanerf_tpu.pipeline.manifests import driving_manifest, multi_window_manifest
from dfanerf_tpu.pipeline.steps import (
    build_transforms,
    compose_training_images,
    extract_background,
    face_rect_from_landmarks,
    flow_stability_map,
    landmark_gaussian_smooth,
    mine_rigid_keypoints,
    track_keypoints,
)


def make_scene(h=64, w=64, n=4):
    """Synthetic frames: red-square 'head' on gray bg, moving slightly."""
    ori = np.zeros((n, h, w, 3), np.uint8) + 128
    parsing = np.full((n, h, w, 3), 255, np.uint8)  # bg = white
    for i in range(n):
        y0, x0 = 16 + i, 20 + i
        ori[i, y0 : y0 + 24, x0 : x0 + 20] = (200, 80, 60)
        parsing[i, y0 : y0 + 24, x0 : x0 + 20] = (255, 0, 0)  # head
    return ori, parsing


class TestBackgroundAndCompose:
    def test_background_recovers_static_bg(self):
        ori, parsing = make_scene()
        bc = extract_background(parsing, ori)
        assert bc.shape == ori.shape[1:]
        # far from any head pixel the bg must be the true gray
        assert (bc[0:8, 40:] == 128).all()

    def test_compose(self):
        ori, parsing = make_scene()
        bc = extract_background(parsing, ori)
        com, head, mask = compose_training_images(ori[0], parsing[0], bc)
        head_part = (parsing[0] == (255, 0, 0)).all(-1)
        assert (mask[head_part] == 255).all()
        assert (mask[~head_part] == 0).all()
        # head image equals bc outside the head
        np.testing.assert_array_equal(head[~head_part], bc[~head_part])
        # com keeps the original inside the head
        np.testing.assert_array_equal(com[head_part], ori[0][head_part])


class TestFlowKeypoints:
    def test_stability_and_mining(self):
        h = w = 40
        rng = np.random.RandomState(0)
        mask = np.zeros((h, w), bool)
        mask[10:30, 10:30] = True
        k = int(mask.sum())
        # stable pixels: linear flow over time; unstable: noisy
        f = 24
        t = np.arange(f, dtype=np.float32)
        flows = np.zeros((f, 2, k), np.float32)
        flows[:, 0, :] = t[:, None] * 0.1
        flows[:, 1, :] = t[:, None] * -0.05
        noisy = rng.rand(k) < 0.5
        flows[:, 0, noisy] += rng.randn(f, int(noisy.sum())) * 2.0
        stab = flow_stability_map(flows, mask, h, w)
        assert stab.shape == (h, w, 1)
        stable_vals = stab[mask, 0][~noisy]
        noisy_vals = stab[mask, 0][noisy]
        assert stable_vals.mean() < noisy_vals.mean()
        keys = mine_rigid_keypoints(stab, win_size=5, d_size=5, min_value=40)
        assert len(keys) > 0
        # all selected keypoints sit on stable pixels
        assert (stab[keys[:, 1], keys[:, 0], 0] < 40).all()

    def test_track_keypoints(self):
        flow = np.zeros((2, 16, 16), np.float32)
        flow[0] = 2.0
        flow[1] = -1.0
        keys = np.array([[4, 5], [10, 3]], np.int32)
        tracks = track_keypoints([flow], keys)
        np.testing.assert_allclose(tracks[0], [[6.0, 4.0], [12.0, 2.0]])


class TestTransforms:
    def test_build_transforms_inverts_pose(self):
        from dfanerf_tpu.core.geometry import euler2rot

        rng = np.random.RandomState(1)
        n = 22
        euler = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
        trans = np.concatenate(
            [rng.uniform(-0.05, 0.05, (n, 2)), -0.6 + rng.uniform(-0.02, 0.02, (n, 1))],
            1,
        ).astype(np.float32)
        lms = [rng.uniform(100, 400, (68, 2)) for _ in range(n)]
        train, val, near, far = build_transforms(
            euler, trans, 900.0, lms, list(range(n)), 512, 512
        )
        assert len(train["frames"]) == int(n * 10 / 11)
        assert len(val["frames"]) == n - int(n * 10 / 11)
        # c2w @ w2c == identity
        R = np.asarray(euler2rot(jnp.asarray(euler)))
        for i, fr in enumerate(train["frames"]):
            c2w = np.array(fr["transform_matrix"])
            w2c = np.eye(4, dtype=np.float32)
            w2c[:3, :3] = R[i]
            w2c[:3, 3] = trans[i]
            np.testing.assert_allclose(c2w @ w2c, np.eye(4), atol=1e-5)
        assert near == pytest.approx(0.6 - 0.2, abs=0.03)
        assert far == pytest.approx(0.6 + 0.4, abs=0.03)

    def test_face_rect(self):
        # face-like layout: jaw bottom (8) below nose bridge (27)
        lms = np.zeros((68, 2))
        lms[:, 0] = np.linspace(150, 350, 68)
        lms[:, 1] = 250.0
        lms[27, 1] = 200.0
        lms[8, 1] = 380.0
        rect = face_rect_from_landmarks(lms, 512, 512)
        assert rect.shape == (4,)
        assert (rect >= 0).all()
        assert rect[2] > 0 and rect[3] > 0

    def test_landmark_smoothing(self):
        rng = np.random.RandomState(2)
        seq = rng.randn(50, 68, 2).astype(np.float32) * 5
        out = landmark_gaussian_smooth(seq, 1.5, area="only_jaw")
        # jaw variance reduced, mouth untouched
        assert out[:, :16].std() < seq[:, :16].std()
        np.testing.assert_array_equal(out[:, 16:], seq[:, 16:])


class TestManifests:
    def _transforms(self, n=30):
        frames = [
            {"img_id": i, "aud_id": i, "face_rect": [0, 0, 10, 10],
             "transform_matrix": np.eye(4).tolist()}
            for i in range(n)
        ]
        return {"focal_len": 900.0, "cx": 256.0, "cy": 256.0, "frames": frames}

    def test_driving_manifest(self):
        tr = self._transforms()
        drive, static = driving_manifest(tr, n_frames=20, param_scale=0.5)
        assert len(drive["frames"]) == 20 and len(static["frames"]) == 20
        assert drive["frames"][5]["img_id"] == 5
        m0 = np.array(static["frames"][0]["transform_matrix"])
        m9 = np.array(static["frames"][9]["transform_matrix"])
        np.testing.assert_array_equal(m0, m9)

    def test_multi_window(self):
        out = multi_window_manifest(self._transforms(), n_frames=50, window=10)
        assert len(out["frames"]) == 50
        assert [f["aud_id"] for f in out["frames"]] == list(range(50))


class TestDiskContractRoundtrip:
    def test_driver_transforms_to_loader(self, tmp_path):
        """steps 9-ish outputs -> load_audface_dataset reads them back."""
        import imageio.v2 as imageio

        from dfanerf_tpu.data import load_audface_dataset
        from dfanerf_tpu.pipeline.driver import PipelineDriver, _torch_save

        id_dir = str(tmp_path / "synthid")
        d = PipelineDriver(id_dir, dst_size=64)
        rng = np.random.RandomState(3)
        n = 22
        # fake per-frame artifacts the contract expects
        for i in range(n):
            img = rng.randint(0, 255, (64, 64, 3), np.uint8)
            imageio.imwrite(os.path.join(id_dir, "ori_imgs", f"{i:06d}.jpg"), img)
            imageio.imwrite(os.path.join(id_dir, "head_imgs", f"{i:06d}.jpg"), img)
            imageio.imwrite(os.path.join(id_dir, "com_imgs", f"{i:06d}.jpg"), img)
            np.savetxt(
                os.path.join(id_dir, "ori_imgs", f"{i:06d}.lms"),
                rng.uniform(10, 54, (68, 2)), "%f",
            )
        imageio.imwrite(
            os.path.join(id_dir, "bc.jpg"), np.full((64, 64, 3), 99, np.uint8)
        )
        euler = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
        trans = np.tile([[0, 0, -0.6]], (n, 1)).astype(np.float32)
        _torch_save(
            {"euler": euler, "trans": trans, "focal": np.array([900.0])},
            os.path.join(id_dir, "bundle_adjustment.pt"),
        )
        near, far = d.step_transforms()
        assert os.path.exists(os.path.join(id_dir, "transforms_train_ba.json"))
        assert os.path.exists(os.path.join(id_dir, "HeadNeRF_config_ba.txt"))

        _torch_save(
            {"exp_o": rng.randn(n, 64).astype(np.float32),
             "exp_m": rng.randn(n, 32).astype(np.float32)},
            os.path.join(id_dir, "synthid_64_32.pt"),
        )
        _torch_save(
            rng.randn(n, 512).astype(np.float32),
            os.path.join(id_dir, "synthid_aud.pt"),
        )
        ds = load_audface_dataset(
            id_dir, "synthid_aud.pt", "synthid_64_32.pt", use_ba=True
        )
        assert ds.n_frames == n
        assert ds.auds.shape == (n, 512) and ds.exps.shape == (n, 64)
        assert ds.imgs_head.shape == (n, 64, 64, 3)
        assert len(ds.i_train) == int(n * 10 / 11)
        from dfanerf_tpu.config import parse_legacy_config_file

        near2, far2 = parse_legacy_config_file(
            os.path.join(id_dir, "HeadNeRF_config_ba.txt")
        )
        assert near2 == pytest.approx(near) and far2 == pytest.approx(far)

    def test_nonba_transforms_step(self, tmp_path):
        """The 7-step AD-NeRF-style variant (process_data.py:190-281):
        transforms without the _ba suffix, trans scaled /10 from
        track_params.pt, testskip = len(val)//7 in the config txts."""
        import json as _json

        import imageio.v2 as imageio

        from dfanerf_tpu.pipeline.driver import PipelineDriver, _torch_save

        id_dir = str(tmp_path / "nonba")
        d = PipelineDriver(id_dir, dst_size=64)
        rng = np.random.RandomState(7)
        n = 33
        for i in range(n):
            imageio.imwrite(
                os.path.join(id_dir, "ori_imgs", f"{i:06d}.jpg"),
                rng.randint(0, 255, (64, 64, 3), np.uint8),
            )
            np.savetxt(
                os.path.join(id_dir, "ori_imgs", f"{i:06d}.lms"),
                rng.uniform(10, 54, (68, 2)), "%f",
            )
        euler = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
        trans = np.tile([[0, 0, -6.0]], (n, 1)).astype(np.float32)  # /10 -> -0.6
        _torch_save(
            {"euler": euler, "trans": trans, "focal": np.array([900.0])},
            os.path.join(id_dir, "track_params.pt"),
        )
        near, far = d.step_transforms_nonba()
        # trans/10: mean_z = 0.6 -> near/far = 0.4/1.0
        assert near == pytest.approx(0.4, abs=1e-5)
        assert far == pytest.approx(1.0, abs=1e-5)
        with open(os.path.join(id_dir, "transforms_train.json")) as f:
            train = _json.load(f)
        with open(os.path.join(id_dir, "transforms_val.json")) as f:
            val = _json.load(f)
        assert len(train["frames"]) == int(n * 10 / 11)
        assert len(val["frames"]) == n - int(n * 10 / 11)
        cfg_txt = open(os.path.join(id_dir, "HeadNeRF_config.txt")).read()
        assert f"testskip = {max(len(val['frames']) // 7, 1)}" in cfg_txt
        assert not os.path.exists(os.path.join(id_dir, "transforms_train_ba.json"))

    def test_torch_free_pt_npz_fallback(self, tmp_path):
        """With torch absent, driver steps write <name>.pt.npz; every later
        consumer that asks for <name>.pt must transparently fall back
        (driver steps 7 -> 8 -> 9 -> loader without torch)."""
        from dfanerf_tpu.data.dataset import _load_pt_or_npy

        base = str(tmp_path / "track_params_ba.pt")
        rng = np.random.RandomState(0)
        euler = rng.randn(5, 3).astype(np.float32)
        np.savez(base + ".npz", euler=euler, focal=np.array([900.0]))
        # .pt itself absent -> npz sibling must be used
        got = _load_pt_or_npy(base, "euler")
        np.testing.assert_array_equal(got, euler)
        got_f = _load_pt_or_npy(base, "focal")
        assert got_f[0] == 900.0

    def test_transforms_step_reads_npz_only_artifacts(self, tmp_path):
        """step 9 must run when step 8 wrote only bundle_adjustment.pt.npz."""
        import imageio.v2 as imageio

        from dfanerf_tpu.pipeline.driver import PipelineDriver

        id_dir = str(tmp_path / "npzid")
        d = PipelineDriver(id_dir, dst_size=64)
        rng = np.random.RandomState(3)
        n = 11
        for i in range(n):
            imageio.imwrite(
                os.path.join(id_dir, "ori_imgs", f"{i:06d}.jpg"),
                rng.randint(0, 255, (64, 64, 3), np.uint8),
            )
            np.savetxt(
                os.path.join(id_dir, "ori_imgs", f"{i:06d}.lms"),
                rng.uniform(10, 54, (68, 2)), "%f",
            )
        np.savez(
            os.path.join(id_dir, "bundle_adjustment.pt.npz"),
            euler=rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32),
            trans=np.tile([[0, 0, -0.6]], (n, 1)).astype(np.float32),
            focal=np.array([900.0]),
        )
        near, far = d.step_transforms()
        assert os.path.exists(os.path.join(id_dir, "transforms_train_ba.json"))
        assert far > near
