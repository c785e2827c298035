"""Preprocessing pipeline driver: video -> training-ready dataset directory.

Replaces scripts/process_data.sh + data_util/process_data_ba.py (12 steps
shelling out to 8 separate python programs) with one in-process DAG over
the same on-disk contract (SURVEY.md §2.5):

    step -1  re-encode the source video to 25 fps            (ffmpeg)
    step 0   extract 16 kHz wav + DeepSpeech features        (ffmpeg + jax)
    step 1   extract frames, resize to dst_size^2            (cv2)
    step 2   detect 68 landmarks + head pose -> .lms files   (BlazeFace+HRNet)
    step 3   face parsing -> parsing/{:06d}.png              (BiSeNet)
    step 4   background extraction -> bc.jpg
    step 5   head/com/mask composition
    step 6   dense flow + rigid keypoint tracks              (RAFT)
    step 7   3DMM landmark fitting -> track_params_ba.pt     (vmapped fit)
    step 8   bundle adjustment -> bundle_adjustment.pt
    step 9   transforms_{train,val}_ba.json + config txts
    step 10  expression disentanglement -> {id}_64_32.pt
    step 11  wav2exp features -> {id}_aud.pt

Model weights are external assets (PipelineAssets), exactly like the
reference's checkpoint blobs. Steps degrade with clear errors when an
asset is absent. Outputs are .npz/.npy first-class with .pt written when
torch is importable (reference-compat).
"""

from __future__ import annotations

import dataclasses
import json
import os
import subprocess
from glob import glob
from typing import Optional

import numpy as np


@dataclasses.dataclass
class PipelineAssets:
    """Paths to external pretrained weights / bases (reference blobs)."""

    blazeface_pth: Optional[str] = None
    hrnet_pth: Optional[str] = None
    eye_pth: Optional[str] = None
    bisenet_pth: Optional[str] = None
    raft_pth: Optional[str] = None
    deepspeech_npz: Optional[str] = None
    wav2exp_pth: Optional[str] = None
    disentangle_dir: Optional[str] = None  # holds dis_ckpt.pth / cat_ckpt.pth
    face3dmm_dir: Optional[str] = None
    pose_model_txt: Optional[str] = None


def _imread(path):
    import cv2

    img = cv2.imread(path)
    return img[..., ::-1].copy()  # BGR -> RGB


def _imwrite(path, rgb):
    import cv2

    cv2.imwrite(path, np.asarray(rgb)[..., ::-1])


def _torch_save(obj, path):
    try:
        import torch

        torch.save(
            {k: torch.as_tensor(np.asarray(v)) for k, v in obj.items()}
            if isinstance(obj, dict)
            else torch.as_tensor(np.asarray(obj)),
            path,
        )
    except ImportError:
        np.savez(path + ".npz", **(obj if isinstance(obj, dict) else {"data": obj}))


def _valid_img_ids(id_dir):
    lms = sorted(glob(os.path.join(id_dir, "ori_imgs", "*.lms")))
    return [int(os.path.basename(p).split(".")[0]) for p in lms]


class PipelineDriver:
    def __init__(self, id_dir: str, assets: PipelineAssets = PipelineAssets(),
                 dst_size: int = 512):
        self.id_dir = id_dir
        self.id = os.path.basename(os.path.normpath(id_dir))
        self.assets = assets
        self.dst_size = dst_size
        for sub in ("ori_imgs", "parsing", "com_imgs", "head_imgs",
                    "face_mask", "flow_result"):
            os.makedirs(os.path.join(id_dir, sub), exist_ok=True)

    # -- steps -----------------------------------------------------------

    def step_reencode(self, src_video: str):
        out = os.path.join(self.id_dir, f"{self.id}_25fps.mp4")
        subprocess.run(
            ["ffmpeg", "-y", "-i", src_video, "-r", "25", out],
            check=True, capture_output=True,
        )
        return out

    def step_audio(self, video: str, video_fps: float = 25.0):
        wav_path = os.path.join(self.id_dir, "aud.wav")
        subprocess.run(
            ["ffmpeg", "-y", "-i", video, "-f", "wav", "-ar", "16000", wav_path],
            check=True, capture_output=True,
        )
        if self.assets.deepspeech_npz:
            from scipy.io import wavfile

            from dfanerf_tpu.pipeline.audio.deepspeech import (
                deepspeech_features_from_wav,
                load_deepspeech_npz,
            )

            sr, wav = wavfile.read(wav_path)
            params = load_deepspeech_npz(self.assets.deepspeech_npz)
            windows = deepspeech_features_from_wav(
                params, wav.astype(np.float32), sr, video_fps
            )
            np.save(os.path.join(self.id_dir, "aud.npy"), windows)
        return wav_path

    def step_frames(self, video: str):
        import cv2

        cap = cv2.VideoCapture(video)
        i = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frame = cv2.resize(frame, (self.dst_size, self.dst_size))
            cv2.imwrite(
                os.path.join(self.id_dir, "ori_imgs", f"{i:06d}.jpg"), frame
            )
            i += 1
        cap.release()
        return i

    def step_landmarks(self, smooth_lms: bool = True):
        """BlazeFace detect -> HRNet 68-landmark decode -> .lms files +
        head poses (the shipped demo_face_eye_detectPerframe_save path)."""
        import cv2
        import torch
        import jax.numpy as jnp

        from dfanerf_tpu.models.perception.blazeface import (
            blazeface_from_torch, detect_faces, generate_anchors,
        )
        from dfanerf_tpu.models.perception.hrnet import apply_hrnet, hrnet_from_torch
        from dfanerf_tpu.pipeline.heatmaps import decode_heatmaps
        from dfanerf_tpu.pipeline.pose import PoseEstimator
        from dfanerf_tpu.pipeline.steps import landmark_gaussian_smooth

        assert self.assets.blazeface_pth and self.assets.hrnet_pth, (
            "step 2 needs blazeface_pth and hrnet_pth assets"
        )
        bf = blazeface_from_torch(torch.load(self.assets.blazeface_pth, map_location="cpu"))
        anchors = generate_anchors()
        hr = hrnet_from_torch(torch.load(self.assets.hrnet_pth, map_location="cpu"))
        paths = sorted(glob(os.path.join(self.id_dir, "ori_imgs", "*.jpg")))
        est = PoseEstimator((self.dst_size, self.dst_size), self.assets.pose_model_txt)
        all_lms, ids, poses, scores = [], [], [], []
        for p in paths:
            img = _imread(p)
            h, w = img.shape[:2]
            small = cv2.resize(img, (128, 128))
            dets = detect_faces(bf, anchors, small[None])[0]
            if len(dets) == 0:
                continue
            scores.append(float(dets[0, 16]))
            y0, x0, y1, x1 = dets[0, :4] * np.array([h, w, h, w])
            cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
            size = max(y1 - y0, x1 - x0) * 1.5
            x0c, y0c = int(max(cx - size / 2, 0)), int(max(cy - size / 2, 0))
            x1c = int(min(cx + size / 2, w))
            y1c = int(min(cy + size / 2, h))
            crop = cv2.resize(img[y0c:y1c, x0c:x1c], (256, 256))
            hm = apply_hrnet(hr, jnp.asarray(crop[None], jnp.float32) / 255.0)
            coords, _ = decode_heatmaps(hm, sigma=1.5)
            lms = np.asarray(coords[0]) * 4.0  # heatmap 64 -> crop 256
            lms[:, 0] = lms[:, 0] * (x1c - x0c) / 256.0 + x0c
            lms[:, 1] = lms[:, 1] * (y1c - y0c) / 256.0 + y0c
            all_lms.append(lms)
            ids.append(int(os.path.basename(p).split(".")[0]))
        all_lms = np.stack(all_lms)
        if smooth_lms:
            all_lms = landmark_gaussian_smooth(all_lms, 1.5, area="only_jaw")
        # QA: frames whose detection confidence was low (the reference's
        # low_score_idxes list, demo...save.py:777-779,1114)
        low_score = [i for i, s in zip(ids, scores) if s < 0.9]
        if low_score:
            np.savetxt(
                os.path.join(self.id_dir, "low_score_frames.txt"),
                np.asarray(low_score, np.int32), "%d",
            )
        for i, lms in zip(ids, all_lms):
            np.savetxt(
                os.path.join(self.id_dir, "ori_imgs", f"{i:06d}.lms"), lms, "%f"
            )
            r, t = est.solve_pose_by_68_points(lms)
            poses.append(est.pose_to_matrix(r, t))
        return np.stack(poses)

    def step_parsing(self):
        import torch
        import jax.numpy as jnp

        from dfanerf_tpu.models.perception.bisenet import (
            apply_bisenet, bisenet_from_torch,
        )

        assert self.assets.bisenet_pth, "step 3 needs bisenet_pth"
        params = bisenet_from_torch(torch.load(self.assets.bisenet_pth, map_location="cpu"))
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        # class -> color: head parts red, neck green, body blue, bg white
        # (face_parsing/test.py:31-50)
        colors = np.full((19, 3), 255, np.uint8)
        for c in range(1, 14):
            colors[c] = (255, 0, 0)
        colors[14] = (0, 255, 0)
        colors[16] = (0, 0, 255)
        colors[17] = (255, 0, 0)
        for p in sorted(glob(os.path.join(self.id_dir, "ori_imgs", "*.jpg"))):
            img = _imread(p).astype(np.float32) / 255.0
            x = jnp.asarray(((img - mean) / std)[None])
            out, _, _ = apply_bisenet(params, x)
            classes = np.asarray(out[0].argmax(-1))
            name = os.path.basename(p).replace(".jpg", ".png")
            _imwrite(os.path.join(self.id_dir, "parsing", name), colors[classes])

    def step_background(self, every: int = 20):
        from dfanerf_tpu.pipeline.steps import extract_background

        ids = _valid_img_ids(self.id_dir)[::every]
        parsing = np.stack(
            [_imread(os.path.join(self.id_dir, "parsing", f"{i:06d}.png")) for i in ids]
        )
        ori = np.stack(
            [_imread(os.path.join(self.id_dir, "ori_imgs", f"{i:06d}.jpg")) for i in ids]
        )
        bc = extract_background(parsing, ori)
        _imwrite(os.path.join(self.id_dir, "bc.jpg"), bc)
        return bc

    def step_compose(self):
        from dfanerf_tpu.pipeline.steps import compose_training_images

        bc = _imread(os.path.join(self.id_dir, "bc.jpg"))
        for i in _valid_img_ids(self.id_dir):
            ori = _imread(os.path.join(self.id_dir, "ori_imgs", f"{i:06d}.jpg"))
            parsing = _imread(os.path.join(self.id_dir, "parsing", f"{i:06d}.png"))
            com, head, mask = compose_training_images(ori, parsing, bc)
            _imwrite(os.path.join(self.id_dir, "com_imgs", f"{i:06d}.jpg"), com)
            _imwrite(os.path.join(self.id_dir, "head_imgs", f"{i:06d}.jpg"), head)
            _imwrite(os.path.join(self.id_dir, "face_mask", f"{i:06d}.png"), mask)

    def step_flow(self, ref_id: int = 18, crop_hw=(240, 320)):
        import torch
        import jax.numpy as jnp

        from dfanerf_tpu.models.perception.raft import (
            apply_raft_small, raft_small_from_torch,
        )
        from dfanerf_tpu.pipeline.steps import (
            flow_stability_map, mine_rigid_keypoints, track_keypoints,
        )

        assert self.assets.raft_pth, "step 6 needs raft_pth"
        params = raft_small_from_torch(torch.load(self.assets.raft_pth, map_location="cpu"))
        ids = _valid_img_ids(self.id_dir)
        ref = _imread(os.path.join(self.id_dir, "ori_imgs", f"{ref_id:06d}.jpg"))
        h, w = ref.shape[:2]
        flows = []
        import cv2

        ref_small = cv2.resize(ref, (crop_hw[1], crop_hw[0])).astype(np.float32)
        for i in ids:
            tgt = _imread(os.path.join(self.id_dir, "ori_imgs", f"{i:06d}.jpg"))
            tgt_small = cv2.resize(tgt, (crop_hw[1], crop_hw[0])).astype(np.float32)
            flow, _ = apply_raft_small(
                params, jnp.asarray(ref_small[None]), jnp.asarray(tgt_small[None])
            )
            flow = np.asarray(flow[0])
            # rescale crop flow back to full res
            flow_full = cv2.resize(flow, (w, h))
            flow_full[..., 0] *= w / crop_hw[1]
            flow_full[..., 1] *= h / crop_hw[0]
            f = flow_full.transpose(2, 0, 1)
            flows.append(f)
            np.save(
                os.path.join(self.id_dir, "flow_result", f"{ref_id:06d}_{i:06d}.npy"), f
            )
        mask = _imread(os.path.join(self.id_dir, "face_mask", f"{ref_id:06d}.png"))
        rigid_mask = mask[..., 0] > 250
        rigid = np.stack([f[:, rigid_mask] for f in flows])
        stab = flow_stability_map(rigid, rigid_mask, h, w)
        key_xys = mine_rigid_keypoints(stab)
        np.savetxt(os.path.join(self.id_dir, "keypoints.txt"), key_xys, "%d")
        track = track_keypoints(flows, key_xys)
        np.save(os.path.join(self.id_dir, "track_xys.npy"), track)
        return track

    def step_track(self, n_iters: int = 2000):
        import jax.numpy as jnp

        from dfanerf_tpu.pipeline.face3dmm import load_face3dmm
        from dfanerf_tpu.pipeline.tracking import fit_landmarks

        assert self.assets.face3dmm_dir, "step 7 needs face3dmm_dir"
        model = load_face3dmm(self.assets.face3dmm_dir)
        ids = _valid_img_ids(self.id_dir)
        lms = np.stack(
            [
                np.loadtxt(os.path.join(self.id_dir, "ori_imgs", f"{i:06d}.lms"))
                for i in ids
            ]
        )
        params, loss = fit_landmarks(
            model, jnp.asarray(lms, jnp.float32),
            (self.dst_size / 2.0, self.dst_size / 2.0), n_iters=n_iters,
        )
        _torch_save(
            {
                "id": np.asarray(params.id),
                "exp": np.asarray(params.exp),
                "euler": np.asarray(params.euler),
                "trans": np.asarray(params.trans),
                "focal": np.asarray(params.focal),
            },
            os.path.join(self.id_dir, "track_params_ba.pt"),
        )
        return loss

    def step_bundle_adjust(self):
        import jax.numpy as jnp

        from dfanerf_tpu.data.dataset import _load_pt_or_npy
        from dfanerf_tpu.pipeline.tracking import bundle_adjust

        base = os.path.join(self.id_dir, "track_params_ba.pt")
        euler = _load_pt_or_npy(base, "euler")
        trans = _load_pt_or_npy(base, "trans") / 1000.0
        focal = _load_pt_or_npy(base, "focal")
        track = np.load(os.path.join(self.id_dir, "track_xys.npy"))
        out = bundle_adjust(
            track, jnp.asarray(euler), jnp.asarray(trans), jnp.asarray(focal[0]),
            (self.dst_size / 2.0, self.dst_size / 2.0),
        )
        _torch_save(
            {"euler": np.asarray(out["euler"]), "trans": np.asarray(out["trans"]),
             "focal": np.asarray(focal)},
            os.path.join(self.id_dir, "bundle_adjustment.pt"),
        )

    def step_transforms(self):
        from dfanerf_tpu.data.dataset import _load_pt_or_npy
        from dfanerf_tpu.pipeline.steps import build_transforms

        base = os.path.join(self.id_dir, "bundle_adjustment.pt")
        euler = _load_pt_or_npy(base, "euler")
        trans = _load_pt_or_npy(base, "trans")
        focal = _load_pt_or_npy(base, "focal")
        ids = _valid_img_ids(self.id_dir)
        lms = [
            np.loadtxt(os.path.join(self.id_dir, "ori_imgs", f"{i:06d}.lms"))
            for i in ids
        ]
        train, val, near, far = build_transforms(
            euler, trans, float(focal.reshape(-1)[0]), lms, ids,
            self.dst_size, self.dst_size,
        )
        for name, obj in (("train", train), ("val", val)):
            with open(
                os.path.join(self.id_dir, f"transforms_{name}_ba.json"), "w"
            ) as f:
                json.dump(obj, f, indent=2, separators=(",", ": "))
        for cfg_name, exp_suffix, extra in (
            ("HeadNeRF_config_ba.txt", "_head", None),
            ("TorsoNeRF_config_ba.txt", "_com", None),
            ("TorsoNeRFTest_config_ba.txt", "_com", "with_test = 1"),
        ):
            with open(os.path.join(self.id_dir, cfg_name), "w") as f:
                f.write(f"expname = {self.id}{exp_suffix}\n")
                f.write(f"datadir = {os.path.abspath(self.id_dir)}\n")
                f.write(f"basedir = {os.path.abspath(self.id_dir)}/logs\n")
                f.write(f"near = {near}\n")
                f.write(f"far = {far}\n")
                f.write(f"{extra}\n" if extra else "testskip = 1\n")
        return near, far

    def step_disentangle(self):
        import torch

        from dfanerf_tpu.data.dataset import _load_pt_or_npy
        from dfanerf_tpu.pipeline.disentangle import (
            disentangle_sequence, distangler_from_torch,
        )

        assert self.assets.disentangle_dir, "step 10 needs disentangle_dir"
        dis = distangler_from_torch(
            torch.load(
                os.path.join(self.assets.disentangle_dir, "dis_ckpt.pth"),
                map_location="cpu",
            )
        )
        import jax.numpy as jnp

        exps = _load_pt_or_npy(
            os.path.join(self.id_dir, "track_params_ba.pt"), "exp"
        )
        out = disentangle_sequence(dis, jnp.asarray(exps))
        _torch_save(out, os.path.join(self.id_dir, f"{self.id}_64_32.pt"))

    def step_wav2exp(self):
        import torch
        import jax.numpy as jnp
        from scipy.io import wavfile

        from dfanerf_tpu.pipeline.audio.wav2exp import (
            audio_encoder_from_torch, wav2exp_features,
        )

        assert self.assets.wav2exp_pth, "step 11 needs wav2exp_pth"
        sd = torch.load(self.assets.wav2exp_pth, map_location="cpu")
        if not any(k.startswith("audio_encoder.") for k in sd):
            sd = {f"audio_encoder.{k}": v for k, v in sd.items()}
        params = audio_encoder_from_torch(sd)
        sr, wav = wavfile.read(os.path.join(self.id_dir, "aud.wav"))
        wav = wav.astype(np.float32) / 32768.0
        feats = wav2exp_features(params, jnp.asarray(wav))
        _torch_save(feats, os.path.join(self.id_dir, f"{self.id}_aud.pt"))
        return feats
