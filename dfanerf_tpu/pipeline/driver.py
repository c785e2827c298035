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


def _load_asset(spec: str, from_torch, init_fn):
    """Load a model asset. ``spec`` is either a torch checkpoint path or
    ``random:<seed>`` (random-init params — lets DAG tests exercise the
    full step machinery without the reference's weight blobs)."""
    if spec.startswith("random:"):
        import jax

        seed = int(spec.split(":", 1)[1] or 0)
        return init_fn(jax.random.PRNGKey(seed))
    import torch

    return from_torch(torch.load(spec, map_location="cpu"))


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

    def step_landmarks(self, smooth_lms: bool = True, score_thresh: float = 0.3,
                       use_optical_flow: bool = True):
        """The full shipped step-2 stack (demo_face_eye_detectPerframe_save.py
        with the process_data_ba.py:166-177 flags: --face_type 300W
        --eye_heatmap_decode --use_optical_flow):

        BlazeFace detect (128 sq input) -> bbox2cs affine crop 256 sq ->
        HRNet heatmaps -> gaussian-modulated decode (:770-775, sigma 2.0) ->
        landmark-score QA (:777-779: low-score frames get NO .lms and are
        listed) -> inverse-affine to frame coords -> LK optical-flow temporal
        stabilization (:823-850, accept tracked point at ||d||<4 px) ->
        GhostNet eye landmarks on pts2cs eye crops (:854-943) with their own
        LK pass -> EPnP head pose + per-scalar Kalman stabilizers
        (:965-977) -> persist {:06d}.lms + pose pkl dicts (:1059-1076).
        No-detection frames write a zero-landmark placeholder so frame ids
        stay dense (:660-690). Jaw-only Gaussian smoothing then runs over
        ALL written .lms files, placeholders included
        (process_data_ba.py:186-199).
        """
        import pickle

        import cv2
        import jax.numpy as jnp

        from dfanerf_tpu.models.perception.blazeface import (
            blazeface_from_torch, detect_faces, generate_anchors,
        )
        from dfanerf_tpu.models.perception.hrnet import apply_hrnet, hrnet_from_torch
        from dfanerf_tpu.pipeline.affine import (
            affine_transform_pts, bbox2cs, crop_affine, get_affine_transform,
        )
        from dfanerf_tpu.pipeline.filters import lk_stabilize
        from dfanerf_tpu.pipeline.heatmaps import decode_heatmaps
        from dfanerf_tpu.pipeline.pose import KalmanStabilizer, PoseEstimator
        from dfanerf_tpu.pipeline.steps import landmark_gaussian_smooth

        assert self.assets.blazeface_pth and self.assets.hrnet_pth, (
            "step 2 needs blazeface_pth and hrnet_pth assets"
        )
        from dfanerf_tpu.models.perception.blazeface import init_blazeface
        from dfanerf_tpu.models.perception.hrnet import init_hrnet

        bf = _load_asset(
            self.assets.blazeface_pth, blazeface_from_torch, init_blazeface
        )
        anchors = generate_anchors()
        hr = _load_asset(self.assets.hrnet_pth, hrnet_from_torch, init_hrnet)
        eye = None
        if self.assets.eye_pth:
            from dfanerf_tpu.models.perception.ghostnet_eye import (
                eye_net_from_torch, init_eye_net,
            )

            eye = _load_asset(
                self.assets.eye_pth, eye_net_from_torch, init_eye_net
            )
        paths = sorted(glob(os.path.join(self.id_dir, "ori_imgs", "*.jpg")))
        est = PoseEstimator((self.dst_size, self.dst_size), self.assets.pose_model_txt)
        # 6 scalar Kalman stabilizers over [r_vec, t_vec]
        # (demo...save.py:596-601: state 2, measure 1, q=0.3, r=18.1)
        stabs = [
            KalmanStabilizer(state_num=2, measure_num=1, cov_process=0.3,
                             cov_measure=18.1)
            for _ in range(6)
        ]
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        pkl_dir = os.path.join(self.id_dir, "pose_pkl")
        os.makedirs(pkl_dir, exist_ok=True)
        prev_gray = prev_lms = prev_eyes = None
        low_score = []
        poses = {}
        for p in paths:
            counter = int(os.path.basename(p).split(".")[0])
            img = _imread(p)
            h, w = img.shape[:2]
            small = cv2.resize(img, (128, 128))
            dets = detect_faces(bf, anchors, small[None])[0]
            if len(dets) == 0:
                # dense-frame contract: zero-landmark placeholder (:660-690)
                np.savetxt(
                    os.path.join(self.id_dir, "ori_imgs", f"{counter:06d}.lms"),
                    np.zeros((68, 2), np.float32), "%f",
                )
                continue  # LK chain resumes from the last good frame
            y0, x0, y1, x1 = dets[0, :4] * 128.0
            scale_ratio = max(h, w) / 128.0
            center, scale = bbox2cs(
                np.array([x0, y0, x1, y1]) * scale_ratio
            )
            crop = crop_affine(img, center, scale, (256, 256))
            trans_inv = get_affine_transform(center, scale, 0, (256, 256), inv=1)
            x = (crop.astype(np.float32) / 255.0 - mean) / std
            hm = apply_hrnet(hr, jnp.asarray(x[None]))
            coords, maxvals = decode_heatmaps(hm, sigma=2.0)
            score = float(np.asarray(maxvals).mean())
            if score < score_thresh:
                # low-score QA (:777-793): record, no .lms for this frame
                low_score.append([counter, score])
                continue
            preds = np.asarray(coords[0], np.float64) * 4.0  # heatmap 64 -> 256
            lms = affine_transform_pts(preds, trans_inv)
            gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
            if use_optical_flow and prev_gray is not None:
                lms = lk_stabilize(prev_gray, gray, prev_lms, lms)
            lms = lms.astype(np.float32)
            eye_lms = None
            if eye is not None:
                eye_lms = self._eye_landmarks(eye, img, lms)
                if use_optical_flow and prev_gray is not None and prev_eyes is not None:
                    eye_lms = lk_stabilize(prev_gray, gray, prev_eyes, eye_lms)
                np.savetxt(
                    os.path.join(self.id_dir, "ori_imgs", f"{counter:06d}.eye"),
                    eye_lms, "%f",
                )
            # EPnP pose on the stabilized 68 + Kalman smoothing (:952-977)
            r_vec, t_vec = est.solve_pose_by_68_points(lms)
            rot, _ = cv2.Rodrigues(r_vec)
            pose_mat = np.hstack([rot, t_vec.reshape(3, 1)])
            pose_np = np.concatenate([r_vec.reshape(-1), t_vec.reshape(-1)])
            steady = []
            for v, s in zip(pose_np, stabs):
                s.update([v])
                steady.append(float(s.state[0, 0]))
            steady_pose = np.reshape(np.asarray(steady, np.float64), (-1, 3))
            with open(os.path.join(pkl_dir, f"{counter:06d}.pkl"), "wb") as f:
                pickle.dump(
                    {
                        "pose_mat": pose_mat,
                        "pose_np": pose_np,
                        "steady_pose": steady_pose,
                        "face_landmarks_show": np.vstack([lms[:36], lms[48:]]),
                    },
                    f,
                )
            poses[counter] = est.pose_to_matrix(r_vec, t_vec)
            np.savetxt(
                os.path.join(self.id_dir, "ori_imgs", f"{counter:06d}.lms"),
                lms, "%f",
            )
            prev_gray, prev_lms, prev_eyes = gray, lms, eye_lms
        if low_score:
            np.savetxt(
                os.path.join(self.id_dir, "low_score_frames.txt"),
                np.asarray(low_score), "%f",
            )
        if smooth_lms:
            # jaw-only Gaussian smoothing over every written .lms file,
            # zero placeholders included (process_data_ba.py:186-199)
            lms_paths = sorted(glob(os.path.join(self.id_dir, "ori_imgs", "*.lms")))
            arr = np.stack([np.loadtxt(q).astype(np.float32) for q in lms_paths])
            arr = landmark_gaussian_smooth(arr, 1.5, area="only_jaw")
            for q, sm in zip(lms_paths, arr):
                np.savetxt(q, sm, "%f")
        return poses

    def _eye_landmarks(self, eye_params, img, lms):
        """GhostNet 6-kpt eye landmarks on pts2cs crops, 300W indices
        (demo...save.py:264-330,854-943): left eye from lms 42:48, right
        from 36:42, scale*1.35, 48x32 gray crops, heatmap decode without
        gaussian modulation (eye cfg HEATMAP_DM false), x2 to crop coords,
        inverse-affine back. Returns [12, 2] (left 6 then right 6)."""
        import cv2
        import jax.numpy as jnp

        from dfanerf_tpu.models.perception.ghostnet_eye import apply_eye_net
        from dfanerf_tpu.pipeline.affine import (
            affine_transform_pts, crop_affine, get_affine_transform, pts2cs,
        )
        from dfanerf_tpu.pipeline.heatmaps import decode_heatmaps

        out = []
        for sl in (slice(42, 48), slice(36, 42)):
            center, scale = pts2cs(lms[sl])
            scale = scale * 1.35
            crop = crop_affine(img, center, scale, (48, 32))
            gray = cv2.cvtColor(crop, cv2.COLOR_RGB2GRAY).astype(np.float32) / 255.0
            hmap = apply_eye_net(eye_params, jnp.asarray(gray[None, ..., None]))
            coords, _ = decode_heatmaps(hmap, modulate=False)
            pts = np.asarray(coords[0], np.float64) * 2.0  # heatmap 24x16 -> 48x32
            trans_inv = get_affine_transform(center, scale, 0, (48, 32), inv=1)
            out.append(affine_transform_pts(pts, trans_inv))
        return np.concatenate(out).astype(np.float32)

    def step_parsing(self):
        import jax.numpy as jnp

        from dfanerf_tpu.models.perception.bisenet import (
            apply_bisenet, bisenet_from_torch, init_bisenet,
        )

        assert self.assets.bisenet_pth, "step 3 needs bisenet_pth"
        params = _load_asset(
            self.assets.bisenet_pth, bisenet_from_torch, init_bisenet
        )
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

    def step_flow(self, ref_id: int = 18, crop_hw=(320, 240)):
        """Dense flow ref->frame with the UNFaceFlow test_flow contract
        (test_flow.py:88-104, network_test_flow.py:73-104): source/target
        cropped to their face-mask bboxes (+-10 px, masked color), RAFT on
        the 320x240 crops, flow rescaled + un-cropped into the source rect
        of the full frame, multiplied by the source mask. (The reference's
        NeuralNRT also carries an ImportanceWeights refinement head, loaded
        but never invoked by its shipped forward — models/perception/raft.py
        apply_importance_weights implements it for the training path.)
        Then rigid-keypoint mining + tracking (process_data_ba.py:289-372).
        """
        from dfanerf_tpu.models.perception.raft import (
            flow_on_crops, init_raft_small, mask_crop, raft_small_from_torch,
        )
        from dfanerf_tpu.pipeline.steps import (
            flow_stability_map, mine_rigid_keypoints, track_keypoints,
        )

        assert self.assets.raft_pth, "step 6 needs raft_pth"
        params = _load_asset(
            self.assets.raft_pth, raft_small_from_torch, init_raft_small
        )
        ids = _valid_img_ids(self.id_dir)
        ref = _imread(os.path.join(self.id_dir, "ori_imgs", f"{ref_id:06d}.jpg"))
        ref_mask_img = _imread(
            os.path.join(self.id_dir, "face_mask", f"{ref_id:06d}.png")
        )
        src_mask = ref_mask_img[..., 0] != 0
        h, w = ref.shape[:2]
        src_crop, (x1s, x2s, y1s, y2s) = mask_crop(ref, src_mask, crop_hw)
        flows = []
        for i in ids:
            tgt = _imread(os.path.join(self.id_dir, "ori_imgs", f"{i:06d}.jpg"))
            tgt_mask = _imread(
                os.path.join(self.id_dir, "face_mask", f"{i:06d}.png")
            )[..., 0] != 0
            tar_crop, (x1t, x2t, y1t, y2t) = mask_crop(tgt, tgt_mask, crop_hw)
            crop_params = np.array(
                [[x1s, x2s, y1s, y2s, x1t, x2t, y1t, y2t]], np.int32
            )
            flow_full = flow_on_crops(
                params, src_crop[None], tar_crop[None], crop_params, (h, w)
            )[0]  # [H, W, 2]
            # flow masked by the SOURCE mask (test_flow.py predict():101-103)
            flow_full = flow_full * src_mask[..., None]
            f = flow_full.transpose(2, 0, 1).astype(np.float32)
            flows.append(f)
            np.save(
                os.path.join(self.id_dir, "flow_result", f"{ref_id:06d}_{i:06d}.npy"), f
            )
        rigid_mask = ref_mask_img[..., 0] > 250
        rigid = np.stack([f[:, rigid_mask] for f in flows])
        stab = flow_stability_map(rigid, rigid_mask, h, w)
        key_xys = mine_rigid_keypoints(stab)
        np.savetxt(os.path.join(self.id_dir, "keypoints.txt"), key_xys, "%d")
        track = track_keypoints(flows, key_xys)
        np.save(os.path.join(self.id_dir, "track_xys.npy"), track)
        return track

    def step_track(self, n_iters: int = 2000, out_name: str = "track_params_ba.pt"):
        import jax.numpy as jnp

        from dfanerf_tpu.pipeline.face3dmm import (
            load_face3dmm, make_synthetic_3dmm,
        )
        from dfanerf_tpu.pipeline.tracking import fit_landmarks

        assert self.assets.face3dmm_dir, "step 7 needs face3dmm_dir"
        if self.assets.face3dmm_dir.startswith("random:"):
            import jax

            seed = int(self.assets.face3dmm_dir.split(":", 1)[1] or 0)
            model = make_synthetic_3dmm(jax.random.PRNGKey(seed))
            id_dim, exp_dim = 20, 12
        else:
            model = load_face3dmm(self.assets.face3dmm_dir)
            id_dim, exp_dim = 100, 79
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
            id_dim=id_dim, exp_dim=exp_dim,
        )
        _torch_save(
            {
                "id": np.asarray(params.id),
                "exp": np.asarray(params.exp),
                "euler": np.asarray(params.euler),
                "trans": np.asarray(params.trans),
                "focal": np.asarray(params.focal),
            },
            os.path.join(self.id_dir, out_name),
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

    def step_transforms_nonba(self):
        """The non-BA (AD-NeRF-style) transforms step — process_data.py's
        step 6 (:190-281): consumes ``track_params.pt`` directly (no flow /
        bundle adjustment), trans scaled by /10 (the BA path divides by
        /1000 at step 8 instead), writes ``transforms_{train,val}.json``
        (no ``_ba`` suffix) and the non-BA config txts whose testskip is
        ``len(val) // 7`` (process_data.py:246-263)."""
        from dfanerf_tpu.data.dataset import _load_pt_or_npy
        from dfanerf_tpu.pipeline.steps import build_transforms

        base = os.path.join(self.id_dir, "track_params.pt")
        euler = _load_pt_or_npy(base, "euler")
        trans = _load_pt_or_npy(base, "trans") / 10.0
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
                os.path.join(self.id_dir, f"transforms_{name}.json"), "w"
            ) as f:
                json.dump(obj, f, indent=2, separators=(",", ": "))
        testskip = max(len(val["frames"]) // 7, 1)
        for cfg_name, exp_suffix, extra in (
            ("HeadNeRF_config.txt", "_head", f"testskip = {testskip}"),
            ("TorsoNeRF_config.txt", "_com", f"testskip = {testskip}"),
            ("TorsoNeRFTest_config.txt", "_com", "with_test = 1"),
        ):
            with open(os.path.join(self.id_dir, cfg_name), "w") as f:
                f.write(f"expname = {self.id}{exp_suffix}\n")
                f.write(f"datadir = {os.path.abspath(self.id_dir)}\n")
                f.write(f"basedir = {os.path.abspath(self.id_dir)}/logs\n")
                f.write(f"near = {near}\n")
                f.write(f"far = {far}\n")
                f.write(f"{extra}\n")
        return near, far

    def run_nonba(self, src_video: str, steps=range(0, 7)):
        """The 7-step AD-NeRF-style pipeline (data_util/process_data.py):
        0 wav+DeepSpeech, 1 frames, 2 landmarks+pose, 3 parsing,
        4 background, 5 compose, 6 track+transforms (no flow, no bundle
        adjustment, no disentangle/wav2exp — the older dataset contract)."""
        table = {
            0: lambda: self.step_audio(src_video),
            1: lambda: self.step_frames(src_video),
            2: self.step_landmarks,
            3: self.step_parsing,
            4: self.step_background,
            5: self.step_compose,
            6: lambda: (
                self.step_track(out_name="track_params.pt"),
                self.step_transforms_nonba(),
            ),
        }
        for s in steps:
            table[s]()

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
