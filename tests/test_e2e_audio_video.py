"""End-to-end audio -> video demo (BASELINE config 4).

One flow covering the reference's test_obama.sh path with NOVEL audio:
synthesize a wav -> wav2exp mel features (pipeline/audio) -> driving
manifest (generate_test_jsons.py semantics) -> train briefly -> a single
`cli render --test-file --video` invocation renders the driven frames and
writes render_com/ + render_head/ + a video file
(run_nerf_com_trainExpLater.py:590-734 --render_person --render_video).
"""

import json
import os

import numpy as np
import pytest

import jax


@pytest.mark.slow
def test_audio_to_video_e2e(tmp_path):
    import imageio.v2 as imageio

    from dfanerf_tpu import cli
    from dfanerf_tpu.config import (
        ExperimentConfig, RenderConfig, SignalConfig, TrainConfig,
    )
    from dfanerf_tpu.data import make_synthetic_dataset
    from dfanerf_tpu.pipeline.audio.wav2exp import (
        Wav2ExpHParams, init_audio_encoder, wav2exp_features,
    )
    from dfanerf_tpu.pipeline.manifests import driving_manifest
    from dfanerf_tpu.train import train_loop

    H = W = 24
    n_frames = 8
    datadir = tmp_path / "identity"
    (datadir / "head_imgs").mkdir(parents=True)
    (datadir / "com_imgs").mkdir()

    # 1. identity data on disk, reference contract (from the synthetic scene)
    ds = make_synthetic_dataset(n_frames=n_frames, H=H, W=W, n_samples_gt=8)
    imageio.imwrite(datadir / "bc.jpg", np.asarray(ds.bc_img))
    for i in range(n_frames):
        imageio.imwrite(datadir / "head_imgs" / f"{i:06d}.jpg",
                        np.asarray(ds.imgs_head[i]))
        imageio.imwrite(datadir / "com_imgs" / f"{i:06d}.jpg",
                        np.asarray(ds.imgs_com[i]))
    _, _, focal, cx, cy = ds.hwfcxy

    def manifest(idx):
        return {
            "focal_len": float(focal), "cx": float(cx), "cy": float(cy),
            "frames": [
                {"img_id": int(i), "aud_id": int(i),
                 "transform_matrix": np.asarray(ds.poses[i]).tolist(),
                 "face_rect": np.asarray(ds.sample_rects[i]).tolist()}
                for i in idx
            ],
        }

    with open(datadir / "transforms_train_ba.json", "w") as f:
        json.dump(manifest(ds.i_train), f)
    with open(datadir / "transforms_val_ba.json", "w") as f:
        json.dump(manifest(ds.i_val), f)

    # 2. NOVEL audio: synthesized wav -> mel -> AudioEncoder features
    hp = Wav2ExpHParams()
    t = np.arange(int(1.2 * hp.sample_rate), dtype=np.float32) / hp.sample_rate
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)
           * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    feats = wav2exp_features(
        init_audio_encoder(jax.random.PRNGKey(0)), wav, hp
    )  # [N_new, 512]
    assert feats.shape[0] > 4 and feats.shape[1] == 512
    # torch-free artifact convention: <name>.pt.npz
    np.savez(datadir / "aud.pt.npz", feats.astype(np.float32))
    np.savez(datadir / "exp.pt.npz",
             exp_o=np.tile(np.asarray(ds.exps[:1]), (feats.shape[0], 1)))

    # 3. driving manifest for the new audio (generate_test_jsons.py:51-84)
    with open(datadir / "transforms_train_ba.json") as f:
        train_tf = json.load(f)
    drive, _static = driving_manifest(train_tf, n_frames=feats.shape[0],
                                      param_scale=0.5)
    with open(datadir / "transforms_val_drive.json", "w") as f:
        json.dump(drive, f)

    # 4. brief training run -> checkpoint
    cfg = ExperimentConfig(
        datadir=str(datadir),
        basedir=str(tmp_path / "runs"),
        expname="e2e",
        aud_file="aud.pt",
        exp_file="exp.pt",
        render=RenderConfig(n_samples=8, near=ds.near, far=ds.far,
                            tile_rays=H * W),
        train=TrainConfig(n_rand=64, i_weights=3, i_test_person=10_000,
                          i_print=100),
        signal=SignalConfig(),
    )
    cfg_path = tmp_path / "cfg.json"
    cfg.save(str(cfg_path))
    from dfanerf_tpu.data import load_audface_dataset

    train_ds = load_audface_dataset(str(datadir), "aud.pt", "exp.pt")
    train_loop(cfg, train_ds, n_iters=3, resume=None, val_render=False)
    ckpt = os.path.join(str(tmp_path / "runs"), "e2e", "000003.npz")
    assert os.path.exists(ckpt)

    # 5. ONE cli invocation: novel-audio driven render + video
    out = tmp_path / "out"
    cli.main([
        "render", "--config", str(cfg_path), "--ckpt", ckpt,
        "--test-file", "transforms_val_drive.json",
        "--out", str(out), "--video",
    ])
    n_drive = len(drive["frames"])
    com = sorted(os.listdir(out / "render_com"))
    head = sorted(os.listdir(out / "render_head"))
    assert len(com) == n_drive and len(head) == n_drive
    img = imageio.imread(out / "render_com" / com[0])
    assert img.shape == (H, W, 3)
    vids = [f for f in os.listdir(out) if f.endswith((".mp4", ".gif"))]
    assert vids, "no video artifact written"
