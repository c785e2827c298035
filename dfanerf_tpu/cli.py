"""Command-line interface: the three reference entry scripts as subcommands.

    python -m dfanerf_tpu.cli process --id-dir dataset/obama --step N
    python -m dfanerf_tpu.cli train   --config cfg.json [--datadir ...]
    python -m dfanerf_tpu.cli render  --config cfg.json --ckpt run/x.npz
    python -m dfanerf_tpu.cli bench

Replaces scripts/{process_data,train_obama,test_obama}.sh +
the configargparse CLI of run_nerf_com_trainExpLater.py.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os


def _build_parser():
    p = argparse.ArgumentParser(prog="dfanerf_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("process", help="run preprocessing steps")
    pp.add_argument("--id-dir", required=True)
    pp.add_argument("--step", type=int, required=True,
                    help="-1..11 (ba variant) or 0..6 (nonba variant)")
    pp.add_argument("--video", default=None)
    pp.add_argument("--dst-size", type=int, default=512)
    pp.add_argument("--assets", default=None, help="json file of PipelineAssets paths")
    pp.add_argument("--variant", choices=("ba", "nonba"), default="ba",
                    help="ba = 12-step process_data_ba.py DAG; nonba = the "
                         "7-step AD-NeRF-style process_data.py DAG")

    tp = sub.add_parser("train", help="train the conditioned NeRF")
    tp.add_argument("--config", default=None, help="ExperimentConfig json")
    tp.add_argument("--datadir", default=None)
    tp.add_argument("--legacy-config", default=None,
                    help="pipeline-generated HeadNeRF_config_ba.txt (near/far)")
    tp.add_argument("--aud-file", default=None)
    tp.add_argument("--exp-file", default=None)
    tp.add_argument("--expname", default=None)
    tp.add_argument("--n-iters", type=int, default=None)
    tp.add_argument("--resume", default="auto")
    tp.add_argument("--synthetic", action="store_true",
                    help="train on the built-in synthetic scene (no assets)")

    rp = sub.add_parser("render", help="render frames/video from a checkpoint")
    rp.add_argument("--config", default=None)
    rp.add_argument("--datadir", default=None)
    rp.add_argument("--ckpt", required=True)
    rp.add_argument("--test-file", default=None,
                    help="driving manifest (reference --test_file mode)")
    rp.add_argument("--out", default="render_out")
    rp.add_argument("--video", action="store_true")
    rp.add_argument("--synthetic", action="store_true")

    sub.add_parser("bench", help="run the standard benchmark")
    return p


def _load_cfg(args):
    from dfanerf_tpu.config import ExperimentConfig, parse_legacy_config_file

    cfg = (
        ExperimentConfig.from_json(args.config)
        if args.config
        else ExperimentConfig()
    )
    updates = {}
    if getattr(args, "datadir", None):
        updates["datadir"] = args.datadir
    if getattr(args, "expname", None):
        updates["expname"] = args.expname
    if getattr(args, "aud_file", None):
        updates["aud_file"] = args.aud_file
    if getattr(args, "exp_file", None):
        updates["exp_file"] = args.exp_file
    if updates:
        cfg = dataclasses.replace(cfg, **updates)
    if getattr(args, "legacy_config", None):
        near, far = parse_legacy_config_file(args.legacy_config)
        cfg = dataclasses.replace(
            cfg, render=dataclasses.replace(cfg.render, near=near, far=far)
        )
    return cfg


def _load_dataset(cfg, args):
    if getattr(args, "synthetic", False):
        from dfanerf_tpu.data import make_synthetic_dataset

        return make_synthetic_dataset(n_frames=40, H=128, W=128)
    from dfanerf_tpu.data import load_audface_dataset

    return load_audface_dataset(
        cfg.datadir, cfg.aud_file, cfg.exp_file, use_ba=cfg.use_ba,
        testskip=cfg.testskip, all_speaker=cfg.all_speaker,
        test_file=getattr(args, "test_file", None),
    )


def cmd_process(args):
    from dfanerf_tpu.pipeline.driver import PipelineAssets, PipelineDriver

    assets = PipelineAssets()
    if args.assets:
        with open(args.assets) as f:
            assets = PipelineAssets(**json.load(f))
    d = PipelineDriver(args.id_dir, assets, args.dst_size)
    step = args.step
    video = args.video or os.path.join(args.id_dir, f"{d.id}_25fps.mp4")
    if args.variant == "nonba":
        table = {
            0: lambda: d.step_audio(video),
            1: lambda: d.step_frames(video),
            2: d.step_landmarks,
            3: d.step_parsing,
            4: d.step_background,
            5: d.step_compose,
            6: lambda: (d.step_track(out_name="track_params.pt"),
                        d.step_transforms_nonba()),
        }
    else:
        table = {
            -1: lambda: d.step_reencode(args.video),
            0: lambda: d.step_audio(video),
            1: lambda: d.step_frames(video),
            2: d.step_landmarks,
            3: d.step_parsing,
            4: d.step_background,
            5: d.step_compose,
            6: d.step_flow,
            7: d.step_track,
            8: d.step_bundle_adjust,
            9: d.step_transforms,
            10: d.step_disentangle,
            11: d.step_wav2exp,
        }
    print(f"[process:{args.variant}] step {step}")
    table[step]()
    print(f"[process:{args.variant}] step {step} done")


def cmd_train(args):
    cfg = _load_cfg(args)
    ds = _load_dataset(cfg, args)
    from dfanerf_tpu.train import train_loop

    train_loop(cfg, ds, n_iters=args.n_iters, resume=args.resume)


def cmd_render(args):
    import numpy as np
    import jax

    cfg = _load_cfg(args)
    ds = _load_dataset(cfg, args)
    from dfanerf_tpu.train import dataset_to_device, init_train_state
    from dfanerf_tpu.train.checkpoint import load_checkpoint
    from dfanerf_tpu.render.renderer import render_video_frames

    state = load_checkpoint(
        args.ckpt, init_train_state(jax.random.PRNGKey(0), cfg)
    )
    data = dataset_to_device(ds)
    idx = list(range(ds.n_frames))
    frames, frames_head = render_video_frames(
        state, data, cfg, ds.hwfcxy, ds.near, ds.far, idx,
        use_smoothing=int(state["step"]) >= cfg.signal.nosmo_iters,
    )
    # reference --render_person writes BOTH composite and head-only frames
    # (run_nerf_com_trainExpLater.py:717-723: render_com/ + render_head/)
    os.makedirs(os.path.join(args.out, "render_com"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "render_head"), exist_ok=True)
    import imageio.v2 as imageio

    for i, (fr, fh) in enumerate(zip(frames, frames_head)):
        imageio.imwrite(
            os.path.join(args.out, "render_com", f"test_{i:06d}.jpg"), fr
        )
        imageio.imwrite(
            os.path.join(args.out, "render_head", f"test_{i:06d}.jpg"), fh
        )
    if args.video:
        mp4 = os.path.join(args.out, f"{cfg.expname}.mp4")
        try:
            imageio.mimwrite(mp4, frames, fps=25, quality=8)
        except (ValueError, ImportError):
            # no ffmpeg backend in this environment — fall back to GIF
            gif = os.path.join(args.out, f"{cfg.expname}.gif")
            imageio.mimwrite(gif, frames, duration=1000 / 25)
            print(f"[render] no mp4 backend; wrote {gif} instead")
    print(f"[render] wrote {len(frames)} frames to {args.out}")


def main(argv=None):
    args = _build_parser().parse_args(argv)
    if args.cmd == "process":
        cmd_process(args)
    elif args.cmd == "train":
        cmd_train(args)
    elif args.cmd == "render":
        cmd_render(args)
    elif args.cmd == "bench":
        import runpy

        runpy.run_path(
            os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
            run_name="__main__",
        )


if __name__ == "__main__":
    main()
