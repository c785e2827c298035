"""Multi-identity batched training (BASELINE config 5).

The reference's ``--n_object`` mode trains one SHARED decoder on several
identities per iteration — object 0 is the speaker (audio+expression
signal into the 'head' branch), objects > 0 are listeners (no signal;
the decoder's fc_in_listener branch) — stepping the optimizers after each
object sequentially (run_nerf_com_trainExpLater.py:743-931).

Here each object's ray batch is sharded over the 'rays' mesh axis and the
whole per-iteration object loop runs inside ONE jitted step; the per-object
sequential Adam updates are preserved (they share the decoder, so update
order matters for exactness)."""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from dfanerf_tpu.config import ExperimentConfig
from dfanerf_tpu.core.rays import rays_for_pixels
from dfanerf_tpu.core.sampling import stratified_z_vals
from dfanerf_tpu.data.dataset import FrameDataset
from dfanerf_tpu.render.fields import render_ray_batch
from dfanerf_tpu.train.optim import adam_update, exp_decay_lr
from dfanerf_tpu.train.signals import encode_signal, encode_signal_torso
from dfanerf_tpu.train.state import OPT_GROUPS, TrainState
from dfanerf_tpu.train.step import dataset_to_device, sample_pixel_coords


def compute_speaker_ids(speak_frames: Sequence[np.ndarray]) -> list:
    """Per-frame speaker index for each conversational PAIR of datasets —
    the exact reference construction (run_nerf_com_trainExpLater.py:485-489):
    ``id = speak[2i] + 2 * speak[2i+1]; id[id >= 3] = 0; id -= 1`` so that
    0 means dataset 2i speaks, 1 means dataset 2i+1 speaks, and -1 means
    neither (or both — the >=3 clamp)."""
    out = []
    for i in range(len(speak_frames) // 2):
        sid = np.asarray(speak_frames[2 * i]).astype(np.int64) + 2 * np.asarray(
            speak_frames[2 * i + 1]
        ).astype(np.int64)
        sid[sid >= 3] = 0
        out.append(sid - 1)
    return out


def make_multi_identity_train_step(
    cfg: ExperimentConfig,
    datasets: Sequence[FrameDataset],
    mesh: Mesh = None,
    dynamic_speaker: bool = False,
):
    """Build the jitted multi-identity step.

    Args:
        datasets: one FrameDataset per object. With ``dynamic_speaker=False``
            object 0 is statically the speaker — the shipped trainer's
            behavior (encode_signal branches on ``itr_obj == 0``,
            run_nerf_com_trainExpLater.py:31,72). With ``dynamic_speaker=
            True`` each object's branch follows its per-frame speak_frames
            (the semantics the reference's speaker_ids construction at
            :485-489 defines but its shipped loop never consumes): a frame
            where the object speaks routes audio+expression through the
            'head' branch, otherwise the signal-free 'head_listener' branch.
        mesh: optional 'rays' mesh; rays shard across it via shard_map.
    Returns:
        (train_step(state, data_list, key) -> (state, metrics), data_list)
    """
    n_obj = len(datasets)
    assert cfg.train.n_object == n_obj
    scfg, tcfg, rcfg, dcfg = cfg.signal, cfg.train, cfg.render, cfg.decoder
    from dfanerf_tpu.data.dataset import speaking_i_train

    metas = [
        dict(
            hwfcxy=ds.hwfcxy,
            n_train=int(len(speaking_i_train(ds))) if not dynamic_speaker
            else int(len(ds.i_train)),
            near=float(ds.near),
            far=float(ds.far),
        )
        for ds in datasets
    ]
    n_dev = mesh.devices.size if mesh is not None else 1

    def object_loss(params, state, data, obj, img_i, coords, z_vals, use_smo):
        meta = metas[obj]
        H, W, focal, cx, cy = meta["hwfcxy"]
        n_valid = jnp.int32(meta["n_train"])
        ys, xs = coords[:, 0], coords[:, 1]
        target_head = data["imgs_head"][img_i, ys, xs].astype(jnp.float32) / 255.0
        target_com = data["imgs_com"][img_i, ys, xs].astype(jnp.float32) / 255.0
        bc_rgb = data["bc_img"][ys, xs].astype(jnp.float32) / 255.0
        rays_o, rays_d = rays_for_pixels(coords, focal, data["poses"][img_i], cx, cy)
        rays_o_t, rays_d_t = rays_for_pixels(coords, focal, data["poses"][0], cx, cy)
        signal_torso = encode_signal_torso(
            params, data["poses"], img_i, n_valid,
            scfg.smo_torso_size, use_smo, scfg.et_multires,
        )

        def render_with(signal, branch):
            return render_ray_batch(
                params["decoder"], dcfg, rcfg,
                rays_o, rays_d, rays_o_t, rays_d_t, z_vals,
                signal, signal_torso,
                state["z_shape"][obj * 2], state["z_app"][obj * 2],
                state["z_shape"][obj * 2 + 1], state["z_app"][obj * 2 + 1],
                bc_rgb,
                head_branch=branch,
            )

        def speaker_render():
            signal = encode_signal(
                params, data["auds"], data["exps"], img_i, n_valid,
                scfg.smo_size, use_smo, scfg.audio_net, scfg.win_size,
            )
            return render_with(signal, "head")

        def listener_render():
            return render_with(jnp.zeros((dcfg.dim_signal,)), "head_listener")

        if dynamic_speaker:
            is_spk = data["speak_frames"][img_i] > 0
            rgb_head, rgb_com = jax.lax.cond(
                is_spk, speaker_render, listener_render
            )
        elif obj == 0:
            rgb_head, rgb_com = speaker_render()
        else:
            rgb_head, rgb_com = listener_render()
        loss_head = jnp.mean((rgb_head - target_head) ** 2)
        loss_com = jnp.mean((rgb_com - target_com) ** 2)
        return loss_head + loss_com, (loss_head, loss_com)

    def sharded_grad_fn(obj):
        loss = partial_loss = lambda params, state, data, img_i, coords, z_vals, use_smo: (
            object_loss(params, state, data, obj, img_i, coords, z_vals, use_smo)
        )
        if mesh is None:
            def plain(params, state, data, img_i, coords, z_vals, use_smo):
                return jax.value_and_grad(partial_loss, has_aux=True)(
                    params, state, data, img_i, coords, z_vals, use_smo
                )
            return plain

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P("rays"), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        def sharded(params, state, data, img_i, coords, z_vals, use_smo):
            (l, aux), g = jax.value_and_grad(partial_loss, has_aux=True)(
                params, state, data, img_i, coords, z_vals, use_smo
            )
            g = jax.lax.pmean(g, "rays")
            losses = jax.lax.pmean(jnp.stack([l, *aux]), "rays")
            return g, losses

        def wrap(params, state, data, img_i, coords, z_vals, use_smo):
            g, losses = sharded(params, state, data, img_i, coords, z_vals, use_smo)
            return (losses[0], (losses[1], losses[2])), g

        return wrap

    grad_fns = [sharded_grad_fn(o) for o in range(n_obj)]

    @jax.jit
    def train_step(state: TrainState, data_list, key: jax.Array):
        step = state["step"]
        use_smo = step >= scfg.nosmo_iters
        use_exp = step >= scfg.noexp_iters
        lr = exp_decay_lr(step, tcfg.lrate, tcfg.lrate_decay)
        gates = {"always": jnp.int32(1), "smo": use_smo.astype(jnp.int32),
                 "exp": use_exp.astype(jnp.int32)}
        metrics = {}
        params = state["params"]
        opt = state["opt"]
        for obj in range(n_obj):
            meta = metas[obj]
            H, W = int(meta["hwfcxy"][0]), int(meta["hwfcxy"][1])
            key, k_img, k_pix = jax.random.split(key, 3)
            data = data_list[obj]
            img_pos = jax.random.randint(k_img, (), 0, meta["n_train"])
            img_i = data["i_train"][img_pos]
            coords = sample_pixel_coords(
                k_pix, H, W, tcfg.n_rand, tcfg.sample_rate, data["rects"][img_i]
            )
            z_vals = stratified_z_vals(
                meta["near"], meta["far"], tcfg.n_rand // n_dev, rcfg.n_samples
            ) if mesh is not None else stratified_z_vals(
                meta["near"], meta["far"], tcfg.n_rand, rcfg.n_samples
            )
            (loss, (lh, lc)), grads = grad_fns[obj](
                params, state, data, img_i, coords, z_vals, use_smo
            )
            # sequential per-object optimizer step (reference :916-931)
            new_params = dict(params)
            new_opt = dict(opt)
            for name, lr_mult, gate_kind in OPT_GROUPS:
                p, o = adam_update(
                    opt[name], grads[name], params[name], lr * lr_mult,
                    gates[gate_kind], tcfg.adam_b1, tcfg.adam_b2, tcfg.adam_eps,
                )
                new_params[name] = p
                new_opt[name] = o
            params, opt = new_params, new_opt
            metrics[f"loss_obj{obj}"] = loss
            metrics[f"psnr_com_obj{obj}"] = -10.0 * jnp.log(lc) / jnp.log(10.0)

        new_state = {**state, "params": params, "opt": opt, "step": step + 1}
        metrics["loss"] = sum(metrics[f"loss_obj{o}"] for o in range(n_obj))
        return new_state, metrics

    if dynamic_speaker:
        assert all(ds.speak_frames is not None for ds in datasets), (
            "dynamic_speaker needs per-frame speak_frames on every dataset"
        )
    data_list = [
        dataset_to_device(ds, filter_speaking=not dynamic_speaker)
        for ds in datasets
    ]
    return train_step, data_list
