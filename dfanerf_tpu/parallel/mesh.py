"""Ray-sharded data-parallel training over a jax.sharding.Mesh.

Design (scaling-book recipe, not a port — the reference is single-GPU):

- mesh: 1-D ``('rays',)`` axis over all chips; model parameters, optimizer
  moments, conditioning signals, and the frame dataset are REPLICATED
  (decoder ≈ 0.9M params — replication is free next to the ray compute);
- each step, batch prep (frame choice, pixel coords, depths, signals) runs
  replicated; the pixel-coordinate batch is then shard_map'd over 'rays':
  every chip generates rays, gathers targets, and evaluates both fields for
  its N_rand/n_chips rays only;
- loss and gradients are ``psum``-averaged over ICI inside the shard_map,
  so the optimizer update is bitwise-identical on every chip and parameters
  never diverge (no broadcast needed);
- the same step function runs on 1 chip (mesh of one) with zero overhead.

Multi-identity batched training (BASELINE config 5) stacks identities on a
second mesh axis; see make_mesh(axes=...).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from dfanerf_tpu.config import ExperimentConfig
from dfanerf_tpu.core.rays import rays_for_pixels
from dfanerf_tpu.core.sampling import stratified_z_vals
from dfanerf_tpu.data.dataset import FrameDataset
from dfanerf_tpu.render.fields import render_ray_batch
from dfanerf_tpu.train.optim import adam_update, exp_decay_lr
from dfanerf_tpu.train.signals import encode_signal, encode_signal_torso
from dfanerf_tpu.train.state import OPT_GROUPS, TrainState
from dfanerf_tpu.train.step import sample_pixel_coords


def make_mesh(devices=None, axis: str = "rays") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    sharding = NamedSharding(mesh, P())
    return jax.device_put(state, sharding)


def make_sharded_train_step(cfg: ExperimentConfig, ds: FrameDataset, mesh: Mesh):
    """Build the mesh-sharded jitted train step (same semantics as
    train.step.make_train_step; rays split over the 'rays' mesh axis)."""
    H, W, focal, cx, cy = ds.hwfcxy
    n_train = int(len(ds.i_train))
    near, far = float(ds.near), float(ds.far)
    scfg, tcfg, rcfg, dcfg = cfg.signal, cfg.train, cfg.render, cfg.decoder
    n_dev = mesh.devices.size
    assert tcfg.n_rand % n_dev == 0, (
        f"n_rand={tcfg.n_rand} must divide over {n_dev} devices"
    )

    def local_loss(params, z_lat, data, img_i, coords, z_vals, signal, signal_torso):
        """Loss on this chip's ray shard (already pmean-ready)."""
        ys, xs = coords[:, 0], coords[:, 1]
        target_head = data["imgs_head"][img_i, ys, xs].astype(jnp.float32) / 255.0
        target_com = data["imgs_com"][img_i, ys, xs].astype(jnp.float32) / 255.0
        bc_rgb = data["bc_img"][ys, xs].astype(jnp.float32) / 255.0
        pose = data["poses"][img_i]
        pose_torso = data["poses"][0]
        rays_o, rays_d = rays_for_pixels(coords, focal, pose, cx, cy)
        rays_o_t, rays_d_t = rays_for_pixels(coords, focal, pose_torso, cx, cy)
        z_shape, z_app = z_lat
        rgb_head, rgb_com = render_ray_batch(
            params["decoder"], dcfg, rcfg,
            rays_o, rays_d, rays_o_t, rays_d_t, z_vals,
            signal, signal_torso,
            z_shape[0], z_app[0], z_shape[1], z_app[1],
            bc_rgb,
        )
        loss_head = jnp.mean((rgb_head - target_head) ** 2)
        loss_com = jnp.mean((rgb_com - target_com) ** 2)
        return loss_head + loss_com, (loss_head, loss_com)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("rays"), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def sharded_grads(params, z_lat, data, img_i, coords, z_vals, sig, sig_t):
        (loss, (lh, lc)), grads = jax.value_and_grad(local_loss, has_aux=True)(
            params, z_lat, data, img_i, coords, z_vals, sig, sig_t
        )
        # equal shard sizes -> global mean = mean of shard means
        grads = jax.lax.pmean(grads, "rays")
        losses = jax.lax.pmean(jnp.stack([loss, lh, lc]), "rays")
        return grads, losses, jax.lax.pmean(loss, "rays")

    @jax.jit
    def train_step(
        state: TrainState, data: Dict[str, jnp.ndarray], key: jax.Array
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        step = state["step"]
        k_img, k_pix, k_z = jax.random.split(key, 3)
        img_pos = jax.random.randint(k_img, (), 0, n_train)
        img_i = data["i_train"][img_pos]
        coords = sample_pixel_coords(
            k_pix, H, W, tcfg.n_rand, tcfg.sample_rate, data["rects"][img_i]
        )
        z_vals = stratified_z_vals(
            near, far, tcfg.n_rand // n_dev, rcfg.n_samples,
            key=k_z if tcfg.perturb else None,
        )
        use_smo = step >= scfg.nosmo_iters
        use_exp = step >= scfg.noexp_iters
        n_valid = jnp.int32(n_train)
        sig = encode_signal(
            state["params"], data["auds"], data["exps"], img_i, n_valid,
            scfg.smo_size, use_smo, scfg.audio_net, scfg.win_size,
        )
        sig_t = encode_signal_torso(
            state["params"], data["poses"], img_i, n_valid,
            scfg.smo_torso_size, use_smo, scfg.et_multires,
        )

        grads, losses, _ = sharded_grads(
            state["params"], (state["z_shape"], state["z_app"]), data,
            img_i, coords, z_vals, sig, sig_t,
        )

        lr = exp_decay_lr(step, tcfg.lrate, tcfg.lrate_decay)
        gates = {"always": jnp.int32(1), "smo": use_smo.astype(jnp.int32),
                 "exp": use_exp.astype(jnp.int32)}
        new_params = dict(state["params"])
        new_opt = dict(state["opt"])
        for name, lr_mult, gate_kind in OPT_GROUPS:
            p, o = adam_update(
                state["opt"][name], grads[name], state["params"][name],
                lr * lr_mult, gates[gate_kind],
                tcfg.adam_b1, tcfg.adam_b2, tcfg.adam_eps,
            )
            new_params[name] = p
            new_opt[name] = o

        new_state = {**state, "params": new_params, "opt": new_opt, "step": step + 1}
        metrics = {
            "loss": losses[0],
            "loss_head": losses[1],
            "loss_com": losses[2],
            "psnr_head": -10.0 * jnp.log(losses[1]) / jnp.log(10.0),
            "psnr_com": -10.0 * jnp.log(losses[2]) / jnp.log(10.0),
            "lr": lr,
        }
        return new_state, metrics

    return train_step
