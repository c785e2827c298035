"""Train state: one pytree holding every network, optimizer moment, latent,
and the step counter — the functional analogue of the reference's 10-entry
checkpoint dict (run_nerf_com_trainExpLater.py:1099-1115)."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from dfanerf_tpu.config import ExperimentConfig
from dfanerf_tpu.core.posenc import nerf_embed_dim
from dfanerf_tpu.models import (
    init_audio_attnet,
    init_audionet_ds,
    init_audionet_w2l,
    init_decoder,
    init_expression_enc,
)
from dfanerf_tpu.train.optim import adam_init

TrainState = Dict[str, Any]

# optimizer groups: (params key, lr multiplier, gate kind)
# gate kinds: "always" | "smo" (step >= nosmo_iters) | "exp" (>= noexp_iters)
OPT_GROUPS = (
    ("decoder", 1.0, "always"),
    ("audnet", 1.0, "always"),
    ("expnet", 1.0, "exp"),
    ("audattnet", 2.0, "smo"),
    ("poseattnet", 2.0, "smo"),
)


def init_train_state(key: jax.Array, cfg: ExperimentConfig) -> TrainState:
    kd, ka, ke, kaa, kpa, kz1, kz2 = jax.random.split(key, 7)
    dim_et = 2 * nerf_embed_dim(cfg.signal.et_multires)
    if cfg.signal.audio_net == "deepspeech":
        # AudioNet over [N,16,29] windows; 32 dims of the signal come from
        # the expression encoder (shipped AD-NeRF-style configuration)
        audnet = init_audionet_ds(
            ka, dim_aud=cfg.signal.dim_signal - 32, win_size=cfg.signal.win_size
        )
    else:
        audnet = init_audionet_w2l(ka)
    params = {
        "decoder": init_decoder(kd, cfg.decoder),
        "audnet": audnet,
        "expnet": init_expression_enc(ke),
        "audattnet": init_audio_attnet(
            kaa, dim_aud=cfg.signal.dim_aud, seq_len=cfg.signal.smo_size
        ),
        "poseattnet": init_audio_attnet(
            kpa, dim_aud=dim_et, seq_len=cfg.signal.smo_torso_size
        ),
    }
    n_lat = cfg.train.n_object * 2  # (head, torso) latent pair per object
    return {
        "params": params,
        "opt": {name: adam_init(params[name]) for name, _, _ in OPT_GROUPS},
        "z_shape": jax.random.normal(kz1, (n_lat, cfg.train.z_dim)),
        "z_app": jax.random.normal(kz2, (n_lat, cfg.train.z_dim)),
        "step": jnp.zeros((), jnp.int32),
    }
