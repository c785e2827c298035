"""Perception model parity tests (random weights, converted) vs the
reference PyTorch architectures."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import REFERENCE_ROOT, reference_available

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


class TestBiSeNet:
    def test_shapes_and_jit(self):
        from dfanerf_tpu.models.perception.bisenet import apply_bisenet, init_bisenet

        params = init_bisenet(jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32)
        out, out16, out32 = jax.jit(apply_bisenet)(params, x)
        assert out.shape == (1, 64, 64, 19)
        assert out16.shape == out32.shape == (1, 64, 64, 19)
        assert bool(jnp.isfinite(out).all())

    @needs_reference
    def test_parity_vs_torch(self):
        import os, sys, types

        sys.path.insert(0, os.path.join(REFERENCE_ROOT, "data_util", "face_parsing"))
        import torch
        import torch.utils.model_zoo as modelzoo

        # torchvision isn't installed and model.py only imports it unused
        sys.modules.setdefault("torchvision", types.ModuleType("torchvision"))

        # the reference Resnet18 downloads ImageNet weights at __init__;
        # no egress here, so neutralize and keep the random init
        modelzoo.load_url = lambda *a, **k: {}
        from model import BiSeNet as TorchBiSeNet

        from dfanerf_tpu.models.perception.bisenet import (
            apply_bisenet,
            bisenet_from_torch,
        )

        torch.manual_seed(0)
        net = TorchBiSeNet(19).eval()
        params = bisenet_from_torch(net.state_dict())
        x = np.random.RandomState(1).randn(1, 3, 64, 64).astype(np.float32)
        with torch.no_grad():
            ref, ref16, ref32 = net(torch.tensor(x))
        ours, ours16, ours32 = apply_bisenet(
            params, jnp.asarray(x.transpose(0, 2, 3, 1))
        )
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(ours32), ref32.numpy().transpose(0, 2, 3, 1), atol=2e-4, rtol=1e-3
        )
