"""Disentangler tests: torch architecture parity + cycle-swap training
actually disentangles mouth from other motion on a synthetic 3DMM."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from conftest import REFERENCE_ROOT, reference_available

from dfanerf_tpu.pipeline.disentangle import (
    MOUTH_IDX,
    OTHER_IDX,
    apply_concatenater,
    apply_distangler,
    apply_mouth_exp2kpts,
    concatenater_from_torch,
    disentangle_sequence,
    distangler_from_torch,
    init_concatenater,
    init_distangler,
    init_mouth_exp2kpts,
    make_disentangle_train_step,
)
from dfanerf_tpu.pipeline.face3dmm import forward_geo_sub, make_synthetic_3dmm

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


class TestNets:
    def test_shapes(self):
        dis = init_distangler(jax.random.PRNGKey(0))
        cat = init_concatenater(jax.random.PRNGKey(1))
        x = jnp.ones((6, 79))
        o, m = apply_distangler(dis, x)
        assert o.shape == (6, 64) and m.shape == (6, 32)
        back = apply_concatenater(cat, o, m)
        assert back.shape == (6, 79)
        mk = init_mouth_exp2kpts(jax.random.PRNGKey(2))
        out = apply_mouth_exp2kpts(mk, m)
        assert out.shape == (6, 40)

    def test_inference_contract(self):
        dis = init_distangler(jax.random.PRNGKey(0))
        exps = jnp.ones((10, 79))
        out = disentangle_sequence(dis, exps)
        assert out["exp_o"].shape == (10, 64) and out["exp_m"].shape == (10, 32)

    @needs_reference
    def test_parity_vs_torch(self):
        import sys, os

        sys.path.insert(0, os.path.join(REFERENCE_ROOT, "data_util", "face_disentangle_3dmm"))
        import torch
        import network as ref_net

        torch.manual_seed(0)
        tdis = ref_net.Distangler()
        tcat = ref_net.Concatenater()
        dis = distangler_from_torch(tdis.state_dict())
        cat = concatenater_from_torch(tcat.state_dict())
        x = np.random.RandomState(0).randn(5, 79).astype(np.float32)
        with torch.no_grad():
            ro, rm = tdis(torch.tensor(x))
            rback = tcat(ro, rm)
        o, m = apply_distangler(dis, jnp.asarray(x))
        back = apply_concatenater(cat, o, m)
        np.testing.assert_allclose(np.asarray(o), ro.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(m), rm.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(back), rback.numpy(), atol=1e-5)


class TestTraining:
    def test_cycle_swap_learns_disentanglement(self):
        import dataclasses

        model = make_synthetic_3dmm(jax.random.PRNGKey(3), point_num=64)
        exp_dim = model.base_exp.shape[0]
        id_dim = model.base_id.shape[0]
        lands_idx = jnp.arange(51, dtype=jnp.int32)
        # structured expression basis at a learnable scale: the first half
        # of the exp components move ONLY mouth landmarks (rows 31:51 of
        # the 51-landmark set), the rest move only the others — so a
        # perfect disentangler exists and the swap loss is informative
        rng0 = np.random.RandomState(0)
        basis = np.zeros((exp_dim, 3 * model.point_num), np.float32)
        mouth_v = np.arange(31, 51)
        other_v = np.arange(0, 31)
        for c in range(exp_dim):
            verts = mouth_v if c < exp_dim // 2 else other_v
            for v in verts:
                basis[c, 3 * v : 3 * v + 3] = rng0.randn(3) * 0.05
        model = dataclasses.replace(model, base_exp=jnp.asarray(basis))
        init, step = make_disentangle_train_step(
            model, lands_idx, id_dim=id_dim, swap_weight=1.0
        )
        params, opt = init(jax.random.PRNGKey(4), dim_o=16, dim_m=8)
        # synthetic exp dataset: note dim must match the model's exp_dim —
        # patch the nets for the synthetic 12-dim codes
        from dfanerf_tpu.pipeline.disentangle import init_concatenater, init_distangler
        params = {
            "dis": init_distangler(jax.random.PRNGKey(5), input_dim=exp_dim, dim_o=16, dim_m=8),
            "cat": init_concatenater(jax.random.PRNGKey(6), dim_o=16, dim_m=8, output_dim=exp_dim),
        }
        from dfanerf_tpu.train.optim import adam_init
        opt = adam_init(params)
        rng = np.random.RandomState(7)
        losses = []
        for i in range(150):
            batch = jnp.asarray(rng.randn(64, exp_dim).astype(np.float32) * 0.3)
            params, opt, aux = step(params, opt, batch, jnp.float32(1e-3))
            losses.append(float(aux["total"]))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-10:]) < 0.5 * np.mean(losses[:10]), (
            f"no convergence: {np.mean(losses[:10]):.4f} -> {np.mean(losses[-10:]):.4f}"
        )
        # check the semantic: swapping mouth codes moves mouth landmarks
        # toward the donor's geometry
        e1 = jnp.asarray(rng.randn(8, exp_dim).astype(np.float32) * 0.3)
        e2 = jnp.asarray(rng.randn(8, exp_dim).astype(np.float32) * 0.3)
        o1, m1 = apply_distangler(params["dis"], e1)
        _, m2 = apply_distangler(params["dis"], e2)
        swapped = apply_concatenater(params["cat"], o1, m2)
        zid = jnp.zeros((8, id_dim))
        g_sw = forward_geo_sub(model, zid, swapped, lands_idx)
        g1 = forward_geo_sub(model, zid, e1, lands_idx)
        g2 = forward_geo_sub(model, zid, e2, lands_idx)
        mouth = slice(*MOUTH_IDX)
        d_donor = float(jnp.mean((g_sw[:, mouth, :2] - g2[:, mouth, :2]) ** 2))
        d_source = float(jnp.mean((g_sw[:, mouth, :2] - g1[:, mouth, :2]) ** 2))
        assert d_donor < d_source, "mouth landmarks did not follow the donor"
