"""Deployment-export tool (tools/export_landmark_model.py — the TPU-native
counterpart of the reference's tools/export_onnx_model.py): flat-npz
roundtrip must reproduce the exact forward."""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools")
)


def test_export_roundtrip_eye(tmp_path):
    import jax
    import jax.numpy as jnp

    import export_landmark_model as ex
    from dfanerf_tpu.models.perception.ghostnet_eye import (
        apply_eye_net, init_eye_net,
    )

    out = str(tmp_path / "eye.npz")
    ex.export("eye", "random:7", out)
    header, params = ex.load_exported(out)
    assert header["arch"] == "eye"

    orig = init_eye_net(jax.random.PRNGKey(7))
    x = jnp.linspace(0, 1, 32 * 48).reshape(1, 32, 48, 1)
    a = apply_eye_net(orig, x)
    b = apply_eye_net(jax.tree.map(jnp.asarray, params), x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_nested_list_structure(tmp_path):
    """u2net has lists-of-dicts several levels deep — the flatten/unflatten
    roundtrip must preserve list ordering past index 9 (string sort would
    scramble it)."""
    import jax

    import export_landmark_model as ex
    from dfanerf_tpu.models.perception.u2net import init_u2net

    out = str(tmp_path / "u2.npz")
    ex.export("u2net", "random:0", out, out_ch=3, small=True)
    _, params = ex.load_exported(out)
    orig = init_u2net(jax.random.PRNGKey(0), out_ch=3, small=True)

    o_leaves = jax.tree.leaves(orig)
    r_leaves = jax.tree.leaves(jax.tree.map(np.asarray, params))
    assert len(o_leaves) == len(r_leaves)
    for a, b in zip(o_leaves, r_leaves):
        np.testing.assert_array_equal(np.asarray(a), b)
