#!/usr/bin/env python
"""Export a landmark-model parameter pytree to a flat npz deployment
artifact — the TPU-native counterpart of the reference's
tools/export_onnx_model.py (which serializes the torch nets for external
inference runtimes; here the deployment contract is a flat npz of named
arrays plus a JSON header describing the architecture, loadable with
numpy alone).

    python tools/export_landmark_model.py hrnet face_lms.pth out.npz
    python tools/export_landmark_model.py eye eye_lms_6kpts.pth out.npz
    python tools/export_landmark_model.py hrnet random:0 out.npz   # smoke

Re-import with ``load_exported(path)`` -> (arch_info, params pytree).
"""

import json
import sys

import numpy as np

ARCHS = {
    "hrnet": ("dfanerf_tpu.models.perception.hrnet",
              "hrnet_from_torch", "init_hrnet"),
    "pose_hrnet": ("dfanerf_tpu.models.perception.hrnet",
                   "hrnet_from_torch", "init_hrnet"),
    "eye": ("dfanerf_tpu.models.perception.ghostnet_eye",
            "eye_net_from_torch", "init_eye_net"),
    "mobilenet": ("dfanerf_tpu.models.perception.mobilenet",
                  "mobilenet_v2_from_torch", "init_mobilenet_v2"),
    "u2net": ("dfanerf_tpu.models.perception.u2net",
              "u2net_from_torch", "init_u2net"),
    "face_ghostnet": ("dfanerf_tpu.models.perception.ghostnet_face",
                      "face_ghostnet_from_torch", "init_face_ghostnet"),
    "shufflenet": ("dfanerf_tpu.models.perception.shufflenet",
                   "shufflenet_v2_from_torch", "init_shufflenet_v2"),
}


def _flatten(tree, prefix=""):
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
        return out
    if isinstance(tree, (list, tuple)):
        out = {}
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
        return out
    return {prefix[:-1]: np.asarray(tree)}


def _unflatten(flat):
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def export(arch: str, src: str, out_path: str, **kwargs) -> None:
    import importlib

    mod_name, conv_name, init_name = ARCHS[arch]
    mod = importlib.import_module(mod_name)
    if src.startswith("random:"):
        import jax

        params = getattr(mod, init_name)(
            jax.random.PRNGKey(int(src.split(":", 1)[1] or 0)), **kwargs
        )
    else:
        import torch

        params = getattr(mod, conv_name)(
            torch.load(src, map_location="cpu"), **kwargs
        )
    flat = _flatten(params)
    header = json.dumps({"arch": arch, "module": mod_name,
                         "n_arrays": len(flat), "kwargs": kwargs})
    np.savez(out_path, __header__=np.frombuffer(header.encode(), np.uint8),
             **flat)
    print(f"exported {len(flat)} arrays -> {out_path}")


def load_exported(path: str):
    """-> (header dict, params pytree of np arrays)."""
    data = dict(np.load(path))
    header = json.loads(bytes(data.pop("__header__")).decode())
    return header, _unflatten(data)


if __name__ == "__main__":
    if len(sys.argv) < 4:
        print(__doc__)
        sys.exit(1)
    export(sys.argv[1], sys.argv[2], sys.argv[3])
