"""Test configuration: force an 8-virtual-device CPU platform so sharding /
collective tests run without TPU hardware, before jax is first imported."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin ignores JAX_PLATFORMS from the environment; force the
# platform through the config API before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Path to the read-only PyTorch reference checkout; parity tests are skipped
# when it is absent (e.g. in CI environments that only have this repo).
REFERENCE_ROOT = os.environ.get("DFANERF_REFERENCE", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "NeRFs", "DFANeRF"))


def add_reference_to_path():
    p = os.path.join(REFERENCE_ROOT, "NeRFs", "DFANeRF")
    if p not in sys.path:
        sys.path.insert(0, p)
    return p
