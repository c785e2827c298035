"""Multi-host entry: a REAL 2-process CPU dryrun of jax.distributed +
the ('dcn', 'rays') pod mesh (BASELINE config 5's multi-slice framing).

Each child process gets 4 virtual CPU devices; the global mesh is 2x4 with
'dcn' across processes and 'rays' within — a global psum must see all 8
shards. Also unit-tests the single-process degradation paths in-process.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", ""
        ) + " --xla_force_host_platform_device_count=4"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dfanerf_tpu.parallel.distributed import (
        hierarchical_pspec, initialize, make_pod_mesh,
    )

    assert initialize()  # from JAX_COORDINATOR_ADDRESS / _NUM_PROCESSES / _PROCESS_ID
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    mesh = make_pod_mesh()
    assert dict(mesh.shape) == {"dcn": 2, "rays": 4}, mesh.shape
    # every 'rays' row must stay inside one process (ICI domain)
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == 1

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, hierarchical_pspec())
    global_shape = (8, 16)
    def cb(index):
        return np.arange(np.prod(global_shape), dtype=np.float32).reshape(
            global_shape)[index]
    arr = jax.make_array_from_callback(global_shape, sharding, cb)
    total = jax.jit(jnp.sum)(arr)   # XLA inserts the cross-process reduce
    expect = float(np.arange(128, dtype=np.float32).sum())
    assert float(total) == expect, (float(total), expect)
    print("DIST_OK", jax.process_index())
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("n_proc", [2])
def test_two_process_cpu_dryrun(tmp_path, n_proc):
    script = tmp_path / "child.py"
    script.write_text(CHILD % {"repo": REPO})
    port = _free_port()
    procs = []
    for pid in range(n_proc):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = str(n_proc)
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed dryrun timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"child failed:\n{out}\n{err}"
        assert "DIST_OK" in out


def test_single_process_degradation():
    """initialize() is a no-op without env; make_pod_mesh degrades to the
    flat ('rays',) mesh."""
    import jax

    from dfanerf_tpu.parallel.distributed import initialize, make_pod_mesh

    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        os.environ.pop(var, None)
    assert initialize() is False
    mesh = make_pod_mesh()
    assert mesh.axis_names == ("rays",)
    assert mesh.devices.size == len(jax.devices())
    mesh2 = make_pod_mesh(dcn_axis_size=2)
    assert dict(mesh2.shape) == {"dcn": 2, "rays": len(jax.devices()) // 2}
