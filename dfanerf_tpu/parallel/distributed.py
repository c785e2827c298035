"""Multi-host (multi-process) initialization and ICI x DCN mesh layout.

The reference is strictly single-process (SURVEY.md §2.4: no NCCL/MPI
anywhere); this module is the TPU-native scaling story for pod slices and
multi-slice jobs (BASELINE config 5 framing):

- ``initialize()`` wraps jax.distributed.initialize: call it once per
  process before any backend use. On a single process it is a no-op, so
  every entry point can call it unconditionally.
- ``make_pod_mesh()`` builds the training mesh. Within one slice the single
  'rays' axis rides ICI (parallel/mesh.py). Across slices/hosts the mesh
  gains a leading 'dcn' axis laid out so that axis crosses the
  data-center network while 'rays' stays inside each slice's ICI domain —
  gradient psums then hierarchically reduce (ICI first, one DCN hop last),
  which is the scaling-book recipe for multi-slice data parallelism.
- identities (multi-identity batched training) map naturally onto the
  'dcn' axis: one identity group per slice, ray-sharding within.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Initialize jax.distributed for a multi-process run.

    Arguments default from the standard environment (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) so launchers only set env vars. When
    neither arguments nor env describe a multi-process job, this is a no-op
    returning False — single-process callers can call it unconditionally.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if not coordinator_address or num_processes in (None, 0, 1):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def make_pod_mesh(dcn_axis_size: Optional[int] = None, ici_axis: str = "rays"):
    """Build the ('dcn', 'rays') training mesh over all global devices.

    dcn_axis_size defaults to jax.process_count() — one DCN group per
    process/slice. With one process (or dcn_axis_size=1) this degrades to
    the flat single-axis ('rays',) mesh of parallel.mesh.make_mesh, so the
    same code path serves laptop CPU, one chip, one slice, and multi-slice.
    """
    import jax
    from jax.sharding import Mesh

    if dcn_axis_size is None:
        dcn_axis_size = jax.process_count()
    devices = jax.devices()
    if dcn_axis_size <= 1:
        return Mesh(np.asarray(devices), (ici_axis,))
    assert len(devices) % dcn_axis_size == 0, (
        f"{len(devices)} devices not divisible by dcn={dcn_axis_size}"
    )
    per = len(devices) // dcn_axis_size
    if jax.process_count() == dcn_axis_size:
        # order devices so each DCN row is one process's local devices:
        # collectives over 'rays' never leave a process's ICI domain.
        by_proc = sorted(devices, key=lambda d: (d.process_index, d.id))
        grid = np.asarray(by_proc).reshape(dcn_axis_size, per)
    else:
        grid = np.asarray(devices).reshape(dcn_axis_size, per)
    return Mesh(grid, ("dcn", ici_axis))


def hierarchical_pspec():
    """PartitionSpec for ray batches on the pod mesh: rays shard over BOTH
    axes (('dcn', 'rays') combined) for pure data parallelism; parameters
    stay replicated (P())."""
    from jax.sharding import PartitionSpec as P

    return P(("dcn", "rays"))
