"""Multi-host (DCN) initialization for pod-scale meshes.

The reference is single-node only: its backend is CUDA peer-to-peer between
GPUs of one workstation (reference: Library/MnSystem/Cuda/Cuda.cu:119-127,
establish_peer_access; Projects/MGSP/halo_buffer.cuh:59).  On TPU pods the
same engine code spans hosts: ``jax.distributed`` brings up the cross-host
runtime, every process sees the global device set, and the identical
``shard_map`` collectives ride ICI within a slice and DCN across slices —
no engine changes, only mesh construction.

Typical pod usage::

    from claymore_tpu.parallel import distributed, MultiChipEngine

    distributed.init_multihost()                  # once per process
    mesh = distributed.pod_mesh((8, 4), ("x", "z"))
    eng = MultiChipEngine(cfg, mats, mesh=mesh)

On a single host both calls degrade gracefully (init is a no-op without
coordinator configuration; the mesh uses local devices).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the cross-host JAX runtime (idempotent).

    With no arguments, relies on the cluster environment (TPU pod metadata /
    ``JAX_COORDINATOR_ADDRESS`` etc.); explicit arguments cover manual
    clusters.  Returns True when a multi-process runtime is active.
    """
    import jax

    try:
        if jax.process_count() > 1:
            return True
    except RuntimeError:
        pass
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # no coordinator configured: single-process run
        return False
    return jax.process_count() > 1


def pod_mesh(mesh_shape: Sequence[int],
             axis_names: Tuple[str, ...] = ("x",)):
    """Build a Mesh over ALL processes' devices, laid out so the leading
    (largest-traffic) axis stays within ICI-connected slices where possible
    (``mesh_utils.create_device_mesh`` optimizes the assignment)."""
    import jax
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    mesh_shape = tuple(int(n) for n in mesh_shape)
    total = int(np.prod(mesh_shape))
    devs = jax.devices()
    assert total <= len(devs), (
        f"mesh {mesh_shape} needs {total} devices, have {len(devs)} "
        f"across {jax.process_count()} process(es)"
    )
    if total == len(devs):
        arr = mesh_utils.create_device_mesh(mesh_shape)
    else:
        arr = np.array(devs[:total]).reshape(mesh_shape)
    names = tuple(axis_names)[: len(mesh_shape)]
    assert len(names) == len(mesh_shape)
    return Mesh(arr, names)
