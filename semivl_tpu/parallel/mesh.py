"""Device-mesh + multi-host utilities.

The reference's multi-node story is nominal (``n_nodes`` is configurable but
every experiment uses 1 and the launcher is single-node —
SURVEY.md §2.2). Here multi-host is first-class: the ``data`` mesh spans all
processes' devices (ICI within a slice, DCN across hosts), each host feeds
its local shard, and the SPMD step is unchanged — collectives come from the
same ``lax.pmean``.

Single-process remains the default; ``setup_multihost`` activates
``jax.distributed`` from standard env vars.
"""

import os
from collections import deque
from concurrent.futures import ThreadPoolExecutor

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def setup_multihost():
    """Initialise jax.distributed from env (no-op if single process).

    Env: SEMIVL_COORDINATOR (host:port), SEMIVL_NUM_PROCESSES,
    SEMIVL_PROCESS_ID — or the standard JAX_COORDINATOR_ADDRESS set.
    Returns (process_index, process_count).
    """
    coord = os.environ.get('SEMIVL_COORDINATOR') \
        or os.environ.get('JAX_COORDINATOR_ADDRESS')
    if coord and jax.process_count() == 1 \
            and os.environ.get('SEMIVL_NUM_PROCESSES'):
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ['SEMIVL_NUM_PROCESSES']),
            process_id=int(os.environ['SEMIVL_PROCESS_ID']))
    return jax.process_index(), jax.process_count()


def make_data_mesh(max_devices=None):
    """1-D ``data`` mesh over ALL processes' devices."""
    devices = jax.devices()
    if max_devices:
        devices = devices[:max_devices]
    return Mesh(np.array(devices), ('data',))


def global_batch_to_device(batch, mesh):
    """Host batch -> global sharded arrays on the mesh's data axis.

    Single-process: plain sharded device_put. Multi-process: each host
    passes its LOCAL portion (global_batch/process_count samples) and the
    runtime assembles the global array
    (``jax.make_array_from_process_local_data``).
    """
    sharding = NamedSharding(mesh, P('data'))
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()
                if not isinstance(v, list)}
    out = {}
    for k, v in batch.items():
        if isinstance(v, list):
            continue
        global_shape = (v.shape[0] * jax.process_count(),) + v.shape[1:]
        out[k] = jax.make_array_from_process_local_data(
            sharding, np.asarray(v), global_shape)
    return out


def device_prefetch(batch_iter, mesh, depth=2, to_device=None):
    """Overlap host->device batch transfer with device compute.

    Yields ``(host_batch, device_batch)`` pairs; up to ``depth`` batches
    are transferred ahead on a background thread, so the (potentially slow)
    host->device link streams while the previous step executes — the
    JAX-side equivalent of the reference DataLoader's ``pin_memory`` +
    async ``.cuda()`` copies. ``to_device`` maps a host batch to device
    arrays (default: ``global_batch_to_device`` on the mesh).
    """
    if to_device is None:
        def to_device(b):
            return global_batch_to_device(b, mesh)

    with ThreadPoolExecutor(max_workers=1) as pool:
        pending = deque()

        def submit():
            try:
                host = next(batch_iter)
            except StopIteration:
                return False
            pending.append((host, pool.submit(to_device, host)))
            return True

        for _ in range(depth):
            if not submit():
                break
        while pending:
            host, fut = pending.popleft()
            submit()
            yield host, fut.result()
