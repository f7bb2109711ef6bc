"""Multi-host (pod-slice) runtime: jax.distributed init + hybrid DCN/ICI mesh.

No reference counterpart (the reference is single-process, SURVEY.md §2.3);
this is the TPU-native scaling story:

  * one process per host joins the runtime via :func:`initialize`
    (jax.distributed — coordinator address from env or args);
  * :func:`make_pod_mesh` builds a (dcn_dp, dp, tp) mesh with
    ``mesh_utils.create_hybrid_device_mesh`` so tensor-parallel collectives
    ride ICI within a host's slice and only data-parallel traffic crosses
    DCN (batch rows are independent at inference, so DCN carries nothing
    during a decode step — only admission/results);
  * weights/KV shard exactly as in :mod:`exllama_tpu.parallel.mesh` —
    ``tp`` over ICI; batch over the combined (dcn_dp, dp) axes.

On a single host this degrades to the plain 2-axis mesh, so all code paths
are exercised by the virtual-device tests; N-host execution only changes how
many processes call :func:`initialize`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Join the multi-host runtime (idempotent).

    Arguments default from the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); on TPU
    pods the runtime can also infer them from the metadata server, in which
    case ``jax.distributed.initialize()`` with no args is correct.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        # already initialized (idempotent restart / single-host run)
        pass


def make_pod_mesh(
    tp: int,
    dp_per_host: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    """(dcn, dp, tp) mesh: tp and dp within a host's ICI domain, the
    leading axis across hosts (DCN).

    ``tp * dp_per_host`` must equal the local device count per host. With
    one process (single host / tests) this is a reshape of the local
    devices with a singleton dcn axis.
    """
    devices = devices if devices is not None else jax.devices()
    n_hosts = max(1, jax.process_count())
    local = len(devices) // n_hosts
    assert tp * dp_per_host == local, (
        f"tp*dp_per_host={tp * dp_per_host} != devices/host={local}"
    )
    if n_hosts > 1:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, dp_per_host, tp),
            dcn_mesh_shape=(n_hosts, 1, 1),
            devices=devices,
        )
    else:
        arr = np.asarray(devices).reshape(1, dp_per_host, tp)
    return Mesh(arr, axis_names=("dcn", "dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Activations/batches shard over the combined host+local batch axes."""
    return NamedSharding(mesh, P(("dcn", "dp")))


def pod_param_specs(params, mesh: Mesh):
    """Param shardings for a pod mesh: identical to the single-host specs
    (weights replicated over dp and dcn, tp-sharded over ICI)."""
    from exllama_tpu.parallel.mesh import param_shardings

    return param_shardings(params, mesh)


def local_batch_slice(global_batch: int) -> slice:
    """The rows of a global batch owned by this process (cross-host
    continuous batching: each host admits into its own slots)."""
    n = max(1, jax.process_count())
    per = global_batch // n
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)


def pod_cache_sharding(mesh: Mesh) -> NamedSharding:
    """Per-layer KV [B, Hkv, S, D]: batch over host+local dp, heads over tp."""
    return NamedSharding(mesh, P(("dcn", "dp"), "tp", None, None))


def shard_cache_pod(cache, mesh: Mesh):
    from exllama_tpu.cache import KVCacheState

    sh = pod_cache_sharding(mesh)
    sh3 = NamedSharding(mesh, P(("dcn", "dp"), "tp", None))

    def put(t, s):
        return None if t is None else tuple(jax.device_put(x, s) for x in t)

    cache.state = KVCacheState(
        k=put(cache.state.k, sh),
        v=put(cache.state.v, sh),
        k_scale=put(cache.state.k_scale, sh3),
        v_scale=put(cache.state.v_scale, sh3),
    )
    return cache
