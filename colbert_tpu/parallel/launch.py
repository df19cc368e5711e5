"""Multi-host (pod) launch: process-group init + global-array placement.

The reference is hard-wired single-GPU ("For now, the package only supports
one GPU" — reference: src/infra/config.jl:13-14); SURVEY §2's replacement
table calls for JAX collectives over ICI within a slice and DCN across
slices. This module is the entry point that makes the rest of the parallel
layer (sharded k-means, sharded index/serving, DP/TP encode) run
multi-controller:

Pod launch story
----------------
One process per host, all running the SAME program:

    # on every host (TPU pods auto-detect all arguments):
    import colbert_tpu.parallel.launch as launch
    launch.initialize()                      # jax.distributed handshake
    mesh = make_mesh()                       # global mesh over ALL devices

    # build: each host encodes its stride of the collection
    # (config.rank = launch.process_index(), config.nranks =
    # launch.process_count(); chunks land on a shared filesystem) then
    # rank 0 trains the codec — the existing multi-rank builder protocol.
    Indexer(cfg, encoder=enc, collection=...).index(path)

    # serve: every host loads ONLY its shard rows (stream_from) and the
    # sharded searcher runs one shard_map program over the global mesh;
    # per-shard top-k is all_gathered so every host returns the same
    # merged results.
    s = Searcher(path, encoder=enc, backend="sharded")

Off-pod (CPU/GPU clusters, tests): pass coordinator/process counts
explicitly or via COLBERT_COORDINATOR / COLBERT_NUM_PROCESSES /
COLBERT_PROCESS_ID — see tests/test_multihost.py for a live two-process
CPU cluster exercising sharded k-means and sharded search.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize",
    "is_initialized",
    "process_index",
    "process_count",
    "put_replicated",
    "put_shard_stack",
    "put_data_sharded",
    "owned_data_shards",
]

_initialized = False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join (or create) the JAX process group. Idempotent.

    Arguments default to the COLBERT_COORDINATOR / COLBERT_NUM_PROCESSES /
    COLBERT_PROCESS_ID environment variables; with none given,
    ``jax.distributed.initialize()`` auto-detects TPU pod topology. A
    single-process run (no env, no args, not on a pod) is a no-op, so this
    is safe to call unconditionally at program start.
    """
    global _initialized
    # NOTE: nothing here may touch the XLA backend (jax.devices(),
    # jax.process_count(), any computation) — jax.distributed.initialize
    # must run first
    if is_initialized():  # incl. a direct jax.distributed.initialize()
        # elsewhere in the launcher script — re-initializing would raise
        _initialized = True
        return
    coordinator_address = coordinator_address or os.environ.get("COLBERT_COORDINATOR")
    if num_processes is None and "COLBERT_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["COLBERT_NUM_PROCESSES"])
    if process_id is None and "COLBERT_PROCESS_ID" in os.environ:
        process_id = int(os.environ["COLBERT_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # bare single-host run: nothing to join (on a real TPU pod the
        # runtime env carries the topology and initialize() would pick it
        # up, but guessing here would hang single-host users)
        if not os.environ.get("TPU_WORKER_HOSTNAMES"):
            return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True


def is_initialized() -> bool:
    """True once the JAX process group is joined (by this module or by a
    direct ``jax.distributed.initialize`` call). Deliberately does NOT
    probe ``jax.process_count()``: that would initialize the local XLA
    backend, after which a distributed initialize() raises — making the
    natural ``if not is_initialized(): initialize()`` pattern self-defeating
    (see the NOTE in :func:`initialize`)."""
    if _initialized:
        return True
    try:
        from jax._src import distributed
        return distributed.global_state.client is not None
    except Exception:  # pragma: no cover - private-API drift fallback
        return False


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def put_replicated(arr: np.ndarray, mesh: Mesh) -> jax.Array:
    """Replicate a host array over every mesh device — works in
    multi-controller runs (each process feeds its own addressable devices;
    all processes must pass the same values)."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    bufs = [
        jax.device_put(arr, d)
        for d in sharding.addressable_devices
    ]
    return jax.make_array_from_single_device_arrays(arr.shape, sharding, bufs)


class ShardStackBuilder:
    """Incrementally assemble a (D, *tail_shape) global array sharded over
    the 'data' axis, one shard's host array at a time.

    Unlike :func:`put_shard_stack` (which needs every shard's host copy
    alive simultaneously), ``add()`` uploads a shard to its device(s)
    immediately, so the caller can free each (possibly multi-GB) padded
    host array before building the next — peak host RSS stays one shard,
    not the whole index. Multi-controller safe: ``add`` for a shard no
    local device addresses is a no-op, and ``build()`` checks every
    addressed shard was fed.
    """

    def __init__(self, mesh: Mesh, tail_shape: tuple, dtype):
        self.mesh = mesh
        self.tail_shape = tuple(tail_shape)
        self.dtype = dtype
        self._bufs: dict[int, list] = {}

    def add(self, s: int, arr: np.ndarray) -> None:
        me = jax.process_index()
        devs = self.mesh.devices.reshape(self.mesh.shape["data"], -1)
        local = [d for d in devs[s] if d.process_index == me]
        if not local:
            return
        row = np.asarray(arr, self.dtype)[None]
        if row.shape != (1,) + self.tail_shape:
            raise ValueError(
                f"shard {s} has shape {row.shape[1:]}, expected {self.tail_shape}"
            )
        self._bufs[s] = [jax.device_put(row, d) for d in local]

    def build(self) -> jax.Array:
        D = self.mesh.shape["data"]
        me = jax.process_index()
        devs = self.mesh.devices.reshape(D, -1)
        bufs = []
        for s in range(D):
            if not any(d.process_index == me for d in devs[s]):
                continue
            if s not in self._bufs:
                raise ValueError(
                    f"process {me} addresses data shard {s} but no host "
                    f"array was provided for it"
                )
            bufs.extend(self._bufs[s])
        return jax.make_array_from_single_device_arrays(
            (D,) + self.tail_shape, NamedSharding(self.mesh, P("data")), bufs
        )


def put_shard_stack(
    mesh: Mesh,
    shard_arrays: dict[int, np.ndarray],
    tail_shape: tuple,
    dtype,
) -> jax.Array:
    """Assemble a (D, *tail_shape) global array sharded over the 'data'
    axis from per-shard host arrays.

    ``shard_arrays`` maps data-axis index -> that shard's (*tail_shape)
    host array; a process only needs entries for shards whose device it
    addresses (multi-controller: each host feeds only its own shards —
    index shards never cross DCN at load time). For arrays too large to
    hold for every shard at once, feed a :class:`ShardStackBuilder`
    incrementally instead.
    """
    builder = ShardStackBuilder(mesh, tail_shape, dtype)
    for s, arr in shard_arrays.items():
        builder.add(s, arr)
    return builder.build()


def put_data_sharded(arr: np.ndarray, mesh: Mesh) -> jax.Array:
    """Shard ``arr``'s leading dim over the 'data' axis — multi-controller
    safe (each process uploads only the rows of its own devices). The
    leading dim must divide the data-axis size."""
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    D = mesh.shape["data"]
    if arr.shape[0] % D:
        raise ValueError(
            f"data-axis size {D} must divide leading dim {arr.shape[0]}")
    rows = arr.shape[0] // D
    me = jax.process_index()
    devs = mesh.devices.reshape(D, -1)
    bufs = []
    for s in range(D):
        for dev in devs[s]:
            if dev.process_index == me:
                bufs.append(jax.device_put(arr[s * rows:(s + 1) * rows], dev))
    return jax.make_array_from_single_device_arrays(arr.shape, sharding, bufs)


def owned_data_shards(mesh: Mesh) -> list[int]:
    """Data-axis indices whose devices this process addresses."""
    me = jax.process_index()
    D = mesh.shape["data"]
    devs = mesh.devices.reshape(D, -1)
    return [s for s in range(D) if any(d.process_index == me for d in devs[s])]
