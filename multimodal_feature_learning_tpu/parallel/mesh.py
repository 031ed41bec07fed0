"""Device mesh + sharding plumbing.

TPU-native replacement for the reference's DDP/NCCL layer
(``utils/misc.py:392-458``, main.py:85): a ``jax.sharding.Mesh`` with a
``data`` axis (and a ``model`` axis kept general for TP-style sharding later),
``NamedSharding`` annotations on the batch, replicated params, and XLA-inserted
collectives — ``reduce_dict``/all_reduce disappear because criterion sums over
the globally sharded batch inside jit.

Multi-host: call ``maybe_initialize_distributed()`` once per process; the mesh
spans all global devices and per-host data loading covers the process shard
(data/loader.py).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed():
    """jax.distributed.initialize() when launched multi-process (env-driven).

    Replaces the reference's init_distributed_mode (utils/misc.py:436-458):
    set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID per
    process (the torchrun RANK/WORLD_SIZE/MASTER_ADDR analog)."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    try:
        already = jax.distributed.is_initialized()
    except AttributeError:  # older jax
        already = getattr(jax.distributed.global_state, "client", None) is not None
    if already:
        return
    # NOTE: must run before anything that initializes the XLA backend
    # (jax.devices()/process_count() would lock in a single-process backend)
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
    )


def make_mesh(num_data: int = -1, num_model: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if num_data == -1:
        num_data = len(devices) // num_model
    grid = np.asarray(devices[: num_data * num_model]).reshape(num_data, num_model)
    return Mesh(grid, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def cast_floats(batch_arrays: dict, float_dtype) -> dict:
    """Host-side cast of float32 leaves to ``float_dtype`` before transfer
    (the cfg.transfer_dtype rule — halves host->device bytes for bf16; the
    step upcasts at entry). Integer/bool arrays untouched. Single source of
    truth for the cast: shard_batch and bench.py both route through here."""
    import jax.numpy as jnp

    dt = jnp.dtype(float_dtype)  # resolves "bfloat16" via ml_dtypes
    return {
        k: np.asarray(v).astype(dt)
        if np.asarray(v).dtype == np.float32 else v
        for k, v in batch_arrays.items()
    }


def shard_batch(batch_arrays: dict, mesh: Mesh, stacked: bool = False,
                float_dtype=None) -> dict:
    """device_put every array with its leading dim split over 'data'.

    stacked=True: arrays are (K, B, ...) stacks of K batches (multi-step
    dispatch, engine/train.py) — the 'data' axis is then dim 1.

    float_dtype: cast float32 arrays to this dtype BEFORE the device_put
    (cfg.transfer_dtype = "bfloat16" halves host->device bytes — the
    dominant per-step cost when the host drives a remote chip; the train
    step upcasts at entry, engine/train.py). Integer/bool arrays untouched.

    Single-device meshes skip NamedSharding entirely: on the experimental
    'axon' TPU platform, feeding NamedSharding-annotated inputs into jit
    selects a partitioned-executable path that runs ~100x slower than the
    plain single-device executable (measured 67s vs 0.14s per train step).
    Semantics are identical either way on one device.
    """
    if float_dtype is not None:
        batch_arrays = cast_floats(batch_arrays, float_dtype)
    if mesh.size == 1:
        dev = mesh.devices.reshape(-1)[0]
        return {k: jax.device_put(v, dev) for k, v in batch_arrays.items()}
    sh = (NamedSharding(mesh, P(None, "data")) if stacked
          else data_sharding(mesh))
    if jax.process_count() > 1:
        # each process loads its own shard of the global batch (loader.py
        # process-strided indices); assemble the global jax.Array from the
        # per-process local data (the DistributedSampler + DDP analog)
        return {
            k: jax.make_array_from_process_local_data(sh, np.asarray(v))
            for k, v in batch_arrays.items()
        }
    return {k: jax.device_put(v, sh) for k, v in batch_arrays.items()}


def replicate_params(tree, mesh: Mesh):
    if mesh.size == 1:
        dev = mesh.devices.reshape(-1)[0]
        return jax.device_put(tree, dev)
    rep = replicated(mesh)
    if jax.process_count() > 1:
        # identical host values on every process -> fully-replicated global
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(rep, np.asarray(a)),
            tree,
        )
    return jax.device_put(tree, rep)
