"""Device mesh + sharding helpers.

The reference's parallelism surface (SURVEY.md §2.5) is host-process data
parallelism for inference and MirroredStrategy all-reduce for training
(trainer_base.py:239-252). TPU-native equivalent: one
``jax.sharding.Mesh`` over the slice; batches sharded over the ``data``
axis, params replicated; XLA inserts the ICI all-reduces for gradients under
jit. A ``model`` axis is kept in the mesh for spatially-sharded segmentation
of oversized pages (width-sharded conv inputs) and future tensor sharding.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, data: Optional[int] = None,
              model: int = 1) -> Mesh:
    """Build a (data, model) mesh over ``devices`` (defaults to all)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"data({data}) * model({model}) != devices({n})")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, batch, batch_axis: int = 0):
    """Place a pytree of arrays with the leading axis sharded over 'data'."""
    def spec_for(x):
        spec = [None] * x.ndim
        spec[batch_axis] = "data"
        return NamedSharding(mesh, P(*spec))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, spec_for(x)), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, ndim: int = 4, batch_axis: int = 0) -> NamedSharding:
    """NamedSharding splitting axis ``batch_axis`` over 'data'."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def spatial_sharding(mesh: Mesh, ndim: int = 4, h_axis: int = 1) -> NamedSharding:
    """NamedSharding splitting the spatial height axis over 'model'.

    For pages too large for one chip's HBM: place the NHWC input with this
    sharding (params replicated) and jit the forward — GSPMD inserts the
    conv halo exchanges and pool/upsample collectives automatically, so the
    whole ARU-Net runs height-sharded with no model changes. Exact in f32
    (<=1e-4 vs replicated); in bf16 the different reduction order
    accumulates visible rounding noise through the 5 scales.
    """
    spec = [None] * ndim
    spec[h_axis] = "model"
    return NamedSharding(mesh, P(*spec))


def data_parallel_jit(fn):
    """Plain jit relying on "computation follows data": place params with
    :func:`replicate` and batches with :func:`shard_batch`, and GSPMD derives
    the data-parallel program (gradient all-reduce over ICI) from the input
    shardings."""
    return jax.jit(fn)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Optional multi-host bring-up: ``jax.distributed.initialize`` with
    explicit args or the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); after it, ``jax.devices()`` spans
    the full slice and :func:`make_mesh` shards over every chip while each
    host feeds only its local shard.

    Returns True when initialization ran, False when no coordinator is
    configured (single-host — the common case; the reference's
    MirroredStrategy training is single-host multi-GPU too,
    trainer_base.py:239-252). Safe to call twice (second call is a no-op).
    """
    import os

    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if coordinator_address is None:
        return False
    if jax._src.distributed.global_state.client is not None:  # already up
        return True
    kwargs = {"coordinator_address": coordinator_address}
    num_processes = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None \
        else os.environ.get("JAX_PROCESS_ID")
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)
    return True
