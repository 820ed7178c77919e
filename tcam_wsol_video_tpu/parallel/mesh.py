"""Device mesh + sharding utilities — the TPU-native distributed backend.

Replaces the reference's torch.distributed stack (DDP wrapper
/root/reference/dlib/parallel/my_ddp.py, all-gather helper
/root/reference/dlib/parallel/__init__.py:15-24, process-group setup
/root/reference/dlib/process/parseit.py:1128-1134):

- one 2-D logical mesh (dp, mp): dp shards the batch (the DDP analogue —
  gradient all-reduce becomes an XLA-inserted psum riding ICI), mp is the
  model axis available for tensor-parallel annotations;
- replication is a sharding annotation, not a module wrapper;
- metric/loss reduction is `psum_across` (replacing
  sync_tensor_across_gpus + .sum());
- multi-host init via jax.distributed.initialize (DCN) when env vars are
  present — the SLURM-rank parsing analogue of parseit.py:798-821.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tcam_wsol_video_tpu.core import constants

DP = constants.MESH_DATA_AXIS
MP = constants.MESH_MODEL_AXIS


def maybe_init_distributed() -> None:
    """Multi-host (DCN) initialization when launched by a cluster runner.
    Single-host runs skip this — jax already sees all local devices."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
        if jax.process_count() > 1:
            # Establish the cross-process collective context (Gloo on
            # CPU) NOW, while every rank is at the same program point.
            # Left to the first psum_across, the context rendezvous has
            # a ~30 s deadline that one rank can blow through if another
            # is still compiling its train program (minutes on a starved
            # host) — observed as "Gloo context initialization failed:
            # DEADLINE_EXCEEDED" in the 2-process smoke.  This also acts
            # as a startup barrier, so ranks begin compiling together.
            from jax.experimental import multihost_utils
            multihost_utils.process_allgather(np.zeros((1,), np.int32))


def make_mesh(dp: int = -1, mp: int = 1,
              devices: Optional[list] = None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    n = len(devs)
    if dp == -1:
        dp = n // mp
    assert dp * mp == n, f"mesh {dp}x{mp} != {n} devices"
    arr = np.asarray(devs).reshape(dp, mp)
    return Mesh(arr, (DP, MP))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis sharded over dp, everything else replicated."""
    return NamedSharding(mesh, P(DP))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place every array leaf of a batch pytree with its batch axis over
    dp (host-local numpy goes straight to per-device buffers)."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh) if hasattr(x, "shape") else x, tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def state_sharding(mesh: Mesh, tree):
    """Sharding pytree for a TrainState: the classification head's fc
    kernel is sharded over classes on the MP axis (bias likewise), all
    other leaves replicated.

    This is the one tensor-parallel annotation the architecture truly
    offers: the (C, num_classes) head is the widest weight at ILSVRC
    scale (2048 x 1000) and its matmul partitions cleanly over the class
    axis — XLA's SPMD partitioner computes per-shard logits and inserts
    the all-gather where the loss needs them.  Every other parameter is
    a conv kernel that is faster replicated at this model size (the
    reference is dp-only, SURVEY §2.8; mp > 1 here is an honest
    extension, not parity).  Works on the params, opt-state and grads
    trees alike (optax momentum mirrors the params structure).
    """
    mp_n = mesh.shape[MP]

    def rule(path, x):
        keys = [str(getattr(p, "key", getattr(p, "name", "")))
                for p in path]
        if mp_n > 1 and "classification_head" in keys and "fc" in keys:
            if keys[-1] == "kernel" and getattr(x, "ndim", 0) == 2:
                return NamedSharding(mesh, P(None, MP))
            if keys[-1] == "bias" and getattr(x, "ndim", 0) == 1:
                return NamedSharding(mesh, P(MP))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, tree)


def psum_across(x, mesh: Optional[Mesh] = None):
    """Sum a host-side value across processes — the counter-reduction
    analogue of the reference's all_gather helper
    (/root/reference/dlib/parallel/__init__.py:15-24 + .sum()).  A single
    process already holds the global value (in-process meshes see every
    shard), so this is the identity; multi-host gathers each process's
    local counters over DCN and sums them."""
    if jax.process_count() == 1:
        return x
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(jnp.asarray(x))
    return np.asarray(gathered).sum(axis=0)


def local_batch_slice(global_batch: int, mesh: Mesh) -> int:
    """Per-process share of the global batch for multi-host input
    pipelines."""
    return global_batch // jax.process_count()
