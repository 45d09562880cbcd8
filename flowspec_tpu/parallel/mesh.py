"""Mesh construction helpers, including multi-host slices.

The reference scales across machines by changing torchrun launch env
(run_jetson.sh: --nnodes=5 --master_addr=...). The TPU equivalent is
jax.distributed + one global mesh: every host runs the same SPMD program and
XLA routes stage hops over ICI within a slice and DCN across slices. The
engines only see a Mesh, so single-host and multi-host runs differ solely in
how the mesh is built.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed. On TPU pods with standard env vars all
    arguments auto-detect; explicit args support manual bring-up (the
    analogue of the reference's master_addr/nnodes torchrun flags)."""
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def stage_mesh(num_stages: int, devices=None,
               allow_subset: bool = False) -> Mesh:
    """1-D pipeline mesh. With an explicit multi-host device list the mesh
    must cover it exactly (a subset would leave some hosts with no
    addressable mesh devices while still running the SPMD program); pass
    allow_subset=True only for single-host experimentation."""
    explicit = devices is not None
    devices = devices if explicit else jax.devices()
    if explicit and not allow_subset:
        assert len(devices) == num_stages, (len(devices), num_stages)
    assert len(devices) >= num_stages, (len(devices), num_stages)
    return Mesh(np.array(devices[:num_stages]), ("stage",))


def stage_tp_mesh(num_stages: int, tp: int, devices=None,
                  allow_subset: bool = False) -> Mesh:
    """(stage, tp) mesh: layers pipeline over `stage`, attention heads /
    mlp shards over `tp`. tp is the minor (fastest-varying) axis so each
    stage's TP group is a contiguous device block — all-reduces stay inside
    a host/slice, stage hops cross blocks."""
    explicit = devices is not None
    devices = devices if explicit else jax.devices()
    need = num_stages * tp
    if explicit and not allow_subset:
        assert len(devices) == need, (len(devices), need)
    assert len(devices) >= need, (len(devices), need)
    arr = np.array(devices[:need]).reshape(num_stages, tp)
    return Mesh(arr, ("stage", "tp"))


def tp_mesh(tp: int, devices=None, allow_subset: bool = False) -> Mesh:
    explicit = devices is not None
    devices = devices if explicit else jax.devices()
    if explicit and not allow_subset:
        assert len(devices) == tp, (len(devices), tp)
    assert len(devices) >= tp
    return Mesh(np.array(devices[:tp]), ("tp",))


def put_global(tree, sharding):
    """jax.device_put that also works on meshes spanning multiple processes
    (real multi-host slices and the 2-process dryrun,
    tools/multihost_dryrun.py): device_put rejects non-addressable
    shardings, so those go through make_array_from_callback — each process
    materializes only its own shards from the (identical-per-process) host
    value, which is exactly the per-host weight-loading pattern on a pod
    slice."""
    if sharding.is_fully_addressable:
        return jax.device_put(tree, sharding)

    def put_one(x):
        if jnp.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key):
            # typed PRNG keys can't cross numpy; transfer the raw key data
            # (replicated — keys are never sharded here) and re-wrap
            impl = jax.random.key_impl(x)
            data = put_one(jax.random.key_data(x))
            return jax.random.wrap_key_data(data, impl=impl)
        xnp = np.asarray(x)
        return jax.make_array_from_callback(xnp.shape, sharding,
                                            lambda idx: xnp[idx])
    return jax.tree_util.tree_map(put_one, tree)
