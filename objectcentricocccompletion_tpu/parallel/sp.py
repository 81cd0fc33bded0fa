"""Sequence parallelism: shard the per-point / per-query axes over the
'model' mesh axis.

The flagship's activation memory scales with the packed point budget
(``[B, N, C]``) and the occupancy decoder's query set (``[B, L, K, C]``) —
both orders of magnitude larger than the per-frame feature tensors. Under
SP those axes shard across the model axis: every per-point matmul / LN /
gate runs on ``N / tp`` points per device and XLA's SPMD partitioner
inserts the (max / sum) collectives for the per-frame segment reductions
and the replicated-table broadcast-backs. This is the sharding-constraint
formulation — no manual collectives, exactly the "annotate and let XLA
partition" recipe — so the module math is byte-identical to the
single-device path (pinned by ``tests/test_sequence_parallel.py``).

Enable via ``make_train_step(..., sequence_parallel=True)`` on a mesh with
a 'model' axis; the constraint helpers no-op when unset, so model code is
layout-agnostic.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_SP: list = [None]   # (mesh, axis_name) | None


def set_sequence_parallel(mesh: Mesh, axis: str = "model") -> None:
    assert axis in mesh.axis_names, (axis, mesh.axis_names)
    _SP[0] = (mesh, axis)


def clear_sequence_parallel() -> None:
    _SP[0] = None


def sequence_parallel_enabled() -> bool:
    return _SP[0] is not None


def shard_seq(x: jax.Array, seq_dim: int) -> jax.Array:
    """Constrain ``seq_dim`` of ``x`` to the SP axis (leading dim stays on
    'data' when the mesh has one). No-op when SP is unset."""
    if _SP[0] is None:
        return x
    mesh, axis = _SP[0]
    spec = [None] * x.ndim
    if "data" in mesh.axis_names and x.ndim >= 2 and seq_dim != 0:
        spec[0] = "data"
    spec[seq_dim] = axis
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))
