"""Multi-host SPMD launch utilities (SURVEY §2.6 "Launch" /
"Eval collection" rows).

Replaces the reference's per-GPU process launch + NCCL init
(``tools/dist_train.sh:1-13``, ``init_dist`` in ``tools/train.py:134-142``)
and its ``collect_results_cpu`` tmpdir gather (``apis/test.py:94-182``)
with the TPU-native pattern: one process per host,
``jax.distributed.initialize`` wires the hosts together, and a single pjit
program spans every chip. The mesh is laid out hybrid: the data axis rides
DCN across hosts (pure data-parallel gradient psum — the only cross-host
collective), the model axis stays inside a host so tensor-parallel
collectives ride ICI.

On a single host everything degrades to the local-mesh path, so the same
training script runs unchanged from 1 chip to a pod.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Wire up multi-host JAX. No-op when single-process (the common local
    case) or when the runtime auto-detects the topology (TPU pods do).

    Mirrors the role of ``init_dist(backend='nccl')`` in the reference's
    ``tools/train.py:139`` — call once at program start, before any
    device computation.
    """
    if num_processes is not None and num_processes <= 1:
        return
    if coordinator_address is None and num_processes is None:
        # no explicit topology: single process, or a TPU pod whose runtime
        # self-assembles — either way nothing to join. Deliberately avoid
        # jax.process_count() here: it would initialize the XLA backend,
        # after which jax.distributed.initialize is illegal.
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_multihost_mesh(model_axis_size: int = 1, devices=None) -> Mesh:
    """2D [data, model] mesh over every global device.

    Layout rule: ``model`` is the innermost axis and never crosses a host
    boundary (asserted), so tensor-parallel all-reduces ride ICI; ``data``
    takes everything else and is the only axis whose psum crosses DCN.
    With ``model_axis_size=1`` this is plain data parallelism over all
    chips of all hosts.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    assert n % model_axis_size == 0, (n, model_axis_size)
    per_host = max(1, n // max(1, jax.process_count()))
    assert model_axis_size <= per_host, (
        f"model axis ({model_axis_size}) must fit inside one host "
        f"({per_host} devices) so its collectives stay on ICI")
    # jax.devices() orders by process, so a row-major reshape keeps each
    # model group within one host
    grid = np.asarray(devices).reshape(n // model_axis_size,
                                       model_axis_size)
    return Mesh(grid, ("data", "model"))


def process_allgather(tree):
    """Host-side gather of per-process results (eval collection) — the
    counterpart of the reference's ``collect_results_cpu`` tmpdir dance.
    Single-process: identity."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(tree)


def sync_hosts(name: str = "sync") -> None:
    """Barrier across hosts (e.g. before checkpoint rotation)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)
