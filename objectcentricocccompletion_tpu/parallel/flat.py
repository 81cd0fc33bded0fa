"""Flat-state packing: collapse a parameter/optimizer pytree's float leaves
into one contiguous buffer.

Rationale: a training step over a pytree state passes O(hundreds) of device
buffers per call. On interconnects with per-buffer dispatch cost (and for
checkpoint IO), packing every float leaf into a single [N] array reduces the
argument surface to a handful of buffers with bit-identical math (the
unravel inside jit is free — XLA sees reshapes/slices of one buffer).
Integer leaves (e.g. optax step counts) keep their dtypes and ride in a
small side tuple.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class FlatState(NamedTuple):
    flat: jax.Array      # packed float leaves
    aux: tuple           # non-float leaves, in tree order


def make_packer(tree: Any):
    """Returns (pack, unpack) for pytrees with this structure."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    is_float = [jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)
                for l in leaves]
    shapes = [jnp.asarray(l).shape for l in leaves]
    dtypes = [jnp.asarray(l).dtype for l in leaves]
    sizes = [int(np.prod(s)) if f else 0
             for s, f in zip(shapes, is_float)]
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    total = int(offsets[-1])

    def pack(t: Any) -> FlatState:
        ls = jax.tree_util.tree_leaves(t)
        flat_parts = [jnp.ravel(l).astype(jnp.float32)
                      for l, f in zip(ls, is_float) if f]
        aux = tuple(l for l, f in zip(ls, is_float) if not f)
        return FlatState(jnp.concatenate(flat_parts) if flat_parts
                         else jnp.zeros((0,), jnp.float32), aux)

    def unpack(fs: FlatState) -> Any:
        out = []
        ai = 0
        for i, f in enumerate(is_float):
            if f:
                seg = jax.lax.dynamic_slice_in_dim(
                    fs.flat, int(offsets[i]), sizes[i])
                out.append(seg.reshape(shapes[i]).astype(dtypes[i]))
            else:
                out.append(fs.aux[ai])
                ai += 1
        return jax.tree_util.tree_unflatten(treedef, out)

    return pack, unpack, total
