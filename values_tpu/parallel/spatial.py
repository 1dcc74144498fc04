"""Spatial ("space"-axis) sharding: the framework's context-parallel analog.

The reference's only long-context mechanism is sliding-window tiling of
volumes bigger than one 64^3 patch (SURVEY.md §5). For volumes whose window
set exceeds one chip's appetite, the window batch shards across the mesh's
``data`` axis with ``shard_map``: each device runs the C1 forward on its
window shard, scatter-adds into a local full-volume buffer, and a single
``psum`` over ICI assembles the volume — windows never round-trip through
the host and the collective moves each voxel exactly once.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.window import stitch_windows
from .mesh import DATA_AXIS


def pad_starts_to_shards(starts: np.ndarray, n_shards: int) -> np.ndarray:
    """Pad the window list to a multiple of n_shards by repeating the last
    window — duplicates land on the count map, and the count-normalized
    outputs stay exact (sums and counts scale together)."""
    n = starts.shape[0]
    padded = int(np.ceil(n / n_shards) * n_shards)
    if padded == n:
        return starts
    reps = np.repeat(starts[-1:], padded - n, axis=0)
    return np.concatenate([starts, reps], axis=0)


def make_sharded_volume_predictor(predictor: Callable, mesh: Mesh,
                                  patch_size: int,
                                  vol_shape: Tuple[int, int, int],
                                  num_classes: int,
                                  dtype: Any = jnp.float32) -> Callable:
    """Build a pjit-ed (stacked_variables, volume, starts, rng) ->
    (softmax_sums (S, *vol, C), counts (*vol)) function whose window batch
    is sharded along the mesh ``data`` axis.

    ``starts`` must already be padded to a multiple of the data-axis size
    (see :func:`pad_starts_to_shards`).
    """
    n_data = mesh.shape[DATA_AXIS]

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(), P(DATA_AXIS), P()),
             out_specs=(P(), P()), check_vma=False)
    def sharded(stacked_variables, volume, starts, rng):
        p = patch_size
        sizes = (p, p, p)

        def gather(start):
            return jax.lax.dynamic_slice(volume, start, sizes)

        windows = jax.vmap(gather)(starts)          # (N/n_data, p, p, p)
        x = windows[..., None].astype(dtype)
        softmax_stack, _ = predictor(stacked_variables, x, rng)

        def stitch_sample(sample):
            return stitch_windows(sample, starts,
                                  tuple(vol_shape) + (num_classes,))

        local_sums = jax.vmap(stitch_sample)(softmax_stack)
        local_counts = stitch_windows(
            jnp.ones(windows.shape, dtype=jnp.float32), starts,
            tuple(vol_shape))
        # one psum over ICI assembles the volume across window shards
        sums = jax.lax.psum(local_sums, axis_name=DATA_AXIS)
        counts = jax.lax.psum(local_counts, axis_name=DATA_AXIS)
        return sums, counts

    return jax.jit(sharded)
