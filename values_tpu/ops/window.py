"""Sliding-window machinery: enumeration, on-device gather and stitching.

The reference processes volumes larger than one 64^3 patch by enumerating
crop windows host-side (reference: toy_datamodule_3D.py:637-665, stride =
``int(patch_size * patch_overlap)``), predicting per-window, and
scatter-adding softmax maps into full-volume numpy arrays with a prediction
count map, normalizing by ``clip(count, 1)`` at save time (reference:
data_carrier_3D.py:99-221). Every window round-trips through the host there.

Here the whole path stays on device: a vmapped ``dynamic_slice`` gather
feeds the batched forward, and stitching is a scan of
``dynamic_update_slice`` accumulations — volumes only leave the device once
fully assembled (SURVEY.md §5 "long-context" analog).

Stitching is a *uniform* average over overlapping windows, matching the
reference exactly (Gaussian weighting is available via ``weight_map`` for
the TPU-native fast path; the shipped configs use non-overlapping windows
where both are identities).
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def enumerate_window_starts(image_shape: Sequence[int], patch_size: int,
                            patch_overlap: float = 1.0) -> np.ndarray:
    """All window start corners with the reference's stride semantics.

    Iteration order matches toy_datamodule_3D.py:637-665: axis 2 outermost,
    axis 0 innermost; ``while start <= dim - patch`` with stride
    ``int(patch_size * patch_overlap)``. Volumes are pre-padded to patch
    multiples by L0 preprocessing, so windows always tile the volume.
    """
    stride = int(patch_size * patch_overlap)
    if stride <= 0:
        raise ValueError("patch_overlap must yield a positive stride")
    axes: List[List[int]] = []
    for dim in image_shape[:3]:
        starts = list(range(0, dim - patch_size + 1, stride))
        axes.append(starts if starts else [0])
    out = []
    for s2 in axes[2]:
        for s1 in axes[1]:
            for s0 in axes[0]:
                out.append((s0, s1, s2))
    return np.asarray(out, dtype=np.int32)


def window_crop_tuples(starts: np.ndarray, patch_size: int) -> List[Tuple]:
    """((x0,x1),(y0,y1),(z0,z1)) tuples as stored in reference samples."""
    return [tuple((int(s), int(s) + patch_size) for s in row)
            for row in starts]


@partial(jax.jit, static_argnums=(2,))
def extract_windows(volume: jnp.ndarray, starts: jnp.ndarray,
                    patch_size: int) -> jnp.ndarray:
    """Gather (N, p, p, p[, C]) windows from a (D0, D1, D2[, C]) volume."""
    trailing = volume.shape[3:]
    sizes = (patch_size,) * 3 + trailing

    def one(start):
        full_start = jnp.concatenate(
            [start, jnp.zeros((len(trailing),), dtype=start.dtype)])
        return jax.lax.dynamic_slice(volume, full_start, sizes)

    return jax.vmap(one)(starts)


@partial(jax.jit, static_argnums=(2,))
def stitch_windows(windows: jnp.ndarray, starts: jnp.ndarray,
                   out_shape: Tuple[int, ...]) -> jnp.ndarray:
    """Scatter-add (N, p, p, p[, C]) windows into a zeroed ``out_shape``
    volume. Sequential scan keeps overlapping-window accumulation exact."""
    n_trailing = windows.ndim - 4

    def body(acc, inp):
        start, window = inp
        full_start = jnp.concatenate(
            [start, jnp.zeros((n_trailing,), dtype=start.dtype)])
        cur = jax.lax.dynamic_slice(acc, full_start, window.shape)
        return jax.lax.dynamic_update_slice(acc, cur + window, full_start), None

    init = jnp.zeros(out_shape, dtype=windows.dtype)
    out, _ = jax.lax.scan(body, init, (starts, windows))
    return out


def count_map(starts: np.ndarray, patch_size: int,
              out_shape: Tuple[int, ...]) -> jnp.ndarray:
    """Per-voxel number of covering windows (``num_predictions`` analog)."""
    ones = jnp.ones((starts.shape[0],) + (patch_size,) * 3, dtype=jnp.float32)
    return stitch_windows(ones, jnp.asarray(starts), tuple(out_shape[:3]))


def gaussian_weight_map(patch_size: int, sigma_scale: float = 0.125,
                        dtype=jnp.float32) -> jnp.ndarray:
    """Separable Gaussian importance map for weighted stitching (optional
    TPU-native extra; NOT used in the reference-parity path)."""
    coords = np.arange(patch_size) - (patch_size - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2 * (patch_size * sigma_scale) ** 2))
    w = g[:, None, None] * g[None, :, None] * g[None, None, :]
    w = w / w.max()
    return jnp.asarray(np.maximum(w, 1e-8), dtype=dtype)
