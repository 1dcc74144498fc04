"""On-device C3 aggregation kernels.

The reference's patch-level aggregation is a dense N-d box-filter
(scipy.signal.convolve with a ones kernel, aggregate_uncertainties.py:13-31)
— on TPU a naive ``reduce_window`` with a 10^3 window reads every voxel
1000x. :func:`box_filter_sum` computes the same 'valid' window sums with
three separable cumulative-sum passes (O(1) reads per voxel per axis).

These feed the fused inference+aggregation pipeline (bench.py) and the
device path of values_tpu.evaluation.aggregate_uncertainties.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp


def _axis_window_sum(x: jnp.ndarray, window: int, axis: int) -> jnp.ndarray:
    """'valid' sliding-window sums along one axis via cumsum difference:
    s[i] = c[i+w-1] - c[i-1] with c = cumsum(x), c[-1] := 0."""
    c = jnp.cumsum(x, axis=axis, dtype=x.dtype)
    n = x.shape[axis]
    upper = jax.lax.slice_in_dim(c, window - 1, n, axis=axis)
    lower = jax.lax.slice_in_dim(c, 0, n - window, axis=axis)
    zero_shape = list(x.shape)
    zero_shape[axis] = 1
    lower = jnp.concatenate(
        [jnp.zeros(zero_shape, dtype=x.dtype), lower], axis=axis)
    return upper - lower


def box_filter_sum(x: jnp.ndarray, window: Sequence[int],
                   spatial_axes: Sequence[int]) -> jnp.ndarray:
    """Separable 'valid' box-filter sum over the given axes."""
    out = x
    for w, axis in zip(window, spatial_axes):
        out = _axis_window_sum(out, int(w), int(axis))
    return out


def patch_level_max(unc: jnp.ndarray, patch: int = 10) -> jnp.ndarray:
    """Max 'valid' box-filter sum per volume; unc (B, D, H, W) -> (B,)."""
    box = box_filter_sum(unc, (patch,) * 3, (1, 2, 3))
    return jnp.max(box.reshape(box.shape[0], -1), axis=-1)


def image_level_sum(unc: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(unc, axis=tuple(range(1, unc.ndim)))


def threshold_mean(unc: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Mean of values >= threshold, falling back to the (zero) sum when no
    voxel passes — the reference's count==0 quirk."""
    axes = tuple(range(1, unc.ndim))
    mask = unc >= threshold
    total = jnp.sum(jnp.where(mask, unc, 0.0), axis=axes)
    count = jnp.sum(mask, axis=axes)
    return jnp.where(count > 0, total / jnp.maximum(count, 1), total)


def aggregate_all(unc: jnp.ndarray, patch: int = 10,
                  threshold: float = 0.3) -> Dict[str, jnp.ndarray]:
    return {
        "patch_level": patch_level_max(unc, patch),
        "image_level": image_level_sum(unc),
        "threshold": threshold_mean(unc, threshold),
    }
