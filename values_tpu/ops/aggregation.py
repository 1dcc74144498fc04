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

import os
from typing import Dict, Mapping, Sequence, Union

import jax
import jax.numpy as jnp

UNC_KEYS = ("pred_entropy", "expected_entropy", "mutual_information")


def linear_agg_default() -> bool:
    """Default for the ``linear=`` knob of the *_maps aggregators:
    VALUES_TPU_AGG_LINEAR=0 restores per-map aggregation (A/B lever)."""
    return os.environ.get("VALUES_TPU_AGG_LINEAR", "1") != "0"


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


def _per_key_thresholds(threshold) -> Sequence[float]:
    if isinstance(threshold, (tuple, list)):
        if len(threshold) != len(UNC_KEYS):
            raise ValueError(f"need {len(UNC_KEYS)} thresholds "
                             f"(PE, EE, MI), got {len(threshold)}")
        return tuple(float(t) for t in threshold)
    return (float(threshold),) * len(UNC_KEYS)


def aggregate_all_maps(
        maps: Mapping[str, jnp.ndarray], patch: int = 10,
        threshold: Union[float, Sequence[float]] = 0.3,
        linear: bool | None = None) -> Dict[str, Dict[str, jnp.ndarray]]:
    """:func:`aggregate_all` over the three C2 uncertainty maps at once.

    ``maps`` holds ``pred_entropy`` / ``expected_entropy`` /
    ``mutual_information`` arrays of identical shape (B, *spatial);
    ``threshold`` is a scalar or a per-key (PE, EE, MI) 3-sequence.
    Returns ``{key: {patch_level, image_level, threshold}}``.

    With ``linear=True`` (default, VALUES_TPU_AGG_LINEAR=0 reverts) the
    box-filter and image sums — the two LINEAR aggregations — run only
    on PE and EE (stacked into one 2B-batch pass) and MI's are derived
    as their difference, since MI = PE - EE voxelwise and both are
    linear maps. That drops a third of the separable-cumsum passes —
    the dominant cost of the C3 tail at the batch-128 pool (measured
    v5e: 268.8 -> 263.6 ms/batch on the headline step,
    scripts/bench_agg_batched.py). Exact in real arithmetic; differs
    from per-map by f32 rounding only (cancellation when the MI box
    sum is tiny), within rtol 1e-4 / atol 5e-3 on entropy-scale maps.
    threshold_mean is NOT linear and always runs per map. Reference
    semantics anchor: aggregate_uncertainties.py:13-67.
    """
    if linear is None:
        linear = linear_agg_default()
    thrs = _per_key_thresholds(threshold)
    if not linear:
        return {k: aggregate_all(maps[k], patch=patch, threshold=t)
                for k, t in zip(UNC_KEYS, thrs)}
    pe, ee = maps[UNC_KEYS[0]], maps[UNC_KEYS[1]]
    b = pe.shape[0]
    duo = jnp.concatenate([pe, ee], axis=0)
    box = box_filter_sum(duo, (patch,) * (duo.ndim - 1),
                         tuple(range(1, duo.ndim)))
    img = image_level_sum(duo)
    box_pe, box_ee = box[:b], box[b:]
    boxes = (box_pe, box_ee, box_pe - box_ee)
    imgs = (img[:b], img[b:], img[:b] - img[b:])
    out = {}
    for key, bx, im, thr in zip(UNC_KEYS, boxes, imgs, thrs):
        out[key] = {
            "patch_level": jnp.max(bx.reshape(b, -1), axis=-1),
            "image_level": im,
            "threshold": threshold_mean(maps[key], thr),
        }
    return out
