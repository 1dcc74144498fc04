"""C3 aggregation: reduce per-voxel heatmaps to per-image scalars.

Numerics parity (reference:
evaluation/uncertainty_aggregation/aggregate_uncertainties.py:13-96):

- patch_level: N-d box-filter sum (window ``patch_size``, 'valid'), report
  max + first-(lexicographic)-near-max bounding box (np.isclose semantics),
- image_level: sum (or mean),
- threshold: mean of values >= threshold (threshold loaded per
  (pred_model, unc-class) from ``threshold_analysis.json``); falls through
  to the *sum* when the count is 0 even with mean=True — a reference quirk
  preserved on purpose (:62-67).

The box filter also ships as an on-device ``reduce_window`` kernel used by
the fused inference path; the host aggregation uses the same kernel through
JAX-on-CPU for identical results.
"""
from __future__ import annotations

import json
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import instantiate, make_config
from .experiment_dataloader import ExperimentDataloader


@partial(jax.jit, static_argnums=(1,))
def _box_filter_sum(image, patch_shape):
    """'valid' box-filter sum via reduce_window (MXU/VPU friendly)."""
    return jax.lax.reduce_window(
        jnp.asarray(image, dtype=jnp.float32), 0.0, jax.lax.add,
        window_dimensions=patch_shape,
        window_strides=(1,) * len(patch_shape), padding="VALID")


def patch_level_aggregation(image: np.ndarray, patch_size,
                            mean: bool = False, use_device: bool = False,
                            **kwargs) -> Dict:
    if isinstance(patch_size, int):
        patch_size = len(image.shape) * [patch_size]
    if use_device:
        patch_aggregated = np.asarray(
            _box_filter_sum(np.asarray(image), tuple(patch_size)),
            dtype=np.float64)
    else:
        # float64 parity with the reference's scipy box filter
        from scipy.signal import convolve
        patch_aggregated = convolve(image, np.ones(patch_size), mode="valid")
    if mean:
        patch_aggregated = patch_aggregated / np.prod(patch_size)
    all_max_indices = np.where(
        np.isclose(patch_aggregated, np.max(patch_aggregated)))
    max_indices_slice = [
        (int(indices[0]), int(indices[0] + patch_size[dim]))
        for dim, indices in enumerate(all_max_indices)]
    return {"max_score": float(np.max(patch_aggregated)),
            "bounding_box": max_indices_slice}


def image_level_aggregation(image: np.ndarray, mean: bool = False,
                            **kwargs):
    if mean:
        return float(np.sum(image) / image.size)
    return {"max_score": float(np.sum(image))}


def threshold_aggregation(image: np.ndarray, threshold: Optional[float] = None,
                          threshold_path: Optional[str] = None,
                          pred_model: Optional[str] = None,
                          unc_type: Optional[str] = None,
                          mean: bool = True) -> Dict:
    if threshold is None:
        if threshold_path is None:
            raise Exception(
                "A threshold needs to be provided for threshold aggregation!")
        with open(threshold_path) as f:
            threshold_json = json.load(f)
        if pred_model is None or unc_type is None:
            raise Exception(
                "If you want to load the threshold from a json file, you "
                "have to provide the prediction model and the uncertainty "
                "type")
        unc_type_split = unc_type.split("_")[0]
        threshold = threshold_json[pred_model][
            f"Mean {unc_type_split} threshold"]
    uncertainty_sum = float(image[image >= threshold].sum())
    count = int((image >= threshold).sum())
    if mean and count > 0:
        return {"max_score": uncertainty_sum / count, "threshold": threshold}
    # reference quirk: count == 0 returns the (zero) SUM even when mean=True
    return {"max_score": uncertainty_sum, "threshold": threshold}


def aggregate_uncertainties(exp_dataloader: ExperimentDataloader,
                            aggregations: Dict) -> None:
    """Per unc_type: aggregate every image map with every configured
    aggregation -> ``aggregated_<unc>.json`` (reference :70-96)."""
    for unc, unc_path in exp_dataloader.unc_path_dict.items():
        all_uncs: Dict[str, Dict] = {}
        for image_id in exp_dataloader.image_ids:
            key = f"{image_id}{exp_dataloader.exp_version.unc_ending}"
            all_uncs[key] = {}
            for aggregation in aggregations:
                unc_image = exp_dataloader.get_unc_map(image_id, unc)
                unc_dict = instantiate(
                    make_config(dict(aggregations[aggregation])),
                    image=unc_image,
                    pred_model=exp_dataloader.exp_version.pred_model,
                    unc_type=unc)
                all_uncs[key][aggregation] = unc_dict
        save_path = exp_dataloader.dataset_path / f"aggregated_{unc}.json"
        with open(save_path, "w") as f:
            json.dump(all_uncs, f, indent=4)
