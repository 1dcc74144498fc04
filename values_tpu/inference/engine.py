"""Sliding-window inference engine: window gather -> vmapped C1 forward ->
on-device stitching, one compiled program per volume geometry.

This replaces the reference's hot loop #2 (SURVEY.md §3.2): per-window
Python iteration with H2D/D2H transfers and CPU scatter-adds
(test_3D.py:399-483 + data_carrier_3D.py:99-179). Here the whole
window->forward->stitch->count path runs on device; only fully assembled
volumes transfer to host, and the stochastic sample axis S never leaves the
chip.

Memory strategy: windows are processed in chunks of ``window_batch`` and
accumulated into the full-volume (S, D0, D1, D2, C) stitching buffers,
so HBM use is bounded by S * volume + S * window_batch * patch^3 activations.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.window import (enumerate_window_starts, extract_windows,
                          stitch_windows)
from .carrier import VolumeCarrier
from .predictors import make_predictor, stack_params


class SlidingWindowEngine:
    """Runs one C1 prediction mode over full volumes.

    Args:
        model: a flax module (channels-last) with scalar-logit output.
        variables_list: list of variable pytrees (len>1 => deep ensemble).
        mode: "default" | "tta" | "aleatoric" (SSN has its own engine).
        n_pred: stochastic passes per model for "default" mode.
        patch_size / patch_overlap: reference stride semantics.
        dtype: compute dtype (float32 on TPU; float64 for parity harness).
    """

    def __init__(self, model: Any, variables_list: List[Any],
                 mode: str = "default", n_pred: int = 1,
                 n_aleatoric_samples: int = 10, patch_size: int = 64,
                 patch_overlap: float = 1.0, window_batch: int = 8,
                 dtype: Any = jnp.float32, seed: int = 123,
                 use_grouped_ensemble: bool = False):
        self.model = model
        self.n_models = len(variables_list)
        self.mode = mode
        self.n_pred = n_pred
        self.n_aleatoric_samples = n_aleatoric_samples
        self.patch_size = patch_size
        self.patch_overlap = patch_overlap
        self.window_batch = window_batch
        self.dtype = dtype
        self.rng = jax.random.PRNGKey(seed)
        self._process_cache: Dict[Any, Any] = {}

        if use_grouped_ensemble and self._grouped_eligible(model):
            # MXU-optimized path: members fused into grouped convolutions
            # (values_tpu.models.ensemble_unet3d); numerically equivalent
            # to the vmapped per-member path. MC-dropout tiles one model's
            # weights n_pred times — the grouped dropout mask realizes the
            # independent MC passes.
            from ..models.ensemble_unet3d import (
                group_member_variables, make_grouped_ensemble_predictor,
                make_grouped_tta_predictor)
            if mode == "tta":
                member_list = []
                for v in variables_list:
                    member_list.extend([v] * 16)
                _, grouped = make_grouped_tta_predictor(
                    model.num_classes, self.n_models,
                    model.initial_filter_size, dtype=dtype)
            else:
                mc_dropout = bool(getattr(model, "do_dropout", False))
                member_list = (list(variables_list) * n_pred if mc_dropout
                               else list(variables_list))
                _, grouped = make_grouped_ensemble_predictor(
                    model.num_classes, len(member_list),
                    model.initial_filter_size, dtype=dtype,
                    do_dropout=mc_dropout)
            self.stacked_variables = jax.tree_util.tree_map(
                jnp.asarray, group_member_variables(member_list))

            def predictor(variables, x, rng):
                stack, sigma = grouped(variables, x, rng)
                return stack.astype(jnp.float32), sigma
            self.predictor = predictor
        else:
            self.stacked_variables = stack_params([
                jax.tree_util.tree_map(
                    lambda x: jnp.asarray(x, dtype=dtype), v)
                for v in variables_list])
            self.predictor = make_predictor(
                model, mode, self.n_models, n_pred, n_aleatoric_samples)

    def _grouped_eligible(self, model: Any) -> bool:
        from ..models.unet3d import UNet3D
        if type(model) is not UNet3D or getattr(model, "aleatoric_loss",
                                                False):
            return False
        if self.mode == "tta":
            # TTA variants as channel groups (16 per member)
            return not getattr(model, "do_dropout", False)
        if self.mode != "default":
            return False
        if getattr(model, "do_dropout", False):
            # MC-dropout: one model, n_pred grouped passes
            return self.n_models == 1 and self.n_pred > 1
        return self.n_pred == 1 and self.n_models > 1

    @property
    def total_samples(self) -> int:
        if self.mode == "tta":
            return 16 * self.n_models
        if self.mode == "aleatoric":
            return self.n_aleatoric_samples * self.n_models
        return self.n_pred * self.n_models

    # -----------------------------------------------------------------
    def _build_process_fn(self, vol_shape, n_windows: int):
        """Compile the per-volume program for a given geometry."""
        p = self.patch_size

        def process(volume, starts, stacked_variables, rng):
            windows = extract_windows(volume, starts, p)  # (N, p, p, p)
            x = windows[..., None].astype(self.dtype)     # channel dim
            softmax_stack, sigma_stack = self.predictor(
                stacked_variables, x, rng)                # (S, N, p,p,p, C)
            num_classes = softmax_stack.shape[-1]

            def stitch_sample(sample):  # (N, p, p, p, C) -> (D,H,W,C)
                return stitch_windows(sample, starts,
                                      tuple(vol_shape) + (num_classes,))

            stitched = jax.vmap(stitch_sample)(softmax_stack)
            sigma_stitched = (jax.vmap(stitch_sample)(sigma_stack)
                              if sigma_stack is not None else None)
            counts = stitch_windows(
                jnp.ones((n_windows, p, p, p), dtype=self.dtype),
                starts, tuple(vol_shape))
            data_sums = stitch_windows(windows, starts, tuple(vol_shape))
            return stitched, sigma_stitched, counts, data_sums

        return jax.jit(process)

    def _next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    # -----------------------------------------------------------------
    def run_volume(self, volume: np.ndarray,
                   labels: Optional[np.ndarray] = None,
                   starts: Optional[np.ndarray] = None):
        """Predict one volume. Returns reference-layout numpy arrays:
        (softmax_sums (S, C, *vol), counts (*vol), data_sums (*vol),
        seg_sums (R, *vol) | None, sigma_sums (S, C, *vol) | None)."""
        vol_shape = tuple(volume.shape)
        if starts is None:
            starts = enumerate_window_starts(
                vol_shape, self.patch_size, self.patch_overlap)
        starts = np.asarray(starts)

        # chunk the window batch to bound activation memory; the ragged
        # last chunk runs unpadded (the process-fn cache keys on chunk
        # length, so the tail costs one extra compile). Padding by
        # repeating a window would inflate the raw softmax sums the
        # reference-semantics uncertainty path consumes (test_3D.py:486-534
        # computes PE/EE/MI on raw sums), shifting entropies by -log(k).
        chunk = max(1, self.window_batch)
        chunks = [starts[i:i + chunk]
                  for i in range(0, len(starts), chunk)]

        volume_dev = jnp.asarray(volume, dtype=self.dtype)
        stitched = sigma_stitched = counts = data_sums = None
        for part in chunks:
            key = (vol_shape, len(part))
            if key not in self._process_cache:
                self._process_cache[key] = self._build_process_fn(
                    vol_shape, len(part))
            out = self._process_cache[key](
                volume_dev, jnp.asarray(part), self.stacked_variables,
                self._next_rng())
            if stitched is None:
                stitched, sigma_stitched, counts, data_sums = out
            else:
                stitched = stitched + out[0]
                if sigma_stitched is not None and out[1] is not None:
                    sigma_stitched = sigma_stitched + out[1]
                counts = counts + out[2]
                data_sums = data_sums + out[3]

        softmax_sums = np.moveaxis(np.asarray(stitched), -1, 1)
        sigma_sums = (np.moveaxis(np.asarray(sigma_stitched), -1, 1)
                      if sigma_stitched is not None else None)
        counts_np = np.asarray(counts)
        data_np = np.asarray(data_sums)

        seg_sums = None
        if labels is not None:
            seg_windows = extract_windows(
                jnp.asarray(labels.astype(np.float32)).transpose(1, 2, 3, 0),
                jnp.asarray(starts), self.patch_size)
            seg = stitch_windows(seg_windows, jnp.asarray(starts),
                                 vol_shape + (labels.shape[0],))
            seg_sums = np.moveaxis(np.asarray(seg), -1, 0)
        return softmax_sums, counts_np, data_np, seg_sums, sigma_sums

    # -----------------------------------------------------------------
    def run_samples(self, data_samples: Sequence[Dict],
                    carrier: Optional[VolumeCarrier] = None) -> VolumeCarrier:
        """Consume a reference-format sample list (one dict per window with
        image_path/label_paths/crop_idx; toy_datamodule_3D.py:581-665),
        grouped per image, and fill a VolumeCarrier."""
        carrier = carrier or VolumeCarrier()
        by_image: Dict[str, Dict] = {}
        for sample in data_samples:
            entry = by_image.setdefault(sample["image_path"], {
                "label_paths": sample.get("label_paths"), "crops": []})
            entry["crops"].append(sample["crop_idx"])

        for image_path, entry in by_image.items():
            volume = np.load(image_path)
            labels = None
            if entry["label_paths"]:
                labels = np.stack([
                    np.load(lp) for lp in entry["label_paths"]]).astype(
                        np.intc)
            starts = np.asarray(
                [[c[0][0], c[1][0], c[2][0]] for c in entry["crops"]],
                dtype=np.int32)
            softmax_sums, counts, data_sums, seg_sums, sigma_sums = (
                self.run_volume(volume, labels, starts))
            carrier.add_volume(image_path, entry["label_paths"], data_sums,
                               seg_sums, softmax_sums, counts, sigma_sums)
        return carrier
