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
                 use_grouped_ensemble: bool = False,
                 mesh: Any = None, mesh_strategy: str = "window",
                 weight_mode: str = "uniform", backend: str = "auto",
                 shape_bucket: Optional[int] = None,
                 max_cached_programs: int = 32,
                 prefetch: bool = True):
        """``mesh``: an optional jax.sharding.Mesh for multi-chip C1.
        ``mesh_strategy``:
          - "window": the window batch shards along the mesh ``data``
            axis; each chip stitches a local partial volume and one psum
            over ICI assembles it (the spatial/CP analog, SURVEY.md §5).
            Works for every prediction mode including the grouped
            lowerings.
          - "sample": ensemble members shard along the ``sample`` axis
            (default mode, n_pred==1, members divisible by the axis).
        ``weight_mode``: "uniform" reproduces the reference's stitching
        (count-normalized average, data_carrier_3D.py:99-221); "gaussian"
        weights every stitched quantity by a separable Gaussian importance
        map (sigma = patch/8), downweighting window borders when windows
        overlap (patch_overlap < 1). With non-overlapping windows both
        modes normalize to identical outputs.

        ``backend``: conv lowering for the grouped default/ensemble mode.
          - "xla": grouped convolutions through XLA's conv emitter; its
            batch-minor layouts saturate only at window batches >= ~96
            (measured v5e: 726 vol/s at batch 128 but 86 at batch 16).
          - "pallas": the batch-packed banded-GEMM pipeline
            (values_tpu.models.ensemble_unet3d_pallas) — keeps all 128
            lanes at ANY batch; 3-5x faster at the small window chunks
            real sliding-window inference uses (ensemble-5: 461 vs 86
            vol/s at batch 16; crossover ~batch 96). Needs patch_size
            dividing 128 and a 16-divisible patch (4 pool levels).
          - "auto": pallas when eligible and window_batch < 96."""
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
        self.mesh = mesh
        self.mesh_strategy = mesh_strategy if mesh is not None else None
        if weight_mode not in ("uniform", "gaussian"):
            raise ValueError(f"unknown weight_mode {weight_mode!r}")
        self.weight_mode = weight_mode
        # heterogeneous volume shapes (unpadded LIDC, full-res GTA) would
        # recompile per shape; ``shape_bucket`` pads every volume dim up
        # to a multiple and crops the outputs back (numerically identical
        # on the original extent), and the program cache is LRU-bounded
        self.shape_bucket = shape_bucket
        # double-buffered volume ingest (VERDICT r2 item 4): run_samples
        # np.loads + device_puts the NEXT volume on a background thread
        # while the current one computes
        self.prefetch = bool(prefetch)
        self.max_cached_programs = int(max_cached_programs)
        from collections import OrderedDict
        self._process_cache: "OrderedDict[Any, Any]" = OrderedDict()

        sample_sharded = (mesh is not None
                          and self.mesh_strategy == "sample")
        if sample_sharded:
            # sample sharding replicates the per-member stacked params
            # and shards the global pass index space; the grouped/packed
            # lowerings fuse members into one tree and are bypassed here
            use_grouped_ensemble = False
        if use_grouped_ensemble and self._grouped_eligible(model):
            # MXU-optimized path: members fused into grouped convolutions
            # (values_tpu.models.ensemble_unet3d); numerically equivalent
            # to the vmapped per-member path. MC-dropout tiles one model's
            # weights n_pred times — the grouped dropout mask realizes the
            # independent MC passes.
            from ..models.ensemble_unet3d import (
                group_member_variables, make_grouped_aleatoric_predictor,
                make_grouped_ensemble_predictor, make_grouped_ssn_predictor,
                make_grouped_tta_predictor)
            if mode == "tta":
                member_list = []
                for v in variables_list:
                    member_list.extend([v] * 16)
                if self._select_backend(backend, mc_dropout=False):
                    from ..models.ensemble_unet3d_pallas import (
                        make_grouped_tta_predictor_pallas)
                    _, grouped = make_grouped_tta_predictor_pallas(
                        model.num_classes, self.n_models,
                        model.initial_filter_size, dtype=dtype,
                        interpret=jax.devices()[0].platform != "tpu")
                else:
                    _, grouped = make_grouped_tta_predictor(
                        model.num_classes, self.n_models,
                        model.initial_filter_size, dtype=dtype)
            elif mode == "aleatoric":
                member_list = list(variables_list)
                if self._select_backend(backend, mc_dropout=False):
                    from ..models.ensemble_unet3d_pallas import (
                        make_grouped_aleatoric_predictor_pallas)
                    _, grouped = make_grouped_aleatoric_predictor_pallas(
                        model.num_classes, self.n_models,
                        model.initial_filter_size,
                        n_aleatoric_samples=n_aleatoric_samples,
                        dtype=dtype,
                        interpret=jax.devices()[0].platform != "tpu")
                else:
                    _, grouped = make_grouped_aleatoric_predictor(
                        model.num_classes, self.n_models,
                        model.initial_filter_size,
                        n_aleatoric_samples=n_aleatoric_samples,
                        dtype=dtype)
            elif mode == "ssn":
                member_list = list(variables_list)
                if self._select_backend(backend, mc_dropout=False):
                    from ..models.ensemble_unet3d_pallas import (
                        make_grouped_ssn_predictor_pallas)
                    _, grouped = make_grouped_ssn_predictor_pallas(
                        model.num_classes, self.n_models,
                        model.initial_filter_size, n_pred=n_pred,
                        rank=getattr(model, "rank", 10),
                        epsilon=getattr(model, "epsilon", 1e-5),
                        dtype=dtype,
                        interpret=jax.devices()[0].platform != "tpu")
                else:
                    _, grouped = make_grouped_ssn_predictor(
                        model.num_classes, self.n_models,
                        model.initial_filter_size, n_pred=n_pred,
                        rank=getattr(model, "rank", 10),
                        epsilon=getattr(model, "epsilon", 1e-5),
                        dtype=dtype)
            else:
                mc_dropout = bool(getattr(model, "do_dropout", False))
                member_list = (list(variables_list) * n_pred if mc_dropout
                               else list(variables_list))
                if self._select_backend(backend, mc_dropout):
                    from ..models.ensemble_unet3d_pallas import (
                        make_grouped_ensemble_predictor_pallas)
                    _, grouped = make_grouped_ensemble_predictor_pallas(
                        model.num_classes, len(member_list),
                        model.initial_filter_size, dtype=dtype,
                        do_dropout=mc_dropout,
                        interpret=jax.devices()[0].platform != "tpu")
                else:
                    _, grouped = make_grouped_ensemble_predictor(
                        model.num_classes, len(member_list),
                        model.initial_filter_size, dtype=dtype,
                        do_dropout=mc_dropout)
            self.stacked_variables = jax.tree_util.tree_map(
                jnp.asarray, group_member_variables(member_list))

            # stacks leave the predictor in f32 — except in the f64
            # parity-harness mode, which must stay f64 end to end
            out_dtype = (jnp.float64 if jnp.dtype(dtype) == jnp.float64
                         else jnp.float32)

            def predictor(variables, x, rng):
                stack, sigma = grouped(variables, x, rng)
                if sigma is not None:
                    sigma = sigma.astype(out_dtype)
                return stack.astype(out_dtype), sigma
            self.predictor = predictor
        else:
            self.stacked_variables = stack_params([
                jax.tree_util.tree_map(
                    lambda x: jnp.asarray(x, dtype=dtype), v)
                for v in variables_list])
            self.predictor = make_predictor(
                model, mode, self.n_models, n_pred, n_aleatoric_samples)

        if self.mesh_strategy == "sample":
            self._setup_sample_sharding()

    def _setup_sample_sharding(self) -> None:
        """Shard the global stochastic-pass space (members x MC passes,
        TTA variants, aleatoric/SSN samples) over the mesh ``sample``
        axis; params replicate (parallel.mesh.make_parallel_pass_predict,
        VERDICT r2 item 5 'the headline win', SURVEY §2.7)."""
        from ..parallel.mesh import make_parallel_pass_predict
        self.predictor = make_parallel_pass_predict(
            self.model, self.mode, self.n_models, self.mesh,
            n_pred=self.n_pred,
            n_aleatoric_samples=self.n_aleatoric_samples,
            stochastic=bool(getattr(self.model, "do_dropout", False)))

    def _select_backend(self, backend: str, mc_dropout: bool) -> bool:
        """True -> the batch-packed Pallas pipeline; False -> XLA convs.
        Pallas needs 128 % patch == 0 (lane packing), patch % 16 == 0
        (four pool levels), a TPU device, and the deterministic fused
        path (dropout falls back to XLA's grouped lowering)."""
        if backend not in ("auto", "xla", "pallas"):
            raise ValueError(f"unknown backend {backend!r}")
        eligible = (128 % self.patch_size == 0
                    and self.patch_size % 16 == 0
                    and not mc_dropout
                    and self.mesh is None)
        if backend == "pallas":
            if not eligible:
                raise ValueError(
                    "backend='pallas' needs a patch_size that divides "
                    "128 and is a multiple of 16, no dropout and no "
                    f"mesh (patch_size={self.patch_size})")
            return True  # non-TPU platforms run in interpret mode
        # auto: XLA's batch-minor conv layouts only win at large window
        # batches (measured crossover ~96 on v5e)
        return (backend == "auto" and eligible and self.window_batch < 96
                and jax.devices()[0].platform == "tpu")

    def _grouped_eligible(self, model: Any) -> bool:
        from ..models.ssn_unet3d import SsnUNet3D
        from ..models.unet3d import UNet3D
        if type(model) is SsnUNet3D:
            # SSN deep ensemble: grouped trunk + per-member heads
            return self.mode == "ssn" and self.n_models > 1
        if type(model) is not UNet3D:
            return False
        if getattr(model, "aleatoric_loss", False):
            # aleatoric ensemble: one grouped (mu, s) forward per window
            return self.mode == "aleatoric" and self.n_models > 1
        if self.mode == "tta":
            # TTA variants as channel groups (16 per member)
            return not getattr(model, "do_dropout", False)
        if self.mode != "default":
            return False
        if getattr(model, "do_dropout", False):
            # MC-dropout: one model, n_pred grouped passes
            return self.n_models == 1 and self.n_pred > 1
        return self.n_pred == 1 and self.n_models > 1

    def _window_weight(self, dtype=None):
        """(p, p, p) per-voxel stitching weight, or None for uniform."""
        if self.weight_mode != "gaussian":
            return None
        from ..ops.window import gaussian_weight_map
        return gaussian_weight_map(self.patch_size,
                                   dtype=dtype or self.dtype)

    @property
    def total_samples(self) -> int:
        if self.mode == "tta":
            return 16 * self.n_models
        if self.mode == "aleatoric":
            return self.n_aleatoric_samples * self.n_models
        return self.n_pred * self.n_models

    # -----------------------------------------------------------------
    def _build_sharded_process_fn(self, vol_shape, n_windows: int):
        """Window-sharded per-volume program: starts (padded to a multiple
        of the data-axis size, invalid entries masked to zero weight)
        shard across chips; each chip stitches a partial volume and one
        psum assembles sums/counts. Masked windows contribute nothing, so
        raw-sum uncertainty semantics stay exact (unlike pad-by-repeat)."""
        from functools import partial
        from jax.sharding import PartitionSpec as P
        from ..parallel.mesh import DATA_AXIS
        p = self.patch_size
        has_sigma = self.mode == "aleatoric"

        @partial(jax.shard_map, mesh=self.mesh,
                 in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(), P()),
                 out_specs=(P(), P(), P(), P()) if has_sigma
                 else (P(), P(), P()),
                 check_vma=False)
        def sharded(volume, starts, mask, stacked_variables, rng):
            rng = jax.random.fold_in(
                rng, jax.lax.axis_index(DATA_AXIS))
            windows = extract_windows(volume, starts, p)
            x = windows[..., None].astype(self.dtype)
            softmax_stack, sigma_stack = self.predictor(
                stacked_variables, x, rng)
            num_classes = softmax_stack.shape[-1]
            wmap = self._window_weight(softmax_stack.dtype)
            m = mask.astype(softmax_stack.dtype)[:, None, None, None]
            if wmap is not None:
                m = m * wmap  # pad mask x Gaussian stitching weight
            m5 = m[:, :, :, :, None]

            def stitch_sample(sample):
                return stitch_windows(sample * m5, starts,
                                      tuple(vol_shape) + (num_classes,))

            stitched = jax.lax.psum(
                jax.vmap(stitch_sample)(softmax_stack), DATA_AXIS)
            counts = jax.lax.psum(stitch_windows(
                jnp.broadcast_to(m, windows.shape).astype(windows.dtype),
                starts, tuple(vol_shape)), DATA_AXIS)
            data_sums = jax.lax.psum(stitch_windows(
                windows * m.astype(windows.dtype),
                starts, tuple(vol_shape)), DATA_AXIS)
            if has_sigma:
                sigma = jax.lax.psum(
                    jax.vmap(stitch_sample)(sigma_stack), DATA_AXIS)
                return stitched, sigma, counts, data_sums
            return stitched, counts, data_sums

        jitted = jax.jit(sharded)

        def process(volume, starts, mask, stacked_variables, rng):
            out = jitted(volume, starts, mask, stacked_variables, rng)
            if has_sigma:
                return out
            return out[0], None, out[1], out[2]

        return process

    def _build_process_fn(self, vol_shape, n_windows: int):
        """Compile the per-volume program for a given geometry."""
        p = self.patch_size

        wmap = self._window_weight()

        def process(volume, starts, stacked_variables, rng):
            windows = extract_windows(volume, starts, p)  # (N, p, p, p)
            x = windows[..., None].astype(self.dtype)     # channel dim
            softmax_stack, sigma_stack = self.predictor(
                stacked_variables, x, rng)                # (S, N, p,p,p, C)
            num_classes = softmax_stack.shape[-1]
            if wmap is not None:
                # weight EVERY stitched quantity: normalized outputs become
                # Gaussian-weighted averages; data/seg are unchanged since
                # overlapping windows agree on their values
                softmax_stack = softmax_stack * wmap[..., None]
                windows = windows * wmap
                cover = jnp.broadcast_to(wmap, (n_windows, p, p, p))
            else:
                cover = jnp.ones((n_windows, p, p, p), dtype=self.dtype)

            def stitch_sample(sample):  # (N, p, p, p, C) -> (D,H,W,C)
                return stitch_windows(sample, starts,
                                      tuple(vol_shape) + (num_classes,))

            stitched = jax.vmap(stitch_sample)(softmax_stack)
            sigma_stitched = (jax.vmap(stitch_sample)(
                sigma_stack * wmap[..., None] if wmap is not None
                else sigma_stack)
                if sigma_stack is not None else None)
            counts = stitch_windows(cover, starts, tuple(vol_shape))
            data_sums = stitch_windows(windows, starts, tuple(vol_shape))
            return stitched, sigma_stitched, counts, data_sums

        return jax.jit(process)

    def _next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    def _cached(self, key, builder):
        """LRU-bounded compiled-program cache (heterogeneous volume
        shapes would otherwise grow it without bound)."""
        if key in self._process_cache:
            self._process_cache.move_to_end(key)
            return self._process_cache[key]
        fn = builder()
        self._process_cache[key] = fn
        while len(self._process_cache) > self.max_cached_programs:
            self._process_cache.popitem(last=False)
        return fn

    # -----------------------------------------------------------------
    def _stage_volume(self, volume: np.ndarray):
        """Shape-bucket pad + async H2D. Bucketing zero-pads dims up to
        the bucket multiple so near-sized volumes share one compiled
        program; windows only cover the original extent and outputs are
        cropped back, so results are bit-identical on the original
        voxels. Thread-safe (run_samples stages the next volume on a
        background thread while the current one computes)."""
        orig_shape = tuple(volume.shape)
        if self.shape_bucket:
            q = int(self.shape_bucket)
            bucketed = tuple(-(-dim // q) * q for dim in orig_shape)
            if bucketed != orig_shape:
                volume = np.pad(volume, [(0, b - d) for d, b in
                                         zip(orig_shape, bucketed)])
        vol_shape = tuple(volume.shape)
        volume_dev = jax.device_put(
            np.asarray(volume, dtype=np.dtype(self.dtype)))
        return volume_dev, vol_shape, orig_shape

    def run_volume(self, volume: np.ndarray,
                   labels: Optional[np.ndarray] = None,
                   starts: Optional[np.ndarray] = None,
                   staged: Optional[tuple] = None):
        """Predict one volume. Returns reference-layout numpy arrays:
        (softmax_sums (S, C, *vol), counts (*vol), data_sums (*vol),
        seg_sums (R, *vol) | None, sigma_sums (S, C, *vol) | None).
        ``staged``: optional pre-staged (volume_dev, vol_shape,
        orig_shape) from :meth:`_stage_volume` (prefetch path)."""
        if staged is not None:
            volume_dev, vol_shape, orig_shape = staged
        else:
            volume_dev, vol_shape, orig_shape = self._stage_volume(volume)
        if starts is None:
            starts = enumerate_window_starts(
                orig_shape, self.patch_size, self.patch_overlap)
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

        window_sharded = self.mesh_strategy == "window"
        n_data = self.mesh.shape["data"] if window_sharded else 1

        stitched = sigma_stitched = counts = data_sums = None
        for part in chunks:
            if window_sharded:
                # pad to the data-axis width with zero-masked windows
                n_valid = len(part)
                padded = int(np.ceil(n_valid / n_data) * n_data)
                mask = np.zeros((padded,), dtype=np.float32)
                mask[:n_valid] = 1.0
                if padded != n_valid:
                    part = np.concatenate(
                        [part, np.repeat(part[-1:], padded - n_valid,
                                         axis=0)], axis=0)
                key = (vol_shape, padded, "window")
                out = self._cached(
                    key, lambda: self._build_sharded_process_fn(
                        vol_shape, padded))(
                    volume_dev, jnp.asarray(part), jnp.asarray(mask),
                    self.stacked_variables, self._next_rng())
            else:
                key = (vol_shape, len(part))
                n_part = len(part)
                out = self._cached(
                    key, lambda: self._build_process_fn(
                        vol_shape, n_part))(
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
        if self.weight_mode == "gaussian":
            # hand downstream already-normalized quantities with a unit
            # count map: every reference formula (uncertainty on raw sums,
            # seg/data division, metrics) then consumes proper Gaussian-
            # weighted averages — the parity-relevant uniform path is
            # untouched
            denom = np.where(counts_np == 0, 1, counts_np)
            softmax_sums = softmax_sums / denom
            data_np = data_np / denom
            if sigma_sums is not None:
                sigma_sums = sigma_sums / denom
            counts_np = np.ones_like(counts_np)

        seg_sums = None
        if labels is not None:
            seg_windows = extract_windows(
                jnp.asarray(labels.astype(np.float32)).transpose(1, 2, 3, 0),
                jnp.asarray(starts), self.patch_size)
            wmap = self._window_weight(jnp.float32)
            if wmap is not None:
                seg_windows = seg_windows * wmap[..., None]
            seg = stitch_windows(seg_windows, jnp.asarray(starts),
                                 vol_shape + (labels.shape[0],))
            seg_sums = np.moveaxis(np.asarray(seg), -1, 0)
            if wmap is not None:
                # integer rater labels, exactly recovered from the
                # weighted average (windows agree on label values); rint
                # guards the w/w float rounding ahead of int casts
                wsum = np.asarray(stitch_windows(
                    jnp.broadcast_to(wmap, (len(starts),)
                                     + (self.patch_size,) * 3),
                    jnp.asarray(starts), vol_shape))
                seg_sums = np.rint(
                    seg_sums / np.where(wsum == 0, 1, wsum))
        if vol_shape != orig_shape:  # crop the bucketing pad back off
            sl = tuple(slice(0, dim) for dim in orig_shape)
            softmax_sums = softmax_sums[(slice(None), slice(None)) + sl]
            counts_np = counts_np[sl]
            data_np = data_np[sl]
            if sigma_sums is not None:
                sigma_sums = sigma_sums[(slice(None), slice(None)) + sl]
            if seg_sums is not None:
                seg_sums = seg_sums[(slice(None),) + sl]
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
        items = list(by_image.items())

        def load_item(idx: int):
            """np.load + shape-bucket + async H2D of one volume — runs on
            the prefetch thread so the NEXT volume's IO and staging ride
            under the current volume's compute (VERDICT r2 item 4; the
            per-window H2D hot loop this engine exists to kill,
            test_3D.py:399-483)."""
            image_path, entry = items[idx]
            volume = np.load(image_path)
            labels = None
            if entry["label_paths"]:
                labels = np.stack([
                    np.load(lp) for lp in entry["label_paths"]]).astype(
                        np.intc)
            starts = np.asarray(
                [[c[0][0], c[1][0], c[2][0]] for c in entry["crops"]],
                dtype=np.int32)
            return (image_path, entry, self._stage_volume(volume), labels,
                    starts)

        def consume(loaded):
            image_path, entry, staged, labels, starts = loaded
            softmax_sums, counts, data_sums, seg_sums, sigma_sums = (
                self.run_volume(None, labels, starts, staged=staged))
            carrier.add_volume(image_path, entry["label_paths"], data_sums,
                               seg_sums, softmax_sums, counts, sigma_sums)

        if not self.prefetch or len(items) <= 1:
            for idx in range(len(items)):
                consume(load_item(idx))
            return carrier
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(load_item, 0)
            for idx in range(len(items)):
                loaded = fut.result()
                if idx + 1 < len(items):
                    fut = pool.submit(load_item, idx + 1)
                consume(loaded)
        return carrier
