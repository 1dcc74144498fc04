"""Full-resolution 2D sliding-window inference.

The reference evaluates GTA/Cityscapes at 0.25x resolution so whole
images fit one forward (reference: uncertainty_modeling/test_2D.py and
the AUGMENTATIONS scale in configs/gta_*.yaml). Production full-res
segmentation (2048x1024) wants the 3D engine's window mechanism in 2D:
gather -> batched forward -> scatter-add stitch, all on device, with
count-normalized averaging of overlapping windows.

Unlike the 3D path (volumes pre-padded to patch multiples by L0), 2D
images are arbitrary sizes: the last window per axis is flushed to the
image edge (standard sliding-window semantics), so every pixel is
covered without padding.
"""
from __future__ import annotations

import functools
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def enumerate_window_starts_2d(shape_hw: Sequence[int],
                               patch_hw: Sequence[int],
                               overlap: float = 0.5) -> np.ndarray:
    """(N, 2) window start corners; stride = patch * overlap, last window
    flushed to the edge. An axis shorter than the patch yields start 0
    (callers must pad such axes; see predict_sliding_2d)."""
    if not 0 < overlap <= 1:
        raise ValueError(f"overlap must be in (0, 1], got {overlap}")
    axes = []
    for dim, p in zip(shape_hw, patch_hw):
        stride = max(1, int(p * overlap))
        starts = list(range(0, max(dim - p, 0) + 1, stride))
        if starts[-1] != max(dim - p, 0):
            starts.append(max(dim - p, 0))
        axes.append(starts)
    return np.array([(a, b) for a in axes[0] for b in axes[1]],
                    dtype=np.int32)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def _run_windows(forward: Callable, image: jnp.ndarray,
                 starts: jnp.ndarray, patch_hw: Tuple[int, int],
                 num_classes: int):
    """Sequential scan over windows: slice -> forward -> scatter-add.
    Exact accumulation for overlapping windows (like the 3D engine)."""
    ph, pw = patch_hw
    h, w = image.shape[0], image.shape[1]

    def body(carry, start):
        acc, cnt = carry
        win = jax.lax.dynamic_slice(
            image, (start[0], start[1], 0),
            (ph, pw, image.shape[2]))
        probs = forward(win[None])[0]              # (ph, pw, classes)
        at = (start[0], start[1], 0)
        cur = jax.lax.dynamic_slice(acc, at, (ph, pw, num_classes))
        acc = jax.lax.dynamic_update_slice(acc, cur + probs, at)
        ccur = jax.lax.dynamic_slice(cnt, at[:2], (ph, pw))
        cnt = jax.lax.dynamic_update_slice(cnt, ccur + 1.0, at[:2])
        return (acc, cnt), None

    acc0 = jnp.zeros((h, w, num_classes), jnp.float32)
    cnt0 = jnp.zeros((h, w), jnp.float32)
    (acc, cnt), _ = jax.lax.scan(body, (acc0, cnt0), starts)
    return acc / cnt[..., None]


class SlidingPredictor2D:
    """Per-model sliding-window softmax with a stable compiled program.

    Mirrors the 3D engine's structure (gather -> BATCHED forward ->
    scatter-add stitch, engine.py): windows run through the model
    ``window_batch`` at a time — a per-window (batch-1) forward inside a
    scan left the MXU idle (measured 738 ms/window vs 10.6 ms for the
    same HRNet-W48 window standalone on v5e). One jitted program per
    (image shape, window count); rng folds per window chunk and the
    batch dimension gives stochastic heads (HRNet DROPOUT_FINAL)
    independent dropout masks per window, matching the per-pass MC
    semantics of the whole-image path."""

    def __init__(self, model, patch_hw: Sequence[int], num_classes: int,
                 overlap: float = 0.5, window_batch: int = 8):
        self.patch_hw = (int(patch_hw[0]), int(patch_hw[1]))
        self.num_classes = int(num_classes)
        self.overlap = float(overlap)
        self.window_batch = int(window_batch)
        needs_rng = bool(getattr(model, "dropout_final", False))
        ph, pw = self.patch_hw
        nc = self.num_classes

        def run(image, starts, weights, variables, rng):
            """starts (N, 2) padded to a window_batch multiple; weights
            (N,) 1.0 for real windows, 0.0 for the padding duplicates
            (they forward but contribute nothing to the stitch)."""
            wb = self.window_batch
            n_chunks = starts.shape[0] // wb

            def body(carry, inp):
                ci, st, wt = inp
                acc, cnt = carry
                wins = jax.vmap(lambda s: jax.lax.dynamic_slice(
                    image, (s[0], s[1], 0),
                    (ph, pw, image.shape[2])))(st)      # (wb, ph, pw, C)
                kwargs = ({"rngs": {"dropout": jax.random.fold_in(
                    rng, ci)}} if needs_rng else {})
                probs = jax.nn.softmax(
                    model.apply(variables, wins, **kwargs),
                    axis=-1).astype(jnp.float32)        # (wb, ph, pw, nc)

                def scatter(j, c):
                    a, k = c
                    at = (st[j, 0], st[j, 1], 0)
                    cur = jax.lax.dynamic_slice(a, at, (ph, pw, nc))
                    a = jax.lax.dynamic_update_slice(
                        a, cur + probs[j] * wt[j], at)
                    kc = jax.lax.dynamic_slice(k, at[:2], (ph, pw))
                    k = jax.lax.dynamic_update_slice(k, kc + wt[j], at[:2])
                    return a, k

                acc, cnt = jax.lax.fori_loop(0, wb, scatter, (acc, cnt))
                return (acc, cnt), None

            acc0 = jnp.zeros(image.shape[:2] + (nc,), jnp.float32)
            cnt0 = jnp.zeros(image.shape[:2], jnp.float32)
            (acc, cnt), _ = jax.lax.scan(
                body, (acc0, cnt0),
                (jnp.arange(n_chunks),
                 starts.reshape(n_chunks, wb, 2),
                 weights.reshape(n_chunks, wb)))
            return acc / cnt[..., None]

        self._run = jax.jit(run)

    def __call__(self, variables, image: np.ndarray,
                 rng) -> np.ndarray:
        ph, pw = self.patch_hw
        h, w = image.shape[:2]
        pad_h, pad_w = max(0, ph - h), max(0, pw - w)
        if pad_h or pad_w:
            image = np.pad(image, ((0, pad_h), (0, pad_w), (0, 0)),
                           mode="reflect")
        starts = enumerate_window_starts_2d(
            image.shape[:2], (ph, pw), self.overlap)
        n = starts.shape[0]
        pad_n = (-n) % self.window_batch
        weights = np.ones((n + pad_n,), np.float32)
        if pad_n:
            starts = np.concatenate(
                [starts, np.repeat(starts[-1:], pad_n, axis=0)])
            weights[n:] = 0.0
        out = self._run(jnp.asarray(image), jnp.asarray(starts),
                        jnp.asarray(weights), variables, rng)
        return np.asarray(out)[:h, :w]


def predict_sliding_2d(forward: Callable, image: np.ndarray,
                       patch_hw: Sequence[int], num_classes: int,
                       overlap: float = 0.5) -> np.ndarray:
    """Count-averaged sliding-window softmax for one (H, W, C) image.

    ``forward``: jittable (1, ph, pw, C) -> (1, ph, pw, num_classes)
    softmax function (the model forward). Axes shorter than the patch
    are reflect-padded for the forward and cropped back.
    """
    ph, pw = int(patch_hw[0]), int(patch_hw[1])
    h, w = image.shape[:2]
    pad_h, pad_w = max(0, ph - h), max(0, pw - w)
    if pad_h or pad_w:
        image = np.pad(image, ((0, pad_h), (0, pad_w), (0, 0)),
                       mode="reflect")
    starts = enumerate_window_starts_2d(image.shape[:2], (ph, pw),
                                        overlap)
    out = _run_windows(forward, jnp.asarray(image), jnp.asarray(starts),
                       (ph, pw), num_classes)
    return np.asarray(out)[:h, :w]
