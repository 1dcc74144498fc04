"""Segmentation quality metrics: micro Dice, GED, per-rater test metrics.

Numerics contract (all verified against the reference's torch stack):

- :func:`dice_score` reproduces torchmetrics 0.11.4 ``functional.dice`` with
  ``average="micro"``/``mdmc_average="global"`` as called by the reference
  (reference: uncertainty_modeling/test_3D.py:275, :297-358 and
  lightning_experiment.py validation). Semantics: one-hot both label maps,
  delete the ``ignore_index`` column from both, then
  ``2·Σtp / (2·Σtp + Σfp + Σfn)`` over everything, safe-dividing to 0.
- :func:`generalized_energy_distance` reproduces
  ``calculate_ged`` (reference: test_3D.py:284-358): each pairwise distance
  term is ONE micro Dice over all stacked ordered pairs (not a mean of
  per-pair Dices), including self-pairs.
- :func:`per_rater_test_metrics` reproduces ``calculate_test_metrics``
  (reference: test_3D.py:250-281): per rater, SoftDice + NLL loss and micro
  Dice with ignore_index=0, averaged over raters.

All functions are pure jnp and jittable with static ``num_classes``.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .losses import soft_dice_loss


def _as_labels(preds: jnp.ndarray, num_classes: Optional[int]) -> tuple:
    """Convert float probability tensors (B, C, ...) to label maps."""
    if jnp.issubdtype(preds.dtype, jnp.floating):
        if preds.ndim < 2:
            raise ValueError("float preds must be (B, C, ...)")
        return jnp.argmax(preds, axis=1), preds.shape[1]
    return preds, num_classes


def dice_stats(pred_labels: jnp.ndarray, target_labels: jnp.ndarray,
               ignore_index: Optional[int] = None) -> tuple:
    """(tp, fp, fn) with torchmetrics' deleted-column ignore semantics."""
    pred_labels = pred_labels.astype(jnp.int32)
    target_labels = target_labels.astype(jnp.int32)
    agree = pred_labels == target_labels
    if ignore_index is None:
        tp = jnp.sum(agree)
        fp = jnp.sum(~agree)
        fn = fp
    else:
        pred_keep = pred_labels != ignore_index
        tgt_keep = target_labels != ignore_index
        tp = jnp.sum(agree & tgt_keep)
        fp = jnp.sum(pred_keep & ~agree)
        fn = jnp.sum(tgt_keep & ~agree)
    return tp, fp, fn


def dice_from_stats(tp: jnp.ndarray, fp: jnp.ndarray,
                    fn: jnp.ndarray) -> jnp.ndarray:
    num = 2.0 * tp
    denom = 2.0 * tp + fp + fn
    return jnp.where(denom > 0, num / jnp.maximum(denom, 1), 0.0)


def dice_score(preds: jnp.ndarray, target: jnp.ndarray,
               ignore_index: Optional[int] = None,
               num_classes: Optional[int] = None) -> jnp.ndarray:
    """Micro Dice. ``preds`` may be probabilities (B, C, ...) or labels."""
    labels, _ = _as_labels(preds, num_classes)
    tp, fp, fn = dice_stats(labels, target, ignore_index)
    return dice_from_stats(tp, fp, fn)


def _pairwise_stats(a: jnp.ndarray, b: jnp.ndarray,
                    ignore_index: Optional[int]) -> tuple:
    """Summed (tp, fp, fn) over all ordered pairs of rows of a (N,V), b (M,V).

    Equivalent to one micro Dice over the repeat_interleave x tile stacking
    the reference builds (test_3D.py:285-320), without materializing N*M
    copies of the volumes.
    """
    def per_a(a_row):
        def per_b(b_row):
            return jnp.stack(dice_stats(a_row, b_row, ignore_index))
        return jax.vmap(per_b)(b)
    stats = jax.vmap(per_a)(a)  # (N, M, 3)
    total = jnp.sum(stats, axis=(0, 1))
    return total[0], total[1], total[2], stats


def pairwise_dice_matrix(a: jnp.ndarray, b: jnp.ndarray,
                         ignore_index: Optional[int] = None) -> jnp.ndarray:
    """(N, M) matrix of per-pair micro Dices between label stacks."""
    _, _, _, stats = _pairwise_stats(a, b, ignore_index)
    return dice_from_stats(stats[..., 0], stats[..., 1], stats[..., 2])


def generalized_energy_distance(
    pred_softmax: jnp.ndarray,
    ground_truth: jnp.ndarray,
    ignore_index: int = 0,
    ged_only: bool = False,
) -> Dict[str, jnp.ndarray]:
    """GED between N predictions and M rater segmentations.

    Args:
        pred_softmax: (N, C, *spatial) softmax stacks (may be count-normalized
            sums, matching the reference's inputs at test_3D.py:545-567).
        ground_truth: (M, *spatial) integer rater maps.
    """
    n = pred_softmax.shape[0]
    m = ground_truth.shape[0]
    pred_labels = jnp.argmax(pred_softmax, axis=1).astype(jnp.int32)
    gt = ground_truth.astype(jnp.int32)
    flat_pred = pred_labels.reshape(n, -1)
    flat_gt = gt.reshape(m, -1)

    # d(gt, pred): one micro dice over all N*M ordered pairs, ignore_index.
    tp, fp, fn, _ = _pairwise_stats(flat_pred, flat_gt, ignore_index)
    dist_gt_pred = 1.0 - dice_from_stats(tp, fp, fn)

    # d(pred, pred): all N*N ordered pairs incl. diagonal; the reference only
    # passes ignore_index when it equals 0 (test_3D.py:303-310).
    pp_ignore = ignore_index if ignore_index == 0 else None
    tp, fp, fn, _ = _pairwise_stats(flat_pred, flat_pred, pp_ignore)
    dist_pred_pred = 1.0 - dice_from_stats(tp, fp, fn)

    # d(gt, gt): ignore_index only when it actually occurs (test_3D.py:316-319)
    gg_ignore_if_present = jnp.any(flat_gt == ignore_index)
    tp_i, fp_i, fn_i, _ = _pairwise_stats(flat_gt, flat_gt, ignore_index)
    tp_n, fp_n, fn_n, _ = _pairwise_stats(flat_gt, flat_gt, None)
    dist_gt_gt = jnp.where(
        gg_ignore_if_present,
        1.0 - dice_from_stats(tp_i, fp_i, fn_i),
        1.0 - dice_from_stats(tp_n, fp_n, fn_n),
    )

    ged = 2.0 * dist_gt_pred - dist_pred_pred - dist_gt_gt
    out: Dict[str, jnp.ndarray] = {"ged": ged}

    if m > 1 and not ged_only:
        dice_mat = pairwise_dice_matrix(flat_pred, flat_gt, ignore_index)
        # reference keeps a 0 floor via `if dice_score > max_dice` on init 0
        max_per_rater = jnp.maximum(jnp.max(dice_mat, axis=0), 0.0)  # (M,)
        max_per_pred = jnp.maximum(jnp.max(dice_mat, axis=1), 0.0)   # (N,)
        for idx in range(m):
            out[f"max dice rater {idx}"] = max_per_rater[idx]
        out["max dice pred"] = jnp.mean(max_per_pred)
    return out


def nll_loss(log_probs: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean negative log likelihood, log_probs (B, C, ...), target (B, ...)."""
    target = target.astype(jnp.int32)
    # one-hot reduce, not take_along_axis (serial gather on TPU; see
    # values_tpu.ops.losses._select_class)
    from .losses import _select_class
    return -jnp.mean(_select_class(log_probs, target))


def per_rater_test_metrics(output_softmax: jnp.ndarray,
                           ground_truth: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-rater SoftDice+NLL loss and micro Dice, averaged over raters.

    Reference: test_3D.py:250-281 (`calculate_test_metrics`).
    """
    num_raters = ground_truth.shape[0]
    losses = []
    dices = []
    for rater in range(num_raters):
        gt = ground_truth[rater][None].astype(jnp.int32)
        loss = (soft_dice_loss(output_softmax, gt)
                + nll_loss(jnp.log(output_softmax), gt))
        losses.append(loss)
        dices.append(dice_score(output_softmax, gt, ignore_index=0))
    return {
        "loss": jnp.mean(jnp.stack(losses)),
        "dice": jnp.mean(jnp.stack(dices)),
    }
