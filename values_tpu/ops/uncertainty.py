"""C2 uncertainty measures: predictive entropy, expected entropy, mutual
information, 1-MSR — fused single-pass reductions over the sample axis.

Numerics contract (reference: uncertainty_modeling/test_3D.py:486-534):

- predictive entropy  PE = -sum_c guard(p̄_c · log p̄_c),  p̄ = mean over samples
- expected entropy    EE = mean_n [ -sum_c guard(p_nc · log p_nc) ]
- mutual information  MI = PE - EE
- guard: positions where ``p log p`` is NaN (i.e. p == 0, since
  0 · log 0 = 0 · -inf = NaN in the reference) contribute 0.
- mapping: non-SSN models report aleatoric=EE, epistemic=MI; SSN models swap
  (aleatoric=MI, epistemic=EE) (test_3D.py:510-516).
- single-prediction fallback: 1 - max softmax, stored as ``pred_entropy``
  (test_3D.py:521-525; lazily re-derived by the eval layer for Softmax at
  experiment_dataloader.py:38-61).

The inputs may be *unnormalized* scatter-added softmax sums: the reference
computes uncertainty on ``DataCarrier3D.data[..]["softmax_pred"]`` before the
count normalization that only happens at save time (data_carrier_3D.py:208 vs
test_3D.py:692). With the shipped non-overlapping window configs the two are
identical; we reproduce the raw-sum semantics for bit-parity and expose the
normalized path via the inference engine.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def _guarded_plogp(p: jnp.ndarray) -> jnp.ndarray:
    """p * log p with the reference's NaN-position exclusion semantics."""
    logp = jnp.log(p)
    val = p * logp
    return jnp.where(jnp.isnan(val), 0.0, val)


def entropy(p: jnp.ndarray, class_axis: int = 0) -> jnp.ndarray:
    """-sum_c guard(p log p) along ``class_axis``."""
    return -jnp.sum(_guarded_plogp(p), axis=class_axis)


def uncertainty_measures(softmax_preds: jnp.ndarray,
                         ssn: bool = False) -> Dict[str, jnp.ndarray]:
    """Fused PE / EE / MI over a stack of softmax predictions.

    Args:
        softmax_preds: (N, C, *spatial) sample-stacked softmax outputs.
        ssn: swap the aleatoric/epistemic labeling (SSN convention).

    Returns dict with ``pred_entropy``, ``aleatoric_uncertainty``,
    ``epistemic_uncertainty`` of shape (*spatial,).
    """
    mean_softmax = jnp.mean(softmax_preds, axis=0)
    pred_entropy = entropy(mean_softmax, class_axis=0)
    expected_entropy = jnp.mean(entropy(softmax_preds, class_axis=1), axis=0)
    mutual_information = pred_entropy - expected_entropy
    out = {"pred_entropy": pred_entropy}
    if not ssn:
        out["aleatoric_uncertainty"] = expected_entropy
        out["epistemic_uncertainty"] = mutual_information
    else:
        out["aleatoric_uncertainty"] = mutual_information
        out["epistemic_uncertainty"] = expected_entropy
    return out


def one_minus_msr(softmax_pred: jnp.ndarray,
                  class_axis: int = 0) -> Dict[str, jnp.ndarray]:
    """1 - maximum softmax response (single-prediction fallback)."""
    return {"pred_entropy": 1.0 - jnp.max(softmax_pred, axis=class_axis)}


def fused_sample_statistics(softmax_preds: jnp.ndarray,
                            class_axis: int = 1) -> Dict[str, jnp.ndarray]:
    """One pass over the leading sample axis producing everything the
    inference engine needs: mean softmax, PE, EE, MI. Keeps per-voxel
    statistics on device; the sample axis never round-trips to host
    (SURVEY.md §2.7).

    ``class_axis`` indexes classes within ``softmax_preds`` (1 for the
    reference's (S, C, ...) layout, -1 for the channels-last stacks the
    C1 predictors emit).
    """
    mean_softmax = jnp.mean(softmax_preds, axis=0)
    mean_class_axis = class_axis - 1 if class_axis > 0 else class_axis
    pe = entropy(mean_softmax, class_axis=mean_class_axis)
    ee = jnp.mean(entropy(softmax_preds, class_axis=class_axis), axis=0)
    return {
        "mean_softmax": mean_softmax,
        "pred_entropy": pe,
        "expected_entropy": ee,
        "mutual_information": pe - ee,
    }
