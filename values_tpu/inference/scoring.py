"""Fully-packed per-volume scoring: only scalars leave the chip.

This is the production home of the TPU-native redesign of the
reference's hot loops #2 and #3 (test_3D.py:399-534 — N sequential
forwards per volume with per-window H2D/D2H and CPU scatter-adds;
aggregate_uncertainties.py:13-96 — scipy box filters over full
volumes): a single compiled program runs the grouped ensemble forward,
softmax + PE/EE/MI, micro Dice against an uploaded GT, and the three
C3 aggregations for each uncertainty map — all in the batch-packed
lane layout (values_tpu.models.ensemble_unet3d_pallas /
values_tpu.ops.packed_stats). Per volume, only 10 scalars ever leave
the layout.

Use this when only image-level scores are needed (OoD / failure /
active-learning acquisition pipelines); use SlidingWindowEngine when
the per-voxel volumes must be materialized for the `test_results/`
tree contract. `bench.py` measures this scorer as the headline
packed pipeline.
"""
from __future__ import annotations

import functools
from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp

from ..core.platform import resolve_interpret
from ..models.ensemble_unet3d_pallas import grouped_forward_packed
from ..ops import packed_stats
from ..ops.pallas.conv3d import LANES, pack_ndhwc

UNC_KEYS = ("pred_entropy", "expected_entropy", "mutual_information")
AGG_KEYS = ("patch_level", "image_level", "threshold")


def score_rows() -> List[str]:
    """Row labels of the (10, B) score matrix."""
    return ["dice"] + [f"{u}/{a}" for u in UNC_KEYS for a in AGG_KEYS]


# -- streaming sample statistics (packed layout) -----------------------------
#
# The sampling C1 modes (aleatoric: members x 10 logit samples,
# MC-dropout: n_pred passes) need S softmax maps. Materializing the
# (S, ...) stack is what bounds the reference AND the engine's stack
# contract; for scores-only use the stack is unnecessary: PE depends
# only on the SUM of softmaxes and EE only on the per-sample entropy
# sum, so both accumulate one sample at a time with O(1) memory —
# this is what lets a 50-sample aleatoric ensemble score batch-128
# pools without holding 50 volumes.

# the NaN-guarded p*log(p) (reference 0*log 0 semantics) is shared with
# the packed-stats consumers — one definition only
_guarded_plogp = packed_stats._guarded_plogp


def streaming_update(carry, probs, class_axis: int = -2):
    """Accumulate one softmax sample into (sum_softmax, sum_entropy).
    class_axis=-2 for packed maps (nb, D, H, C, lanes), -1 for
    unpacked (B, ..., C)."""
    sum_p, sum_ent = carry
    return (sum_p + probs,
            sum_ent - jnp.sum(_guarded_plogp(probs), axis=class_axis))


def streaming_finalize(carry, n_samples: int, class_axis: int = -2):
    """(sum_softmax, sum_entropy) -> the fused_sample_statistics_packed
    dict (identical values to the materialized-stack version)."""
    sum_p, sum_ent = carry
    mean_softmax = sum_p / n_samples
    pe = -jnp.sum(_guarded_plogp(mean_softmax), axis=class_axis)
    ee = sum_ent / n_samples
    return {"mean_softmax": mean_softmax, "pred_entropy": pe,
            "expected_entropy": ee, "mutual_information": pe - ee}


def _pad_batch(volumes: jnp.ndarray, gt: jnp.ndarray, bp: int):
    """Zero-pad the batch up to a pack multiple; returns (volumes, gt,
    original_B). Padded items' scores are sliced off by the callers."""
    if volumes.ndim == 4:
        volumes = volumes[..., None]
    b = volumes.shape[0]
    pad = (-b) % bp
    if pad:
        volumes = jnp.concatenate(
            [volumes, jnp.zeros((pad,) + volumes.shape[1:],
                                volumes.dtype)])
        gt = jnp.concatenate(
            [gt, jnp.zeros((pad,) + gt.shape[1:], gt.dtype)])
    return volumes, gt, b


def _packed_mean_rater_dice(seg, gt, bp, ignore_index):
    """Micro Dice of the packed argmax seg vs gt (B, D, H, W) — or the
    mean over raters for gt (B, R, D, H, W), the reference metrics.json
    semantics (ops/metrics.per_rater_test_metrics, test_3D.py:250-281)."""
    gt = gt.astype(jnp.int32)
    if gt.ndim == 5:
        return jnp.mean(jnp.stack([
            packed_stats.packed_dice(
                seg, packed_stats.pack_labels(gt[:, r], bp), bp,
                ignore_index=ignore_index)
            for r in range(gt.shape[1])]), axis=0)
    return packed_stats.packed_dice(
        seg, packed_stats.pack_labels(gt, bp), bp,
        ignore_index=ignore_index)


# A scalar threshold applies to all three uncertainty classes; a
# 3-sequence is keyed by UNC_KEYS order (PE, EE, MI) — the reference's
# per-(pred_model, unc-class) threshold_analysis.json scheme
# (aggregate_uncertainties.py:73-91). Validation lives with the
# aggregators:
from ..ops.aggregation import _per_key_thresholds as _per_unc_thresholds


def _score_from_stats(stats, gt, bp, *, agg_patch, threshold,
                      ignore_index):
    seg = jnp.argmax(stats["mean_softmax"], axis=-2).astype(jnp.int32)
    rows = [_packed_mean_rater_dice(seg, gt, bp, ignore_index)]
    aggs = packed_stats.packed_aggregate_all_maps(
        stats, bp, patch=agg_patch, threshold=threshold)
    for key in UNC_KEYS:
        rows.extend(aggs[key][a] for a in AGG_KEYS)
    return jnp.stack(rows)


def make_packed_scorer(members: int, patch: int, *,
                       agg_patch: int = 10, threshold: float = 0.3,
                       ignore_index: int = 0, dtype=jnp.bfloat16,
                       interpret: bool | None = None
                       ) -> Tuple[Callable, List[str]]:
    """Build the jittable packed scorer.

    Returns (score_fn, rows): ``score_fn(stacked_variables, volumes,
    gt, rng) -> (10, B) float32`` where volumes is (B, p, p, p) or
    (B, p, p, p, 1) with B a multiple of ``128 // p`` and gt an
    integer (B, p, p, p) segmentation — or (B, R, p, p, p) for R
    raters, in which case the dice row is the mean over raters
    (metrics.json semantics, ops/metrics.per_rater_test_metrics).
    ``stacked_variables`` comes from
    ensemble_unet3d.group_member_variables. The same gt contract holds
    for every scorer in this module.
    """
    if LANES % patch:
        raise ValueError(f"patch={patch} must divide {LANES} for the "
                         "packed layout; use SlidingWindowEngine")
    interpret = resolve_interpret(interpret)
    bp = LANES // patch

    def score(stacked_variables, volumes, gt, rng):
        del rng  # deterministic ensemble forward
        volumes, gt, b = _pad_batch(volumes, gt, bp)
        gv = jax.tree_util.tree_map(lambda a: a.astype(dtype),
                                    stacked_variables)
        xp = pack_ndhwc(volumes.astype(dtype), bp)
        logits = grouped_forward_packed(gv, xp, members, patch,
                                        interpret=interpret)
        stats = packed_stats.fused_sample_statistics_packed(logits)
        return _score_from_stats(stats, gt, bp, agg_patch=agg_patch,
                                 threshold=threshold,
                                 ignore_index=ignore_index)[:, :b]

    return score, score_rows()


def make_hybrid_scorer(num_classes: int, members: int, patch: int, *,
                       initial_filter_size: int = 8,
                       agg_patch: int = 10, threshold: float = 0.3,
                       ignore_index: int = 0, dtype=jnp.bfloat16
                       ) -> Tuple[Callable, List[str]]:
    """XLA grouped convs + the packed C2/C3 consumers.

    At large window batches (>= ~96) XLA's batch-minor conv layouts run
    the forward at the HBM roofline and beat the banded kernel (ROADMAP
    r2 findings; the r3 batch-128 headline), while the stats tail is
    fastest in the packed lane layout. This scorer takes both: the
    ensemble forward stays in NDHWC for XLA, then ONE pack transpose of
    the final logits feeds fused_sample_statistics_packed and the packed
    aggregations — instead of either unpacking every map (the r2 tail)
    or forcing the conv through the banded kernel at a batch where it
    loses. Same (10, B) contract as make_packed_scorer."""
    if LANES % patch:
        raise ValueError(f"patch={patch} must divide {LANES} for the "
                         "packed layout; use SlidingWindowEngine")
    bp = LANES // patch
    from ..models.ensemble_unet3d import EnsembleUNet3D
    model = EnsembleUNet3D(num_classes=num_classes, members=members,
                           initial_filter_size=initial_filter_size,
                           dtype=dtype)

    def score(stacked_variables, volumes, gt, rng):
        del rng  # deterministic ensemble forward
        volumes, gt, b = _pad_batch(volumes, gt, bp)
        gv = jax.tree_util.tree_map(lambda a: a.astype(dtype),
                                    stacked_variables)
        logits = model.apply(gv, volumes.astype(dtype))
        bb, d, h, w, m, c = logits.shape
        packed = pack_ndhwc(logits.reshape(bb, d, h, w, m * c), bp)
        packed = packed.reshape(packed.shape[0], d, h, m, c, LANES)
        stats = packed_stats.fused_sample_statistics_packed(packed)
        return _score_from_stats(stats, gt, bp, agg_patch=agg_patch,
                                 threshold=threshold,
                                 ignore_index=ignore_index)[:, :b]

    return score, score_rows()


def make_packed_aleatoric_scorer(members: int, patch: int, *,
                                 n_aleatoric_samples: int = 10,
                                 agg_patch: int = 10,
                                 threshold: float = 0.3,
                                 ignore_index: int = 0,
                                 dtype=jnp.bfloat16,
                                 sampler: str = "auto",
                                 interpret: bool | None = None
                                 ) -> Tuple[Callable, List[str]]:
    """Scores for the aleatoric-logit-sampling deep ensemble
    (reference loop test_3D.py:458-469): one grouped (mu, s) forward,
    then members x n_aleatoric_samples softmax samples accumulated
    streamingly in the packed layout — no (S, ...) stack is ever
    materialized, so the 50-sample workload scores batch-128 pools in
    the memory footprint of a single sample.

    ``sampler``: how the S-sample tail runs.
    - "pallas" (the "auto" pick on TPU): the whole draw -> softmax ->
      accumulate loop runs inside ONE VMEM-resident kernel
      (ops/pallas/sampling.py) with the hardware PRNG — (mu, sigma)
      cross HBM once instead of once per sample, and the threefry bit
      cost disappears (VERDICT r3 item 3: pack the sampling tails).
    - "xla": a fori_loop drawing eps ~ N(0,1) with key fold_in(rng, i)
      (statistically identical to the engine's per-member block draws,
      not bitwise; the two samplers are statistically identical to each
      other too, tests/test_pallas_sampling.py)."""
    if LANES % patch:
        raise ValueError(f"patch={patch} must divide {LANES} for the "
                         "packed layout; use SlidingWindowEngine")
    if sampler not in ("auto", "pallas", "xla"):
        raise ValueError(f"unknown sampler {sampler!r}")
    interpret = resolve_interpret(interpret)
    bp = LANES // patch
    n = int(n_aleatoric_samples)
    if sampler == "auto":
        # Measured on v5e (r4, scripts/bench_sampling.py): the XLA
        # fori_loop sampler beats the Pallas streaming kernel at both
        # batch 8 (50.7 vs 39.1 vol/s) and batch 32 (143.5 vs 86.7) —
        # the VPU-resident inverse-CDF draw doesn't pay for itself at
        # these head widths, so auto picks XLA everywhere.
        sampler = "xla"

    def score(stacked_variables, volumes, gt, rng):
        volumes, gt, b = _pad_batch(volumes, gt, bp)
        gv = jax.tree_util.tree_map(lambda a: a.astype(dtype),
                                    stacked_variables)
        xp = pack_ndhwc(volumes.astype(dtype), bp)
        out = grouped_forward_packed(gv, xp, members, patch,
                                     interpret=interpret)
        # (nb, D, H, M, 2C, lanes): first C channels mu, last C are s
        out = out.astype(jnp.float32)
        mu, s = jnp.split(out, 2, axis=-2)
        sigma = jnp.exp(s / 2.0)

        if sampler == "pallas":
            from ..ops.pallas.sampling import sampled_softmax_stats
            seed = jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max,
                                      jnp.int32)
            carry = sampled_softmax_stats(mu, sigma, seed, n_samples=n,
                                          interpret=interpret)
        else:
            shape = mu.shape[:3] + mu.shape[4:]  # one member's sample

            def body(i, carry):
                m = i // n
                mu_m = jax.lax.dynamic_index_in_dim(mu, m, 3,
                                                    keepdims=False)
                sig_m = jax.lax.dynamic_index_in_dim(sigma, m, 3,
                                                     keepdims=False)
                eps = jax.random.normal(jax.random.fold_in(rng, i), shape,
                                        jnp.float32)
                probs = jax.nn.softmax(mu_m + sig_m * eps, axis=-2)
                return streaming_update(carry, probs)

            zero_p = jnp.zeros(shape, jnp.float32)
            zero_e = jnp.zeros(shape[:3] + shape[4:], jnp.float32)
            carry = jax.lax.fori_loop(0, members * n, body,
                                      (zero_p, zero_e))
        stats = streaming_finalize(carry, members * n)
        return _score_from_stats(stats, gt, bp, agg_patch=agg_patch,
                                 threshold=threshold,
                                 ignore_index=ignore_index)[:, :b]

    return score, score_rows()


@functools.lru_cache(maxsize=None)
def _lane_reverse_matrix(lanes: int, w_item: int):
    """(lanes, lanes) 0/1 permutation reversing W inside each item's
    lane block (the packed-layout W un-flip)."""
    import numpy as np
    r = np.zeros((lanes, lanes), np.float32)
    for l in range(lanes):
        b, j = divmod(l, w_item)
        r[l, b * w_item + (w_item - 1 - j)] = 1.0
    return r


def _unflip_packed(p: jnp.ndarray, axes, w_item: int) -> jnp.ndarray:
    """Un-flip a packed map (nb, D, H, ..., lanes) whose generating
    input was flipped along the given VOLUME axes (1=D, 2=H, 3=W)."""
    vol_axes = [a for a in axes if a in (1, 2)]
    if vol_axes:
        p = jnp.flip(p, axis=vol_axes)
    if 3 in axes:
        r = jnp.asarray(_lane_reverse_matrix(p.shape[-1], w_item))
        p = jax.lax.dot_general(
            p.astype(jnp.float32), r, (((p.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return p


def make_packed_tta_scorer(members: int, patch: int, *,
                           do_dropout: bool = False,
                           agg_patch: int = 10, threshold: float = 0.3,
                           ignore_index: int = 0, dtype=jnp.bfloat16,
                           interpret: bool | None = None
                           ) -> Tuple[Callable, List[str]]:
    """Scores for test-time augmentation (reference loop
    test_3D.py:427-456): the 16 clean/noise x flip variants run as 16
    sequential members-grouped packed forwards whose softmaxes are
    un-flipped IN THE PACKED LAYOUT (D/H: jnp.flip; W: one lane-reverse
    permutation matmul) and accumulated streamingly. Unlike the grouped
    TTA lowering (members*16 channel groups — exceeds HBM at 64^3
    window batches >= 8), this holds one variant at a time, so TTA
    scores batch-128 pools. Variant RNG (variance draw + noise field)
    mirrors make_grouped_tta_predictor key-for-key; takes plain
    member-stacked variables (no 16x tiling)."""
    if LANES % patch:
        raise ValueError(f"patch={patch} must divide {LANES} for the "
                         "packed layout; use SlidingWindowEngine")
    interpret = resolve_interpret(interpret)
    bp = LANES // patch
    from .predictors import FLIP_COMBOS

    def score(stacked_variables, volumes, gt, rng):
        volumes, gt, b = _pad_batch(volumes, gt, bp)
        gv = jax.tree_util.tree_map(lambda a: a.astype(dtype),
                                    stacked_variables)
        var_key, noise_key, drop_key = jax.random.split(rng, 3)
        variance = jax.random.uniform(var_key, (), minval=0.0,
                                      maxval=0.1)
        noise = jax.random.normal(noise_key, volumes.shape,
                                  volumes.dtype)
        x_noise = volumes + noise * variance

        carry = None
        variant_idx = 0
        for base in (volumes, x_noise):
            for axes in ((),) + tuple(FLIP_COMBOS):
                xv = jnp.flip(base, axis=list(axes)) if axes else base
                xp = pack_ndhwc(xv.astype(dtype), bp)
                # reference TTA runs dropout LIVE per variant
                # (PARITY.md "deviations": test_3D TTA x dropout)
                logits = grouped_forward_packed(
                    gv, xp, members, patch, do_dropout=do_dropout,
                    rng=jax.random.fold_in(drop_key, variant_idx),
                    interpret=interpret)
                variant_idx += 1
                p = jax.nn.softmax(logits.astype(jnp.float32), axis=-2)
                p = _unflip_packed(p, axes, patch)
                if carry is None:
                    shape = p.shape[:3] + p.shape[4:]
                    carry = (jnp.zeros(shape, jnp.float32),
                             jnp.zeros(shape[:3] + shape[4:],
                                       jnp.float32))
                for m in range(members):
                    carry = streaming_update(carry, p[:, :, :, m])
        stats = streaming_finalize(carry, 16 * members)
        return _score_from_stats(stats, gt, bp, agg_patch=agg_patch,
                                 threshold=threshold,
                                 ignore_index=ignore_index)[:, :b]

    return score, score_rows()


def make_packed_dropout_scorer(members: int, patch: int, *,
                               n_pred: int,
                               agg_patch: int = 10,
                               threshold: float = 0.3,
                               ignore_index: int = 0,
                               dtype=jnp.bfloat16,
                               interpret: bool | None = None
                               ) -> Tuple[Callable, List[str]]:
    """Scores for MC-dropout (models left in train mode, reference
    test_3D.py:417-483): n_pred grouped stochastic passes accumulated
    streamingly — pass j draws its 17 dropout masks from
    fold_in(rng, j). Total samples = members * n_pred."""
    if LANES % patch:
        raise ValueError(f"patch={patch} must divide {LANES} for the "
                         "packed layout; use SlidingWindowEngine")
    interpret = resolve_interpret(interpret)
    bp = LANES // patch

    def score(stacked_variables, volumes, gt, rng):
        volumes, gt, b = _pad_batch(volumes, gt, bp)
        gv = jax.tree_util.tree_map(lambda a: a.astype(dtype),
                                    stacked_variables)
        xp = pack_ndhwc(volumes.astype(dtype), bp)

        def body(j, carry):
            logits = grouped_forward_packed(
                gv, xp, members, patch, do_dropout=True,
                rng=jax.random.fold_in(rng, j), interpret=interpret)
            # (nb, D, H, M, C, lanes): fold every member's sample in
            p = jax.nn.softmax(logits.astype(jnp.float32), axis=-2)
            for m in range(members):
                carry = streaming_update(carry, p[:, :, :, m])
            return carry

        nb = xp.shape[0]
        d, h = xp.shape[1], xp.shape[2]
        # per-member class count from the stacked (members-fused) head.
        # Aleatoric trees must go through make_packed_aleatoric_scorer:
        # softmaxing over the concatenated (mu, log-var) channels would
        # silently produce 2C fake classes.
        head = stacked_variables["params"].get("final")
        if head is None:
            if "final_aleatoric" in stacked_variables["params"]:
                raise ValueError(
                    "aleatoric-head ensemble passed to the MC-dropout "
                    "scorer; use make_packed_aleatoric_scorer")
            raise ValueError("stacked tree has no 'final' head")
        num_classes = head["bias"].shape[-1] // members
        zero_p = jnp.zeros((nb, d, h, num_classes, LANES), jnp.float32)
        zero_e = jnp.zeros((nb, d, h, LANES), jnp.float32)
        carry = jax.lax.fori_loop(0, n_pred, body, (zero_p, zero_e))
        stats = streaming_finalize(carry, members * n_pred)
        return _score_from_stats(stats, gt, bp, agg_patch=agg_patch,
                                 threshold=threshold,
                                 ignore_index=ignore_index)[:, :b]

    return score, score_rows()


def make_packed_ssn_scorer(num_classes: int, members: int, patch: int, *,
                           n_pred: int = 1, rank: int = 10,
                           epsilon: float = 1e-5,
                           agg_patch: int = 10, threshold: float = 0.3,
                           ignore_index: int = 0, dtype=jnp.bfloat16,
                           interpret: bool | None = None
                           ) -> Tuple[Callable, List[str]]:
    """Scores for the SSN deep ensemble (reference loop
    test_3D.py:361-396): ONE packed grouped trunk forward, then the
    low-rank-MVN machinery streams member by member — the (B, C*V, R)
    cov_factor (the SSN memory wall: 2.7 GB per member at batch 128)
    is materialized for one member at a time, and each of its n_pred
    logit samples accumulates into the streaming statistics before the
    next is drawn. The singular-capacitance fallback is hoisted out of
    the sample loop (LowRankMVN._degenerate_factor — torch constructor-
    failure parity). Sample (m, s) draws with key
    fold_in(rng, m*n_pred+s) through LowRankMVN.rsample's split tree
    (statistically identical to the engine's batched draw, not
    bitwise)."""
    if LANES % patch:
        raise ValueError(f"patch={patch} must divide {LANES} for the "
                         "packed layout; use SlidingWindowEngine")
    interpret = resolve_interpret(interpret)
    bp = LANES // patch
    from ..models.ssn_unet3d import LowRankMVN
    from ..ops.pallas.conv3d import unpack_ndhwc

    def score(stacked_variables, volumes, gt, rng):
        volumes, gt, b = _pad_batch(volumes, gt, bp)
        gv = jax.tree_util.tree_map(lambda a: a.astype(dtype),
                                    stacked_variables)
        xp = pack_ndhwc(volumes.astype(dtype), bp)
        feats_p = grouped_forward_packed(gv, xp, members, patch,
                                         apply_final=False,
                                         interpret=interpret)
        p = stacked_variables["params"]
        f = feats_p.shape[-2]
        spatial = volumes.shape[1:4]

        def head(fm, name, m, cout):  # unpacked (B, sp, F) -> (B, sp, c)
            k = jax.lax.dynamic_index_in_dim(
                p[name]["kernel"].reshape(f, members, cout), m, 1,
                keepdims=False)
            bias = jax.lax.dynamic_index_in_dim(
                p[name]["bias"].reshape(members, cout), m, 0,
                keepdims=False)
            return (jnp.einsum("b...i,io->b...o", fm,
                               k.astype(jnp.float32))
                    + bias.astype(jnp.float32))

        def flatten_cf(t):  # (B, sp, C) -> (B, C*V), torch (C,D,H,W)
            return jnp.moveaxis(t, -1, 1).reshape(t.shape[0], -1)

        carry = (jnp.zeros(volumes.shape[:4] + (num_classes,),
                           jnp.float32),
                 jnp.zeros(volumes.shape[:4], jnp.float32))

        # fori_loop (not an unrolled Python loop) over members: one
        # member's (B, C*V, R) cov_factor + rsample temporaries live at
        # a time — the unrolled form kept several members' tensors live
        # and OOMed HBM at batch 32 on v5e (20.2 G used of 15.75 G, r4).
        def member_body(m, carry):
            fm = unpack_ndhwc(
                jax.lax.dynamic_index_in_dim(feats_p, m, 3,
                                             keepdims=False),
                bp).astype(jnp.float32)
            mean = flatten_cf(head(fm, "mean_conv", m, num_classes))
            cov_diag = jnp.exp(flatten_cf(
                head(fm, "log_cov_diag_conv", m, num_classes))) + epsilon
            raw = head(fm, "cov_factor_conv", m, num_classes * rank)
            raw = jnp.moveaxis(raw, -1, 1)        # (B, C*R, *sp)
            raw = raw.reshape(raw.shape[0], rank, -1)
            cov_factor = jnp.swapaxes(raw, 1, 2)  # (B, C*V, R)
            dist = LowRankMVN(mean=mean, cov_diag=cov_diag,
                              cov_factor=cov_factor)
            # hoist the capacitance check out of the sample loop
            degenerate = dist._degenerate_factor()
            factor = jnp.where(degenerate[:, None, None],
                               jnp.zeros_like(cov_factor), cov_factor)
            sqrt_diag = jnp.sqrt(cov_diag)

            def sample_body(s, carry):
                k1, k2 = jax.random.split(
                    jax.random.fold_in(rng, m * n_pred + s))
                eps_r = jax.random.normal(k1, (1,) + factor.shape[:1]
                                          + (rank,), jnp.float32)
                eps_d = jax.random.normal(k2, (1,) + mean.shape,
                                          jnp.float32)
                smp = (mean + jnp.einsum("bnr,br->bn", factor, eps_r[0])
                       + sqrt_diag * eps_d[0])    # (B, C*V)
                logits = smp.reshape((-1, num_classes) + spatial)
                logits = jnp.moveaxis(logits, 1, -1)   # (B, sp, C)
                probs = jax.nn.softmax(logits, axis=-1)
                return streaming_update(carry, probs, class_axis=-1)

            return jax.lax.fori_loop(0, n_pred, sample_body, carry)

        carry = jax.lax.fori_loop(0, members, member_body, carry)
        stats = streaming_finalize(carry, members * n_pred,
                                   class_axis=-1)

        from ..ops.aggregation import aggregate_all_maps
        from ..ops.metrics import dice_from_stats, dice_stats
        seg = jnp.argmax(stats["mean_softmax"], axis=-1).astype(jnp.int32)
        per_rater = jax.vmap(lambda a, g: dice_from_stats(
            *dice_stats(a, g, ignore_index=ignore_index)))
        if gt.ndim == 5:  # (B, R, ...): reference mean-over-raters dice
            dice = jnp.mean(jnp.stack(
                [per_rater(seg, gt[:, r]) for r in range(gt.shape[1])]),
                axis=0)
        else:
            dice = per_rater(seg, gt)
        rows = [dice]
        aggs = aggregate_all_maps({k: stats[k] for k in UNC_KEYS},
                                  patch=agg_patch, threshold=threshold)
        for key in UNC_KEYS:
            rows.extend(aggs[key][a] for a in AGG_KEYS)
        return jnp.stack(rows)[:, :b]

    return score, score_rows()
