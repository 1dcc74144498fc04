"""values_tpu.inference.scoring: the fully-packed per-volume scorer
must reproduce the unpacked composition (grouped predictor ->
fused_sample_statistics -> micro Dice -> aggregate_all) — the same
equivalence bench.py relies on for its headline packed pipeline."""
import jax
import jax.numpy as jnp
import numpy as np

from values_tpu.inference.scoring import make_packed_scorer, score_rows
from values_tpu.models.ensemble_unet3d import (
    group_member_variables, make_grouped_ensemble_predictor)
from values_tpu.models.unet3d import UNet3D
from values_tpu.ops.aggregation import aggregate_all
from values_tpu.ops.metrics import dice_from_stats, dice_stats
from values_tpu.ops.uncertainty import fused_sample_statistics

MEMBERS, PATCH, B = 2, 16, 8


def test_packed_scorer_matches_unpacked_composition():
    base = UNet3D(num_classes=2, initial_filter_size=8)
    keys = jax.random.split(jax.random.PRNGKey(0), MEMBERS)
    stacked = group_member_variables(
        [base.init(k, jnp.zeros((1, PATCH, PATCH, PATCH, 1)))
         for k in keys])
    rs = np.random.RandomState(0)
    vols = jnp.asarray(rs.rand(B, PATCH, PATCH, PATCH, 1)
                       .astype(np.float32))
    gt = jnp.asarray((rs.rand(B, PATCH, PATCH, PATCH) > 0.7)
                     .astype(np.int32))
    rng = jax.random.PRNGKey(1)

    score, rows = make_packed_scorer(MEMBERS, PATCH, agg_patch=4,
                                     threshold=0.3, dtype=jnp.float32,
                                     interpret=True)
    assert rows == score_rows() and len(rows) == 10
    got = np.asarray(score(stacked, vols, gt, rng))

    _, pred = make_grouped_ensemble_predictor(2, MEMBERS, 8,
                                              dtype=jnp.float32)
    stack, _ = pred(stacked, vols, rng)
    stats = fused_sample_statistics(stack.astype(jnp.float32),
                                    class_axis=-1)
    seg = jnp.argmax(stats["mean_softmax"], axis=-1).astype(jnp.int32)
    dice = jax.vmap(lambda s, g: dice_from_stats(
        *dice_stats(s, g, ignore_index=0)))(seg, gt)
    want = [np.asarray(dice)]
    for unc in (stats["pred_entropy"], stats["expected_entropy"],
                stats["mutual_information"]):
        agg = aggregate_all(unc, patch=4, threshold=0.3)
        want.extend([np.asarray(agg["patch_level"]),
                     np.asarray(agg["image_level"]),
                     np.asarray(agg["threshold"])])
    np.testing.assert_allclose(got, np.stack(want), atol=5e-3, rtol=5e-3)


def test_packed_scorer_rejects_bad_patch():
    import pytest
    with pytest.raises(ValueError):
        make_packed_scorer(2, 48)


def test_streaming_stats_match_stack():
    """streaming_update/finalize accumulate exactly what
    fused_sample_statistics_packed computes on the materialized stack."""
    from values_tpu.inference.scoring import (streaming_finalize,
                                              streaming_update)
    from values_tpu.ops.packed_stats import fused_sample_statistics_packed
    rs = np.random.RandomState(3)
    logits = jnp.asarray(rs.randn(2, 4, 4, 5, 3, 128).astype(np.float32))
    want = fused_sample_statistics_packed(logits)
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-2)
    carry = (jnp.zeros((2, 4, 4, 3, 128), jnp.float32),
             jnp.zeros((2, 4, 4, 128), jnp.float32))
    for s in range(5):
        carry = streaming_update(carry, p[:, :, :, s])
    got = streaming_finalize(carry, 5)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(want[k]),
                                   atol=1e-6, rtol=1e-5, err_msg=k)


def test_packed_aleatoric_scorer_matches_composition():
    """The streaming aleatoric scorer == unpacked composition fed the
    SAME eps draws (drawn in packed shape, unpacked for the oracle)."""
    from values_tpu.inference.scoring import make_packed_aleatoric_scorer
    from values_tpu.models.ensemble_unet3d import EnsembleUNet3D
    from values_tpu.ops.pallas.conv3d import LANES, unpack_ndhwc

    members, n = 2, 3
    base = UNet3D(num_classes=2, initial_filter_size=8,
                  aleatoric_loss=True)
    keys = jax.random.split(jax.random.PRNGKey(0), members)
    stacked = group_member_variables(
        [base.init(k, jnp.zeros((1, PATCH, PATCH, PATCH, 1)))
         for k in keys])
    rs = np.random.RandomState(1)
    vols = jnp.asarray(rs.rand(B, PATCH, PATCH, PATCH, 1)
                       .astype(np.float32))
    gt = jnp.asarray((rs.rand(B, PATCH, PATCH, PATCH) > 0.7)
                     .astype(np.int32))
    rng = jax.random.PRNGKey(7)
    bp = LANES // PATCH

    score, _ = make_packed_aleatoric_scorer(
        members, PATCH, n_aleatoric_samples=n, agg_patch=4,
        dtype=jnp.float32, interpret=True)
    got = np.asarray(score(stacked, vols, gt, rng))

    # oracle: flax grouped forward (XLA convs), same eps draws unpacked
    ens = EnsembleUNet3D(num_classes=2, members=members,
                         initial_filter_size=8, aleatoric=True)
    out = ens.apply(stacked, vols)                  # (B, sp, M, 2C)
    mu, s = jnp.split(out.astype(jnp.float32), 2, axis=-1)
    sigma = jnp.exp(s / 2.0)
    nb = B // bp
    sum_p = jnp.zeros((B, PATCH, PATCH, PATCH, 2), jnp.float32)
    sum_e = jnp.zeros((B, PATCH, PATCH, PATCH), jnp.float32)
    for i in range(members * n):
        m = i // n
        eps_packed = jax.random.normal(
            jax.random.fold_in(rng, i),
            (nb, PATCH, PATCH, 2, LANES), jnp.float32)
        eps = unpack_ndhwc(eps_packed, bp)          # (B, sp, C)
        probs = jax.nn.softmax(mu[..., m, :] + sigma[..., m, :] * eps,
                               axis=-1)
        sum_p = sum_p + probs
        plogp = probs * jnp.log(probs)
        sum_e = sum_e - jnp.sum(jnp.where(jnp.isnan(plogp), 0.0, plogp),
                                axis=-1)
    mean_softmax = sum_p / (members * n)
    plogp = mean_softmax * jnp.log(mean_softmax)
    pe = -jnp.sum(jnp.where(jnp.isnan(plogp), 0.0, plogp), axis=-1)
    ee = sum_e / (members * n)
    seg = jnp.argmax(mean_softmax, axis=-1).astype(jnp.int32)
    dice = jax.vmap(lambda a, g: dice_from_stats(
        *dice_stats(a, g, ignore_index=0)))(seg, gt)
    want = [np.asarray(dice)]
    for unc in (pe, ee, pe - ee):
        agg = aggregate_all(unc, patch=4, threshold=0.3)
        want.extend([np.asarray(agg["patch_level"]),
                     np.asarray(agg["image_level"]),
                     np.asarray(agg["threshold"])])
    np.testing.assert_allclose(got, np.stack(want), atol=5e-3, rtol=5e-3)


def test_packed_dropout_scorer_matches_manual_passes():
    """The dropout scorer == manually accumulating the same packed
    stochastic passes (bitwise-same masks via the same fold_in keys)."""
    from values_tpu.inference.scoring import (make_packed_dropout_scorer,
                                              streaming_finalize,
                                              streaming_update)
    from values_tpu.models.ensemble_unet3d_pallas import (
        grouped_forward_packed)
    from values_tpu.ops.pallas.conv3d import LANES, pack_ndhwc

    members, n_pred = 1, 3
    base = UNet3D(num_classes=2, initial_filter_size=8, do_dropout=True)
    stacked = group_member_variables(
        [base.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, PATCH, PATCH, PATCH, 1)))])
    rs = np.random.RandomState(2)
    vols = jnp.asarray(rs.rand(B, PATCH, PATCH, PATCH, 1)
                       .astype(np.float32))
    gt = jnp.asarray((rs.rand(B, PATCH, PATCH, PATCH) > 0.7)
                     .astype(np.int32))
    rng = jax.random.PRNGKey(5)
    bp = LANES // PATCH

    score, _ = make_packed_dropout_scorer(
        members, PATCH, n_pred=n_pred, agg_patch=4, dtype=jnp.float32,
        interpret=True)
    got = np.asarray(score(stacked, vols, gt, rng))

    from values_tpu.inference.scoring import _score_from_stats
    xp = pack_ndhwc(vols.astype(jnp.float32), bp)
    carry = (jnp.zeros((B // bp, PATCH, PATCH, 2, LANES), jnp.float32),
             jnp.zeros((B // bp, PATCH, PATCH, LANES), jnp.float32))
    for j in range(n_pred):
        logits = grouped_forward_packed(
            stacked, xp, members, PATCH, do_dropout=True,
            rng=jax.random.fold_in(rng, j), interpret=True)
        p = jax.nn.softmax(logits.astype(jnp.float32), axis=-2)
        carry = streaming_update(carry, p[:, :, :, 0])
    stats = streaming_finalize(carry, n_pred)
    want = np.asarray(_score_from_stats(stats, gt, bp, agg_patch=4,
                                        threshold=0.3, ignore_index=0))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_packed_tta_scorer_matches_grouped_tta():
    """Streaming TTA scorer == the grouped TTA predictor composition:
    both draw the variance/noise from the SAME rng splits, so the
    variant inputs are bitwise identical; stats then agree."""
    from values_tpu.inference.scoring import make_packed_tta_scorer
    from values_tpu.models.ensemble_unet3d import (
        make_grouped_tta_predictor)
    from values_tpu.ops.uncertainty import fused_sample_statistics

    members = 2
    base = UNet3D(num_classes=2, initial_filter_size=8)
    keys = jax.random.split(jax.random.PRNGKey(0), members)
    member_vars = [base.init(k, jnp.zeros((1, PATCH, PATCH, PATCH, 1)))
                   for k in keys]
    stacked = group_member_variables(member_vars)
    tta_stacked = group_member_variables(
        sum([[v] * 16 for v in member_vars], []))
    rs = np.random.RandomState(4)
    vols = jnp.asarray(rs.rand(4, PATCH, PATCH, PATCH, 1)
                       .astype(np.float32))
    gt = jnp.asarray((rs.rand(4, PATCH, PATCH, PATCH) > 0.7)
                     .astype(np.int32))
    rng = jax.random.PRNGKey(9)

    score, _ = make_packed_tta_scorer(members, PATCH, agg_patch=4,
                                      dtype=jnp.float32, interpret=True)
    got = np.asarray(score(stacked, vols, gt, rng))

    _, pred = make_grouped_tta_predictor(2, members, 8, dtype=jnp.float32)
    stack, _ = pred(tta_stacked, vols, rng)      # (32, B, sp, C)
    stats = fused_sample_statistics(stack.astype(jnp.float32),
                                    class_axis=-1)
    seg = jnp.argmax(stats["mean_softmax"], axis=-1).astype(jnp.int32)
    dice = jax.vmap(lambda a, g: dice_from_stats(
        *dice_stats(a, g, ignore_index=0)))(seg, gt)
    want = [np.asarray(dice)]
    for unc in (stats["pred_entropy"], stats["expected_entropy"],
                stats["mutual_information"]):
        agg = aggregate_all(unc, patch=4, threshold=0.3)
        want.extend([np.asarray(agg["patch_level"]),
                     np.asarray(agg["image_level"]),
                     np.asarray(agg["threshold"])])
    np.testing.assert_allclose(got, np.stack(want), atol=5e-3, rtol=5e-3)


def test_packed_ssn_scorer_matches_flax_composition():
    """SSN streaming scorer == per-member flax SsnUNet3D distributions
    sampled with the scorer's exact key scheme (fold_in(rng, m*n+s) ->
    split -> eps_r/eps_d), including the hoisted singular fallback."""
    from values_tpu.inference.scoring import make_packed_ssn_scorer
    from values_tpu.models.ssn_unet3d import SsnUNet3D

    members, n_pred, rank = 2, 2, 3
    base = SsnUNet3D(num_classes=2, initial_filter_size=8, rank=rank)
    keys = jax.random.split(jax.random.PRNGKey(0), members)
    member_vars = [base.init(k, jnp.zeros((1, PATCH, PATCH, PATCH, 1)))
                   for k in keys]
    stacked = group_member_variables(member_vars)
    rs = np.random.RandomState(6)
    vols = jnp.asarray(rs.rand(B, PATCH, PATCH, PATCH, 1)
                       .astype(np.float32))
    gt = jnp.asarray((rs.rand(B, PATCH, PATCH, PATCH) > 0.7)
                     .astype(np.int32))
    rng = jax.random.PRNGKey(11)

    score, _ = make_packed_ssn_scorer(
        2, members, PATCH, n_pred=n_pred, rank=rank, agg_patch=4,
        dtype=jnp.float32, interpret=True)
    got = np.asarray(score(stacked, vols, gt, rng))

    sum_p = jnp.zeros((B, PATCH, PATCH, PATCH, 2), jnp.float32)
    sum_e = jnp.zeros((B, PATCH, PATCH, PATCH), jnp.float32)
    for m in range(members):
        dist = base.apply(member_vars[m], vols)
        degen = dist._degenerate_factor()
        factor = jnp.where(degen[:, None, None],
                           jnp.zeros_like(dist.cov_factor),
                           dist.cov_factor)
        for s in range(n_pred):
            k1, k2 = jax.random.split(
                jax.random.fold_in(rng, m * n_pred + s))
            eps_r = jax.random.normal(k1, (1, B, rank), jnp.float32)[0]
            eps_d = jax.random.normal(k2, (1,) + dist.mean.shape,
                                      jnp.float32)[0]
            smp = (dist.mean + jnp.einsum("bnr,br->bn", factor, eps_r)
                   + jnp.sqrt(dist.cov_diag) * eps_d)
            logits = jnp.moveaxis(
                smp.reshape(B, 2, PATCH, PATCH, PATCH), 1, -1)
            probs = jax.nn.softmax(logits, axis=-1)
            sum_p = sum_p + probs
            plogp = probs * jnp.log(probs)
            sum_e = sum_e - jnp.sum(
                jnp.where(jnp.isnan(plogp), 0.0, plogp), axis=-1)
    n_tot = members * n_pred
    mean_softmax = sum_p / n_tot
    plogp = mean_softmax * jnp.log(mean_softmax)
    pe = -jnp.sum(jnp.where(jnp.isnan(plogp), 0.0, plogp), axis=-1)
    ee = sum_e / n_tot
    seg = jnp.argmax(mean_softmax, axis=-1).astype(jnp.int32)
    dice = jax.vmap(lambda a, g: dice_from_stats(
        *dice_stats(a, g, ignore_index=0)))(seg, gt)
    want = [np.asarray(dice)]
    for unc in (pe, ee, pe - ee):
        agg = aggregate_all(unc, patch=4, threshold=0.3)
        want.extend([np.asarray(agg["patch_level"]),
                     np.asarray(agg["image_level"]),
                     np.asarray(agg["threshold"])])
    np.testing.assert_allclose(got, np.stack(want), atol=5e-3, rtol=5e-3)


def test_packed_dropout_scorer_rejects_aleatoric_tree():
    """Aleatoric trees must be rejected (softmax over concatenated
    (mu, log-var) channels would silently fake 2C classes)."""
    import pytest
    from values_tpu.inference.scoring import make_packed_dropout_scorer

    base = UNet3D(num_classes=2, initial_filter_size=4,
                  aleatoric_loss=True, do_dropout=True)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    stacked = group_member_variables(
        [base.init(k, jnp.zeros((1, PATCH, PATCH, PATCH, 1)))
         for k in keys])
    score, _ = make_packed_dropout_scorer(2, PATCH, n_pred=2,
                                          dtype=jnp.float32,
                                          interpret=True)
    rs = np.random.RandomState(0)
    vols = jnp.asarray(rs.rand(B, PATCH, PATCH, PATCH, 1)
                       .astype(np.float32))
    gt = jnp.zeros((B, PATCH, PATCH, PATCH), jnp.int32)
    with pytest.raises(ValueError, match="aleatoric"):
        score(stacked, vols, gt, jax.random.PRNGKey(1))


def test_per_unc_threshold_triple_matches_scalar_calls():
    """A (PE, EE, MI) threshold triple must reproduce three scalar-
    threshold scorer runs' respective rows (reference per-class
    threshold_analysis.json scheme)."""
    from values_tpu.inference.scoring import make_packed_scorer

    base = UNet3D(num_classes=2, initial_filter_size=4)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    stacked = group_member_variables(
        [base.init(k, jnp.zeros((1, PATCH, PATCH, PATCH, 1)))
         for k in keys])
    rs = np.random.RandomState(4)
    vols = jnp.asarray(rs.rand(B, PATCH, PATCH, PATCH, 1)
                       .astype(np.float32))
    gt = jnp.asarray((rs.rand(B, PATCH, PATCH, PATCH) > 0.7)
                     .astype(np.int32))
    rng = jax.random.PRNGKey(1)
    thr = (0.25, 0.4, 0.05)
    score_t, rows = make_packed_scorer(2, PATCH, agg_patch=4,
                                       threshold=thr,
                                       dtype=jnp.float32, interpret=True)
    got = np.asarray(score_t(stacked, vols, gt, rng))
    for i, t in enumerate(thr):
        score_s, _ = make_packed_scorer(2, PATCH, agg_patch=4,
                                        threshold=t, dtype=jnp.float32,
                                        interpret=True)
        want = np.asarray(score_s(stacked, vols, gt, rng))
        r = rows.index(f"{['pred_entropy','expected_entropy','mutual_information'][i]}/threshold")
        np.testing.assert_allclose(got[r], want[r], atol=1e-6)


def test_packed_aleatoric_scorer_pallas_sampler():
    """The Pallas streaming-sampler tail (VERDICT r3 item 3) composes in
    the scorer: finite (10, B) scores, deterministic per rng, and the
    deterministic parts (dice from the mean softmax with sigma->0 at
    init is NOT guaranteed — so only distributional sanity is asserted
    here; the tail math itself is pinned in test_pallas_sampling.py)."""
    from values_tpu.inference.scoring import make_packed_aleatoric_scorer

    members, n = 2, 4
    base = UNet3D(num_classes=2, initial_filter_size=8,
                  aleatoric_loss=True)
    keys = jax.random.split(jax.random.PRNGKey(0), members)
    stacked = group_member_variables(
        [base.init(k, jnp.zeros((1, PATCH, PATCH, PATCH, 1)))
         for k in keys])
    rs = np.random.RandomState(1)
    vols = jnp.asarray(rs.rand(B, PATCH, PATCH, PATCH, 1)
                       .astype(np.float32))
    gt = jnp.asarray((rs.rand(B, PATCH, PATCH, PATCH) > 0.7)
                     .astype(np.int32))
    rng = jax.random.PRNGKey(7)

    score, rows = make_packed_aleatoric_scorer(
        members, PATCH, n_aleatoric_samples=n, agg_patch=4,
        dtype=jnp.float32, sampler="pallas", interpret=True)
    got = np.asarray(score(stacked, vols, gt, rng))
    assert got.shape == (10, B)
    assert np.all(np.isfinite(got))
    # deterministic for a fixed rng
    again = np.asarray(score(stacked, vols, gt, rng))
    np.testing.assert_array_equal(got, again)
    # dice row in [0, 1]; entropy sums positive
    assert (got[0] >= 0).all() and (got[0] <= 1).all()
    assert (got[2] > 0).all()  # pred_entropy image_level sum


def test_hybrid_scorer_matches_packed():
    """XLA-conv + packed-stats hybrid == the fully-packed scorer to
    conv-rounding tolerance (same weights, same statistics math; only
    the conv lowering differs)."""
    from values_tpu.inference.scoring import (make_hybrid_scorer,
                                              make_packed_scorer)
    base = UNet3D(num_classes=2, initial_filter_size=8)
    keys = jax.random.split(jax.random.PRNGKey(0), MEMBERS)
    stacked = group_member_variables(
        [base.init(k, jnp.zeros((1, PATCH, PATCH, PATCH, 1)))
         for k in keys])
    rs = np.random.RandomState(0)
    vols = jnp.asarray(rs.rand(B, PATCH, PATCH, PATCH, 1)
                       .astype(np.float32))
    gt = jnp.asarray((rs.rand(B, PATCH, PATCH, PATCH) > 0.7)
                     .astype(np.int32))
    rng = jax.random.PRNGKey(1)

    packed_fn, _ = make_packed_scorer(MEMBERS, PATCH, agg_patch=4,
                                      threshold=0.3, dtype=jnp.float32,
                                      interpret=True)
    hybrid_fn, rows = make_hybrid_scorer(2, MEMBERS, PATCH,
                                         initial_filter_size=8,
                                         agg_patch=4, threshold=0.3,
                                         dtype=jnp.float32)
    assert rows == score_rows()
    got = np.asarray(hybrid_fn(stacked, vols, gt, rng))
    want = np.asarray(packed_fn(stacked, vols, gt, rng))
    assert got.shape == want.shape == (10, B)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)
