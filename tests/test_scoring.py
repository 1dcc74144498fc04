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
