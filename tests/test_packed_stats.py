"""Packed-layout C2/C3 consumers vs the unpacked reference ops
(VERDICT r2 item 2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from values_tpu.ops import aggregation, metrics, packed_stats, uncertainty
from values_tpu.ops.pallas.conv3d import LANES, pack_ndhwc

B, D, H, W = 8, 16, 16, 16
BP = LANES // W


@pytest.fixture(scope="module")
def stack(rng_seed=0):
    rs = np.random.RandomState(rng_seed)
    logits = rs.randn(5, B, D, H, W, 2).astype(np.float32)
    # sprinkle exact zeros post-softmax via -inf logits (NaN-guard path)
    logits[0, 0, 0, 0, 0, 0] = -np.inf
    return jnp.asarray(logits)


def _pack_logit_stack(logits):
    """(M, B, D, H, W, C) -> (nb, D, H, M, C, lanes)."""
    m, b, d, h, w, c = logits.shape
    moved = jnp.moveaxis(logits, 0, -2)          # (B, D, H, W, M, C)
    packed = pack_ndhwc(moved.reshape(b, d, h, w, m * c), BP)
    return packed.reshape(b // BP, d, h, m, c, LANES)


def test_fused_statistics_match_unpacked(stack):
    ref = uncertainty.fused_sample_statistics(
        jax.nn.softmax(stack, axis=-1), class_axis=-1)
    packed = packed_stats.fused_sample_statistics_packed(
        _pack_logit_stack(stack))
    for key in ("pred_entropy", "expected_entropy", "mutual_information"):
        got = packed_stats.unpack_map(packed[key], BP, B)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref[key]),
                                   atol=1e-5, err_msg=key)
    mean_got = packed_stats.unpack_map(
        packed["mean_softmax"][:, :, :, 0], BP, B)
    np.testing.assert_allclose(np.asarray(mean_got),
                               np.asarray(ref["mean_softmax"][..., 0]),
                               atol=1e-6)


def test_packed_dice_matches_metrics(stack):
    probs = jax.nn.softmax(stack, axis=-1)
    mean = jnp.mean(probs, axis=0)
    seg = jnp.argmax(mean, axis=-1).astype(jnp.int32)     # (B, D, H, W)
    rs = np.random.RandomState(1)
    gt = jnp.asarray((rs.rand(B, D, H, W) > 0.6).astype(np.int32))
    got = packed_stats.packed_dice(
        packed_stats.pack_labels(seg, BP), packed_stats.pack_labels(gt, BP),
        BP, ignore_index=0)
    for i in range(B):
        want = metrics.dice_from_stats(
            *metrics.dice_stats(seg[i], gt[i], ignore_index=0))
        np.testing.assert_allclose(float(got[i]), float(want), atol=1e-6)


@pytest.mark.parametrize("patch", [4, 10])
def test_packed_aggregations_match_unpacked(stack, patch):
    probs = jax.nn.softmax(stack, axis=-1)
    unc = uncertainty.fused_sample_statistics(
        probs, class_axis=-1)["pred_entropy"]              # (B, D, H, W)
    packed_unc = pack_ndhwc(unc[..., None], BP)[:, :, :, 0, :]
    got = packed_stats.packed_aggregate_all(packed_unc, BP, patch=patch,
                                            threshold=0.3)
    for i in range(B):
        want = aggregation.aggregate_all(unc[i][None], patch=patch,
                                         threshold=0.3)
        for key in ("patch_level", "image_level", "threshold"):
            np.testing.assert_allclose(
                float(got[key][i]), float(np.asarray(want[key])[0]),
                rtol=2e-5, err_msg=f"{key} patch={patch} item={i}")


def test_packed_aggregate_all_maps_linear_matches_per_map(stack):
    probs = jax.nn.softmax(stack, axis=-1)
    stats = uncertainty.fused_sample_statistics(probs, class_axis=-1)
    packed = {k: pack_ndhwc(stats[k][..., None], BP)[:, :, :, 0, :]
              for k in aggregation.UNC_KEYS}
    got = packed_stats.packed_aggregate_all_maps(
        packed, BP, patch=4, threshold=(0.3, 0.2, 0.05), linear=True)
    want = packed_stats.packed_aggregate_all_maps(
        packed, BP, patch=4, threshold=(0.3, 0.2, 0.05), linear=False)
    for key in aggregation.UNC_KEYS:
        for a in ("patch_level", "image_level", "threshold"):
            np.testing.assert_allclose(
                np.asarray(got[key][a]), np.asarray(want[key][a]),
                rtol=1e-5, atol=1e-4, err_msg=f"{key}/{a}")


def test_threshold_count_zero_quirk():
    """count == 0 returns the (zero) SUM even in mean mode
    (aggregate_uncertainties.py:62-67)."""
    unc = jnp.zeros((1, D, H, LANES), jnp.float32)
    out = packed_stats.packed_aggregate_all(unc, BP, patch=4,
                                            threshold=0.5)
    np.testing.assert_array_equal(np.asarray(out["threshold"]),
                                  np.zeros(BP, np.float32))
