"""On-device aggregation kernels vs scipy brute force."""
import numpy as np
import pytest
from scipy.signal import convolve

import jax.numpy as jnp

from values_tpu.ops.aggregation import (UNC_KEYS, aggregate_all,
                                        aggregate_all_maps, box_filter_sum,
                                        patch_level_max, threshold_mean)


def test_separable_box_filter_matches_scipy(rng):
    x = rng.rand(2, 12, 11, 10).astype(np.float32)
    got = np.asarray(box_filter_sum(jnp.asarray(x), (4, 3, 5), (1, 2, 3)))
    for b in range(2):
        want = convolve(x[b].astype(np.float64), np.ones((4, 3, 5)),
                        mode="valid")
        np.testing.assert_allclose(got[b], want, rtol=1e-4)


def test_patch_level_max_matches_reference(rng):
    from values_tpu.evaluation.aggregate_uncertainties import (
        patch_level_aggregation)
    x = rng.rand(9, 9, 9)
    want = patch_level_aggregation(x, patch_size=4)["max_score"]
    got = float(patch_level_max(jnp.asarray(x[None], dtype=jnp.float32),
                                patch=4)[0])
    assert got == pytest.approx(want, rel=1e-4)


def test_threshold_mean_quirk():
    x = jnp.asarray([[0.1, 0.5, 0.9, 0.2]])
    assert float(threshold_mean(x, 0.4)[0]) == pytest.approx(0.7)
    assert float(threshold_mean(x, 2.0)[0]) == 0.0  # count==0 -> sum


def test_aggregate_all_shapes(rng):
    x = jnp.asarray(rng.rand(3, 16, 16, 16).astype(np.float32))
    out = aggregate_all(x, patch=4, threshold=0.5)
    assert all(v.shape == (3,) for v in out.values())


def _entropy_like_maps(rng, b=3, n=16):
    """PE/EE/MI triple with real structure: MI = PE - EE >= 0."""
    pe = rng.rand(b, n, n, n).astype(np.float32) * 0.7
    ee = pe * rng.rand(b, n, n, n).astype(np.float32)
    return {"pred_entropy": jnp.asarray(pe),
            "expected_entropy": jnp.asarray(ee),
            "mutual_information": jnp.asarray(pe - ee)}


def test_aggregate_all_maps_linear_matches_per_map(rng):
    maps = _entropy_like_maps(rng)
    got = aggregate_all_maps(maps, patch=4, threshold=0.3, linear=True)
    want = aggregate_all_maps(maps, patch=4, threshold=0.3, linear=False)
    for key in UNC_KEYS:
        # PE/EE ride the identical ops (stacking is per-item independent);
        # MI's box/image sums are derived by subtraction -> f32 rounding
        tol = dict(rtol=1e-5, atol=1e-4) if key == "mutual_information" \
            else dict(rtol=0, atol=0)
        for a in ("patch_level", "image_level", "threshold"):
            np.testing.assert_allclose(np.asarray(got[key][a]),
                                       np.asarray(want[key][a]),
                                       err_msg=f"{key}/{a}", **tol)


def test_aggregate_all_maps_per_key_thresholds(rng):
    maps = _entropy_like_maps(rng)
    thrs = (0.2, 0.1, 0.05)
    got = aggregate_all_maps(maps, patch=4, threshold=thrs)
    for key, t in zip(UNC_KEYS, thrs):
        want = aggregate_all(maps[key], patch=4, threshold=t)
        np.testing.assert_allclose(np.asarray(got[key]["threshold"]),
                                   np.asarray(want["threshold"]),
                                   rtol=1e-6, err_msg=key)
    with pytest.raises(ValueError):
        aggregate_all_maps(maps, patch=4, threshold=(0.1, 0.2))
