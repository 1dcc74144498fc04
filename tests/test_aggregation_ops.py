"""On-device aggregation kernels vs scipy brute force."""
import numpy as np
import pytest
from scipy.signal import convolve

import jax.numpy as jnp

from values_tpu.ops.aggregation import (aggregate_all, box_filter_sum,
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
