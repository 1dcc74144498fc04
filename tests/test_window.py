"""Window enumeration / gather / stitch numerics."""
import numpy as np
import pytest

import jax.numpy as jnp

from values_tpu.ops import window as W


def test_enumeration_matches_reference_order():
    """Reference loops: z outer, y, x inner; stride=int(p*overlap)
    (toy_datamodule_3D.py:637-665)."""
    starts = W.enumerate_window_starts((64, 128, 64), 64, 1.0)
    # axis1 has two positions; axis order in output rows is (x=a0, y=a1, z=a2)
    np.testing.assert_array_equal(starts, [[0, 0, 0], [0, 64, 0]])

    starts = W.enumerate_window_starts((96, 64, 64), 64, 0.5)
    # stride 32: axis0 starts 0,32; others 0
    np.testing.assert_array_equal(starts, [[0, 0, 0], [32, 0, 0]])


def test_crop_tuples():
    starts = np.array([[0, 64, 0]])
    assert W.window_crop_tuples(starts, 64) == [((0, 64), (64, 128), (0, 64))]


def test_extract_stitch_roundtrip_nonoverlapping(rng):
    vol = rng.rand(16, 32, 16).astype(np.float32)
    starts = W.enumerate_window_starts(vol.shape, 16, 1.0)
    assert len(starts) == 2
    wins = W.extract_windows(jnp.asarray(vol), jnp.asarray(starts), 16)
    assert wins.shape == (2, 16, 16, 16)
    back = W.stitch_windows(wins, jnp.asarray(starts), vol.shape)
    np.testing.assert_allclose(np.asarray(back), vol, atol=0)
    counts = W.count_map(starts, 16, vol.shape)
    np.testing.assert_array_equal(np.asarray(counts), np.ones(vol.shape))


def test_overlapping_stitch_counts(rng):
    vol = rng.rand(32, 16, 16).astype(np.float32)
    starts = W.enumerate_window_starts(vol.shape, 16, 0.5)  # stride 8
    counts = np.asarray(W.count_map(starts, 16, vol.shape))
    # middle region covered twice along axis 0, once at borders
    assert counts.max() == 2
    assert counts.min() == 1
    wins = W.extract_windows(jnp.asarray(vol), jnp.asarray(starts), 16)
    summed = np.asarray(W.stitch_windows(wins, jnp.asarray(starts), vol.shape))
    np.testing.assert_allclose(summed / counts, vol, rtol=1e-6)


def test_stitch_with_channels(rng):
    vol = rng.rand(16, 16, 16, 3).astype(np.float32)
    starts = W.enumerate_window_starts(vol.shape, 16, 1.0)
    wins = W.extract_windows(jnp.asarray(vol), jnp.asarray(starts), 16)
    assert wins.shape == (1, 16, 16, 16, 3)
    back = W.stitch_windows(wins, jnp.asarray(starts), vol.shape)
    np.testing.assert_allclose(np.asarray(back), vol, atol=0)


def test_gaussian_weight_map_properties():
    w = np.asarray(W.gaussian_weight_map(16))
    assert w.shape == (16, 16, 16)
    assert w.max() == pytest.approx(1.0)
    assert w[0, 0, 0] < w[8, 8, 8]
