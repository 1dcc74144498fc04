"""Native C++ volume ops vs numpy equivalents."""
import numpy as np
import pytest

from values_tpu import native


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native library could not be built")
    return True


def test_crop_matches_numpy(rng, lib_available):
    src = rng.rand(20, 24, 28).astype(np.float32)
    got = native.crop(src, (2, 3, 4), 16)
    np.testing.assert_array_equal(got, src[2:18, 3:19, 4:20])
    src_i = rng.randint(0, 5, size=(20, 20, 20)).astype(np.int32)
    got_i = native.crop(src_i, (1, 2, 3), 16)
    np.testing.assert_array_equal(got_i, src_i[1:17, 2:18, 3:19])


def test_mirror_matches_numpy(rng, lib_available):
    for flips in range(8):
        vol = rng.rand(8, 8, 8).astype(np.float32)
        want = vol.copy()
        for axis in range(3):
            if flips & (1 << axis):
                want = np.flip(want, axis=axis)
        got = native.mirror3d(vol.copy(), flips)
        np.testing.assert_array_equal(got, want)


def test_noise_statistics(lib_available):
    vol = np.zeros(200_000, dtype=np.float32).reshape(-1)
    out = native.add_gaussian_noise(vol.copy(), sigma=0.5, seed=7)
    assert abs(out.mean()) < 0.01
    assert out.std() == pytest.approx(0.5, rel=0.02)
    # deterministic per seed
    out2 = native.add_gaussian_noise(vol.copy(), sigma=0.5, seed=7)
    np.testing.assert_array_equal(out, out2)
    out3 = native.add_gaussian_noise(vol.copy(), sigma=0.5, seed=8)
    assert not np.allclose(out, out3)


def test_zscore_matches_numpy(rng, lib_available):
    vol = (rng.rand(32, 32, 32) * 7 + 3).astype(np.float32)
    want = (vol - vol.mean()) / (vol.std() + 1e-8)
    got = native.zscore(vol.copy())
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_python_fallback_paths(rng):
    """Fallbacks must work even when the lib exists (odd dtypes/strides)."""
    src = rng.rand(10, 10, 10)  # float64 -> fallback
    got = native.crop(src, (1, 1, 1), 8)
    np.testing.assert_array_equal(got, src[1:9, 1:9, 1:9])
