"""NIfTI-1 round-trip tests for the dependency-free reader/writer."""
import numpy as np
import pytest

from values_tpu.core import nifti


@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.int32,
                                   np.float32, np.float64])
def test_roundtrip_dtypes(tmp_path, rng, dtype):
    arr = (rng.rand(5, 6, 7) * 100).astype(dtype)
    path = tmp_path / "x.nii.gz"
    nifti.save(arr, path)
    back, hdr = nifti.load(path)
    assert back.dtype == arr.dtype
    assert back.shape == arr.shape
    np.testing.assert_array_equal(back, arr)


def test_roundtrip_uncompressed(tmp_path, rng):
    arr = rng.rand(4, 4, 4).astype(np.float32)
    path = tmp_path / "x.nii"
    nifti.save(arr, path)
    back, _ = nifti.load(path)
    np.testing.assert_array_equal(back, arr)


def test_header_spacing_preserved(tmp_path, rng):
    arr = rng.rand(3, 3, 3).astype(np.float32)
    hdr = nifti.NiftiHeader()
    hdr.pixdim[1:4] = [0.5, 0.7, 2.0]
    path = tmp_path / "sp.nii.gz"
    nifti.save(arr, path, hdr)
    _, hdr2 = nifti.load(path)
    assert hdr2.spacing == pytest.approx((0.5, 0.7, 2.0))


def test_2d_and_bool(tmp_path):
    arr = np.eye(8, dtype=bool)
    path = tmp_path / "b.nii.gz"
    nifti.save(arr, path)
    back, _ = nifti.load(path)
    np.testing.assert_array_equal(back, arr.astype(np.uint8))


def test_axis_order_not_scrambled(tmp_path):
    """A strictly increasing ramp must come back element-identical — guards
    against C/Fortran order mixups in stitched-volume artifacts."""
    arr = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    path = tmp_path / "ramp.nii.gz"
    nifti.save(arr, path)
    back, _ = nifti.load(path)
    np.testing.assert_array_equal(back, arr)
