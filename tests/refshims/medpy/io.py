"""medpy.io shim: delegate to values_tpu's dependency-free NIfTI codec."""
from values_tpu.core import nifti


def load(path):
    return nifti.load(str(path))


def save(arr, path, hdr=False, use_compression=None):
    nifti.save(arr, str(path), hdr if hdr is not False else None)
