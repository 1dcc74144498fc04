import numpy as np
import torch

from .abstract_transforms import AbstractTransform


class NumpyToTensor(AbstractTransform):
    """Converts every numpy array in the data dict to a torch tensor
    (value-preserving; copies so read-only mmap views convert cleanly)."""

    def __init__(self, keys=None, cast_to=None):
        self.keys = keys
        self.cast_to = cast_to

    def __call__(self, **data_dict):
        keys = self.keys or list(data_dict.keys())
        for k in keys:
            v = data_dict.get(k)
            if isinstance(v, np.ndarray):
                data_dict[k] = torch.from_numpy(np.ascontiguousarray(v))
        return data_dict
