import random

import numpy as np

from .abstract_transforms import AbstractTransform


class GaussianNoiseTransform(AbstractTransform):
    """batchgenerators' GaussianNoiseTransform with the shipped defaults,
    as the reference's TTA loop constructs it (test_3D.py:428:
    ``GaussianNoiseTransform()``): noise_variance=(0, 0.1),
    p_per_sample=1. augment_gaussian_noise draws "variance" ~
    U(lo, hi) per sample and passes it to np.random.normal as the
    SCALE (std) — reproduced faithfully; the statistical oracle
    (tests/test_reference_oracle_stochastic.py) depends on this
    distributional contract, not on bitwise draws."""

    def __init__(self, noise_variance=(0, 0.1), p_per_sample=1,
                 data_key="data"):
        self.noise_variance = tuple(noise_variance)
        self.p_per_sample = p_per_sample
        self.data_key = data_key

    def __call__(self, **data_dict):
        data = np.array(data_dict[self.data_key], copy=True)
        lo, hi = self.noise_variance
        for b in range(data.shape[0]):
            if np.random.uniform() < self.p_per_sample:
                variance = lo if lo == hi else random.uniform(lo, hi)
                data[b] = data[b] + np.random.normal(
                    0.0, variance, size=data[b].shape)
        data_dict[self.data_key] = data
        return data_dict
