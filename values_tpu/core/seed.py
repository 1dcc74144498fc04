"""Deterministic seeding.

The reference seeds python/numpy/torch and forces cuDNN determinism
(reference: uncertainty_modeling/main.py:21-30,
evaluation/utils/set_seed.py:9). In JAX determinism is the default — compiled
programs are pure functions of their inputs — so here seeding covers the
host-side RNGs (data pipeline, split generation) and provides the root
``jax.random`` key for the functional RNG streams.
"""
from __future__ import annotations

import os
import random

import numpy as np


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)


def root_key(seed: int):
    import jax
    return jax.random.PRNGKey(seed)
