"""Pallas fused entropy kernel vs the XLA reference (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from values_tpu.ops.pallas.entropy import fused_entropy_pallas, fused_entropy
from values_tpu.ops.uncertainty import fused_sample_statistics


def test_pallas_kernel_matches_xla(rng):
    s, c, n = 5, 2, 4 * 128
    stack = jnp.asarray(rng.dirichlet([1.0] * c, size=(s, n))
                        .transpose(0, 2, 1).astype(np.float32))
    want = fused_sample_statistics(stack, class_axis=1)
    got = fused_entropy_pallas(stack, tile_n=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got["mean_softmax"]),
                               np.asarray(want["mean_softmax"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got["pred_entropy"]),
                               np.asarray(want["pred_entropy"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got["mutual_information"]),
                               np.asarray(want["mutual_information"]),
                               atol=1e-6)


def test_pallas_kernel_zero_guard():
    s, c, n = 2, 3, 128
    stack = np.zeros((s, c, n), dtype=np.float32)
    stack[:, 0, :] = 1.0  # one-hot => all entropies exactly 0
    got = fused_entropy_pallas(jnp.asarray(stack), tile_n=128,
                               interpret=True)
    assert np.all(np.asarray(got["pred_entropy"]) == 0.0)
    assert np.all(np.isfinite(np.asarray(got["expected_entropy"])))


def test_dispatch_falls_back_on_cpu(rng):
    stack = jnp.asarray(rng.rand(3, 2, 130).astype(np.float32))  # not /128
    out = fused_entropy(stack)
    want = fused_sample_statistics(stack, class_axis=1)
    np.testing.assert_allclose(np.asarray(out["pred_entropy"]),
                               np.asarray(want["pred_entropy"]), atol=1e-6)
