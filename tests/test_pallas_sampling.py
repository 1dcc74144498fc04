"""Streaming sampled-softmax statistics kernel (ops/pallas/sampling.py).

The kernel's math pipeline (bits -> uniform -> inverse-CDF normal ->
logits -> softmax/entropy -> accumulate) is exactly reproducible on CPU
through the counter bits source; the hardware-PRNG variant differs only
in where the bits come from.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from values_tpu.inference.scoring import streaming_finalize
from values_tpu.ops.pallas.sampling import (
    counter_bits, inverse_normal_cdf, sampled_softmax_stats,
    sampled_softmax_stats_reference, uniform_from_bits)


def test_inverse_normal_cdf_against_scipy():
    scipy_stats = pytest.importorskip("scipy.stats")
    u = np.concatenate([
        np.linspace(1e-6, 0.02, 7),          # lower tail
        np.linspace(0.03, 0.97, 23),         # central
        np.linspace(0.98, 1 - 1e-6, 7),      # upper tail
    ])
    got = np.asarray(inverse_normal_cdf(jnp.asarray(u, jnp.float32)))
    want = scipy_stats.norm.ppf(u)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_counter_bits_uniform_and_normal_moments():
    bits = counter_bits(jnp.int32(7), jnp.int32(3), (64, 128))
    u = np.asarray(uniform_from_bits(bits))
    assert u.min() > 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.01
    z = np.asarray(inverse_normal_cdf(jnp.asarray(u)))
    n = z.size
    assert abs(z.mean()) < 4.0 / np.sqrt(n)
    assert abs(z.std() - 1.0) < 0.02
    # distinct (seed, salt) give distinct streams
    bits2 = counter_bits(jnp.int32(8), jnp.int32(3), (64, 128))
    assert np.mean(np.asarray(bits) == np.asarray(bits2)) < 0.01


def _mu_sigma(rng, nb=1, d=8, h=8, m=2, c=2):
    mu = jnp.asarray(rng.randn(nb, d, h, m, c, 128), jnp.float32)
    sigma = jnp.asarray(
        np.abs(rng.randn(nb, d, h, m, c, 128)) * 0.5, jnp.float32)
    return mu, sigma


def test_kernel_matches_pure_jnp_oracle():
    rng = np.random.RandomState(0)
    mu, sigma = _mu_sigma(rng)
    sd = 4
    got_p, got_e = sampled_softmax_stats(
        mu, sigma, 11, n_samples=3, sd=sd, interpret=True)
    want_p, want_e = sampled_softmax_stats_reference(
        mu, sigma, 11, n_samples=3, sd=sd)
    # f32 accumulation-order differences between the interpreted kernel
    # and the .at[].add oracle: ~4e-5 on sums of O(n_samples)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want_p),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               atol=2e-4, rtol=1e-4)


def test_sigma_zero_reduces_to_deterministic_softmax():
    """With sigma = 0 every draw is softmax(mu): sum_p = S * softmax and
    sum_ent = S * entropy exactly, independent of the bits source."""
    rng = np.random.RandomState(1)
    mu, _ = _mu_sigma(rng, m=2)
    sigma = jnp.zeros_like(mu)
    n = 4
    sum_p, sum_e = sampled_softmax_stats(
        mu, sigma, 5, n_samples=n, sd=4, interpret=True)
    probs = jax.nn.softmax(mu, axis=-2)               # (nb,d,h,m,c,l)
    want_p = n * jnp.sum(probs, axis=3)
    logp = jax.nn.log_softmax(mu, axis=-2)
    want_e = n * jnp.sum(-jnp.sum(probs * logp, axis=-2), axis=3)
    np.testing.assert_allclose(np.asarray(sum_p), np.asarray(want_p),
                               atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sum_e), np.asarray(want_e),
                               atol=1e-4, rtol=1e-5)


def test_streaming_finalize_composes():
    """The kernel's outputs feed streaming_finalize with n = M * S; the
    finalized statistics match the oracle-composed ones."""
    rng = np.random.RandomState(2)
    mu, sigma = _mu_sigma(rng, m=3)
    n_samples = 2
    sum_p, sum_e = sampled_softmax_stats(
        mu, sigma, 9, n_samples=n_samples, sd=8, interpret=True)
    stats = streaming_finalize((sum_p, sum_e), 3 * n_samples)
    assert stats["mean_softmax"].shape == sum_p.shape
    mi = np.asarray(stats["mutual_information"])
    assert np.all(np.isfinite(mi))
    # MI = PE - EE >= 0 up to float tolerance (Jensen)
    assert mi.min() > -1e-4
    # mean softmax sums to 1 over classes
    np.testing.assert_allclose(
        np.asarray(stats["mean_softmax"]).sum(axis=-2), 1.0, atol=1e-5)


def test_statistical_agreement_with_xla_streaming_path():
    """Moment check against the existing XLA streaming semantics: with
    many samples both estimators converge to the same statistics (the
    draws differ — counter/hw bits vs threefry — but eps ~ N(0,1)
    i.i.d. either way)."""
    from values_tpu.inference.scoring import streaming_update
    rng = np.random.RandomState(3)
    mu, sigma = _mu_sigma(rng, d=4, h=4, m=1)
    S = 256
    sum_p, sum_e = sampled_softmax_stats(
        mu, sigma, 21, n_samples=S, sd=4, interpret=True)
    ours = streaming_finalize((sum_p, sum_e), S)

    key = jax.random.PRNGKey(0)
    carry = (jnp.zeros(mu.shape[:3] + mu.shape[4:], jnp.float32),
             jnp.zeros(mu.shape[:3] + mu.shape[5:], jnp.float32))
    mu0, sig0 = mu[:, :, :, 0], sigma[:, :, :, 0]
    for i in range(S):
        eps = jax.random.normal(jax.random.fold_in(key, i), mu0.shape)
        probs = jax.nn.softmax(mu0 + sig0 * eps, axis=-2)
        carry = streaming_update(carry, probs)
    theirs = streaming_finalize(carry, S)

    # means of softmax agree to ~3 sigma of the MC error (std <= 0.5/sqrt(S))
    tol = 3 * 0.5 / np.sqrt(S)
    np.testing.assert_allclose(
        np.asarray(ours["mean_softmax"]),
        np.asarray(theirs["mean_softmax"]), atol=tol)
    np.testing.assert_allclose(
        np.asarray(ours["expected_entropy"]),
        np.asarray(theirs["expected_entropy"]), atol=tol)
