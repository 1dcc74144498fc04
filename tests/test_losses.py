"""Loss numerics vs torch oracles (torch CPU is available in the image)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from values_tpu.ops import losses as L


def test_soft_dice_matches_reference_formula(rng):
    b, c = 2, 3
    probs = rng.rand(b, c, 4, 4, 4)
    probs /= probs.sum(axis=1, keepdims=True)
    tgt = rng.randint(0, c, size=(b, 4, 4, 4))

    got = float(L.soft_dice_loss(jnp.asarray(probs), jnp.asarray(tgt)))

    # independent torch oracle of loss_modules.py:69-94 formula
    x = torch.tensor(probs)
    y = torch.tensor(tgt).long().unsqueeze(1)
    y_onehot = torch.zeros_like(x).scatter_(1, y, 1)
    axes = (2, 3, 4)
    intersect = (x * y_onehot).sum(axes)
    denom = (x + y_onehot).sum(axes)
    want = float((-(2 * intersect + 1e-5) / (denom + 1e-5)).mean())
    assert got == pytest.approx(want, rel=1e-6)


def test_soft_dice_no_bg_and_only_intersect(rng):
    probs = rng.rand(1, 2, 4, 4)
    probs /= probs.sum(axis=1, keepdims=True)
    tgt = rng.randint(0, 2, size=(1, 4, 4))
    full = L.soft_dice_loss(jnp.asarray(probs), jnp.asarray(tgt),
                            do_bg=False, only_intersect=True)
    assert full.shape == (1, 1)


@pytest.mark.parametrize("ignore_index", [None, 0, 255])
def test_cross_entropy_matches_torch(rng, ignore_index):
    b, c = 2, 4
    logits = rng.randn(b, c, 5, 5).astype(np.float32)
    tgt = rng.randint(0, c, size=(b, 5, 5))
    if ignore_index == 255:
        tgt[0, :2, :2] = 255
    got = float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(tgt),
                                ignore_index=ignore_index))
    kwargs = {} if ignore_index is None else {"ignore_index": ignore_index}
    want = float(F.cross_entropy(torch.tensor(logits),
                                 torch.tensor(tgt).long(), **kwargs))
    assert got == pytest.approx(want, rel=1e-5)


def test_dice_ce_loss_gta_path_uses_plain_ce(rng):
    logits = rng.randn(1, 3, 6, 6).astype(np.float32)
    tgt = rng.randint(0, 3, size=(1, 6, 6))
    got = float(L.dice_ce_loss(jnp.asarray(logits), jnp.asarray(tgt),
                               ignore_index=255))
    want = float(F.cross_entropy(torch.tensor(logits),
                                 torch.tensor(tgt).long(), ignore_index=255))
    assert got == pytest.approx(want, rel=1e-5)


def test_ssn_mc_loss_matches_torch(rng):
    s, b, c = 4, 2, 3
    samples = rng.randn(s, b, c, 4, 4).astype(np.float64)
    tgt = rng.randint(0, c, size=(b, 4, 4))
    got = float(L.ssn_mc_loglikelihood_loss(jnp.asarray(samples),
                                            jnp.asarray(tgt)))
    # torch oracle of lightning_experiment.py:199-218
    t_samples = torch.tensor(samples).view(s * b, c, -1)
    t_target = (torch.tensor(tgt).long().unsqueeze(0)
                .expand(s, b, 4, 4).reshape(s * b, -1))
    log_prob = -F.cross_entropy(t_samples, t_target,
                                reduction="none").view(s, b, -1)
    loglik = torch.mean(
        torch.logsumexp(log_prob.sum(-1), dim=0) - np.log(s))
    assert got == pytest.approx(float(-loglik), rel=1e-6)


def test_aleatoric_loss_finite_and_differentiable(rng):
    mu = jnp.asarray(rng.randn(1, 2, 4, 4, 4).astype(np.float32))
    s = jnp.asarray(rng.randn(1, 2, 4, 4, 4).astype(np.float32) * 0.1)
    tgt = jnp.asarray(rng.randint(0, 2, size=(1, 4, 4, 4)))
    key = jax.random.PRNGKey(0)

    def loss_fn(mu, s):
        return L.aleatoric_sampling_loss(mu, s, tgt, key, n_samples=5)

    val, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(mu, s)
    assert np.isfinite(float(val))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in grads)
