"""Grouped-ensemble UNet3D must match the vmapped per-member reference."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from values_tpu.models.unet3d import UNet3D
from values_tpu.models.ensemble_unet3d import (
    EnsembleUNet3D, group_member_variables, make_grouped_ensemble_predictor)
from values_tpu.inference.predictors import (make_default_predictor,
                                             stack_params)

P = 16
M = 2


@pytest.fixture(scope="module")
def members():
    model = UNet3D(num_classes=2, initial_filter_size=2)
    init = jax.jit(model.init)
    keys = jax.random.split(jax.random.PRNGKey(0), M)
    return model, [init(k, jnp.zeros((1, P, P, P, 1))) for k in keys]


def test_grouped_matches_vmapped(rng, members):
    model, member_vars = members
    x = jnp.asarray(rng.rand(2, P, P, P, 1).astype(np.float32))
    rngk = jax.random.PRNGKey(1)

    vmapped = make_default_predictor(model, M, 1, False)
    ref_stack, _ = jax.jit(vmapped)(stack_params(member_vars), x, rngk)

    grouped_vars = group_member_variables(member_vars)
    gmodel, gpred = make_grouped_ensemble_predictor(
        num_classes=2, members=M, initial_filter_size=2)
    got_stack, _ = jax.jit(gpred)(grouped_vars, x, rngk)

    assert got_stack.shape == ref_stack.shape
    np.testing.assert_allclose(np.asarray(got_stack), np.asarray(ref_stack),
                               atol=3e-3)
    # mean absolute deviation should be tiny (just f32 reassociation)
    mad = np.abs(np.asarray(got_stack) - np.asarray(ref_stack)).mean()
    assert mad < 2e-4


def test_grouped_param_shapes(members):
    _, member_vars = members
    grouped = group_member_variables(member_vars)
    k = grouped["params"]["contr_1_1"]["kernel"]
    assert k.shape == (3, 3, 3, 1, M * 2)
    up = grouped["params"]["upscale4"]["kernel"]
    assert up.shape == (M, 2, 2, 2, 16, 8)


def test_grouped_mc_dropout_statistics(rng):
    """Tiling one dropout model M times + grouped dropout must match the
    per-pass MC statistics (mean prediction) of the vmapped path."""
    from values_tpu.models.unet3d import UNet3D
    from values_tpu.models.ensemble_unet3d import (
        group_member_variables, make_grouped_ensemble_predictor)
    from values_tpu.inference.predictors import make_default_predictor

    base = UNet3D(num_classes=2, initial_filter_size=2, do_dropout=True)
    v = jax.jit(base.init)(jax.random.PRNGKey(0),
                           jnp.zeros((1, P, P, P, 1)))
    x = jnp.asarray(rng.rand(1, P, P, P, 1).astype(np.float32))
    S = 16

    # vmapped MC passes
    vm = make_default_predictor(base, 1, S, True)
    ref_stack, _ = jax.jit(vm)(stack_params([v]), x, jax.random.PRNGKey(1))
    # grouped MC passes (weights tiled S times)
    gvars = group_member_variables([v] * S)
    _, gp = make_grouped_ensemble_predictor(2, S, 2, do_dropout=True)
    got_stack, _ = jax.jit(gp)(gvars, x, jax.random.PRNGKey(2))
    assert got_stack.shape == ref_stack.shape

    # different RNG streams => per-sample outputs differ but the MC mean
    # and dispersion statistics agree
    ref_mean = np.asarray(ref_stack).mean(axis=0)
    got_mean = np.asarray(got_stack).mean(axis=0)
    assert np.abs(ref_mean - got_mean).mean() < 0.05
    ref_std = np.asarray(ref_stack).std(axis=0).mean()
    got_std = np.asarray(got_stack).std(axis=0).mean()
    assert got_std == pytest.approx(ref_std, rel=0.4)
    # samples within a grouped pass are actually distinct (independent
    # dropout masks per member group)
    assert not np.allclose(np.asarray(got_stack)[0],
                           np.asarray(got_stack)[1])


def test_grouped_tta_matches_vmapped(rng, members):
    """Grouped TTA must reproduce the reference TTA loop's outputs given
    the same noise realization."""
    from values_tpu.models.ensemble_unet3d import (
        group_member_variables, make_grouped_tta_predictor)
    from values_tpu.inference.predictors import make_tta_predictor

    model, member_vars = members
    x = jnp.asarray(rng.rand(1, P, P, P, 1).astype(np.float32))
    key = jax.random.PRNGKey(3)

    ref_fn = make_tta_predictor(model, M)
    ref_stack, _ = jax.jit(ref_fn)(stack_params(member_vars), x, key)

    tiled = []
    for v in member_vars:
        tiled.extend([v] * 16)
    gvars = group_member_variables(tiled)
    _, gfn = make_grouped_tta_predictor(2, M, 2)
    got_stack, _ = jax.jit(gfn)(gvars, x, key)

    assert got_stack.shape == ref_stack.shape == (M * 16, 1, P, P, P, 2)
    np.testing.assert_allclose(np.asarray(got_stack),
                               np.asarray(ref_stack), atol=5e-3)
    mad = np.abs(np.asarray(got_stack) - np.asarray(ref_stack)).mean()
    assert mad < 3e-4
