"""UNet3D architecture parity vs the reference torch module.

The reference module file (which only depends on torch) is loaded straight
from the read-only mount as a test oracle: random torch weights are imported
through values_tpu.models.torch_import and the two forwards must agree to
float64 precision.
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from values_tpu.models.unet3d import UNet3D
from values_tpu.models.torch_import import unet3d_params_from_torch

REF = "/root/reference/uncertainty_modeling/models/unet3D_module.py"
needs_ref = pytest.mark.skipif(not os.path.exists(REF),
                               reason="reference mount not available")


def _load_reference_unet():
    spec = importlib.util.spec_from_file_location("ref_unet3d", REF)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_unet3d"] = mod
    spec.loader.exec_module(mod)
    return mod.UNet3D


def _forward_pair(torch_model, jax_model, x_np, **apply_kwargs):
    import torch
    torch_model = torch_model.double().eval()
    with torch.no_grad():
        torch_out = torch_model(torch.tensor(x_np, dtype=torch.float64))
    variables = unet3d_params_from_torch(torch_model.state_dict(),
                                         dtype=np.float64)
    x_jax = jnp.asarray(np.transpose(x_np, (0, 2, 3, 4, 1)))  # NCDHW->NDHWC
    jax_out = jax.jit(
        lambda v, x: jax_model.apply(v, x, **apply_kwargs))(variables, x_jax)
    return torch_out, jax_out


@needs_ref
def test_forward_parity_plain(rng):
    RefUNet = _load_reference_unet()
    with jax.enable_x64(True):
        tm = RefUNet(num_classes=2, initial_filter_size=4)
        jm = UNet3D(num_classes=2, initial_filter_size=4,
                    dtype=jnp.float64, param_dtype=jnp.float64)
        x = rng.randn(1, 1, 16, 16, 16).astype(np.float64)
        t_out, j_out = _forward_pair(tm, jm, x)
        j_nchw = np.transpose(np.asarray(j_out), (0, 4, 1, 2, 3))
        np.testing.assert_allclose(j_nchw, t_out.numpy(), atol=1e-10)


@needs_ref
def test_forward_parity_no_instancenorm(rng):
    RefUNet = _load_reference_unet()
    with jax.enable_x64(True):
        tm = RefUNet(num_classes=2, initial_filter_size=4,
                     do_instancenorm=False)
        jm = UNet3D(num_classes=2, initial_filter_size=4,
                    do_instancenorm=False,
                    dtype=jnp.float64, param_dtype=jnp.float64)
        x = rng.randn(1, 1, 16, 16, 16).astype(np.float64)
        t_out, j_out = _forward_pair(tm, jm, x)
        j_nchw = np.transpose(np.asarray(j_out), (0, 4, 1, 2, 3))
        np.testing.assert_allclose(j_nchw, t_out.numpy(), atol=1e-10)


@needs_ref
def test_forward_parity_aleatoric_head(rng):
    RefUNet = _load_reference_unet()
    with jax.enable_x64(True):
        tm = RefUNet(num_classes=2, initial_filter_size=4,
                     aleatoric_loss=True)
        jm = UNet3D(num_classes=2, initial_filter_size=4,
                    aleatoric_loss=True,
                    dtype=jnp.float64, param_dtype=jnp.float64)
        x = rng.randn(1, 1, 16, 16, 16).astype(np.float64)
        (t_mu, t_s), (j_mu, j_s) = _forward_pair(tm, jm, x)
        np.testing.assert_allclose(
            np.transpose(np.asarray(j_mu), (0, 4, 1, 2, 3)),
            t_mu.numpy(), atol=1e-10)
        np.testing.assert_allclose(
            np.transpose(np.asarray(j_s), (0, 4, 1, 2, 3)),
            t_s.numpy(), atol=1e-10)


@needs_ref
def test_dropout_variant_imports_and_runs(rng):
    RefUNet = _load_reference_unet()
    tm = RefUNet(num_classes=2, initial_filter_size=4, do_dropout=True)
    jm = UNet3D(num_classes=2, initial_filter_size=4, do_dropout=True)
    variables = unet3d_params_from_torch(tm.state_dict())
    x = jnp.asarray(rng.randn(1, 16, 16, 16, 1).astype(np.float32))
    # deterministic forward
    out_det = jax.jit(jm.apply)(variables, x)
    assert out_det.shape == (1, 16, 16, 16, 2)
    # two different dropout keys give different stochastic outputs
    mc = jax.jit(lambda v, x, k: jm.apply(
        v, x, deterministic=False, rngs={"dropout": k}))
    out_a = mc(variables, x, jax.random.PRNGKey(0))
    out_b = mc(variables, x, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))
    # same key reproduces exactly
    out_a2 = mc(variables, x, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_a2))


def test_init_shapes_and_param_count():
    jm = UNet3D(num_classes=2, initial_filter_size=8)
    variables = jax.jit(jm.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 16, 16, 16, 1)))
    n_params = sum(np.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(variables))
    # reference UNet3D(2, 1, 8) has ~1.4M params (final head, no AE head)
    assert 1_000_000 < n_params < 2_000_000


def test_enable_concat_false_uses_reconstruction_head(rng):
    jm = UNet3D(num_classes=2, initial_filter_size=4)
    init = jax.jit(lambda k, x: jm.init(k, x, enable_concat=False))
    variables = init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 1)))
    x = jnp.asarray(rng.randn(1, 16, 16, 16, 1).astype(np.float32))
    out = jax.jit(lambda v, x: jm.apply(v, x, enable_concat=False))(
        variables, x)
    assert out.shape == (1, 16, 16, 16, 1)

@needs_ref
@pytest.mark.parametrize("aleatoric", [False, True])
def test_export_strict_load_roundtrip(rng, aleatoric):
    """flax params -> reference-layout state_dict -> strict torch load ->
    forward parity. Covers the synthesized heads the reference constructs
    but flax never materializes (unused `final` under aleatoric_loss,
    unet3D_module.py:199; unused AE head, :207-209)."""
    import torch
    from values_tpu.models.torch_import import unet3d_params_to_torch
    RefUNet = _load_reference_unet()
    with jax.enable_x64(True):
        jm = UNet3D(num_classes=2, initial_filter_size=4,
                    aleatoric_loss=aleatoric,
                    dtype=jnp.float64, param_dtype=jnp.float64)
        variables = jm.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 16, 16, 16, 1), jnp.float64))
        state = unet3d_params_to_torch(variables)
        tm = RefUNet(num_classes=2, initial_filter_size=4,
                     aleatoric_loss=aleatoric).double().eval()
        # test_3D.py:236-238 strips the Lightning "model." prefix
        tm.load_state_dict(
            {k[len("model."):]: v.double() for k, v in state.items()},
            strict=True)
        x = rng.randn(1, 1, 16, 16, 16).astype(np.float64)
        with torch.no_grad():
            t_out = tm(torch.tensor(x))
        j_out = jm.apply(variables,
                         jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))))
        if aleatoric:
            for t, j in zip(t_out, j_out):
                np.testing.assert_allclose(
                    np.transpose(np.asarray(j), (0, 4, 1, 2, 3)),
                    t.numpy(), atol=1e-10)
        else:
            np.testing.assert_allclose(
                np.transpose(np.asarray(j_out), (0, 4, 1, 2, 3)),
                t_out.numpy(), atol=1e-10)
