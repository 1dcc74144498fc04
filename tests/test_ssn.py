"""SSN numerics: low-rank MVN sampling parity vs torch distributions and
checkpoint import of the reference SsnUNet3D."""
import importlib.util
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from values_tpu.models.ssn_unet3d import LowRankMVN, SsnUNet3D
from values_tpu.models.torch_import import unet3d_params_from_torch

REF_DIR = "/root/reference/uncertainty_modeling/models"
needs_ref = pytest.mark.skipif(not os.path.exists(REF_DIR),
                               reason="reference mount not available")


def test_lowrank_mvn_moments(rng):
    """Sample moments must match the analytic low-rank covariance."""
    b, n, r = 1, 6, 2
    mean = jnp.asarray(rng.randn(b, n))
    factor = jnp.asarray(rng.randn(b, n, r) * 0.5)
    diag = jnp.asarray(rng.rand(b, n) + 0.3)
    dist = LowRankMVN(mean=mean, cov_diag=diag, cov_factor=factor)
    samples = dist.rsample(jax.random.PRNGKey(0), (20000,))
    emp_mean = np.mean(np.asarray(samples), axis=0)
    np.testing.assert_allclose(emp_mean[0], np.asarray(mean)[0], atol=0.05)
    emp_cov = np.cov(np.asarray(samples)[:, 0, :].T)
    want_cov = (np.asarray(factor)[0] @ np.asarray(factor)[0].T
                + np.diag(np.asarray(diag)[0]))
    np.testing.assert_allclose(emp_cov, want_cov, atol=0.1)


def test_lowrank_mvn_degenerate_fallback():
    """A covariance whose capacitance Cholesky fails must sample like
    independent normals (the reference's except-branch,
    ssn_unet3D_module.py:58-68)."""
    b, n, r = 1, 4, 2
    mean = jnp.zeros((b, n))
    diag = jnp.full((b, n), 1e-30)  # tiny diag -> capacitance blows up
    factor = jnp.full((b, n, r), 1e18)
    dist = LowRankMVN(mean=mean, cov_diag=diag, cov_factor=factor)
    assert bool(dist._degenerate_factor()[0])
    samples = dist.rsample(jax.random.PRNGKey(0), (100,))
    # factor zeroed: samples ~ N(0, sqrt(diag)) => tiny
    assert np.abs(np.asarray(samples)).max() < 1.0


def _load_reference_ssn():
    spec_u = importlib.util.spec_from_file_location(
        "ref_unet3d", os.path.join(REF_DIR, "unet3D_module.py"))
    mod_u = importlib.util.module_from_spec(spec_u)
    sys.modules["ref_unet3d"] = mod_u
    sys.modules["uncertainty_modeling"] = type(sys)("uncertainty_modeling")
    sys.modules["uncertainty_modeling.models"] = type(sys)(
        "uncertainty_modeling.models")
    sys.modules["uncertainty_modeling.models.unet3D_module"] = mod_u
    spec_u.loader.exec_module(mod_u)
    src = open(os.path.join(REF_DIR, "ssn_unet3D_module.py")).read()
    src = src.replace(
        "from uncertainty_modeling.models.unet3D_module import UNet3D",
        "from ref_unet3d import UNet3D")
    mod_s = type(sys)("ref_ssn")
    exec(src, mod_s.__dict__)
    return mod_s


@needs_ref
def test_ssn_unet_distribution_parity(rng):
    """Converted reference SSN weights must produce identical distribution
    parameters (mean / cov_diag / cov_factor in torch's flattening)."""
    import torch
    mod_s = _load_reference_ssn()

    with jax.enable_x64(True):
        tm = mod_s.SsnUNet3D(num_classes=2, initial_filter_size=2,
                             rank=3).double().eval()
        x = rng.randn(1, 1, 16, 16, 16).astype(np.float64)
        with torch.no_grad():
            t_dist = tm(torch.tensor(x))
        variables = unet3d_params_from_torch(tm.state_dict(),
                                             dtype=np.float64)
        jm = SsnUNet3D(num_classes=2, initial_filter_size=2, rank=3,
                       dtype=jnp.float64, param_dtype=jnp.float64)
        j_dist = jm.apply(variables,
                          jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))))
        np.testing.assert_allclose(np.asarray(j_dist.mean),
                                   t_dist.loc.numpy(), atol=1e-10)
        np.testing.assert_allclose(np.asarray(j_dist.cov_diag),
                                   t_dist.cov_diag.numpy(), atol=1e-10)
        np.testing.assert_allclose(np.asarray(j_dist.cov_factor),
                                   t_dist.cov_factor.numpy(), atol=1e-10)


def test_mean_only_zero_factor(rng):
    jm = SsnUNet3D(num_classes=2, initial_filter_size=2, rank=3)
    variables = jax.jit(
        lambda k, x: jm.init(k, x, mean_only=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 1)))
    x = jnp.asarray(rng.rand(1, 16, 16, 16, 1).astype(np.float32))
    dist = jm.apply(variables, x, mean_only=True)
    assert np.all(np.asarray(dist.cov_factor) == 0.0)


@needs_ref
def test_ssn_export_strict_load_roundtrip(rng):
    """flax SSN params -> reference-layout state_dict -> strict torch load
    -> identical distribution parameters. Covers the synthesized unused
    `final` head the reference SsnUNet3D inherits sized
    num_classes*2 + num_classes*rank (ssn_unet3D_module.py:19-27)."""
    import torch
    from values_tpu.models.torch_import import unet3d_params_to_torch
    mod_s = _load_reference_ssn()
    with jax.enable_x64(True):
        jm = SsnUNet3D(num_classes=2, initial_filter_size=2, rank=3,
                       dtype=jnp.float64, param_dtype=jnp.float64)
        variables = jm.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 16, 16, 16, 1), jnp.float64))
        state = unet3d_params_to_torch(variables)
        tm = mod_s.SsnUNet3D(num_classes=2, initial_filter_size=2,
                             rank=3).double().eval()
        tm.load_state_dict(
            {k[len("model."):]: v.double() for k, v in state.items()},
            strict=True)
        x = rng.randn(1, 1, 16, 16, 16).astype(np.float64)
        with torch.no_grad():
            t_dist = tm(torch.tensor(x))
        j_dist = jm.apply(variables,
                          jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))))
        np.testing.assert_allclose(np.asarray(j_dist.mean),
                                   t_dist.loc.numpy(), atol=1e-10)
        np.testing.assert_allclose(np.asarray(j_dist.cov_diag),
                                   t_dist.cov_diag.numpy(), atol=1e-10)
        np.testing.assert_allclose(np.asarray(j_dist.cov_factor),
                                   t_dist.cov_factor.numpy(), atol=1e-10)
