"""Stochastic Segmentation Network on the 3D U-Net trunk.

Parity with the reference (reference:
uncertainty_modeling/models/ssn_unet3D_module.py:7-70): the U-Net runs with
``last_layer=False`` and three 1x1x1 heads produce a low-rank multivariate
normal over the flattened (class, voxel) logits:

    mean        (B, C*V)
    cov_diag    (B, C*V)        = exp(log_diag) + epsilon
    cov_factor  (B, C*V, rank)

Sampling follows torch's ``LowRankMultivariateNormal.rsample``:
``z = mean + cov_factor @ eps_r + sqrt(cov_diag) * eps_d`` — an affine
transform of standard normals, no Cholesky needed. The reference's
singular-covariance fallback (constructor fails -> independent normals,
ssn_unet3D_module.py:58-68) is reproduced by checking the capacitance
Cholesky ``I + W^T D^-1 W`` and zeroing the factor when it is not finite,
since ``td.Independent(Normal(loc, sqrt(diag)))`` samples exactly like the
zero-factor low-rank form.

Flattening order matches torch's C-contiguous (B, C, D, H, W) view so
converted reference checkpoints sample identically; inputs/outputs at the
module boundary stay channels-last.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .unet3d import UNet3D


@dataclass
class LowRankMVN:
    """Batch low-rank multivariate normal, torch-compatible sampling."""
    mean: jnp.ndarray        # (B, N)
    cov_diag: jnp.ndarray    # (B, N)
    cov_factor: jnp.ndarray  # (B, N, R)
    event_shape: Tuple[int, ...] = ()

    def _degenerate_factor(self) -> jnp.ndarray:
        """Per-batch flag reproducing torch's constructor failure: the
        capacitance matrix I + W^T D^-1 W must admit a Cholesky. The
        check always runs in float32: a bf16 Cholesky has no CPU kernel
        and its rounding would flip the degeneracy verdict (mixed-
        precision training keeps the factor itself in bf16)."""
        f32 = lambda t: t.astype(jnp.float32)
        w_d = f32(self.cov_factor) / f32(self.cov_diag)[..., None]
        cap = (jnp.eye(self.cov_factor.shape[-1], dtype=jnp.float32)
               + jnp.einsum("bnr,bns->brs", w_d, f32(self.cov_factor)))
        chol = jnp.linalg.cholesky(cap)
        return ~jnp.all(jnp.isfinite(chol), axis=(-2, -1))  # (B,)

    def rsample(self, key: jax.Array, sample_shape: Tuple[int, ...] = ()):
        import math
        n = math.prod(sample_shape) if sample_shape else 1
        b, dim = self.mean.shape
        rank = self.cov_factor.shape[-1]
        k1, k2 = jax.random.split(key)
        eps_r = jax.random.normal(k1, (n, b, rank), dtype=self.mean.dtype)
        eps_d = jax.random.normal(k2, (n, b, dim), dtype=self.mean.dtype)
        degenerate = self._degenerate_factor()  # (B,)
        factor = jnp.where(degenerate[:, None, None],
                           jnp.zeros_like(self.cov_factor), self.cov_factor)
        samples = (self.mean[None]
                   + jnp.einsum("bnr,sbr->sbn", factor, eps_r)
                   + jnp.sqrt(self.cov_diag)[None] * eps_d)
        return samples.reshape(tuple(sample_shape) + (b, dim))

    # torch's .sample == rsample without grad; identical draw here
    sample = rsample


class SsnUNet3D(UNet3D):
    """UNet3D trunk + SSN heads. ``__call__`` returns a LowRankMVN."""
    rank: int = 10
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, enable_concat: bool = True,
                 mean_only: bool = False, deterministic: bool = True):
        features = UNet3D.__call__(self, x, enable_concat=enable_concat,
                                   last_layer=False,
                                   deterministic=deterministic)
        batch = features.shape[0]
        spatial = features.shape[1:-1]
        conv = lambda n_out, name: nn.Conv(
            n_out, (1, 1, 1), name=name, dtype=self.dtype,
            param_dtype=self.param_dtype)

        # channels-last -> channel-first flattening for torch view parity:
        # (B, D, H, W, C) -> (B, C*V) in C-contiguous (C, D, H, W) order
        def flatten_cf(t):
            return jnp.moveaxis(t, -1, 1).reshape(batch, -1)

        mean = conv(self.num_classes, "mean_conv")(features)
        mean = flatten_cf(mean)
        cov_diag = jnp.exp(flatten_cf(
            conv(self.num_classes, "log_cov_diag_conv")(features))) \
            + self.epsilon

        if mean_only:
            cov_factor = jnp.zeros(mean.shape + (self.rank,),
                                   dtype=mean.dtype)
        else:
            raw = conv(self.num_classes * self.rank, "cov_factor_conv")(
                features)  # (B, D, H, W, C*R)
            # torch: view(B, R, C, V) -> flatten(2,3) -> transpose(1,2)
            # => factor[b, c*V + v, r]
            raw = jnp.moveaxis(raw, -1, 1)           # (B, C*R, D, H, W)
            raw = raw.reshape(batch, self.rank, self.num_classes, -1)
            raw = raw.reshape(batch, self.rank, -1)  # (B, R, C*V)
            cov_factor = jnp.swapaxes(raw, 1, 2)     # (B, C*V, R)

        return LowRankMVN(mean=mean, cov_diag=cov_diag,
                          cov_factor=cov_factor,
                          event_shape=(self.num_classes,) + spatial)
