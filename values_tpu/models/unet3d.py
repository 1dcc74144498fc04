"""3D U-Net backbone (C0) — flax/linen, channels-last NDHWC.

Architecture parity with the reference's torch module (reference:
uncertainty_modeling/models/unet3D_module.py:7-373):

- 4-level encoder: per level two blocks of Conv3d(k=3, SAME) ->
  InstanceNorm (affine-free, eps=1e-5) -> LeakyReLU(0.01) -> Dropout(p),
  followed by MaxPool 2x2x2.
- bottleneck ("center"): Conv -> ReLU -> Conv -> ReLU ->
  ConvTranspose(k=2, s=2) -> ReLU (+ Dropout when do_dropout).
- decoder: center-crop skip concat (with a concat on/off weight), two
  expand blocks (Conv -> LeakyReLU -> Dropout, NO norm), ConvTranspose up.
- heads: 1x1x1 ``final`` conv; optional ``final_aleatoric`` emitting
  (mu, s) with 2*num_classes channels; unused autoencoder head kept for
  checkpoint-shape compatibility.
- MC-dropout: ``do_dropout`` puts p=0.5 Dropout after every block and in
  the bottleneck; at inference stochasticity comes from running with
  ``deterministic=False`` and a fresh 'dropout' RNG per sample, matching
  the reference's models-left-in-train-mode semantics (test_3D.py:222-247).

TPU-first design notes: all convs run channels-last via
``lax.conv_general_dilated`` so XLA tiles them onto the MXU; the k=2/s=2
transpose convolutions are lowered to a single einsum (matmul on the MXU)
plus a pixel-shuffle reshape — exactly equivalent to torch's
ConvTranspose3d(k=2, s=2) but avoids the gradient-of-conv lowering.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Affine-free InstanceNorm over spatial dims (torch InstanceNorm3d
    defaults: affine=False, track_running_stats=False, biased variance).
    Statistics accumulate in float32 regardless of the compute dtype:
    a 64^3 spatial mean/variance in bf16 loses ~3 decimal digits, which
    is the difference between stable and drifting mixed-precision
    training."""
    spatial_axes = tuple(range(1, x.ndim - 1))
    xf = x.astype(jnp.float32) if x.dtype in (
        jnp.bfloat16, jnp.float16) else x  # f32/f64 paths stay bit-exact
    mean = jnp.mean(xf, axis=spatial_axes, keepdims=True)
    var = jnp.var(xf, axis=spatial_axes, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def center_crop_spatial(x: jnp.ndarray, target_shape: Tuple[int, ...]) -> jnp.ndarray:
    """Center crop spatial dims of (B, *spatial, C) to ``target_shape``."""
    slices = [slice(None)]
    for dim, tgt in zip(x.shape[1:-1], target_shape):
        start = (dim - tgt) // 2
        slices.append(slice(start, start + tgt))
    slices.append(slice(None))
    return x[tuple(slices)]


class ConvTransposeK2S2(nn.Module):
    """ConvTranspose(k=2, s=2) as einsum + pixel shuffle (exact torch parity).

    out[b, 2d+a, 2h+e, 2w+f, o] = bias[o] + sum_i x[b,d,h,w,i] * W[a,e,f,i,o]
    """
    features: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform",
                                             in_axis=-2, out_axis=-1),
            (2, 2, 2, in_features, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        b, d, h, w, _ = x.shape
        y = jnp.einsum("bdhwi,aefio->bdahewfo",
                       x.astype(self.dtype), kernel.astype(self.dtype))
        y = y.reshape(b, 2 * d, 2 * h, 2 * w, self.features)
        return y + bias.astype(self.dtype)


class ConvBlock(nn.Module):
    """Conv3d(k, SAME) -> [InstanceNorm] -> LeakyReLU/ReLU -> [Dropout]."""
    features: int
    kernel_size: int = 3
    instancenorm: bool = True
    dropout_prob: float = 0.0
    negative_slope: float = 0.01
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        k = self.kernel_size
        x = nn.Conv(self.features, (k, k, k), padding="SAME", name="conv",
                    dtype=self.dtype, param_dtype=self.param_dtype)(x)
        if self.instancenorm:
            x = instance_norm(x)
        x = nn.leaky_relu(x, negative_slope=self.negative_slope)
        if self.dropout_prob > 0.0:
            x = nn.Dropout(rate=self.dropout_prob)(x, deterministic=deterministic)
        return x


class UNet3D(nn.Module):
    """Reference-parity 3D U-Net. Input/output are channels-last NDHWC."""
    num_classes: int
    in_channels: int = 1
    initial_filter_size: int = 8
    kernel_size: int = 3
    do_instancenorm: bool = True
    do_dropout: bool = False
    aleatoric_loss: Optional[bool] = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def dropout_prob(self) -> float:
        return 0.5 if self.do_dropout else 0.0

    def _contract(self, features: int, name: str) -> ConvBlock:
        return ConvBlock(features, self.kernel_size,
                         instancenorm=self.do_instancenorm,
                         dropout_prob=self.dropout_prob, name=name,
                         dtype=self.dtype, param_dtype=self.param_dtype)

    def _expand(self, features: int, name: str) -> ConvBlock:
        return ConvBlock(features, self.kernel_size, instancenorm=False,
                         dropout_prob=self.dropout_prob, name=name,
                         dtype=self.dtype, param_dtype=self.param_dtype)

    @nn.compact
    def __call__(self, x: jnp.ndarray, enable_concat: bool = True,
                 last_layer: bool = True, deterministic: bool = True):
        f = self.initial_filter_size
        concat_weight = 1.0 if enable_concat else 0.0
        det = deterministic

        pool = lambda v: nn.max_pool(v, (2, 2, 2), strides=(2, 2, 2))

        contr_1 = self._contract(f, "contr_1_2")(
            self._contract(f, "contr_1_1")(x, det), det)
        p1 = pool(contr_1)
        contr_2 = self._contract(f * 2, "contr_2_2")(
            self._contract(f * 2, "contr_2_1")(p1, det), det)
        p2 = pool(contr_2)
        contr_3 = self._contract(f * 4, "contr_3_2")(
            self._contract(f * 4, "contr_3_1")(p2, det), det)
        p3 = pool(contr_3)
        contr_4 = self._contract(f * 8, "contr_4_2")(
            self._contract(f * 8, "contr_4_1")(p3, det), det)
        p4 = pool(contr_4)

        # Bottleneck: ReLU convs, no norm (unet3D_module.py:97-146)
        k = self.kernel_size
        c = nn.Conv(f * 16, (3, 3, 3), padding="SAME", name="center_conv1",
                    dtype=self.dtype, param_dtype=self.param_dtype)(p4)
        c = nn.relu(c)
        c = nn.Conv(f * 16, (3, 3, 3), padding="SAME", name="center_conv2",
                    dtype=self.dtype, param_dtype=self.param_dtype)(c)
        c = nn.relu(c)
        c = ConvTransposeK2S2(f * 8, name="center_up", dtype=self.dtype,
                              param_dtype=self.param_dtype)(c)
        center = nn.relu(c)
        if self.do_dropout:
            center = nn.Dropout(rate=self.dropout_prob)(
                center, deterministic=det)

        def skip(enc: jnp.ndarray, dec: jnp.ndarray) -> jnp.ndarray:
            crop = center_crop_spatial(enc, dec.shape[1:-1])
            return jnp.concatenate([dec, crop * concat_weight], axis=-1)

        e = self._expand(f * 8, "expand_4_2")(
            self._expand(f * 8, "expand_4_1")(skip(contr_4, center), det), det)
        up = ConvTransposeK2S2(f * 4, name="upscale4", dtype=self.dtype,
                               param_dtype=self.param_dtype)(e)
        e = self._expand(f * 4, "expand_3_2")(
            self._expand(f * 4, "expand_3_1")(skip(contr_3, up), det), det)
        up = ConvTransposeK2S2(f * 2, name="upscale3", dtype=self.dtype,
                               param_dtype=self.param_dtype)(e)
        e = self._expand(f * 2, "expand_2_2")(
            self._expand(f * 2, "expand_2_1")(skip(contr_2, up), det), det)
        up = ConvTransposeK2S2(f, name="upscale2", dtype=self.dtype,
                               param_dtype=self.param_dtype)(e)
        expand = self._expand(f, "expand_1_2")(
            self._expand(f, "expand_1_1")(skip(contr_1, up), det), det)

        if not last_layer:
            return expand

        if enable_concat:
            if not self.aleatoric_loss:
                return nn.Conv(self.num_classes, (1, 1, 1), name="final",
                               dtype=self.dtype,
                               param_dtype=self.param_dtype)(expand)
            out = nn.Conv(2 * self.num_classes, (1, 1, 1),
                          name="final_aleatoric", dtype=self.dtype,
                          param_dtype=self.param_dtype)(expand)
            mu, s = jnp.split(out, 2, axis=-1)
            return mu, s
        # autoencoder mode (kept for interface parity; unused in pipelines)
        return nn.Conv(1, (1, 1, 1), name="output_reconstruction_map",
                       dtype=self.dtype, param_dtype=self.param_dtype)(expand)
