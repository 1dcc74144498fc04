"""Grouped ensemble UNet3D forward on the Pallas banded-GEMM conv kernel.

Same math and the same grouped variable tree as
``values_tpu.models.ensemble_unet3d.EnsembleUNet3D`` (members fused into
grouped convolutions), but the activations flow in the kernel's "NDHCW"
layout — (B, D, H, C, W), W innermost on the lanes — and every 3x3x3
convolution at the wide shallow levels runs through
``values_tpu.ops.pallas.conv3d.conv3d_grouped_banded``, whose banded GEMM
lifts the MXU bound from Cout/128 to ~9*qd*qh*Cout/(128*(qd+2)(qh+2))
(4x at the 8-channel top level). Deep levels (W < min width) stay on
``lax.conv_general_dilated`` with NDHCW dimension numbers — they are
MXU-wide already.

Inference-only (the C1 prediction path, reference test_3D.py:399-483);
training keeps the flax module whose backward XLA fuses.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.pallas.conv3d import conv3d_grouped_banded

_NDHCW = ("NDHCW", "DHWIO", "NDHCW")


def _conv(x, params, groups, *, min_pallas_w=32, interpret=False):
    """Grouped 3x3x3 SAME conv in NDHCW; Pallas where W is lane-wide."""
    kernel = params["kernel"]
    bias = params["bias"]
    if kernel.shape[0] == 1:  # 1x1x1 head: a pure per-member matmul
        b, d, h, gc, w = x.shape
        cin = gc // groups
        k = kernel.reshape(cin, groups, -1)
        xm = x.reshape(b, d, h, groups, cin, w)
        out = jnp.einsum("bdhmiw,imo->bdhmow", xm, k)
        out = out.reshape(b, d, h, -1, w)
        return out + bias.reshape(-1, 1)
    if x.shape[-1] >= min_pallas_w and x.shape[-1] % 8 == 0:
        return conv3d_grouped_banded(x, kernel, bias, groups,
                                     interpret=interpret)
    out = jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), "SAME", dimension_numbers=_NDHCW,
        feature_group_count=groups)
    return out + bias.reshape(-1, 1)


def _instance_norm(x):
    mean = jnp.mean(x, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(x, axis=(1, 2, 4), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5)


def _pool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, 2, 2, 1, 2), (1, 2, 2, 1, 2), "VALID")


def _dropout(x, rng, rate=0.5):
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _transpose_conv_k2s2(x, params, groups):
    """Per-member ConvTranspose(k=2, s=2) in NDHCW (einsum + pixel
    shuffle; parity with models.ensemble_unet3d.GroupedConvTransposeK2S2)."""
    kernel = params["kernel"]   # (M, 2, 2, 2, cin, cout)
    bias = params["bias"]       # (M, cout)
    b, d, h, gc, w = x.shape
    cin = gc // groups
    xm = x.reshape(b, d, h, groups, cin, w)
    y = jnp.einsum("bdhmiw,maefio->bdahemowf", xm, kernel)
    y = y.reshape(b, 2 * d, 2 * h, groups * kernel.shape[-1], 2 * w)
    return y + bias.reshape(-1, 1)


def _concat_members(a, bb, groups):
    sh = a.shape
    am = a.reshape(sh[0], sh[1], sh[2], groups, -1, sh[4])
    bm = bb.reshape(sh[0], sh[1], sh[2], groups, -1, sh[4])
    out = jnp.concatenate([am, bm], axis=-2)
    return out.reshape(sh[0], sh[1], sh[2], -1, sh[4])


def grouped_forward_ndhcw(grouped_variables: Dict, x: jnp.ndarray,
                          members: int, *, do_dropout: bool = False,
                          rng: Optional[jax.Array] = None,
                          min_pallas_w: int = 32,
                          interpret: bool = False) -> jnp.ndarray:
    """Forward the grouped ensemble in NDHCW.

    Args:
        grouped_variables: tree from ensemble_unet3d.group_member_variables.
        x: (B, D, H, Cin_total, W); a 1-channel input is tiled across
           members like EnsembleUNet3D.__call__.
    Returns logits (B, D, H, members, num_classes, W).
    """
    p = grouped_variables["params"]
    # 17 dropout sites: 8 contract blocks + bottleneck + 8 expand blocks
    rngs = iter(jax.random.split(rng, 17)) if do_dropout else None

    def block(v, name, norm=True, relu="leaky", dropout=True):
        v = _conv(v, p[name]["conv"] if "conv" in p[name] else p[name],
                  members, min_pallas_w=min_pallas_w, interpret=interpret)
        if norm:
            v = _instance_norm(v)
        v = (jax.nn.leaky_relu(v, 0.01) if relu == "leaky"
             else jax.nn.relu(v))
        if do_dropout and dropout:
            v = _dropout(v, next(rngs))
        return v

    if x.shape[-2] == 1:  # tile the shared input across members
        x = jnp.tile(x, (1, 1, 1, members, 1))

    contr_1 = block(block(x, "contr_1_1"), "contr_1_2")
    p1 = _pool(contr_1)
    contr_2 = block(block(p1, "contr_2_1"), "contr_2_2")
    p2 = _pool(contr_2)
    contr_3 = block(block(p2, "contr_3_1"), "contr_3_2")
    p3 = _pool(contr_3)
    contr_4 = block(block(p3, "contr_4_1"), "contr_4_2")
    p4 = _pool(contr_4)

    c = block(p4, "center_conv1", norm=False, relu="relu", dropout=False)
    c = block(c, "center_conv2", norm=False, relu="relu", dropout=False)
    c = _transpose_conv_k2s2(c, p["center_up"], members)
    center = jax.nn.relu(c)
    if do_dropout:
        center = _dropout(center, next(rngs))

    e = _concat_members(center, contr_4, members)
    e = block(block(e, "expand_4_1", norm=False), "expand_4_2", norm=False)
    up = _transpose_conv_k2s2(e, p["upscale4"], members)
    e = _concat_members(up, contr_3, members)
    e = block(block(e, "expand_3_1", norm=False), "expand_3_2", norm=False)
    up = _transpose_conv_k2s2(e, p["upscale3"], members)
    e = _concat_members(up, contr_2, members)
    e = block(block(e, "expand_2_1", norm=False), "expand_2_2", norm=False)
    up = _transpose_conv_k2s2(e, p["upscale2"], members)
    e = _concat_members(up, contr_1, members)
    expand = block(block(e, "expand_1_1", norm=False),
                   "expand_1_2", norm=False)

    out = _conv(expand, p["final"], members, min_pallas_w=min_pallas_w,
                interpret=interpret)
    b, d, h, gc, w = out.shape
    return out.reshape(b, d, h, members, gc // members, w)


def make_grouped_ensemble_predictor_pallas(num_classes: int, members: int,
                                           initial_filter_size: int = 8,
                                           dtype=jnp.bfloat16,
                                           do_dropout: bool = False,
                                           min_pallas_w: int = 32,
                                           interpret: bool = False):
    """Same contract as ensemble_unet3d.make_grouped_ensemble_predictor:
    predict(grouped_variables, x_ndhwc, rng) -> ((M, B, D, H, W, C)
    softmax stack, None) — but lowered through the Pallas conv kernel."""
    del num_classes, initial_filter_size  # derived from the variables

    def predict(grouped_variables, x, rng):
        gv = jax.tree_util.tree_map(lambda a: a.astype(dtype),
                                    grouped_variables)
        x_ndhcw = jnp.swapaxes(x, -1, -2).astype(dtype)
        logits = grouped_forward_ndhcw(
            gv, x_ndhcw, members, do_dropout=do_dropout, rng=rng,
            min_pallas_w=min_pallas_w, interpret=interpret)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-2)
        # (B, D, H, M, C, W) -> (M, B, D, H, W, C)
        probs = jnp.moveaxis(probs, 3, 0)       # (M, B, D, H, C, W)
        probs = jnp.swapaxes(probs, -1, -2)     # (M, B, D, H, W, C)
        return probs, None

    return None, predict
