"""Grouped ensemble UNet3D forward on the Pallas banded-GEMM conv kernel.

Same math and the same grouped variable tree as
``values_tpu.models.ensemble_unet3d.EnsembleUNet3D`` (members fused into
grouped convolutions), but activations flow in the kernel's batch-packed
layout — (B/bp, D, H, C, bp*W) with bp = 128//W, so the innermost dim is
exactly 128 lanes at every UNet level — and every 3x3x3 convolution runs
through ``values_tpu.ops.pallas.conv3d.conv3d_banded_packed``, whose
banded GEMM lifts the MXU bound from Cout/128 to
~9*qd*qh*Cout/(128*(qd+2)(qh+2)) (4x at the 8-channel top level).

Level transitions re-pack the lanes (w-pool halves W -> bp doubles;
upscale doubles W -> bp halves); those are the only XLA transposes in
the forward. Instance norm / pooling / dropout / transpose-convs operate
directly on the packed layout.

Inference-only (the C1 prediction path, reference test_3D.py:399-483);
training keeps the flax module whose backward XLA fuses.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.pallas.conv3d import (LANES, conv3d_banded_packed, pack_ndhwc,
                                 unpack_ndhwc)


# -- packed-layout primitives ------------------------------------------------

def _repack_halve_w(x):
    """After a w-pool the lanes are (bp, W/2) = 64; merge nb pairs so the
    lane dim refills to 128: (nb, D, H, C, 64) -> (nb/2, D, H, C, 128).
    Item index convention stays global = ib*bp + b at every level."""
    nb, d, h, c, lanes = x.shape
    x = x.reshape(nb // 2, 2, d, h, c, lanes)
    x = jnp.moveaxis(x, 1, 4)            # (nb/2, D, H, C, 2, 64)
    return x.reshape(nb // 2, d, h, c, 2 * lanes)


def _repack_double_w(x):
    """After an upscale the lanes are (bp, 2W) = 256; split packs so the
    lane dim returns to 128: (nb, D, H, C, 256) -> (2nb, D, H, C, 128).
    Exact inverse of :func:`_repack_halve_w`."""
    nb, d, h, c, lanes = x.shape
    x = x.reshape(nb, d, h, c, 2, lanes // 2)
    x = jnp.moveaxis(x, 4, 1)            # (nb, 2, D, H, C, 128)
    return x.reshape(2 * nb, d, h, c, lanes // 2)


def _instance_norm(x, bp):
    """Per-item, per-channel stats over (D, H, W) in the packed layout."""
    nb, d, h, c, lanes = x.shape
    xi = x.reshape(nb, d, h, c, bp, lanes // bp)
    mean = jnp.mean(xi, axis=(1, 2, 5), keepdims=True)
    var = jnp.var(xi, axis=(1, 2, 5), keepdims=True)
    xi = (xi - mean) * jax.lax.rsqrt(var + 1e-5)
    return xi.reshape(nb, d, h, c, lanes)


def _pool(x, bp):
    """2x2x2 max pool in packed layout (halves W; lanes refill happens in
    the caller via _repack_halve_w when a pack pair is available)."""
    nb, d, h, c, lanes = x.shape
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                              (1, 2, 2, 1, 1), (1, 2, 2, 1, 1), "VALID")
    xi = x.reshape(nb, d // 2, h // 2, c, bp, lanes // bp // 2, 2)
    xi = jnp.max(xi, axis=-1)
    return xi.reshape(nb, d // 2, h // 2, c, lanes // 2)


def _dropout(x, rng, rate=0.5):
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _transpose_conv_k2s2(x, params, groups, bp, repack=True):
    """Per-member ConvTranspose(k=2, s=2) on the packed layout (einsum +
    pixel shuffle; parity with ensemble_unet3d.GroupedConvTransposeK2S2),
    followed by a lane re-pack (W doubles -> bp halves) when the matching
    encoder pool refilled lanes."""
    kernel = params["kernel"]   # (M, 2, 2, 2, cin, cout)
    bias = params["bias"]       # (M, cout)
    nb, d, h, gc, lanes = x.shape
    cin = gc // groups
    co = kernel.shape[-1]
    xm = x.reshape(nb, d, h, groups, cin, lanes)
    # Explicit dot_general + ONE transpose: a naive einsum materializes a
    # 10-D intermediate whose tiny trailing dims (w-item, f=2) force a 4x
    # lane/sublane-padded layout (10GB at the top level). The dot output
    # below keeps (h, lanes) trailing (dense tiling), and the final
    # transpose+reshape writes directly into the packed target layout.
    y = jax.lax.dot_general(
        kernel, xm, (((4,), (4,)), ((0,), (3,))),
        preferred_element_type=jnp.float32).astype(x.dtype)
    # y: (m, a, e, f, o, nb, d, h, lanes)
    y = jnp.transpose(y, (5, 6, 1, 7, 2, 0, 4, 8, 3))
    # (nb, d, a, h, e, m, o, lanes, f): lane index (b, w, f) = packed
    # (bp, 2w) with the f interleave in the minor position
    y = y.reshape(nb, 2 * d, 2 * h, groups * co, 2 * lanes)
    if repack:
        y = _repack_double_w(y)
    return y + bias.reshape(-1, 1)


def _concat_members(a, bb, groups):
    nb, d, h, _, lanes = a.shape
    am = a.reshape(nb, d, h, groups, -1, lanes)
    bm = bb.reshape(nb, d, h, groups, -1, lanes)
    out = jnp.concatenate([am, bm], axis=-2)
    return out.reshape(nb, d, h, -1, lanes)


def _conv(x, params, groups, w_item, bp, *, interpret=False):
    """Grouped 3x3x3 SAME conv (Pallas banded GEMM) or 1x1x1 head (einsum)
    on packed activations. When the packed lane dim is below 128 (small
    batches whose packs ran out at deep levels), the conv falls back to
    lax.conv on the unpacked layout — those levels are MXU-wide anyway."""
    kernel = params["kernel"]
    bias = params["bias"]
    nb, d, h, gc, lanes = x.shape
    if kernel.shape[0] == 1:  # 1x1x1 head: a pure per-member matmul
        cin = gc // groups
        k = kernel.reshape(cin, groups, -1)
        xm = x.reshape(nb, d, h, groups, cin, lanes)
        out = jnp.einsum("ndhmil,imo->ndhmol", xm, k)
        out = out.reshape(nb, d, h, -1, lanes)
        return out + bias.reshape(-1, 1)
    if lanes == LANES:
        if kernel.shape[3] == 1:
            # Mosaic slices the channel (sublane) dim in 8-aligned blocks;
            # replicate the single input channel 8x with kernel/8 (exact
            # power-of-two scaling) so each member block is 8 wide.
            kernel = jnp.repeat(kernel / 8.0, 8, axis=3)
            x = jnp.repeat(x, 8, axis=-2)
        return conv3d_banded_packed(x, kernel, bias, groups, w_item=w_item,
                                    interpret=interpret)
    flat = unpack_ndhwc(x, bp)
    out = jax.lax.conv_general_dilated(
        flat, kernel, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=groups) + bias
    return pack_ndhwc(out, bp)


# -- the forward --------------------------------------------------------------

def grouped_forward_packed(grouped_variables: Dict, x: jnp.ndarray,
                           members: int, w_item: int, *,
                           do_dropout: bool = False,
                           rng: Optional[jax.Array] = None,
                           interpret: bool = False) -> jnp.ndarray:
    """Forward the grouped ensemble in the packed layout.

    Args:
        grouped_variables: tree from ensemble_unet3d.group_member_variables.
        x: (B/bp, D, H, Cin_total, 128) packed input; a 1-channel input is
           tiled across members like EnsembleUNet3D.__call__.
        w_item: W extent of one item inside the packed lanes.
    Returns packed logits (B/bp, D, H, members, num_classes, 128).
    """
    p = grouped_variables["params"]
    # 17 dropout sites: 8 contract blocks + bottleneck + 8 expand blocks
    rngs = iter(jax.random.split(rng, 17)) if do_dropout else None
    state = {"w": w_item, "bp": x.shape[-1] // w_item}
    repacks = []  # encoder records, decoder replays in reverse

    def block(v, name, norm=True, relu="leaky", dropout=True):
        v = _conv(v, p[name]["conv"] if "conv" in p[name] else p[name],
                  members, state["w"], state["bp"], interpret=interpret)
        if norm:
            v = _instance_norm(v, state["bp"])
        v = (jax.nn.leaky_relu(v, 0.01) if relu == "leaky"
             else jax.nn.relu(v))
        if do_dropout and dropout:
            v = _dropout(v, next(rngs))
        return v

    def pool(v):
        out = _pool(v, state["bp"])
        state["w"] //= 2
        if out.shape[0] > 1:  # a pack pair exists: refill lanes to 128
            out = _repack_halve_w(out)
            state["bp"] *= 2
            repacks.append(True)
        else:
            repacks.append(False)
        return out

    def up(v, name):
        repack = repacks.pop()
        out = _transpose_conv_k2s2(v, p[name], members, state["bp"],
                                   repack=repack)
        state["w"] *= 2
        if repack:
            state["bp"] //= 2
        return out

    if x.shape[-2] == 1:  # tile the shared input across members
        x = jnp.tile(x, (1, 1, 1, members, 1))

    contr_1 = block(block(x, "contr_1_1"), "contr_1_2")
    p1 = pool(contr_1)
    contr_2 = block(block(p1, "contr_2_1"), "contr_2_2")
    p2 = pool(contr_2)
    contr_3 = block(block(p2, "contr_3_1"), "contr_3_2")
    p3 = pool(contr_3)
    contr_4 = block(block(p3, "contr_4_1"), "contr_4_2")
    p4 = pool(contr_4)

    c = block(p4, "center_conv1", norm=False, relu="relu", dropout=False)
    c = block(c, "center_conv2", norm=False, relu="relu", dropout=False)
    c = up(c, "center_up")
    center = jax.nn.relu(c)
    if do_dropout:
        center = _dropout(center, next(rngs))

    e = _concat_members(center, contr_4, members)
    e = block(block(e, "expand_4_1", norm=False), "expand_4_2", norm=False)
    e = _concat_members(up(e, "upscale4"), contr_3, members)
    e = block(block(e, "expand_3_1", norm=False), "expand_3_2", norm=False)
    e = _concat_members(up(e, "upscale3"), contr_2, members)
    e = block(block(e, "expand_2_1", norm=False), "expand_2_2", norm=False)
    e = _concat_members(up(e, "upscale2"), contr_1, members)
    expand = block(block(e, "expand_1_1", norm=False),
                   "expand_1_2", norm=False)

    out = _conv(expand, p["final"], members, state["w"], state["bp"],
                interpret=interpret)
    nb, d, h, gc, lanes = out.shape
    return out.reshape(nb, d, h, members, gc // members, lanes)


def make_grouped_ensemble_predictor_pallas(num_classes: int, members: int,
                                           initial_filter_size: int = 8,
                                           dtype=jnp.bfloat16,
                                           do_dropout: bool = False,
                                           interpret: bool = False):
    """Same contract as ensemble_unet3d.make_grouped_ensemble_predictor:
    predict(grouped_variables, x_ndhwc, rng) -> ((M, B, D, H, W, C)
    softmax stack, None) — lowered through the Pallas banded-GEMM kernel.
    The batch is padded up to a multiple of bp = 128//W packed items."""
    del num_classes, initial_filter_size  # derived from the variables

    def predict(grouped_variables, x, rng):
        gv = jax.tree_util.tree_map(lambda a: a.astype(dtype),
                                    grouped_variables)
        b, d, h, w, c = x.shape
        assert LANES % w == 0, f"W={w} must divide {LANES}"
        bp = LANES // w
        pad_b = (-b) % bp
        if pad_b:
            x = jnp.concatenate(
                [x, jnp.zeros((pad_b,) + x.shape[1:], x.dtype)], axis=0)
        packed = pack_ndhwc(x.astype(dtype), bp)
        logits = grouped_forward_packed(
            gv, packed, members, w, do_dropout=do_dropout, rng=rng,
            interpret=interpret)
        nb, dd, hh, m, cc, lanes = logits.shape
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-2)
        probs = probs.reshape(nb, dd, hh, m * cc, lanes)
        probs = unpack_ndhwc(probs, bp)[:b]     # (B, D, H, W, M*C)
        probs = probs.reshape(b, dd, hh, w, m, cc)
        return jnp.moveaxis(probs, -2, 0), None  # (M, B, D, H, W, C)

    return None, predict
