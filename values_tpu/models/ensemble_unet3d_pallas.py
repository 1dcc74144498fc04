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

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.pallas.conv3d import (LANES, conv3d_banded_packed,
                                 conv3d_banded_packed_ad, fold_halo,
                                 unfold_halo, pack_ndhwc,
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


import functools as _functools

import numpy as _np


@_functools.lru_cache(maxsize=None)
def _lane_block_sum_matrix(lanes: int, bp: int):
    """(lanes, bp) 0/1 matrix: column b sums lanes of item block b."""
    w = lanes // bp
    s = _np.zeros((lanes, bp), _np.float32)
    for l in range(lanes):
        s[l, l // w] = 1.0
    return s


@_functools.lru_cache(maxsize=None)
def _pool_compact_matrix(lanes: int, bp: int, repack: bool):
    """W-pair-max compaction as a matmul. Input lane l = b*W + w carries
    max(x[w], x[w+1]) on even w (after a roll-max); the matrix routes even
    lanes to the compacted layout. repack=True fuses _repack_halve_w:
    shape (2, lanes, lanes) so out = sum_p m[p] @ C[p] merges the pack
    pair into full lanes; repack=False: (lanes, lanes//2)."""
    w = lanes // bp
    if repack:
        c = _np.zeros((2, lanes, lanes), _np.float32)
        for p in range(2):
            for l in range(0, lanes, 2):
                b, ww = l // w, (l % w) // 2
                c[p, l, p * (lanes // 2) + b * (w // 2) + ww] = 1.0
        return c
    c = _np.zeros((lanes, lanes // 2), _np.float32)
    for l in range(0, lanes, 2):
        b, ww = l // w, (l % w) // 2
        c[l, b * (w // 2) + ww] = 1.0
    return c


def _roll_lanes(x, shift):
    """Rotate the minor (lane) dim; XLA lowers to a lane rotate."""
    return jnp.roll(x, shift, axis=-1)


def _instance_norm(x, bp):
    """Per-item, per-channel stats over (D, H, W), packed layout.

    The per-item lane-block sums route through one MXU contraction
    (lanes @ S) instead of splitting lanes with a reshape — the f32
    (…, bp, W) reshape was 2x24 ms of pure layout copies in the r2
    profile. Stats accumulate in f32 (preferred_element_type)."""
    nb, d, h, c, lanes = x.shape
    w = lanes // bp
    n_vox = d * h * w
    s = jnp.asarray(_lane_block_sum_matrix(lanes, bp), x.dtype)
    xf = x
    # (nb, c, bp) sums of x and x^2 in f32, one fused pass each
    sum1 = jax.lax.dot_general(
        xf.reshape(nb, d * h * c, lanes), s, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(nb, d, h, c, bp)
    sum1 = jnp.sum(sum1, axis=(1, 2))
    sum2 = jax.lax.dot_general(
        (xf * xf).reshape(nb, d * h * c, lanes), s,
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(nb, d, h, c, bp)
    sum2 = jnp.sum(sum2, axis=(1, 2))
    mean = sum1 / n_vox
    var = jnp.maximum(sum2 / n_vox - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + 1e-5)
    # broadcast (nb, c, bp) back onto lanes: tiny dot with S^T
    st = jnp.asarray(_lane_block_sum_matrix(lanes, bp).T, jnp.float32)
    scale = jax.lax.dot_general(inv, st,
                                (((2,), (0,)), ((), ())))  # (nb, c, lanes)
    shift = jax.lax.dot_general(mean * inv, st,
                                (((2,), (0,)), ((), ())))
    return (x.astype(jnp.float32) * scale[:, None, None]
            - shift[:, None, None]).astype(x.dtype)


def _pool(x, bp):
    """2x2x2 max pool in packed layout (halves W; lanes refill happens in
    the caller via _repack_halve_w when a pack pair is available).

    D/H pool by strided slicing on major dims; W pool by a lane roll-max
    whose even lanes are compacted through one 0/1 matmul (bf16-exact) —
    reduce_window on the packed lanes cost 95 ms/step in the r2 profile.
    """
    nb, d, h, c, lanes = x.shape
    # contiguous reshape-max (a strided slice x[:, 0::2] lowers to a
    # gather -> while loop on TPU: 2x4.5 ms/step in the r2 profile)
    m = x.reshape(nb, d // 2, 2, h, c, lanes).max(axis=2)
    m = m.reshape(nb, d // 2, h // 2, 2, c, lanes).max(axis=3)
    m = jnp.maximum(m, _roll_lanes(m, -1))      # even lanes: W-pair max
    cmp = jnp.asarray(_pool_compact_matrix(lanes, bp, False), x.dtype)
    out = jax.lax.dot_general(
        m.reshape(nb, -1, lanes), cmp, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return out.reshape(nb, d // 2, h // 2, c, lanes // 2)


def _pool_repack(x, bp):
    """Fused _repack_halve_w(_pool(x)): pack pairs merge inside the same
    compaction matmul, so the (…, 2, 64) -> (…, 128) lane interleave never
    materializes. (nb, D, H, C, 128) -> (nb/2, D/2, H/2, C, 128)."""
    nb, d, h, c, lanes = x.shape
    # contiguous reshape-max (a strided slice x[:, 0::2] lowers to a
    # gather -> while loop on TPU: 2x4.5 ms/step in the r2 profile)
    m = x.reshape(nb, d // 2, 2, h, c, lanes).max(axis=2)
    m = m.reshape(nb, d // 2, h // 2, 2, c, lanes).max(axis=3)
    m = jnp.maximum(m, _roll_lanes(m, -1))
    cmp = jnp.asarray(_pool_compact_matrix(lanes, bp, True), x.dtype)
    m = m.reshape(nb // 2, 2, (d // 2) * (h // 2) * c, lanes)
    out = jax.lax.dot_general(
        m, cmp, (((1, 3), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return out.reshape(nb // 2, d // 2, h // 2, c, lanes)


def _dropout(x, rng, rate=0.5):
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


@_functools.lru_cache(maxsize=None)
def _upscale_interleave_matrix(lanes: int, repack: bool):
    """The w-doubling lane interleave of a k2s2 transpose-conv as a 0/1
    matrix: input lane l = b*W + w and offset f land on output lane
    l' = b*2W + 2w + f = 2l + f. repack=True also splits the doubled
    256-lane space into the two output packs (p = l' // lanes), fusing
    _repack_double_w into the same contraction."""
    if repack:
        e = _np.zeros((2, lanes, 2, lanes), _np.float32)
        for f in range(2):
            for l in range(lanes):
                lp = 2 * l + f
                e[f, l, lp // lanes, lp % lanes] = 1.0
        return e
    e = _np.zeros((2, lanes, 2 * lanes), _np.float32)
    for f in range(2):
        for l in range(lanes):
            e[f, l, 2 * l + f] = 1.0
    return e


def _transpose_conv_k2s2(x, params, groups, bp, repack=True,
                         activation="none", include_bias=True):
    """Per-member ConvTranspose(k=2, s=2) on the packed layout, parity
    with ensemble_unet3d.GroupedConvTransposeK2S2.

    Three steps: (1) the per-member GEMM over cin, (2) the w/f lane
    interleave (+ fused pack split) as ONE 0/1-matrix contraction on the
    MXU — the reshape formulation cost 2x ~24 ms of 9-D layout copies per
    upscale in the r2 profile — and (3) a single major-dim transpose
    placing (p, a, e) next to (nb, d, h)."""
    kernel = params["kernel"]   # (M, 2, 2, 2, cin, cout)
    bias = params["bias"]       # (M, cout)
    nb, d, h, gc, lanes = x.shape
    cin = gc // groups
    co = kernel.shape[-1]
    xm = x.reshape(nb, d, h, groups, cin, lanes)
    y = jax.lax.dot_general(
        kernel, xm, (((4,), (4,)), ((0,), (3,))),
        preferred_element_type=jnp.float32).astype(x.dtype)
    # y: (m, a, e, f, o, nb, d, h, lanes)
    em = jnp.asarray(_upscale_interleave_matrix(lanes, repack), x.dtype)
    if repack:
        y = jax.lax.dot_general(
            y, em, (((3, 8), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)
        # (m, a, e, o, nb, d, h, p, l)
        y = jnp.transpose(y, (4, 7, 5, 1, 6, 2, 0, 3, 8))
        # (nb, p, d, a, h, e, m, o, l): out pack = 2*nb + p
        y = y.reshape(2 * nb, 2 * d, 2 * h, groups * co, lanes)
    else:
        y = jax.lax.dot_general(
            y, em, (((3, 8), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)
        # (m, a, e, o, nb, d, h, l2)
        y = jnp.transpose(y, (4, 5, 1, 6, 2, 0, 3, 7))
        y = y.reshape(nb, 2 * d, 2 * h, groups * co, 2 * lanes)
    if not include_bias:
        # bias (and any activation) ride the consuming conv's prologue
        # as shift = -bias (a standalone y+bias pass cost 8.8 ms at L1)
        return y
    return _apply_act(y + bias.reshape(-1, 1), activation)


def _concat_members(a, bb, groups):
    nb, d, h, _, lanes = a.shape
    am = a.reshape(nb, d, h, groups, -1, lanes)
    bm = bb.reshape(nb, d, h, groups, -1, lanes)
    out = jnp.concatenate([am, bm], axis=-2)
    return out.reshape(nb, d, h, -1, lanes)


def _apply_act(v, activation):
    if activation == "leaky":
        return jax.nn.leaky_relu(v, 0.01)
    if activation == "relu":
        return jax.nn.relu(v)
    return v


def _conv(x, params, groups, w_item, bp, *, activation="none",
          x2=None, prologue=None, emit_stats=False, interpret=False,
          ad=False):
    """Grouped 3x3x3 SAME conv (Pallas banded GEMM) or 1x1x1 head (einsum)
    on packed activations, with the v2 kernel's fusions (skip concat,
    normalize prologue, stats epilogue). When the packed lane dim is
    below 128 (small batches whose packs ran out at deep levels), the
    conv falls back to lax.conv on the unpacked layout with the fusions
    emulated in XLA — those levels are MXU-wide anyway."""
    kernel = params["kernel"]
    bias = params["bias"]
    nb, d, h, gc, lanes = x.shape
    if kernel.shape[0] == 1:  # 1x1x1 head: a pure per-member matmul
        assert x2 is None and prologue is None and not emit_stats
        cin = gc // groups
        k = kernel.reshape(cin, groups, -1)
        xm = x.reshape(nb, d, h, groups, cin, lanes)
        out = jnp.einsum("ndhmil,imo->ndhmol", xm, k)
        out = out.reshape(nb, d, h, -1, lanes)
        return _apply_act(out + bias.reshape(-1, 1), activation)
    # the Mosaic out-block needs an 8-aligned per-group Cout (production
    # filter sizes are >= 8; tiny test models take the XLA fallback), and
    # a tiling that fits scoped VMEM must exist (f32 at wide channels +
    # full resolution does not — choose_tiling returns None there). The
    # ONE tiling decision made here is passed through so the wrapper
    # cannot disagree with the precheck.
    from ..ops.pallas.conv3d import choose_tiling as _choose_tiling
    _cin_tot = max(8, -(-kernel.shape[3] // 8) * 8)  # wrapper's pad rule
    _tiling = (_choose_tiling(kernel.shape[4] // groups, d, h, _cin_tot,
                              x.dtype.itemsize)
               if kernel.shape[0] == 3 else None)
    if lanes == LANES and (kernel.shape[4] // groups) % 8 == 0 \
            and _tiling is not None:
        if kernel.shape[3] == 1:
            # Mosaic slices the channel (sublane) dim in 8-aligned blocks;
            # replicate the single input channel 8x with kernel/8 (exact
            # power-of-two scaling) so each member block is 8 wide.
            kernel = jnp.repeat(kernel / 8.0, 8, axis=3)
            # broadcast+reshape, NOT jnp.repeat: repeat lowers to a
            # while+dynamic-update-slice loop on this shape (13 ms/step)
            nb_, d_, h_, c_, l_ = x.shape
            x = jnp.broadcast_to(x[:, :, :, :, None, :],
                                 (nb_, d_, h_, c_, 8, l_))
            x = x.reshape(nb_, d_, h_, c_ * 8, l_)
        if ad:  # differentiable training path: conv(+act), custom VJP
            assert x2 is None and prologue is None
            if emit_stats:
                # training norm blocks: stats ride the kernel epilogue
                # (custom VJP folds their cotangents into dy) so the
                # instance norm needs no full-tensor reductions
                assert activation == "none"
                from ..ops.pallas.conv3d import (
                    conv3d_banded_packed_ad_stats)
                return conv3d_banded_packed_ad_stats(
                    x, kernel, bias, groups, w_item=w_item,
                    tiling=_tiling, interpret=interpret)
            return conv3d_banded_packed_ad(x, kernel, bias, groups,
                                           w_item=w_item, tiling=_tiling,
                                           activation=activation,
                                           interpret=interpret)
        return conv3d_banded_packed(x, kernel, bias, groups, w_item=w_item,
                                    x2=x2, prologue=prologue,
                                    tiling=_tiling,
                                    activation=activation,
                                    emit_stats=emit_stats,
                                    interpret=interpret)
    # ---- deep-level lane refill (ROADMAP "lane-refill at deep levels"):
    # when the batch has run out of pack pairs (bp*W < 128 at deep UNet
    # levels), fold H (or D) slabs WITH real 1-row halos into the lanes
    # and recurse — the banded kernel then keeps all 128 lanes at every
    # level; the 2 garbage halo output rows per slab are trimmed by
    # unfold_halo, everything else is exact (tests/test_pallas_conv3d.py).
    # Costs (hs+2)/hs extra rows of compute; measured on-chip via
    # VALUES_TPU_FOLD_DEEP=0 A/B in scripts/bench_convs.py.
    if (lanes < LANES and LANES % lanes == 0
            and kernel.shape[0] == 3
            and (kernel.shape[4] // groups) % 8 == 0
            and os.environ.get("VALUES_TPU_FOLD_DEEP", "1") != "0"):
        fold = LANES // lanes
        axis = 2 if h % fold == 0 else (1 if d % fold == 0 else 0)
        if axis:
            df, hf = (d, h // fold + 2) if axis == 2 else (d // fold + 2, h)
            if _choose_tiling(kernel.shape[4] // groups, df, hf, _cin_tot,
                              x.dtype.itemsize) is not None:
                if prologue is not None:
                    # the prologue must run BEFORE folding: the volume-
                    # edge halo rows are materialized SAME-pad zeros, and
                    # an in-kernel prologue would turn them into -shift
                    sc, shf, sl = prologue
                    xc = (x if x2 is None
                          else _concat_members(x, x2, groups))
                    v = (xc.astype(jnp.float32) * sc[:, None, None]
                         - shf[:, None, None])
                    x = jnp.maximum(v, v * sl[:, None, None]).astype(
                        x.dtype)
                    x2 = None
                elif x2 is not None:
                    x = _concat_members(x, x2, groups)
                    x2 = None
                xf = fold_halo(x, fold, axis)
                # stats must be PRE-activation sums; with stats requested
                # the activation moves outside the recursion
                act_in = "none" if emit_stats else activation
                outf = _conv(xf, params, groups, w_item, bp * fold,
                             activation=act_in,
                             interpret=interpret, ad=ad)
                out = unfold_halo(outf, fold, axis)
                if not emit_stats:
                    return out
                pre = out.astype(jnp.float32)
                return (_apply_act(out, activation),
                        (jnp.sum(pre, axis=(1, 2)),
                         jnp.sum(pre * pre, axis=(1, 2))))
    # ---- XLA fallback (lanes < 128), fusions emulated -------------------
    if prologue is not None:
        sc, sh, sl = prologue
        xc = x if x2 is None else _concat_members(x, x2, groups)
        v = (xc.astype(jnp.float32) * sc[:, None, None]
             - sh[:, None, None])
        xc = jnp.maximum(v, v * sl[:, None, None]).astype(x.dtype)
    else:
        xc = x if x2 is None else _concat_members(x, x2, groups)
    flat = unpack_ndhwc(xc, bp)
    out = jax.lax.conv_general_dilated(
        flat, kernel, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=groups) + bias
    packed = pack_ndhwc(_apply_act(out, activation), bp)
    if not emit_stats:
        return packed
    # lane-resolved stats, same contract as the kernel: (nb, C, lanes)
    # sums of the PRE-activation conv+bias output over (d, h)
    pre = pack_ndhwc(out, bp).astype(jnp.float32)
    return packed, (jnp.sum(pre, axis=(1, 2)),
                    jnp.sum(pre * pre, axis=(1, 2)))


# -- instance-norm map plumbing (fused path) ---------------------------------

def _norm_maps(stats, n_vox, bp_src, bp_t, lanes_t, slope):
    """Stats from a conv's epilogue -> the consumer conv's prologue maps.

    stats: (nb_s, C, lanes_s) f32 lane-resolved (sum, sumsq) of the
    normalized layer's output. Reduces to per-item mean/var, then
    broadcasts (scale, shift, slope) into the consumer's packing
    (bp_t items per pack, lanes_t lanes) — which may differ from the
    source packing across a pool-repack boundary. Item identity is
    global index ib*bp + b in both packings."""
    ssum, ssq = stats
    nb_s, c, lanes_s = ssum.shape
    s = jnp.asarray(_lane_block_sum_matrix(lanes_s, bp_src), jnp.float32)
    dims = (((2,), (0,)), ((), ()))

    def per_item(a):  # (nb_s, C, lanes_s) -> (n_items, C)
        t = jax.lax.dot_general(a, s, dims)        # (nb_s, C, bp_src)
        return jnp.transpose(t, (0, 2, 1)).reshape(nb_s * bp_src, c)

    mean = per_item(ssum) / n_vox
    var = jnp.maximum(per_item(ssq) / n_vox - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + 1e-5)
    st = jnp.asarray(_lane_block_sum_matrix(lanes_t, bp_t).T, jnp.float32)
    nb_t = (nb_s * bp_src) // bp_t

    def to_lanes(m):  # (n_items, C) -> (nb_t, C, lanes_t)
        t = jnp.transpose(m.reshape(nb_t, bp_t, c), (0, 2, 1))
        return jax.lax.dot_general(t, st, dims)

    scale = to_lanes(inv)
    return scale, to_lanes(mean * inv), jnp.full_like(scale, slope)


def _identity_maps(nb, c, lanes, slope=1.0):
    one = jnp.ones((nb, c, lanes), jnp.float32)
    return one, jnp.zeros_like(one), jnp.full_like(one, slope)


def _concat_maps(m1, m2, groups):
    """Per-group channel concat of two prologue map triples (matches the
    kernel's per-group [part1, part2] channel layout)."""
    out = []
    for a, b in zip(m1, m2):
        nb, _, lanes = a.shape
        am = a.reshape(nb, groups, -1, lanes)
        bm = b.reshape(nb, groups, -1, lanes)
        out.append(jnp.concatenate([am, bm], axis=2)
                   .reshape(nb, -1, lanes))
    return tuple(out)


# -- the forward --------------------------------------------------------------

def _instance_norm_from_stats(x, stats, bp):
    """Instance norm whose (sum, sumsq) come from the producing conv's
    epilogue instead of two full-tensor reductions (the training-path
    counterpart of the fused inference chain; VERDICT r3 item 5). Only
    the tiny (nb, C, lanes) -> (nb, C, bp) lane-block contractions and
    one normalize pass remain. Differentiable end to end: the stats'
    cotangents flow back through conv3d_banded_packed_ad_stats."""
    nb, d, h, c, lanes = x.shape
    n_vox = d * h * (lanes // bp)
    ssum, ssq = stats
    s = jnp.asarray(_lane_block_sum_matrix(lanes, bp), jnp.float32)
    dims = (((2,), (0,)), ((), ()))
    mean = jax.lax.dot_general(ssum, s, dims) / n_vox       # (nb, c, bp)
    var = jnp.maximum(
        jax.lax.dot_general(ssq, s, dims) / n_vox - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + 1e-5)
    st = jnp.asarray(_lane_block_sum_matrix(lanes, bp).T, jnp.float32)
    scale = jax.lax.dot_general(inv, st, dims)              # (nb, c, lanes)
    shift = jax.lax.dot_general(mean * inv, st, dims)
    return (x.astype(jnp.float32) * scale[:, None, None]
            - shift[:, None, None]).astype(x.dtype)


def grouped_forward_packed(grouped_variables: Dict, x: jnp.ndarray,
                           members: int, w_item: int, *,
                           do_dropout: bool = False,
                           rng: Optional[jax.Array] = None,
                           apply_final: bool = True,
                           interpret: bool = False,
                           trainable: bool = False) -> jnp.ndarray:
    """Forward the grouped ensemble in the packed layout.

    Args:
        grouped_variables: tree from ensemble_unet3d.group_member_variables.
        x: (B/bp, D, H, Cin_total, 128) packed input; a 1-channel input is
           tiled across members like EnsembleUNet3D.__call__.
        w_item: W extent of one item inside the packed lanes.
        trainable: differentiable mode (VERDICT r2 item 1) — convs go
           through the custom-VJP banded kernel, norms/activations/pools
           stay jnp so ``jax.grad`` composes end to end. Used by the
           packed TRAINING step (Experiment train_backend="packed").
    Returns packed logits (B/bp, D, H, members, num_classes, 128).
    """
    if not do_dropout and not trainable:
        # stats-chained fused path: norms/activations ride conv
        # prologues/epilogues, pooling runs on raw conv outputs
        return _grouped_forward_fused(grouped_variables, x, members,
                                      w_item, apply_final=apply_final,
                                      interpret=interpret)
    p = grouped_variables["params"]
    # 17 dropout sites: 8 contract blocks + bottleneck + 8 expand blocks
    rngs = iter(jax.random.split(rng, 17)) if do_dropout else None
    state = {"w": w_item, "bp": x.shape[-1] // w_item}
    repacks = []  # encoder records, decoder replays in reverse

    # norm-block statistics ride the conv kernel's epilogue in trainable
    # mode too (custom VJP; VALUES_TPU_TRAIN_FUSED_NORM=0 is the on-chip
    # A/B lever back to the standalone jnp instance norm)
    fused_norm = (trainable and os.environ.get(
        "VALUES_TPU_TRAIN_FUSED_NORM", "1") != "0")

    def block(v, name, norm=True, relu="leaky", dropout=True):
        # without a norm between them, the activation fuses into the conv
        # kernel's epilogue (f32 registers, zero extra HBM passes) — in
        # trainable mode too: the custom VJP recovers the activation
        # derivative from the saved post-activation output
        act = "none" if norm else relu
        out = _conv(v, p[name]["conv"] if "conv" in p[name] else p[name],
                    members, state["w"], state["bp"], activation=act,
                    emit_stats=norm and fused_norm,
                    interpret=interpret, ad=trainable)
        if norm:
            if fused_norm:
                v, stats = out
                v = _instance_norm_from_stats(v, stats, state["bp"])
            else:
                v = _instance_norm(out, state["bp"])
            v = (jax.nn.leaky_relu(v, 0.01) if relu == "leaky"
                 else jax.nn.relu(v))
        else:
            v = out
        if do_dropout and dropout:
            v = _dropout(v, next(rngs))
        return v

    def pool(v):
        if v.shape[0] > 1:  # a pack pair exists: refill lanes to 128
            out = _pool_repack(v, state["bp"])
            state["w"] //= 2
            state["bp"] *= 2
            repacks.append(True)
        else:
            out = _pool(v, state["bp"])
            state["w"] //= 2
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

    if not apply_final:
        nb, d, h, gc, lanes = expand.shape
        return expand.reshape(nb, d, h, members, gc // members, lanes)
    head = "final_aleatoric" if "final_aleatoric" in p else "final"
    out = _conv(expand, p[head], members, state["w"], state["bp"],
                interpret=interpret)
    nb, d, h, gc, lanes = out.shape
    return out.reshape(nb, d, h, members, gc // members, lanes)


def _grouped_forward_fused(grouped_variables: Dict, x: jnp.ndarray,
                           members: int, w_item: int, *,
                           apply_final: bool = True,
                           interpret: bool = False) -> jnp.ndarray:
    """The deterministic (no-dropout) grouped forward with every
    instance norm + activation fused into the consuming conv's prologue
    and every standalone activation into its producing conv's epilogue.

    Correctness rests on two identities:
    - max-pool commutes with norm+leaky-relu (both monotone increasing,
      norm scale rsqrt(var+eps) > 0), so pooling runs on RAW conv
      outputs and normalization is deferred to the next conv's prologue;
    - the decoder's skip concat is the kernel's fused second input, with
      per-part prologue maps (identity for the already-upsampled half, the
      encoder's norm maps + leaky slope for the raw skip half).
    """
    p = grouped_variables["params"]
    if x.shape[-2] == 1:
        x = jnp.tile(x, (1, 1, 1, members, 1))

    state = {"w": w_item, "bp": x.shape[-1] // w_item}
    repacks = []

    def conv(v, name, **kw):
        prm = p[name]["conv"] if "conv" in p[name] else p[name]
        return _conv(v, prm, members, state["w"], state["bp"],
                     interpret=interpret, **kw)

    def pool(v):
        if v.shape[0] > 1:
            out = _pool_repack(v, state["bp"])
            state["w"] //= 2
            state["bp"] *= 2
            repacks.append(True)
        else:
            out = _pool(v, state["bp"])
            state["w"] //= 2
            repacks.append(False)
        return out

    def up(v, name):
        """Bias-less upscale; returns (y, bias) — the consumer conv adds
        the bias (and any activation) in its prologue."""
        repack = repacks.pop()
        out = _transpose_conv_k2s2(v, p[name], members, state["bp"],
                                   repack=repack, include_bias=False)
        state["w"] *= 2
        if repack:
            state["bp"] //= 2
        return out, p[name]["bias"].reshape(-1).astype(jnp.float32)

    def bias_maps(nb, bias_flat, lanes, slope):
        c = bias_flat.shape[0]
        one = jnp.ones((nb, c, lanes), jnp.float32)
        shift = jnp.broadcast_to(-bias_flat[None, :, None], (nb, c, lanes))
        return one, shift, jnp.full_like(one, slope)

    def maps(stats, n_vox, bp_src):
        """Norm maps in the CURRENT packing (call after pool/up updates)."""
        lanes_t = state["bp"] * state["w"]
        return _norm_maps(stats, n_vox, bp_src, state["bp"], lanes_t,
                          slope=0.01)

    # ---- encoder: conv(+stats) -> conv(prologue norm, +stats) -> raw pool
    skips = []   # (raw activation, stats, n_vox, bp at that level)
    v = x
    for lvl in (1, 2, 3, 4):
        # per-item voxel count from the ACTUAL level shape (non-cubic
        # D/H/W are first-class; a cubic assumption silently skews the
        # norm statistics 2-4x on anisotropic patches)
        n_vox = v.shape[1] * v.shape[2] * state["w"]
        if lvl == 1:
            y1, st = conv(v, "contr_1_1", emit_stats=True)
        else:
            y1, st = conv(v, f"contr_{lvl}_1", prologue=prev_maps,
                          emit_stats=True)
        m1 = maps(st, n_vox, state["bp"])
        y2, st2 = conv(y1, f"contr_{lvl}_2", prologue=m1, emit_stats=True)
        skips.append((y2, st2, n_vox, state["bp"],
                      state["bp"] * state["w"]))
        v = pool(y2)
        prev_maps = maps(st2, n_vox, skips[-1][3])

    # ---- bottleneck ----
    c = conv(v, "center_conv1", prologue=prev_maps, activation="relu")
    c = conv(c, "center_conv2", activation="relu")
    e, up_bias = up(c, "center_up")
    up_slope = 0.0  # center_up output gets a ReLU (slope 0)

    # ---- decoder: split-input convs (skip normalized in-prologue) ----
    for lvl in (4, 3, 2, 1):
        skip, st2, n_vox, bp_src, lanes_src = skips.pop()
        lanes_t = state["bp"] * state["w"]
        up_maps = bias_maps(e.shape[0], up_bias, lanes_t, up_slope)
        skip_maps = _norm_maps(st2, n_vox, bp_src, state["bp"], lanes_t,
                               slope=0.01)
        e = conv(e, f"expand_{lvl}_1", x2=skip,
                 prologue=_concat_maps(up_maps, skip_maps, members),
                 activation="leaky")
        e = conv(e, f"expand_{lvl}_2", activation="leaky")
        if lvl > 1:
            e, up_bias = up(e, f"upscale{lvl}")
            up_slope = 1.0  # plain upscales pass through unactivated

    if not apply_final:
        nb, d, h, gc, lanes = e.shape
        return e.reshape(nb, d, h, members, gc // members, lanes)
    out = conv(e, "final_aleatoric" if "final_aleatoric" in p
               else "final")
    nb, d, h, gc, lanes = out.shape
    return out.reshape(nb, d, h, members, gc // members, lanes)


def make_grouped_ensemble_predictor_pallas(num_classes: int, members: int,
                                           initial_filter_size: int = 8,
                                           dtype=jnp.bfloat16,
                                           do_dropout: bool = False,
                                           interpret: bool | None = None):
    """Same contract as ensemble_unet3d.make_grouped_ensemble_predictor:
    predict(grouped_variables, x_ndhwc, rng) -> ((M, B, D, H, W, C)
    softmax stack, None) — lowered through the Pallas banded-GEMM kernel.
    The batch is padded up to a multiple of bp = 128//W packed items."""
    del num_classes, initial_filter_size  # derived from the variables
    from ..core.platform import resolve_interpret
    interpret = resolve_interpret(interpret)

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
        # softmax reduces in f32, but the unpack transposes move bf16:
        # the C-minor unpacked layout lane-pads ~13x, so halving the
        # element size halves a ~25 ms tail; the XLA grouped path's
        # stack carries the same bf16 precision
        probs = jax.nn.softmax(logits.astype(jnp.float32),
                               axis=-2).astype(dtype)
        probs = probs.reshape(nb, dd, hh, m * cc, lanes)
        probs = unpack_ndhwc(probs, bp)[:b]     # (B, D, H, W, M*C)
        probs = probs.reshape(b, dd, hh, w, m, cc)
        return jnp.moveaxis(probs, -2, 0), None  # (M, B, D, H, W, C)

    return None, predict


def make_grouped_tta_predictor_pallas(num_classes: int, members: int,
                                      initial_filter_size: int = 8,
                                      dtype=jnp.bfloat16,
                                      interpret: bool | None = None):
    """TTA through the batch-packed pipeline: the 16 clean/noise x flip
    variants (per member) become channel groups like
    ensemble_unet3d.make_grouped_tta_predictor (same variant set,
    ordering and un-flip semantics; reference loop test_3D.py:427-456),
    but every conv runs in the packed layout — at the small window
    chunks real inference uses this is the 3-5x regime, multiplied by
    TTA's 16 variants."""
    from ..inference.predictors import FLIP_COMBOS

    groups = members * 16
    _, inner = make_grouped_ensemble_predictor_pallas(
        num_classes, groups, initial_filter_size, dtype=dtype,
        interpret=interpret)

    def predict(grouped_variables, x, rng):
        var_key, noise_key = jax.random.split(rng)
        variance = jax.random.uniform(var_key, (), minval=0.0, maxval=0.1)
        noise = jax.random.normal(noise_key, x.shape, dtype=x.dtype)
        x_noise = x + noise * variance

        def variants(inp):
            outs = [inp]
            for axes in FLIP_COMBOS:
                outs.append(jnp.flip(inp, axis=axes))
            return outs

        per_member = variants(x) + variants(x_noise)
        stacked_in = jnp.concatenate(per_member * members, axis=-1)
        probs, _ = inner(grouped_variables, stacked_in, rng)
        # probs: (groups, B, *sp, C); un-flip the flipped variants
        unflipped = []
        for m in range(members):
            for half in range(2):
                base = m * 16 + half * 8
                unflipped.append(probs[base])
                for fi, axes in enumerate(FLIP_COMBOS):
                    unflipped.append(jnp.flip(probs[base + 1 + fi],
                                              axis=axes))
        return jnp.stack(unflipped), None

    return None, predict


def _pack_forward(grouped_variables, x, members, dtype, interpret,
                  apply_final=True):
    """Shared pack -> forward -> (nb, d, h, m, cc, lanes) helper for the
    predictor factories; pads the batch to a pack multiple."""
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
    out = grouped_forward_packed(gv, packed, members, w,
                                 apply_final=apply_final,
                                 interpret=interpret)
    return out, b, bp, w


def _unpack_stack(packed_mcc, b, bp, w):
    """(nb, d, h, m, cc, lanes) -> (B, d, h, w, m, cc)."""
    nb, d, h, m, cc, lanes = packed_mcc.shape
    flat = packed_mcc.reshape(nb, d, h, m * cc, lanes)
    out = unpack_ndhwc(flat, bp)[:b]
    return out.reshape(b, d, h, w, m, cc)


def make_grouped_aleatoric_predictor_pallas(num_classes: int, members: int,
                                            initial_filter_size: int = 8,
                                            n_aleatoric_samples: int = 10,
                                            dtype=jnp.bfloat16,
                                            interpret: bool | None = None):
    """Aleatoric deep ensemble through the batch-packed pipeline: the
    fused (mu, s) head runs as the packed final conv (2C channels per
    member), then the logit sampling mirrors
    ensemble_unet3d.make_grouped_aleatoric_predictor key-for-key (same
    split tree -> bitwise-equal epsilon draws). Reference loop:
    test_3D.py:458-469."""
    from ..core.platform import resolve_interpret
    interpret = resolve_interpret(interpret)
    del initial_filter_size

    def predict(grouped_variables, x, rng):
        out_p, b, bp, w = _pack_forward(grouped_variables, x, members,
                                        dtype, interpret)
        out = _unpack_stack(out_p, b, bp, w)      # (B, *sp, M, 2C)
        out = out.astype(jnp.float32)
        mu, s = jnp.split(out, 2, axis=-1)
        mu = jnp.moveaxis(mu, -2, 0)              # (M, B, *sp, C)
        sigma = jnp.exp(jnp.moveaxis(s, -2, 0) / 2.0)
        keys = jax.random.split(rng, members)

        def per_member(mu_m, sigma_m, key):
            eps = jax.random.normal(
                key, (n_aleatoric_samples,) + mu_m.shape,
                dtype=mu_m.dtype)
            logits = mu_m[None] + sigma_m[None] * eps
            sigma_rep = jnp.broadcast_to(
                sigma_m[None], (n_aleatoric_samples,) + sigma_m.shape)
            return jax.nn.softmax(logits, axis=-1), sigma_rep

        probs, sigmas = jax.vmap(per_member)(mu, sigma, keys)
        s_total = members * n_aleatoric_samples
        return (probs.reshape((s_total,) + probs.shape[2:]),
                sigmas.reshape((s_total,) + sigmas.shape[2:]))

    return None, predict


def make_grouped_ssn_predictor_pallas(num_classes: int, members: int,
                                      initial_filter_size: int = 8,
                                      n_pred: int = 1, rank: int = 10,
                                      epsilon: float = 1e-5,
                                      dtype=jnp.bfloat16,
                                      interpret: bool | None = None):
    """SSN deep ensemble: packed trunk forward (apply_final=False), then
    the per-member 1x1x1 heads + ONE batched LowRankMVN, mirroring
    ensemble_unet3d.make_grouped_ssn_predictor (same head math, same
    sampling batch order). Reference: test_3D.py:361-396."""
    from ..core.platform import resolve_interpret
    interpret = resolve_interpret(interpret)
    from .ssn_unet3d import LowRankMVN
    del initial_filter_size

    def predict(grouped_variables, x, rng):
        feats_p, b, bp, w = _pack_forward(grouped_variables, x, members,
                                          dtype, interpret,
                                          apply_final=False)
        fm = _unpack_stack(feats_p, b, bp, w).astype(jnp.float32)
        # fm: (B, *sp, M, F)
        spatial = fm.shape[1:-2]
        f = fm.shape[-1]
        p = grouped_variables["params"]

        def head(name, cout):   # (M, B, *sp, cout)
            k = p[name]["kernel"].reshape(f, members, cout).astype(
                jnp.float32)
            bias = p[name]["bias"].reshape(members, cout).astype(
                jnp.float32)
            out = jnp.einsum("b...mi,imo->b...mo", fm, k) + bias
            return jnp.moveaxis(out, -2, 0)

        def flatten_cf(t):      # (M, B, *sp, C) -> (M*B, C*V) torch order
            t = jnp.moveaxis(t, -1, 2)
            return t.reshape((members * b, -1))

        mean = flatten_cf(head("mean_conv", num_classes))
        cov_diag = jnp.exp(flatten_cf(
            head("log_cov_diag_conv", num_classes))) + epsilon
        raw = head("cov_factor_conv", num_classes * rank)
        raw = jnp.moveaxis(raw, -1, 2)            # (M, B, C*R, *sp)
        raw = raw.reshape(members * b, rank, num_classes, -1)
        cov_factor = jnp.swapaxes(raw.reshape(members * b, rank, -1),
                                  1, 2)
        dist = LowRankMVN(mean=mean, cov_diag=cov_diag,
                          cov_factor=cov_factor,
                          event_shape=(num_classes,) + spatial)
        samples = dist.sample(rng, (n_pred,))     # (S, M*B, C*V)
        samples = samples.reshape((n_pred, members, b, num_classes)
                                  + spatial)
        samples = jnp.moveaxis(samples, 1, 0)     # (M, S, B, C, *sp)
        logits = samples.reshape((members * n_pred, b, num_classes)
                                 + spatial)
        logits = jnp.moveaxis(logits, 2, -1)
        return jax.nn.softmax(logits, axis=-1), None

    return None, predict


# -- differentiable training entry (VERDICT r2 item 1) ------------------------

def _single_member_tree(params: Dict) -> Dict:
    """Adapt a plain flax UNet3D param tree to the grouped tree shape for
    members=1, with TRACEABLE ops only (group_member_variables is
    numpy-based): conv blocks/heads pass through, transpose-convs gain
    the leading member axis."""
    out = {}
    for name, leaves in params.items():
        if name in ("center_up", "upscale4", "upscale3", "upscale2"):
            out[name] = {"kernel": leaves["kernel"][None],
                         "bias": leaves["bias"][None]}
        else:
            out[name] = leaves
    return out


def packed_train_forward(params: Dict, x: jnp.ndarray, *,
                         do_dropout: bool = False,
                         rng: Optional[jax.Array] = None,
                         apply_final: bool = True,
                         trainable: bool = True,
                         interpret: bool = False):
    """Differentiable batch-packed UNet3D forward for the TRAINING step.

    Takes the plain flax UNet3D ``params`` and an NDHWC batch; returns
    logits (B, D, H, W, C) — or ``(mu, s)`` when the tree carries the
    aleatoric head, or the pre-head features with ``apply_final=False``
    (``UNet3D.__call__(last_layer=False)``) — numerically equivalent to
    ``UNet3D.apply`` (same math; conv ordering differs at
    float-rounding level). Convolutions run the banded packed kernel
    with a custom VJP whose backward-data conv is packed too, so BOTH
    directions escape XLA's collapsed small-batch conv regime (ROADMAP
    r2: batch-minor lanes 16/128 below batch ~96). Batches not
    divisible by the pack factor are zero-padded and sliced back
    (padded items contribute nothing to the loss). ``trainable=False``
    (gradient-free callers, e.g. the validation step) switches to the
    stats-chained fused pipeline — same values, no VJP residuals.
    """
    b, d, h, w, cin = x.shape
    if LANES % w != 0:
        # config-reachable (train_backend=packed with an odd patch size);
        # a bare assert would vanish under python -O and crash opaquely
        # mid-training
        raise ValueError(
            f"train_backend='packed' requires the patch W dimension to "
            f"divide {LANES} (got W={w}); use a power-of-two patch size "
            f"<= {LANES} or train_backend='xla'")
    bp = LANES // w
    pad_b = (-b) % bp
    if pad_b:
        x = jnp.concatenate(
            [x, jnp.zeros((pad_b,) + x.shape[1:], x.dtype)], axis=0)
    grouped = {"params": _single_member_tree(params)}
    xp = pack_ndhwc(x, bp)
    out = grouped_forward_packed(grouped, xp, 1, w, do_dropout=do_dropout,
                                 rng=rng, trainable=trainable,
                                 apply_final=apply_final,
                                 interpret=interpret)
    nb, d_, h_, _m, c, lanes = out.shape
    flat = unpack_ndhwc(out.reshape(nb, d_, h_, c, lanes), bp)[:b]
    if apply_final and "final_aleatoric" in params:
        mu, s = jnp.split(flat, 2, axis=-1)
        return mu, s
    return flat


def packed_ssn_train_forward(params: Dict, x: jnp.ndarray, *,
                             num_classes: int, rank: int,
                             epsilon: float = 1e-5,
                             mean_only: bool = False,
                             do_dropout: bool = False,
                             rng: Optional[jax.Array] = None,
                             trainable: bool = True,
                             interpret: bool = False):
    """Differentiable packed SSN forward: banded-kernel trunk + unpacked
    1x1x1 heads, returning the same LowRankMVN as ``SsnUNet3D.apply``
    (reference: ssn_unet3D_module.py:30-56). The trunk — where all the
    conv FLOPs are — rides the custom-VJP packed pipeline; the heads
    are plain einsums (gradients compose), and the torch-view-parity
    flattening matches the flax module exactly, so ``rsample`` with the
    same key draws statistically identical logit samples."""
    from .ssn_unet3d import LowRankMVN
    features = packed_train_forward(params, x, do_dropout=do_dropout,
                                    rng=rng, apply_final=False,
                                    trainable=trainable,
                                    interpret=interpret)
    features = features.astype(jnp.float32)
    batch = features.shape[0]
    f_in = features.shape[-1]

    def head(name, cout):
        k = params[name]["kernel"].reshape(f_in, cout).astype(jnp.float32)
        bias = params[name]["bias"].astype(jnp.float32)
        return jnp.einsum("b...i,io->b...o", features, k) + bias

    def flatten_cf(t):  # (B, sp, C) -> (B, C*V), torch (C, D, H, W) view
        return jnp.moveaxis(t, -1, 1).reshape(batch, -1)

    mean = flatten_cf(head("mean_conv", num_classes))
    cov_diag = jnp.exp(flatten_cf(
        head("log_cov_diag_conv", num_classes))) + epsilon
    if mean_only:
        cov_factor = jnp.zeros(mean.shape + (rank,), dtype=mean.dtype)
    else:
        raw = head("cov_factor_conv", num_classes * rank)
        raw = jnp.moveaxis(raw, -1, 1)            # (B, C*R, D, H, W)
        raw = raw.reshape(batch, rank, -1)        # (B, R, C*V)
        cov_factor = jnp.swapaxes(raw, 1, 2)      # (B, C*V, R)
    return LowRankMVN(mean=mean, cov_diag=cov_diag, cov_factor=cov_factor,
                      event_shape=(num_classes,) + x.shape[1:-1])
