"""Banded-GEMM grouped 3D convolution (Pallas, TPU) for narrow channels.

Why this kernel exists. The flagship workload's convolutions have 8-128
output channels per ensemble-member group (reference UNet3D topology,
uncertainty_modeling/models/unet3D_module.py:296-373, run as grouped
convs by values_tpu.models.ensemble_unet3d). Any standard GEMM lowering
of such a conv — im2col or implicit — has N = Cout as the only small
GEMM dimension, and MXU utilization is then bounded by Cout/128 no
matter how the other dims are tiled (the 128x128 systolic array streams
M rows through a KxN weight tile; N=8 leaves 120 lanes idle). XLA's conv
already sits at that bound; a faster kernel must *change the GEMM*.

The banded trick: fold a block of qd x qh neighbouring OUTPUT positions
into N. For output block base (d0, h0):

    out[d0+dd, h0+dh, w, co] =
        sum_{rd, rh, kw, ci} A[(rd,rh,kw,ci), w] * Bm[(rd,rh,kw,ci), (dd,dh,co)]

with A[(rd,rh,kw,ci), w] = x_pad[d0+rd, h0+rh, ci, w+kw] (an extended
patch shared by the whole output block) and Bm the *banded* weight
matrix Bm[(rd,rh,kw,ci),(dd,dh,co)] = W[rd-dd, rh-dh, kw, ci, co],
zero outside 0 <= rd-dd < 3, 0 <= rh-dh < 3. N grows to qd*qh*Cout
(=128 for Cout=8 with a 4x4 block) at the cost of computing the band's
zeros: useful-FLOP fraction 9/((qd+2)(qh+2)). Net MXU bound becomes
9*Cout*qd*qh / (128*(qd+2)(qh+2)) ~ 25% for Cout=8 — 4x over the
im2col bound. For Cout >= 128 the block degenerates to 1x1 = plain
im2col, so the kernel is never worse.

Layout: activations are "NDHCW" — (B, D, H, C, W) with W innermost so
the GEMM M dimension (W, padded to 128 lanes by packing ``bp`` batch
items) and the A-matrix K rows (channel planes of shifted W-slices) are
built from pure VMEM slices: no transposes anywhere in the hot path.
The banded weight matrix is precomputed outside the kernel with XLA
(it is tiny) once per call.

Grid: (batch-packs, groups, D-superblocks). Each cell DMAs its haloed
x region HBM->VMEM once, then runs (SD/qd)*(H/qh) banded GEMMs from
VMEM. Weights/bias arrive via auto-pipelined BlockSpecs; output blocks
are disjoint and stream back through the normal Pallas output pipeline.

Forward/inference only: training keeps XLA's conv (it fuses the
backward); the engine swaps this kernel in for the sample-parallel C1
prediction path where the reference spends its time (test_3D.py:399-483).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Banded weight construction (XLA side, tiny)
# ---------------------------------------------------------------------------

def banded_weights(kernel: jnp.ndarray, groups: int, qd: int, qh: int,
                   dtype=None) -> jnp.ndarray:
    """Banded GEMM weights (G, N, K) from a grouped conv kernel.

    kernel: (3, 3, 3, Cin, G*Cout) — flax grouped-conv layout (DHWIO,
    members stacked along output channels).
    Row n = (dd, dh, co), column k = (rd, rh, kw, ci):
    B[g, n, k] = kernel[rd-dd, rh-dh, kw, ci, g*Cout+co] inside the band.
    """
    kd, kh, kw_, cin, gcout = kernel.shape
    assert (kd, kh, kw_) == (3, 3, 3), "banded kernel supports 3x3x3"
    cout = gcout // groups
    dtype = dtype or kernel.dtype
    # (G, Cout, rd', rh', kw, ci)
    km = kernel.reshape(3, 3, 3, cin, groups, cout)
    km = jnp.transpose(km, (4, 5, 0, 1, 2, 3)).astype(dtype)
    band = jnp.zeros((groups, qd, qh, cout, qd + 2, qh + 2, 3, cin), dtype)
    slab = km.reshape(groups, 1, 1, cout, 3, 3, 3, cin)
    for dd in range(qd):
        for dh in range(qh):
            band = jax.lax.dynamic_update_slice(
                band, slab, (0, dd, dh, 0, dd, dh, 0, 0))
    n = qd * qh * cout
    k = (qd + 2) * (qh + 2) * 3 * cin
    return band.reshape(groups, n, k)


def banded_bias(bias: jnp.ndarray, groups: int, qd: int, qh: int,
                dtype=jnp.float32) -> jnp.ndarray:
    """(G*Cout,) -> (G, N, 1) matching the banded row order (dd, dh, co)."""
    cout = bias.shape[0] // groups
    b = bias.reshape(groups, 1, cout).astype(dtype)
    b = jnp.broadcast_to(b, (groups, qd * qh, cout))
    return b.reshape(groups, qd * qh * cout, 1)


# ---------------------------------------------------------------------------
# Tiling selection
# ---------------------------------------------------------------------------

def choose_tiling(cout: int, batch: int, d: int, h: int, w: int
                  ) -> Tuple[int, int, int, int]:
    """Pick (qd, qh, bp, sd): output block qd x qh (N = qd*qh*cout <= 128,
    square-ish to minimize band waste), batch pack bp (M = bp*w <= 128),
    D superblock sd (bounds the per-cell VMEM x tile)."""
    target = max(1, 128 // cout)
    best = (1, 1)

    def waste(q):  # band overhead (qd+2)(qh+2)/(qd*qh)
        return (q[0] + 2) * (q[1] + 2) / (q[0] * q[1])

    for qd in (1, 2, 4, 8, 16):
        if d % qd:
            continue
        for qh in (1, 2, 4, 8, 16):
            if h % qh or qd * qh > target:
                continue
            if (qd * qh > best[0] * best[1]
                    or (qd * qh == best[0] * best[1]
                        and waste((qd, qh)) < waste(best))):
                best = (qd, qh)
    qd, qh = best
    bp = max(1, min(batch, 128 // w))
    while batch % bp:
        bp -= 1

    # superblock: largest multiple of qd dividing d whose haloed x tile
    # stays under ~4MB of VMEM (lane dim pads to 128; 2-byte elements —
    # f32 doubles this, still comfortably inside 16MB with the rest)
    def tile_bytes(sd_):
        return bp * (sd_ + 2) * (h + 2) * max(128, w + 2) * 2

    sd = d
    while sd > qd and (d % sd or tile_bytes(sd) > 4 * 2 ** 20):
        sd -= qd
    if d % sd:
        sd = qd
    return qd, qh, bp, sd


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _conv_kernel(x_hbm, bw_ref, bb_ref, out_ref, x_vmem, sem,
                 *, groups: int, cin: int, cout: int,
                 qd: int, qh: int, bp: int, sd: int, h: int, w: int,
                 out_dtype):
    ib = pl.program_id(0)
    g = pl.program_id(1)
    idd = pl.program_id(2)

    # one haloed x region per cell: (bp, sd+2, h+2, cin, w+2)
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(ib * bp, bp), pl.ds(idd * sd, sd + 2), :,
                 pl.ds(g * cin, cin), :],
        x_vmem, sem)
    dma.start()
    dma.wait()

    bw = bw_ref[0]          # (N, K) banded weights for member g
    bb = bb_ref[0]           # (N, 1) bias rows

    n_dblk = sd // qd
    n_hblk = h // qh

    def body(i, _):
        d0 = (i // n_hblk) * qd
        h0 = (i % n_hblk) * qh
        pieces = []
        for rd in range(qd + 2):
            for rh in range(qh + 2):
                for kw in range(3):
                    row = [x_vmem[b, d0 + rd, h0 + rh, :, kw:kw + w]
                           for b in range(bp)]
                    pieces.append(row[0] if bp == 1
                                  else jnp.concatenate(row, axis=-1))
        a_mat = jnp.concatenate(pieces, axis=0)  # (K, bp*w)
        out = jax.lax.dot_general(
            bw, a_mat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (N, bp*w)
        out = (out + bb).astype(out_dtype)
        for b in range(bp):
            out_ref[b, pl.ds(d0, qd), pl.ds(h0, qh), :, :] = (
                out[:, b * w:(b + 1) * w].reshape(qd, qh, cout, w))
        return 0

    jax.lax.fori_loop(0, n_dblk * n_hblk, body, 0)


def conv3d_grouped_banded(x: jnp.ndarray, kernel: jnp.ndarray,
                          bias: Optional[jnp.ndarray] = None,
                          groups: int = 1, *,
                          tiling: Optional[Tuple[int, int, int, int]] = None,
                          interpret: bool = False) -> jnp.ndarray:
    """Grouped 3x3x3 SAME conv over NDHCW activations.

    Args:
        x: (B, D, H, G*Cin, W) activations (channels second-to-last).
        kernel: (3, 3, 3, Cin, G*Cout) grouped DHWIO weights.
        bias: (G*Cout,) or None.
        groups: feature_group_count (ensemble members).
        tiling: optional (qd, qh, bp, sd) override.

    Returns (B, D, H, G*Cout, W) in x.dtype.
    """
    b, d, h, gc, w = x.shape
    cin = gc // groups
    cout = kernel.shape[4] // groups
    assert kernel.shape[3] == cin, (kernel.shape, cin)
    qd, qh, bp, sd = tiling or choose_tiling(cout, b, d, h, w)
    assert d % qd == 0 and h % qh == 0 and b % bp == 0 and d % sd == 0
    assert sd % qd == 0

    if bias is None:
        bias = jnp.zeros((groups * cout,), jnp.float32)
    bw = banded_weights(kernel, groups, qd, qh, dtype=x.dtype)
    bb = banded_bias(bias, groups, qd, qh)

    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (1, 1)))
    n = qd * qh * cout
    k = (qd + 2) * (qh + 2) * 3 * cin

    grid = (b // bp, groups, d // sd)
    kernel_fn = functools.partial(
        _conv_kernel, groups=groups, cin=cin, cout=cout, qd=qd, qh=qh,
        bp=bp, sd=sd, h=h, w=w, out_dtype=x.dtype)

    out = pl.pallas_call(
        kernel_fn,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # x_pad in HBM
            pl.BlockSpec((1, n, k), lambda ib, g, idd: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda ib, g, idd: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bp, sd, h, cout, w),
            lambda ib, g, idd: (ib, idd, 0, g, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d, h, groups * cout, w), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bp, sd + 2, h + 2, cin, w + 2), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            # one (N,K)@(K,bp*w) GEMM per output block
            flops=2 * n * k * bp * w * ((b // bp) * groups
                                        * (d // qd) * (h // qh)),
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x_pad, bw, bb)
    return out


def to_ndhcw(x_ndhwc: jnp.ndarray) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B, D, H, C, W)."""
    return jnp.swapaxes(x_ndhwc, -1, -2)


def from_ndhcw(x_ndhcw: jnp.ndarray) -> jnp.ndarray:
    return jnp.swapaxes(x_ndhcw, -1, -2)
