"""Banded-GEMM grouped 3D convolution (Pallas, TPU) for narrow channels.

Why this kernel exists. The flagship workload's convolutions have 8-128
output channels per ensemble-member group (reference UNet3D topology,
uncertainty_modeling/models/unet3D_module.py:296-373, run as grouped
convs by values_tpu.models.ensemble_unet3d). Any standard GEMM lowering
of such a conv — im2col or implicit — has N = Cout as the only small
GEMM dimension, and MXU utilization is then bounded by Cout/128 no
matter how the other dims are tiled (the 128x128 systolic array streams
M rows through a KxN weight tile; N=8 leaves 120 lanes idle). XLA's
conv already sits at that bound (measured 13.8% of v5e bf16 peak for
the whole grouped ensemble forward); a faster kernel must *change the
GEMM*.

The banded trick: fold a block of qd x qh neighbouring OUTPUT positions
into N. For output block base (d0, h0):

    out[d0+dd, h0+dh, w, co] =
        sum_{kw, rd, rh, ci} A[(kw,rd,rh,ci), w] * Bm[(kw,rd,rh,ci), (dd,dh,co)]

with A[(kw,rd,rh,ci), w] = x_pad[d0+rd, h0+rh, ci, w+kw-1] (an extended
patch shared by the whole output block) and Bm the *banded* weight
matrix Bm[(kw,rd,rh,ci),(dd,dh,co)] = W[rd-dd, rh-dh, kw, ci, co],
zero outside 0 <= rd-dd < 3, 0 <= rh-dh < 3. N grows to qd*qh*Cout
(=128 for Cout=8 with a 4x4 block) at the cost of computing the band's
zeros: useful-FLOP fraction 9/((qd+2)(qh+2)) — the MXU bound becomes
9*qd*qh*Cout/(128*(qd+2)(qh+2)) ~ 25% for Cout=8, 4x the im2col bound.
For Cout >= 128 the block degenerates to 1x1 = plain im2col, so the
kernel is never worse.

Packed layout. Mosaic requires DMA slices tile-aligned in the last
(lane) dim, so activations carry a *batch-packed* layout:

    (B/bp, D, H, C, bp*W)   with bp = 128 // W  ("packed NDHCW")

— the innermost dim is exactly 128 lanes at EVERY UNet level (W halves,
bp doubles). The GEMM M dimension is the packed lane vector itself; the
kw = 0/2 taps become lane rolls masked at the W-item boundaries (the
SAME-padding zeros), and the A matrix assembles from one contiguous
VMEM slice + 2 rolls — no transposes anywhere. Each grid cell DMAs one
(d,h)-haloed x region HBM->VMEM and runs its banded GEMMs from VMEM;
weights/bias arrive via auto-pipelined BlockSpecs.

Forward/inference only: training keeps XLA's conv (it fuses the
backward); this kernel serves the sample-parallel C1 prediction path
where the reference spends its time (test_3D.py:399-483).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


# ---------------------------------------------------------------------------
# Packed-layout helpers (XLA side)
# ---------------------------------------------------------------------------

def pack_ndhwc(x: jnp.ndarray, bp: int) -> jnp.ndarray:
    """(B, D, H, W, C) -> (B/bp, D, H, C, bp*W); item i of a pack occupies
    lane block [i*W, (i+1)*W)."""
    b, d, h, w, c = x.shape
    assert b % bp == 0, (b, bp)
    x = x.reshape(b // bp, bp, d, h, w, c)
    x = jnp.transpose(x, (0, 2, 3, 5, 1, 4))   # (nb, D, H, C, bp, W)
    return x.reshape(b // bp, d, h, c, bp * w)


def unpack_ndhwc(xp: jnp.ndarray, bp: int) -> jnp.ndarray:
    """Inverse of :func:`pack_ndhwc`."""
    nb, d, h, c, l = xp.shape
    w = l // bp
    xp = xp.reshape(nb, d, h, c, bp, w)
    xp = jnp.transpose(xp, (0, 4, 1, 2, 5, 3))  # (nb, bp, D, H, W, C)
    return xp.reshape(nb * bp, d, h, w, c)


# ---------------------------------------------------------------------------
# Banded weight construction (XLA side, tiny)
# ---------------------------------------------------------------------------

def banded_weights(kernel: jnp.ndarray, groups: int, qd: int, qh: int,
                   dtype=None) -> jnp.ndarray:
    """Banded GEMM weights (G, N, K) from a grouped conv kernel.

    kernel: (3, 3, 3, Cin, G*Cout) — flax grouped-conv layout (DHWIO,
    members stacked along output channels).
    Row n = (dd, dh, co), column k = (kw, rd, rh, ci):
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
    # K order (kw, rd, rh, ci) so the kernel builds A as 3 lane-rolled
    # copies of one contiguous (rd, rh, ci) block
    band = jnp.transpose(band, (0, 1, 2, 3, 6, 4, 5, 7))
    n = qd * qh * cout
    k = 3 * (qd + 2) * (qh + 2) * cin
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

def choose_tiling(cout: int, d: int, h: int,
                  cin: int = 8) -> Tuple[int, int, int]:
    """Pick (qd, qh, sd): output block qd x qh with N = qd*qh*cout <= 128
    (square-ish to minimize band waste (qd+2)(qh+2)/(qd*qh)), and the D
    superblock sd keeping the per-cell VMEM budget (haloed x tile +
    double-buffered output block + banded weights) under ~10MB of the
    16MB core VMEM."""
    target = max(1, LANES // cout)
    best = (1, 1)

    def waste(q):
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
    k = 3 * (qd + 2) * (qh + 2) * cin
    n = qd * qh * cout

    def vmem_bytes(sd_):
        # 2 double-buffered raw tiles + 2 kw-roll variants
        x_tiles = 4 * (sd_ + 2) * (h + 2) * cin * LANES * 2
        out_blocks = 2 * sd_ * h * cout * LANES * 2
        weights = 2 * n * k * 2
        return x_tiles + out_blocks + weights

    sd = d
    while sd > qd and (d % sd or vmem_bytes(sd) > 10 * 2 ** 20):
        sd -= qd
    if d % sd:
        sd = qd
    return qd, qh, sd


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _conv_kernel(x_hbm, bw_ref, bb_ref, out_ref, raw_vmem, x3_vmem, sem,
                 *, cin: int, cout: int, qd: int, qh: int, sd: int,
                 h: int, w_item: int, out_dtype):
    ib = pl.program_id(0)
    g = pl.program_id(1)
    idd = pl.program_id(2)
    ng = pl.num_programs(1)
    nd = pl.num_programs(2)
    total = pl.num_programs(0) * ng * nd

    # double-buffered x DMA across grid cells: cell L waits on the copy
    # started during cell L-1 and prefetches cell L+1, so the HBM reads
    # ride under the GEMMs instead of serializing with them.
    lin = (ib * ng + g) * nd + idd
    slot = jax.lax.rem(lin, 2)
    nxt = lin + 1
    n_idd = jax.lax.rem(nxt, nd)
    n_g = jax.lax.rem(nxt // nd, ng)
    n_ib = nxt // (nd * ng)

    def x_dma(l_ib, l_g, l_idd, l_slot):
        return pltpu.make_async_copy(
            x_hbm.at[l_ib, pl.ds(l_idd * sd, sd + 2), :,
                     pl.ds(l_g * cin, cin), :],
            raw_vmem.at[l_slot], sem.at[l_slot])

    @pl.when(lin == 0)
    def _():
        x_dma(ib, g, idd, slot).start()

    @pl.when(nxt < total)
    def _():
        x_dma(n_ib, n_g, n_idd, 1 - slot).start()

    x_dma(ib, g, idd, slot).wait()

    bw = bw_ref[0]           # (N, K) banded weights for member g
    bb = bb_ref[0]           # (N, 1) bias rows

    n_hblk = h // qh
    rows = (sd + 2) * (h + 2) * cin
    ksub = (qd + 2) * (qh + 2) * cin

    def lane_roll(v, shift):
        # Mosaic only rotates 32-bit lanes; lane rotation commutes with
        # the sublane packing of 16-bit types, so bitcast-roll-bitcast is
        # exact for bf16 (any row-pairing is preserved by a lane move).
        if v.dtype.itemsize == 4:
            return pltpu.roll(v, shift, axis=1)
        packed = pltpu.bitcast(v, jnp.int32)
        return pltpu.bitcast(pltpu.roll(packed, shift, axis=1), v.dtype)

    # hoist the kw lane-shifts: build the 3 shifted/masked tile variants
    # ONCE per cell so the per-GEMM A build is pure slices + concat.
    # Item-boundary masks realize the SAME-padding zeros.
    raw = raw_vmem[slot].reshape(rows, LANES)
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1) % w_item
    zero = jnp.zeros_like(raw)
    x3_vmem[0] = jnp.where(lane_w != 0, lane_roll(raw, 1),
                           zero).reshape(x3_vmem.shape[1:])
    x3_vmem[1] = jnp.where(lane_w != w_item - 1, lane_roll(raw, LANES - 1),
                           zero).reshape(x3_vmem.shape[1:])

    # lane-batch nq output blocks per dot: a lone (128, K)@(K, 128) GEMM
    # engages only part of the chip's MXUs (measured 38% of peak); N=512
    # reaches 84%. The A matrices of nq consecutive h-blocks concatenate
    # along lanes.
    nq = 4 if n_hblk % 4 == 0 else (2 if n_hblk % 2 == 0 else 1)

    def body(i, _):
        d0 = (i // (n_hblk // nq)) * qd
        h0 = (i % (n_hblk // nq)) * (qh * nq)

        def piece(buf, kw_idx, q):
            return buf[kw_idx, pl.ds(d0, qd + 2),
                       pl.ds(h0 + q * qh, qh + 2), :, :].reshape(ksub,
                                                                 LANES)

        a_mat = jnp.concatenate([
            jnp.concatenate([
                piece(x3_vmem, 0, q),      # kw=0 (rolled +1, masked)
                piece(raw_vmem, slot, q),  # kw=1 (raw)
                piece(x3_vmem, 1, q),      # kw=2 (rolled -1, masked)
            ], axis=0)
            for q in range(nq)
        ], axis=1)                                   # (3*ksub, nq*128)
        out = jax.lax.dot_general(
            bw, a_mat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (N, nq*128)
        out = (out + bb).astype(out_dtype)
        # the row order (dd, dh, co) makes each lane-block's full (N, 128)
        # output one contiguous (qd, qh, cout, 128) region per d-row
        for q in range(nq):
            blk = out[:, q * LANES:(q + 1) * LANES].reshape(
                qd, qh, cout, LANES)
            for dd in range(qd):
                out_ref[0, d0 + dd, pl.ds(h0 + q * qh, qh), :, :] = blk[dd]
        return 0

    jax.lax.fori_loop(0, (sd // qd) * (n_hblk // nq), body, 0,
                      unroll=False)


def conv3d_banded_packed(x: jnp.ndarray, kernel: jnp.ndarray,
                         bias: Optional[jnp.ndarray] = None,
                         groups: int = 1, *, w_item: int,
                         tiling: Optional[Tuple[int, int, int]] = None,
                         interpret: bool = False) -> jnp.ndarray:
    """Grouped 3x3x3 SAME conv over batch-packed NDHCW activations.

    Args:
        x: (B/bp, D, H, G*Cin, bp*W) packed activations (pack_ndhwc).
        kernel: (3, 3, 3, Cin, G*Cout) grouped DHWIO weights.
        bias: (G*Cout,) or None.
        groups: feature_group_count (ensemble members).
        w_item: per-item W extent inside the 128 packed lanes.

    Returns (B/bp, D, H, G*Cout, bp*W) in x.dtype.
    """
    nb, d, h, gc, lanes = x.shape
    assert lanes == LANES, f"packed lane dim must be {LANES}, got {lanes}"
    cin = gc // groups
    cout = kernel.shape[4] // groups
    assert kernel.shape[3] == cin, (kernel.shape, cin)
    if cin % 8:
        # Mosaic DMA-slices the channel (sublane) dim in 8-aligned blocks;
        # zero-pad each group's input channels (weights padded to match,
        # so the math is unchanged). Production channel counts are already
        # 8-aligned — this path serves tiny test models.
        cin8 = -(-cin // 8) * 8
        xg = x.reshape(nb, d, h, groups, cin, lanes)
        xg = jnp.pad(xg, ((0, 0),) * 4 + ((0, cin8 - cin), (0, 0)))
        x = xg.reshape(nb, d, h, groups * cin8, lanes)
        kernel = jnp.pad(kernel,
                         ((0, 0),) * 3 + ((0, cin8 - cin), (0, 0)))
        cin = cin8
    qd, qh, sd = tiling or choose_tiling(cout, d, h, cin)
    assert d % qd == 0 and h % qh == 0 and d % sd == 0 and sd % qd == 0

    if bias is None:
        bias = jnp.zeros((groups * cout,), jnp.float32)
    bw = banded_weights(kernel, groups, qd, qh, dtype=x.dtype)
    bb = banded_bias(bias, groups, qd, qh)

    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))
    n = qd * qh * cout
    k = 3 * (qd + 2) * (qh + 2) * cin

    grid = (nb, groups, d // sd)
    kernel_fn = functools.partial(
        _conv_kernel, cin=cin, cout=cout, qd=qd, qh=qh, sd=sd, h=h,
        w_item=w_item, out_dtype=x.dtype)

    out = pl.pallas_call(
        kernel_fn,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # x_pad in HBM
            pl.BlockSpec((1, n, k), lambda ib, g, idd: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda ib, g, idd: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, sd, h, cout, LANES),
            lambda ib, g, idd: (ib, idd, 0, g, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, d, h, groups * cout, LANES),
                                       x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, sd + 2, h + 2, cin, LANES), x.dtype),  # raw x2
            pltpu.VMEM((2, sd + 2, h + 2, cin, LANES), x.dtype),  # kw 0/2
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            # one (N,K)@(K,128) GEMM per output block
            flops=2 * n * k * LANES * (nb * groups * (d // qd) * (h // qh)),
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x_pad, bw, bb)
    return out


def conv3d_grouped_banded(x: jnp.ndarray, kernel: jnp.ndarray,
                          bias: Optional[jnp.ndarray] = None,
                          groups: int = 1, *,
                          tiling: Optional[Tuple[int, int, int]] = None,
                          interpret: bool = False) -> jnp.ndarray:
    """Convenience wrapper over plain NDHWC (B, D, H, W, C): packs the
    batch into lanes (padding B up to bp = 128//W items), convolves, and
    unpacks. Production code should stay packed across layers instead
    (values_tpu.models.ensemble_unet3d_pallas)."""
    b, d, h, w, c = x.shape
    assert LANES % w == 0, f"W={w} must divide {LANES}"
    bp = LANES // w
    pad_b = (-b) % bp
    if pad_b:
        x = jnp.concatenate(
            [x, jnp.zeros((pad_b,) + x.shape[1:], x.dtype)], axis=0)
    packed = pack_ndhwc(x, bp)
    out = conv3d_banded_packed(packed, kernel, bias, groups, w_item=w,
                               tiling=tiling, interpret=interpret)
    out = unpack_ndhwc(out, bp)
    return out[:b]
