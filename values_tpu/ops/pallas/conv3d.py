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
import os
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


def fold_halo(x: jnp.ndarray, f: int, axis: int) -> jnp.ndarray:
    """Fold a spatial dim (axis 1 = D, 2 = H) into the packed lane dim
    with 1-voxel halos: (nb, D, H, C, L) -> lanes f*L, the folded dim
    split into f slabs of n/f rows plus one REAL neighbor row on each
    side (zero at the volume edge — exactly the conv's SAME padding).

    A 3x3x3 SAME conv on the folded tensor then computes exact interior
    outputs: the kernel zero-pads each slab's local edge, which only
    feeds the 2 halo output rows per slab that :func:`unfold_halo`
    drops. This refills the 128 lanes at deep UNet levels where the
    batch has run out of pack pairs (bp*W < 128), at the cost of
    (n/f + 2)/(n/f) extra rows of compute."""
    n = x.shape[axis]
    assert n % f == 0 and f >= 2, (n, f)
    hs = n // f
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    xp = jnp.pad(x, pad)
    slabs = [jax.lax.slice_in_dim(xp, s * hs, s * hs + hs + 2, axis=axis)
             for s in range(f)]
    y = jnp.stack(slabs, axis=-2)          # (..., hs+2, ..., C, f, L)
    return y.reshape(y.shape[:-2] + (f * y.shape[-1],))


def unfold_halo(y: jnp.ndarray, f: int, axis: int) -> jnp.ndarray:
    """Inverse of :func:`fold_halo` on a conv OUTPUT: drop each slab's 2
    halo rows and splice the slabs back along `axis`."""
    lead, lanes = y.shape[:-1], y.shape[-1]
    y = y.reshape(lead + (f, lanes // f))
    hs2 = y.shape[axis]
    y = jax.lax.slice_in_dim(y, 1, hs2 - 1, axis=axis)
    y = jnp.moveaxis(y, -2, axis)          # (..., f, hs, ..., C, L)
    sh = list(y.shape)
    sh[axis:axis + 2] = [sh[axis] * sh[axis + 1]]
    return y.reshape(sh)


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

_SCOPED_VMEM_BUDGET = 13 * 2 ** 20


def _vmem_accounting(cout: int, h: int, cin: int, itemsize: int, form: str):
    """Shared scoped-VMEM byte accounting for a banded-conv cell: returns
    ``(fixed_bytes(qd, qh, sd), dot_bytes(qd, qh, nq))``. Both
    ``choose_tiling`` and the explicit-tiling fallback budget through
    these, so the two paths cannot drift (the r3 ADVICE finding: the
    legacy fallback used a pre-outroll formula that skipped the f32
    product blocks choose_tiling budgets after a real-chip 16.28M/16M
    OOM)."""
    n_bufs = 4 if form == "x3" else 2
    # per-dot A size = K / k_div: x3 contracts the full K at once,
    # outroll splits K by kw (3 dots), hband by (kw, rd) (9 dots whose
    # A operands are contiguous VMEM row-runs)
    k_div = {"x3": 1, "outroll": 3, "hband": 9}[form]
    n_dots = 1 if form == "x3" else 3
    # VMEM tiles pad the second-minor dim to the sublane multiple (16
    # for bf16's T(8,128)(2,1) packing, 8 for f32) and the minor dim to
    # 128 lanes; cin/cout sit second-minor in the x/out tiles.
    sub = 16 if itemsize == 2 else 8

    def spad(c):
        return -(-c // sub) * sub

    def lpad(c):
        return -(-c // LANES) * LANES

    def kn(qd, qh):
        return 3 * (qd + 2) * (qh + 2) * cin, qd * qh * cout

    def fixed_bytes(qd, qh, sd):
        k, n = kn(qd, qh)
        x_tiles = n_bufs * (sd + 2) * (h + 2) * spad(cin) * LANES * itemsize
        out_blocks = 2 * sd * h * spad(cout) * LANES * itemsize
        weights = 2 * spad(n) * lpad(k) * itemsize
        # d-boundary fix-up: the clamped-DMA realignment at idd 0/nd-1
        # reads a shifted (sd+1, h, cin, LANES) copy of the tile — a
        # live stack temporary (budgeted always: the stack allocator
        # sizes the worst path, and the r4 battery's 16.43M/16M OOM
        # showed un-budgeted full-tile temporaries are real)
        fixup = (sd + 1) * h * spad(cin) * LANES * itemsize
        return x_tiles + out_blocks + weights + fixup

    def dot_bytes(qd, qh, nq):
        # per-dot live temporaries: the A matrix counted TWICE (the
        # strided piece reads materialize before the lane concat and
        # both are live at the handoff), the f32 accumulator blocks —
        # x3 keeps one (N x nq*LANES) dot output, outroll/hband THREE
        # (one per kw band) — plus one more n-block for the current
        # dot's raw output before it folds into its accumulator
        k, n = kn(qd, qh)
        return (2 * spad(k // k_div) * nq * LANES * itemsize
                + (n_dots + 1) * spad(n) * nq * LANES * 4)

    return fixed_bytes, dot_bytes


def pick_nq(qd: int, qh: int, sd: int, cout: int, h: int, cin: int,
            itemsize: int, form: Optional[str] = None) -> int:
    """Largest lane batch nq whose dot temporaries fit the scoped-VMEM
    budget left over by the fixed tiles, for an EXPLICIT (qd, qh, sd)
    tiling — the same accounting choose_tiling uses for its search."""
    if form is None:
        form = os.environ.get("VALUES_TPU_BANDED_FORM", "outroll")
    fixed_bytes, dot_bytes = _vmem_accounting(cout, h, cin, itemsize, form)
    headroom = _SCOPED_VMEM_BUDGET - fixed_bytes(qd, qh, sd)
    n_hblk = h // qh
    for q in (16, 8, 4, 2, 1):
        if n_hblk % q == 0 and dot_bytes(qd, qh, q) <= headroom:
            return q
    return 1


def choose_tiling(cout: int, d: int, h: int, cin: int = 8,
                  itemsize: int = 2,
                  form: Optional[str] = None) -> Tuple[int, int, int, int]:
    """Pick (qd, qh, sd, nq): output block qd x qh with N = qd*qh*cout
    <= 128, the D superblock sd, and the lane-batch nq — such that the
    cell's SCOPED VMEM (double-buffered haloed x tiles [+ kw-roll
    variants for form="x3"] + output block + banded weights + the
    in-kernel A-matrix temporary) fits the 16M scoped-vmem limit with
    margin. The A temporary dominates at large nq/f32 — the r2 demo OOM
    came from budgeting activations only.

    Form-specific empirics (v5e, L1/L2 geometries, chained-scan):
    - "x3" favours square-ish blocks (least band waste
      (qd+2)(qh+2)/(qd*qh)): (4,4) measured 18.25 ms vs (2,4) untested
      ceiling at the L1 cin-8 conv.
    - "outroll" favours qd=2 blocks: the A build (the kernel's compute
      overhang over its own DMA floor) shrinks with ksub, and (2,4)
      beat (4,4) at BOTH cin 8 (16.8 vs 20.9 ms) and cin 16 (22.2 vs
      31.7 ms) despite the worse nominal band waste. It also needs no
      x3 scratch, freeing VMEM for sd=8..16 (less d-halo re-read).
    """
    if form is None:
        form = os.environ.get("VALUES_TPU_BANDED_FORM", "outroll")
    budget = _SCOPED_VMEM_BUDGET
    target = max(1, LANES // cout)

    def waste(qd, qh):
        return (qd + 2) * (qh + 2) / (qd * qh)

    candidates = []
    for qd in (1, 2, 4, 8, 16):
        if d % qd:
            continue
        for qh in (1, 2, 4, 8, 16):
            if h % qh or qd * qh > target:
                continue
            candidates.append((qd, qh))
    if form == "hband":
        # h-band-only form: qd is structurally 1 (kd runs as 3
        # accumulating dots over contiguous d-rows); widest qh first
        # (N = qh*cout)
        candidates = [(qd, qh) for qd, qh in candidates if qd == 1]
        candidates.sort(key=lambda q: -q[1])
    elif form == "outroll":
        # qd=2 first (measured; see docstring), then biggest N, least
        # waste
        candidates.sort(key=lambda q: (q[0] != 2, -q[0] * q[1],
                                       waste(*q)))
    else:
        # biggest N first, then least band waste
        candidates.sort(key=lambda q: (-q[0] * q[1], waste(*q)))
    # Shared byte accounting (sublane/lane padding; cin=8 bf16 occupies
    # DOUBLE its nominal bytes — omitting this caused a real-chip
    # scoped-vmem OOM (16.28M/16M) at the batch-128 L1 conv. Likewise
    # the f32 product blocks in dot_bytes.)
    fixed_bytes, dot_bytes = _vmem_accounting(cout, h, cin, itemsize, form)

    def plan(qd, qh):
        n_hblk = h // qh
        # outroll's A temporary is 3x smaller, so more of the budget can
        # go to the x tiles (bigger sd = less d-halo re-read: the (sd+2)
        # rows per sd-step read (sd+2)/sd of the input)
        fixed_cap = budget // 2 if form == "x3" else (3 * budget) // 4
        sd = d
        while sd > qd and (d % sd or fixed_bytes(qd, qh, sd) > fixed_cap):
            sd -= qd
        if d % sd:
            sd = qd
        nq = 1
        for q in (16, 8, 4, 2, 1):
            if (n_hblk % q == 0
                    and dot_bytes(qd, qh, q)
                    <= budget - fixed_bytes(qd, qh, sd)):
                nq = q
                break
        return sd, nq, fixed_bytes(qd, qh, sd) + dot_bytes(qd, qh, nq)

    for qd, qh in candidates:
        sd, nq, total = plan(qd, qh)
        if total <= budget:
            return qd, qh, sd, nq
    return None  # no tiling fits scoped VMEM (callers fall back to XLA)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _conv_kernel(*refs, cin_parts, cout, qd: int, qh: int, sd: int,
                 nq: int, h: int, d_total: int, w_item: int, out_dtype,
                 activation: str, has_prologue: bool, emit_stats: bool,
                 form: str = "x3"):
    """Banded-GEMM grouped conv cell with fused prologue/epilogue.

    - inputs arrive UNPADDED; (d, h) halos are assembled by boundary-aware
      row DMAs + in-VMEM zero fills (an XLA pad op costs a full extra
      HBM read+write of the activation — 42 ms/step in the r2 profile),
    - an optional second input is concatenated along each group's
      channels inside VMEM (fusing the U-Net skip concat),
    - optional prologue per (item, channel): act(x*scale - shift) with a
      per-channel activation slope (1 = identity, 0.01 = leaky, 0 = relu)
      — this is where the PREVIOUS layer's instance norm is applied
      (normalize+activation commute with max-pool, both monotone),
    - optional epilogue activation and per-(channel, lane) sum/sumsq
      side outputs (the next layer's instance-norm statistics).
    """
    n_parts = len(cin_parts)
    cin = sum(cin_parts)
    ri = 0
    x_refs = refs[ri:ri + n_parts]; ri += n_parts
    bw_ref = refs[ri]; ri += 1
    bb_ref = refs[ri]; ri += 1
    if has_prologue:
        scale_ref = refs[ri]; shift_ref = refs[ri + 1]
        slope_ref = refs[ri + 2]; ri += 3
    out_ref = refs[ri]; ri += 1
    if emit_stats:
        sum_ref = refs[ri]; sq_ref = refs[ri + 1]; ri += 2
    raw_vmem = refs[ri]; ri += 1
    x3_vmem = None
    if form == "x3":
        x3_vmem = refs[ri]; ri += 1
    sem = refs[ri]

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

    def x_dmas(l_ib, l_g, l_idd, l_slot):
        """ONE clamped DMA per input part (descriptor issue overhead at
        thousands of grid cells costed ~20 ms/step with per-halo-row
        copies). Interior cells read exactly [idd*sd-1, idd*sd+sd+1);
        boundary cells read a clamped window whose one-row misalignment
        is fixed up in VMEM after the wait."""
        copies = []
        off = 0
        for pi, (xr, cp) in enumerate(zip(x_refs, cin_parts)):
            csl = pl.ds(l_g * cp, cp)
            if nd == 1:
                copies.append(pltpu.make_async_copy(
                    xr.at[l_ib, :, :, csl, :],
                    raw_vmem.at[l_slot, pl.ds(1, sd), pl.ds(1, h),
                                pl.ds(off, cp)],
                    sem.at[l_slot, pi]))
            else:
                start = jnp.clip(l_idd * sd - 1, 0, d_total - (sd + 2))
                copies.append(pltpu.make_async_copy(
                    xr.at[l_ib, pl.ds(start, sd + 2), :, csl, :],
                    raw_vmem.at[l_slot, :, pl.ds(1, h), pl.ds(off, cp)],
                    sem.at[l_slot, pi]))
            off += cp
        return copies

    @pl.when(lin == 0)
    def _():
        for c in x_dmas(ib, g, idd, slot):
            c.start()

    @pl.when(nxt < total)
    def _():
        for c in x_dmas(n_ib, n_g, n_idd, 1 - slot):
            c.start()

    for c in x_dmas(ib, g, idd, slot):
        c.wait()

    if nd > 1:
        # boundary fix-ups: the clamped window is shifted one row at the
        # volume edges — restore alignment in VMEM, then zero-fill the
        # out-of-range halo row (SAME padding)
        @pl.when(idd == 0)
        def _():
            shifted = raw_vmem[slot, pl.ds(0, sd + 1), pl.ds(1, h)]
            raw_vmem[slot, pl.ds(1, sd + 1), pl.ds(1, h)] = shifted

        @pl.when(idd == nd - 1)
        def _():
            shifted = raw_vmem[slot, pl.ds(1, sd + 1), pl.ds(1, h)]
            raw_vmem[slot, pl.ds(0, sd + 1), pl.ds(1, h)] = shifted

    # the (h+2) halo columns are never DMA-written; zero them once per
    # VMEM slot (scratch persists across grid cells)
    @pl.when(lin <= 1)
    def _():
        raw_vmem[slot, :, 0] = jnp.zeros((sd + 2, cin, LANES),
                                         raw_vmem.dtype)
        raw_vmem[slot, :, h + 1] = jnp.zeros((sd + 2, cin, LANES),
                                             raw_vmem.dtype)

    if has_prologue:
        # previous layer's normalize+activation, applied to every real
        # row (halo rows are neighbours of the same items). Chunked over
        # d-rows: upcasting the WHOLE (sd+2, h, cin, LANES) tile to f32
        # in one expression materializes a ~5 MB stack temporary that
        # blew the 16M scoped-VMEM limit on-chip (16.43M at the L2
        # cin=16 h=32 sd=16 geometry, r4 battery); per-row slabs bound
        # the temp at h*cin*LANES*4 regardless of tiling.
        scale = scale_ref[0][None]             # (1, cin, LANES) f32
        shift = shift_ref[0][None]
        slope = slope_ref[0][None]

        def _prologue_row(r, carry):
            v = raw_vmem[slot, r, pl.ds(1, h)].astype(jnp.float32)
            v = v * scale - shift
            v = jnp.maximum(v, v * slope)
            raw_vmem[slot, r, pl.ds(1, h)] = v.astype(raw_vmem.dtype)
            return carry

        jax.lax.fori_loop(0, sd + 2, _prologue_row, 0, unroll=False)

    # out-of-range d-halo rows (clamped DMAs fetched a duplicate row)
    @pl.when(idd == 0)
    def _():
        raw_vmem[slot, 0, pl.ds(1, h)] = jnp.zeros((h, cin, LANES),
                                                   raw_vmem.dtype)

    @pl.when(idd == nd - 1)
    def _():
        raw_vmem[slot, sd + 1, pl.ds(1, h)] = jnp.zeros((h, cin, LANES),
                                                        raw_vmem.dtype)

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

    if form == "x3":
        # hoist the kw lane-shifts: build the 3 shifted/masked tile
        # variants ONCE per cell so the per-GEMM A build is pure
        # slices + concat. Item-boundary masks realize the SAME-padding
        # zeros.
        raw = raw_vmem[slot].reshape(rows, LANES)
        lane_w = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES),
                                          1) % w_item
        zero = jnp.zeros_like(raw)
        x3_vmem[0] = jnp.where(lane_w != 0, lane_roll(raw, 1),
                               zero).reshape(x3_vmem.shape[1:])
        x3_vmem[1] = jnp.where(lane_w != w_item - 1,
                               lane_roll(raw, LANES - 1),
                               zero).reshape(x3_vmem.shape[1:])

    # lane-batch nq output blocks per dot (chosen by choose_tiling
    # against the scoped-VMEM budget): a lone (128, K)@(K, 128) GEMM
    # engages only part of the chip's MXUs (measured 38% of peak); M=512+
    # reaches 84%. The A matrices of nq consecutive h-blocks concatenate
    # along lanes.

    def body(i, carry):
        acc_s, acc_q = carry
        d0 = (i // (n_hblk // nq)) * qd
        h0 = (i % (n_hblk // nq)) * (qh * nq)

        def piece(buf, kw_idx, q):
            return buf[kw_idx, pl.ds(d0, qd + 2),
                       pl.ds(h0 + q * qh, qh + 2), :, :].reshape(ksub,
                                                                 LANES)

        if form == "hband":
            # zero-copy h-band-only form (qd = 1, ROADMAP r4): band ONLY
            # in h, so every dot's A operand is ONE contiguous VMEM
            # row-run raw_vmem[slot, d0+rd, h0:h0+qh+2, :, :] — the
            # strided (qd+2, qh+2) gather that is outroll's compute
            # overhang disappears. Cost: kd becomes 3 accumulating dots
            # (per-rd weight column slices) and the nominal ceiling
            # drops to 3/(qh+2) of peak; kw rides the proven outroll
            # output rolls. Selected via VALUES_TPU_BANDED_FORM=hband
            # for the chip A/B that decides whether zero-copy beats the
            # lower ceiling.
            ksub_h = (qh + 2) * cin
            pr = [None, None, None]
            for rd in range(3):
                runs = [raw_vmem[slot, pl.ds(d0 + rd, 1),
                                 pl.ds(h0 + q * qh, qh + 2),
                                 :, :].reshape(ksub_h, LANES)
                        for q in range(nq)]
                a_mat = runs[0] if nq == 1 else jnp.concatenate(runs,
                                                               axis=1)
                for kw in range(3):
                    dsl = jax.lax.dot_general(
                        bw[:, (kw * 3 + rd) * ksub_h:
                           (kw * 3 + rd + 1) * ksub_h],
                        a_mat, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    pr[kw] = dsl if rd == 0 else pr[kw] + dsl
            n_rows = qh * cout
            lw = jax.lax.broadcasted_iota(
                jnp.int32, (n_rows, LANES), 1) % w_item
            zblk = jnp.zeros((n_rows, LANES), jnp.float32)
            for q in range(nq):
                p0 = pr[0][:, q * LANES:(q + 1) * LANES]
                p1 = pr[1][:, q * LANES:(q + 1) * LANES]
                p2 = pr[2][:, q * LANES:(q + 1) * LANES]
                out = (p1
                       + jnp.where(lw != 0, pltpu.roll(p0, 1, axis=1),
                                   zblk)
                       + jnp.where(lw != w_item - 1,
                                   pltpu.roll(p2, LANES - 1, axis=1),
                                   zblk) + bb)
                if emit_stats:
                    blk_f = out.reshape(qh, cout, LANES)
                    acc_s = acc_s + jnp.sum(blk_f, axis=0)
                    acc_q = acc_q + jnp.sum(blk_f * blk_f, axis=0)
                if activation == "leaky":
                    out = jnp.where(out > 0, out, 0.01 * out)
                elif activation == "relu":
                    out = jnp.maximum(out, 0.0)
                ob = out.astype(out_dtype).reshape(qh, cout, LANES)
                out_ref[0, d0, pl.ds(h0 + q * qh, qh), :, :] = ob
            return acc_s, acc_q

        if form == "outroll":
            # single-variant A (K = ksub, 3x smaller build) + 3
            # accumulating dots; the kw=0/2 lane shifts move to the f32
            # OUTPUT blocks (lane rolls commute with the K-contraction,
            # and masking the roll's wrap lanes realizes the same
            # item-boundary SAME-padding zeros as the x3 prebuild). The
            # in-kernel ablation (L1 geometry, batch 128) measured
            # 18.25 -> 16.8 ms: the A-build VMEM traffic is the banded
            # kernel's compute overhang over its own DMA floor.
            a_mat = jnp.concatenate([piece(raw_vmem, slot, q)
                                     for q in range(nq)], axis=1)
            pr = [jax.lax.dot_general(
                bw[:, kw * ksub:(kw + 1) * ksub], a_mat,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) for kw in range(3)]
            n_rows = qd * qh * cout
            lw = jax.lax.broadcasted_iota(
                jnp.int32, (n_rows, LANES), 1) % w_item
            zblk = jnp.zeros((n_rows, LANES), jnp.float32)
            for q in range(nq):
                p0 = pr[0][:, q * LANES:(q + 1) * LANES]
                p1 = pr[1][:, q * LANES:(q + 1) * LANES]
                p2 = pr[2][:, q * LANES:(q + 1) * LANES]
                out = (p1
                       + jnp.where(lw != 0, pltpu.roll(p0, 1, axis=1),
                                   zblk)
                       + jnp.where(lw != w_item - 1,
                                   pltpu.roll(p2, LANES - 1, axis=1),
                                   zblk) + bb)
                if emit_stats:
                    blk_f = out.reshape(qd, qh, cout, LANES)
                    acc_s = acc_s + jnp.sum(blk_f, axis=(0, 1))
                    acc_q = acc_q + jnp.sum(blk_f * blk_f, axis=(0, 1))
                if activation == "leaky":
                    out = jnp.where(out > 0, out, 0.01 * out)
                elif activation == "relu":
                    out = jnp.maximum(out, 0.0)
                ob = out.astype(out_dtype).reshape(qd, qh, cout, LANES)
                for dd in range(qd):
                    out_ref[0, d0 + dd, pl.ds(h0 + q * qh, qh),
                            :, :] = ob[dd]
            return acc_s, acc_q

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
        out = out + bb
        if emit_stats:
            # instance-norm statistics of the conv+bias output, reduced
            # over this block's (qd, qh, nq) positions in f32 registers
            blk_f = out.reshape(qd, qh, cout, nq, LANES)
            acc_s = acc_s + jnp.sum(blk_f, axis=(0, 1, 3))
            acc_q = acc_q + jnp.sum(blk_f * blk_f, axis=(0, 1, 3))
        # epilogue activation in f32 registers: a standalone
        # leaky-relu pass costs a full HBM read+write of the activation
        # (8.75 ms per 64^3 block in the r2 profile)
        if activation == "leaky":
            out = jnp.where(out > 0, out, 0.01 * out)
        elif activation == "relu":
            out = jnp.maximum(out, 0.0)
        out = out.astype(out_dtype)
        # the row order (dd, dh, co) makes each lane-block's full (N, 128)
        # output one contiguous (qd, qh, cout, 128) region per d-row
        for q in range(nq):
            blk = out[:, q * LANES:(q + 1) * LANES].reshape(
                qd, qh, cout, LANES)
            for dd in range(qd):
                out_ref[0, d0 + dd, pl.ds(h0 + q * qh, qh), :, :] = blk[dd]
        return acc_s, acc_q

    zeros_cl = jnp.zeros((cout, LANES), jnp.float32)
    acc_s, acc_q = jax.lax.fori_loop(
        0, (sd // qd) * (n_hblk // nq), body, (zeros_cl, zeros_cl),
        unroll=False)
    if emit_stats:
        # stats blocks are indexed (ib, g) only — revisited across idd,
        # accumulating the full (D, H, W) reduction
        @pl.when(idd == 0)
        def _():
            sum_ref[0] = acc_s
            sq_ref[0] = acc_q

        @pl.when(idd != 0)
        def _():
            sum_ref[0] = sum_ref[0] + acc_s
            sq_ref[0] = sq_ref[0] + acc_q


def conv3d_banded_packed(x: jnp.ndarray, kernel: jnp.ndarray,
                         bias: Optional[jnp.ndarray] = None,
                         groups: int = 1, *, w_item: int,
                         x2: Optional[jnp.ndarray] = None,
                         prologue: Optional[Tuple] = None,
                         tiling: Optional[Tuple[int, int, int]] = None,
                         activation: str = "none",
                         emit_stats: bool = False,
                         form: Optional[str] = None,
                         interpret: bool = False):
    """Grouped 3x3x3 SAME conv over batch-packed NDHCW activations.

    Args:
        x: (B/bp, D, H, G*Cin1, bp*W) packed activations (pack_ndhwc),
           UNPADDED (halos are assembled in-kernel).
        kernel: (3, 3, 3, Cin, G*Cout) grouped DHWIO weights, where
           Cin = Cin1 (+ Cin2 with x2).
        bias: (G*Cout,) or None.
        groups: feature_group_count (ensemble members).
        w_item: per-item W extent inside the 128 packed lanes.
        x2: optional second input, concatenated after x along each
           group's channels (the U-Net skip concat, fused).
        prologue: optional (scale, shift, slope) f32 maps of shape
           (B/bp, G*Cin, 128) applied as max(v, v*slope) with
           v = x*scale - shift before convolving (the previous layer's
           instance norm + activation).
        activation: fused epilogue ("none" | "leaky" | "relu").
        emit_stats: also return (sum, sumsq) f32 lane-resolved
           (B/bp, G*Cout, 128) statistics of the conv+bias output.

    Returns out, or (out, (sum, sumsq)) with emit_stats.
    """
    form_from_env = form is None
    if form is None:
        # A/B hook for the kernel-form benchmarks (scripts/bench_convs.py)
        form = os.environ.get("VALUES_TPU_BANDED_FORM", "outroll")
    nb, d, h, gc1, lanes = x.shape
    assert lanes == LANES, f"packed lane dim must be {LANES}, got {lanes}"
    cin1 = gc1 // groups
    cin2 = 0
    if x2 is not None:
        assert x2.shape[:3] == (nb, d, h) and x2.shape[4] == lanes
        cin2 = x2.shape[3] // groups
        if cin1 % 8 or cin2 % 8:
            # Mosaic DMAs sublane-slice in 8-aligned blocks; for tiny
            # (test-sized) channel counts concat in XLA instead —
            # production counts are 8-aligned and stay fused
            xg = x.reshape(nb, d, h, groups, cin1, lanes)
            x2g = x2.reshape(nb, d, h, groups, cin2, lanes)
            x = jnp.concatenate([xg, x2g], axis=4).reshape(
                nb, d, h, groups * (cin1 + cin2), lanes)
            x2 = None
            cin1, cin2 = cin1 + cin2, 0
    cin = cin1 + cin2
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
        if prologue is not None:
            sc, sh, sl = prologue
            def padmap(m, fill):
                mm = m.reshape(nb, groups, cin, lanes)
                mm = jnp.pad(mm, ((0, 0), (0, 0), (0, cin8 - cin), (0, 0)),
                             constant_values=fill)
                return mm.reshape(nb, groups * cin8, lanes)
            prologue = (padmap(sc, 1.0), padmap(sh, 0.0), padmap(sl, 1.0))
        cin1 = cin = cin8
    if tiling is not None:
        qd, qh, sd = tiling[:3]
        if len(tiling) > 3:
            nq = tiling[3]
        else:
            # legacy 3-tuple: pick the lane batch through the SAME
            # fixed_bytes/dot_bytes accounting choose_tiling budgets with
            # (covers both forms' real scoped-VMEM footprint)
            nq = pick_nq(qd, qh, sd, cout, h, cin, x.dtype.itemsize,
                         form=form)
    else:
        chosen = choose_tiling(cout, d, h, cin, x.dtype.itemsize, form=form)
        if chosen is None:
            raise ValueError(
                f"no VMEM-fitting banded tiling for cin={cin} "
                f"cout={cout} d={d} h={h} itemsize="
                f"{x.dtype.itemsize}; use the XLA conv path")
        qd, qh, sd, nq = chosen
    if form == "hband" and qd != 1:
        if form_from_env:
            # an explicit qd>1 tiling outranks the env A/B default —
            # run it under the production form instead of failing
            form = "outroll"
        else:
            raise ValueError(
                f"form='hband' bands only in h and requires qd=1 (got "
                f"qd={qd}); pass a (1, qh, sd[, nq]) tiling or let "
                "choose_tiling pick one")
    assert d % qd == 0 and h % qh == 0 and d % sd == 0 and sd % qd == 0
    assert (h // qh) % nq == 0, (
        f"nq={nq} must divide the h-block count {h // qh} "
        "(unwritten output blocks otherwise)")

    if bias is None:
        bias = jnp.zeros((groups * cout,), jnp.float32)
    bw = banded_weights(kernel, groups, qd, qh, dtype=x.dtype)
    bb = banded_bias(bias, groups, qd, qh)

    n = qd * qh * cout
    k = 3 * (qd + 2) * (qh + 2) * cin

    cin_parts = (cin1,) if x2 is None else (cin1, cin2)
    inputs = [x] + ([x2] if x2 is not None else [])
    in_specs = [pl.BlockSpec(memory_space=pl.ANY) for _ in inputs]
    in_specs += [
        pl.BlockSpec((1, n, k), lambda ib, g, idd: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, 1), lambda ib, g, idd: (g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = inputs + [bw, bb]
    has_prologue = prologue is not None
    if has_prologue:
        for m in prologue:
            assert m.shape == (nb, groups * cin, lanes), (
                m.shape, (nb, groups * cin, lanes))
            in_specs.append(pl.BlockSpec(
                (1, cin, lanes), lambda ib, g, idd: (ib, g, 0),
                memory_space=pltpu.VMEM))
            operands.append(m.astype(jnp.float32))

    out_shapes = [jax.ShapeDtypeStruct((nb, d, h, groups * cout, LANES),
                                       x.dtype)]
    out_specs = [pl.BlockSpec(
        (1, sd, h, cout, LANES),
        lambda ib, g, idd: (ib, idd, 0, g, 0),
        memory_space=pltpu.VMEM)]
    if emit_stats:
        for _ in range(2):
            out_shapes.append(jax.ShapeDtypeStruct(
                (nb, groups * cout, LANES), jnp.float32))
            out_specs.append(pl.BlockSpec(
                (1, cout, LANES), lambda ib, g, idd: (ib, g, 0),
                memory_space=pltpu.VMEM))

    grid = (nb, groups, d // sd)
    kernel_fn = functools.partial(
        _conv_kernel, cin_parts=cin_parts, cout=cout, qd=qd, qh=qh, sd=sd,
        nq=nq, h=h, d_total=d, w_item=w_item, out_dtype=x.dtype,
        activation=activation, has_prologue=has_prologue,
        emit_stats=emit_stats, form=form)

    scratch = [pltpu.VMEM((2, sd + 2, h + 2, cin, LANES), x.dtype)]  # raw
    if form == "x3":
        scratch.append(
            pltpu.VMEM((2, sd + 2, h + 2, cin, LANES), x.dtype))  # kw 0/2
    scratch.append(pltpu.SemaphoreType.DMA((2, len(cin_parts))))
    result = pl.pallas_call(
        kernel_fn,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if emit_stats else out_specs[0],
        out_shape=out_shapes if emit_stats else out_shapes[0],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            # one (N,K)@(K,128) GEMM per output block
            flops=2 * n * k * LANES * (nb * groups * (d // qd) * (h // qh)),
            bytes_accessed=2 * (x.size + (x2.size if x2 is not None else 0))
            * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(*operands)
    if emit_stats:
        out, ssum, ssq = result
        return out, (ssum, ssq)
    return result


# ---------------------------------------------------------------------------
# Differentiable wrapper (training path)
# ---------------------------------------------------------------------------

def _conv_packed_any(x: jnp.ndarray, kernel: jnp.ndarray,
                     bias: Optional[jnp.ndarray], groups: int,
                     w_item: int, interpret: bool) -> jnp.ndarray:
    """Packed grouped SAME conv via the banded kernel when a tiling
    exists, else XLA on the unpacked layout (used for backward-data
    convs whose per-group Cout is not 8-aligned, e.g. the first layer)."""
    nb, d, h, _, lanes = x.shape
    cout_pg = kernel.shape[4] // groups
    cin8 = max(8, -(-kernel.shape[3] // 8) * 8)
    tiling = (choose_tiling(cout_pg, d, h, cin8, x.dtype.itemsize)
              if (lanes == LANES and cout_pg % 8 == 0) else None)
    if tiling is not None:
        return conv3d_banded_packed(x, kernel, bias, groups,
                                    w_item=w_item, tiling=tiling,
                                    interpret=interpret)
    bp = lanes // w_item
    flat = unpack_ndhwc(x, bp)
    out = jax.lax.conv_general_dilated(
        flat, kernel, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=groups)
    if bias is not None:
        out = out + bias
    return pack_ndhwc(out, bp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _banded_packed_ad(groups, w_item, tiling, interpret, activation, x,
                      kernel, bias):
    return conv3d_banded_packed(x, kernel, bias, groups, w_item=w_item,
                                tiling=tiling, activation=activation,
                                interpret=interpret)


def _banded_packed_ad_fwd(groups, w_item, tiling, interpret, activation, x,
                          kernel, bias):
    y = conv3d_banded_packed(x, kernel, bias, groups, w_item=w_item,
                             tiling=tiling, activation=activation,
                             interpret=interpret)
    # the POST-activation output doubles as the activation residual:
    # leaky/relu preserve sign, so act'(pre) = 1 if y > 0 else slope
    return y, (x, kernel, y if activation != "none" else None)


def _banded_packed_ad_bwd(groups, w_item, tiling, interpret, activation,
                          res, dy):
    """Backward of the packed banded conv (+fused epilogue activation).

    - the activation derivative is recovered from the saved
      post-activation output (sign-preserving leaky/relu: y > 0 iff
      pre > 0), turning dy into d(conv+bias) with one fused elementwise,
    - dx is ITSELF a packed banded conv (same small-batch geometry as the
      forward — the whole reason training routes through this kernel):
      SAME conv of dy with the spatially flipped, per-group channel-
      transposed kernel.
    - dkernel is a batch-rich contraction (K = B*D*H*W): XLA's backward-
      weights conv handles it at full MXU efficiency at any batch, so it
      runs on the unpacked layout via jax.vjp of lax.conv.
    - dbias is a sum over everything but channels.
    """
    x, kernel, y_act = res
    if activation != "none":
        slope = jnp.asarray(0.01 if activation == "leaky" else 0.0,
                            dy.dtype)
        dy = jnp.where(y_act > 0, dy, slope * dy)
    return _banded_bwd_core(groups, w_item, interpret, x, kernel, dy)


def _banded_bwd_core(groups, w_item, interpret, x, kernel, dy):
    """Shared (dx, dkernel, dbias) of the packed banded conv given the
    pre-activation cotangent dy.

    VALUES_TPU_SKIP_DK=1 / VALUES_TPU_SKIP_DX=1 are MEASUREMENT-ONLY
    levers (scripts/bench_train_micro.py attribution A/B): they replace
    the corresponding gradient with zeros so its cost vanishes from the
    step. Training under them is silently wrong — never set outside a
    bench.
    """
    bias_dtype = kernel.dtype  # bias rides the same cast as the kernel
    cin = kernel.shape[3]
    cout = kernel.shape[4] // groups
    if os.environ.get("VALUES_TPU_SKIP_DX") == "1":
        dx = jnp.zeros(x.shape, x.dtype)
    else:
        km = kernel[::-1, ::-1, ::-1].reshape(3, 3, 3, cin, groups, cout)
        kb = jnp.transpose(km, (0, 1, 2, 5, 4, 3)).reshape(
            3, 3, 3, cout, groups * cin)
        dx = _conv_packed_any(dy, kb, None, groups, w_item, interpret)

    dk_impl = os.environ.get("VALUES_TPU_DK_IMPL", "unpack")
    if os.environ.get("VALUES_TPU_SKIP_DK") == "1":
        dk = jnp.zeros_like(kernel)
    elif dk_impl == "fake":
        # backward-weights DIRECTLY on the packed layout via a
        # fake-geometry XLA conv — see _dkernel_fakegeom. Kills the two
        # full-tensor unpack transposes the "unpack" path pays per conv
        # site, but measured SLOWER on v5e (r5 A/B: 51.8 vs 31.6 ms
        # bf16 batch-8 step): XLA's backward-weights emitter picks a
        # poor layout for the fake NDHCW geometry. Kept for A/B.
        dk = _dkernel_fakegeom(x, dy, kernel, groups, w_item)
    elif dk_impl == "packed":
        # experimental: contraction in the packed layout (see
        # _dkernel_packed). Measured SLOWER than the unpack path on v5e
        # r4 (step 64 vs 31 ms): every tap pays a materialization of the
        # shifted operand, and the one-time channel-major relayout runs
        # at ~20 GB/s (sublane-major transpose). Kept for A/B until a
        # fused Pallas dkernel kernel replaces both.
        dk = _dkernel_packed(x, dy, groups, w_item).astype(kernel.dtype)
    elif dk_impl == "unpack":
        # DEFAULT (r3, re-measured fastest r5): unpack both operands to
        # NDHWC and take XLA's backward-weights conv — 21.6 ms of the
        # 31 ms batch-8 step on v5e (bench_train_micro SKIP_DK A/B).
        # r5 floor probes close the search: an ideal pre-im2col'd dot
        # for this contraction runs 4.1-4.6 ms at the dominant site
        # regardless of operand layout or N (the chip feeds tall-skinny
        # dots at ~210 GB/s), XLA's conv is within 25% of that floor,
        # and a 4-spatial-dim conv on the packed layout (exact, zero
        # transposes) lowers 1.8x WORSE (9.5 ms vs 6.3 total here).
        # See ROADMAP "measured structural dead end".
        bp = LANES // w_item
        xu = unpack_ndhwc(x, bp)
        dyu = unpack_ndhwc(dy, bp)

        def conv_ref(k):
            return jax.lax.conv_general_dilated(
                xu, k, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                feature_group_count=groups)

        _, pullback = jax.vjp(conv_ref, kernel)
        dk, = pullback(dyu)
    else:
        raise ValueError(
            f"VALUES_TPU_DK_IMPL={dk_impl!r}: expected one of "
            "'fake', 'packed', 'unpack'")
    db = jnp.sum(dy.astype(jnp.float32),
                 axis=(0, 1, 2, 4)).astype(bias_dtype)
    return dx, dk, db


def _dkernel_fakegeom(x: jnp.ndarray, dy: jnp.ndarray,
                      kernel: jnp.ndarray, groups: int,
                      w_item: int) -> jnp.ndarray:
    """Backward-weights contraction on the packed layout via a
    FAKE-GEOMETRY conv: no unpack transposes at all.

    The packed tensor (nb, D, H, C, L) is handed to XLA's backward-
    weights conv as a real NDHWC-style operand with the LANE axis as a
    third spatial dim of extent L=bp*w_item (dimension numbers
    "NDHCW") — the contraction over (n, d, h, lane) has identical FLOP
    count to the true (b, d, h, w) one because nb*L = B*W. Two
    deviations from the true dkernel, both corrected exactly:

    - kw=+-1 taps pair lanes ACROSS item boundaries (item m's last
      column against item m+1's first), where the true conv sees SAME
      zero-padding. Those invalid pairs touch only the bp-1 interior
      boundary lanes, so the correction is a (kd, kh)-shifted
      contraction over (n, d, h, bp-1 lanes) — ~1/w_item of one tap's
      work — subtracted from the fake result.
    - the fake conv zero-pads lanes 0 and L-1, which IS the true
      padding of the outermost items' W edges: no correction needed.

    Replaces the r3 "unpack" path (two full-tensor sublane-major
    transposes + XLA conv, 21.6 ms of the 31 ms batch-8 train step on
    v5e) and the r4 "packed" einsum attempt (64 ms: per-tap operand
    materialization). Reference anchor for the workload this serves:
    hot loop #1 (unet3D_module.py:296-373, the training step).
    """
    nb, d, h, gci, lanes = x.shape
    gco = dy.shape[3]
    ci = gci // groups
    co = gco // groups
    assert lanes % w_item == 0, (lanes, w_item)
    bp = lanes // w_item

    def conv_fake(k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), "SAME",
            dimension_numbers=("NDHCW", "DHWIO", "NDHCW"),
            feature_group_count=groups)

    _, pullback = jax.vjp(conv_fake, kernel)
    dk_fake, = pullback(dy)
    dk = dk_fake.astype(jnp.float32).reshape(3, 3, 3, ci, groups, co)

    if bp > 1:
        # boundary lanes: m*w_item, m = 1..bp-1
        lm = np.arange(1, bp) * w_item
        xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0)))

        def corr(x_lanes, dy_lanes):
            xb = xpad[..., x_lanes].reshape(nb, d + 2, h + 2, groups,
                                            ci, len(x_lanes))
            db = dy[..., dy_lanes].reshape(nb, d, h, groups,
                                           co, len(dy_lanes))
            taps = [
                jnp.einsum("ndhgam,ndhgbm->gab",
                           xb[:, kd:kd + d, kh:kh + h], db,
                           preferred_element_type=jnp.float32)
                for kd in range(3) for kh in range(3)]
            # (3, 3, G, ci, co) -> (3, 3, ci, G, co)
            return jnp.stack(taps).reshape(
                3, 3, groups, ci, co).transpose(0, 1, 3, 2, 4)

        # kw=0 tap (shift -1): x[w-1]*dy[w] invalid at each item's w=0
        dk = dk.at[:, :, 0].add(-corr(lm - 1, lm))
        # kw=2 tap (shift +1): x[w+1]*dy[w] invalid at each item's last w
        dk = dk.at[:, :, 2].add(-corr(lm, lm - 1))

    return dk.reshape(3, 3, 3, ci, groups * co).astype(kernel.dtype)


def _dkernel_packed(x: jnp.ndarray, dy: jnp.ndarray, groups: int,
                    w_item: int) -> jnp.ndarray:
    """Backward-weights contraction DIRECTLY on the packed layout.

    dk[kd,kh,kw,ci,g*co] = sum_{b,d,h,w} x[b,d+kd-1,h+kh-1,w+kw-1,g,ci]
                                        * dy[b,d,h,w,g,co]

    In the packed layout (nb, D, H, G*C, bp*W) the D/H taps are zero-pad
    + slice and the W taps are a lane roll masked at each item's W-block
    edge — all fusable elementwise prologue for one
    (G, 3*3*3*Cin) x (N*D*H*L) -> (G, tap*Cin, Cout) reduction einsum
    that XLA runs at the HBM roofline. This replaces the r3 path
    (unpack x/dy to NDHWC + XLA backward-weights conv) that dominated
    the packed train step: 21.6 ms of 31 ms at batch 8 on v5e
    (scripts/bench_train_micro.py SKIP_DK A/B). FLOP count here equals
    one forward — the win is pure layout/traffic.
    """
    nb, d, h, gci, lanes = x.shape
    gco = dy.shape[3]
    ci = gci // groups
    co = gco // groups
    lane = jax.lax.broadcasted_iota(jnp.int32, (lanes,), 0)
    wpos = lane % w_item

    # ONE channel-major relayout per operand. After it, every tap's
    # contraction dims (n, d, h, l) are the minor-contiguous dims of
    # both operands, so each tap einsum is a plain (G*ci, K) x (K, G*co)
    # GEMM — XLA needs no per-tap transpose. (The first attempt einsum'd
    # the packed layout directly: XLA re-transposed x per (kd,kh) group
    # and the step went 31 -> 71 ms.)
    xT = jnp.moveaxis(x, 3, 0)        # (G*ci, nb, D, H, L)
    dyT = jnp.moveaxis(dy, 3, 0).reshape((groups, co, nb, d, h, lanes))
    xTp = jnp.pad(xT, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))

    def wshift(t, s):
        """t shifted so result[w] = t[w + s] within each item W-block."""
        if s == 0:
            return t
        rolled = jnp.roll(t, -s, axis=-1)
        if s > 0:       # result[w] = t[w+s]: last s positions invalid
            mask = wpos < (w_item - s)
        else:           # result[w] = t[w+s], s<0: first |s| invalid
            mask = wpos >= (-s)
        return rolled * mask.astype(t.dtype)

    taps = []
    for kd in range(3):
        for kh in range(3):
            xs = jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(xTp, kd, kd + d, axis=2),
                kh, kh + h, axis=3)
            xs = xs.reshape((groups, ci, nb, d, h, lanes))
            for kw in range(3):
                taps.append(jnp.einsum(
                    "gandhl,gbndhl->gab", wshift(xs, kw - 1), dyT,
                    preferred_element_type=jnp.float32))
    dk = jnp.stack(taps)                        # (27, G, ci, co)
    dk = jnp.moveaxis(dk, 1, 2)                 # (27, ci, G, co)
    return dk.reshape(3, 3, 3, ci, groups * co)


_banded_packed_ad.defvjp(_banded_packed_ad_fwd, _banded_packed_ad_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _banded_packed_ad_stats(groups, w_item, tiling, interpret, x, kernel,
                            bias):
    return conv3d_banded_packed(x, kernel, bias, groups, w_item=w_item,
                                tiling=tiling, emit_stats=True,
                                interpret=interpret)


def _banded_packed_ad_stats_fwd(groups, w_item, tiling, interpret, x,
                                kernel, bias):
    out = conv3d_banded_packed(x, kernel, bias, groups, w_item=w_item,
                               tiling=tiling, emit_stats=True,
                               interpret=interpret)
    y, _ = out
    return out, (x, kernel, y)


def _banded_packed_ad_stats_bwd(groups, w_item, tiling, interpret, res,
                                cts):
    """Backward of (conv, (sum, sumsq)): the stats outputs are plain
    (d, h, w)-sums of y and y^2 per (channel, lane), so their cotangents
    fold into dy elementwise — d_sum broadcasts, d_sumsq rides 2*y —
    and the rest is the shared conv backward. This is what lets the
    TRAINING forward get its instance-norm statistics from the kernel
    epilogue for free (VERDICT r3 item 5) instead of two standalone
    full-tensor reduction passes per norm site."""
    x, kernel, y = res
    dy, (ds1, ds2) = cts
    dy32 = (dy.astype(jnp.float32) + ds1[:, None, None]
            + 2.0 * y.astype(jnp.float32) * ds2[:, None, None])
    dy = dy32.astype(dy.dtype)
    return _banded_bwd_core(groups, w_item, interpret, x, kernel, dy)


_banded_packed_ad_stats.defvjp(_banded_packed_ad_stats_fwd,
                               _banded_packed_ad_stats_bwd)


def conv3d_banded_packed_ad_stats(x: jnp.ndarray, kernel: jnp.ndarray,
                                  bias: jnp.ndarray, groups: int = 1, *,
                                  w_item: int,
                                  tiling: Optional[Tuple] = None,
                                  interpret: bool = False):
    """Differentiable packed banded conv that ALSO returns the kernel
    epilogue's lane-resolved (sum, sumsq) f32 statistics of the
    pre-activation output — gradients flow through both (custom VJP).
    The training path's instance-norm consumes these instead of
    re-reducing the full tensor (see _banded_packed_ad_stats_bwd)."""
    tiling = tuple(tiling) if tiling is not None else None
    return _banded_packed_ad_stats(groups, w_item, tiling, interpret, x,
                                   kernel, bias)


def conv3d_banded_packed_ad(x: jnp.ndarray, kernel: jnp.ndarray,
                            bias: jnp.ndarray, groups: int = 1, *,
                            w_item: int,
                            tiling: Optional[Tuple] = None,
                            activation: str = "none",
                            interpret: bool = False) -> jnp.ndarray:
    """Differentiable :func:`conv3d_banded_packed` (training path,
    VERDICT r2 item 1): custom VJP pairing the packed forward with a
    packed backward-data conv and an XLA backward-weights contraction.
    The epilogue activation fuses too (its derivative is recovered from
    the post-activation output, so norm-less conv+act blocks cost zero
    extra HBM passes in training); skip-concat/prologue/stats fusions
    stay inference-only (training applies norms as jnp ops so autodiff
    composes)."""
    tiling = tuple(tiling) if tiling is not None else None
    return _banded_packed_ad(groups, w_item, tiling, interpret, activation,
                             x, kernel, bias)


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
