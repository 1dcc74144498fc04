"""Streaming sampled-softmax statistics kernel (the aleatoric tail).

The aleatoric-logit-sampling families (reference test_3D.py:458-469:
S = members x n_samples softmax draws of logits = mu + sigma*eps) are
bandwidth- and PRNG-bound when expressed as an XLA ``fori_loop``: every
sample re-reads (mu, sigma) and the accumulator carry through HBM, and
each eps draw pays threefry's ~20-round bit generation. This kernel
keeps a ``(sd, H, C, lanes)`` tile of (mu, sigma) resident in VMEM and
runs the whole S-sample loop on the VPU:

- bits come from the TPU's hardware PRNG (``pltpu.prng_random_bits``,
  ~free) — or, under ``interpret=True`` (CPU tests) and
  ``bits_source="counter"``, from a stateless integer-hash generator
  that is reproducible OUTSIDE the kernel, so the full pipeline is
  exactly testable without TPU hardware,
- normals via Acklam's inverse-CDF approximation (|z| rel. err
  < 1.2e-9; log/sqrt/rational polynomials only — no VPU trig),
- softmax + the NaN-guard-equivalent entropy accumulate into
  per-tile (sum_p, sum_ent) f32 accumulators that cross HBM once.

HBM traffic per volume drops from O(S) passes to ONE read of
(mu, sigma) + one accumulator write. The statistical contract matches
``values_tpu.inference.scoring``'s streaming XLA path (eps ~ N(0,1)
i.i.d. per sample/voxel; identical softmax/entropy math); draws are not
bitwise-equal across backends, same caveat as the engine
(scoring.py make_packed_aleatoric_scorer docstring).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


# ---------------------------------------------------------------------------
# Normal draws from uint32 bits (shared by kernel + test oracle)
# ---------------------------------------------------------------------------

def uniform_from_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 bits -> f32 uniform strictly inside (0, 1): the top 24 bits
    give u in [2^-25, 1 - 2^-25], keeping log(u) and log1p(-u) finite."""
    top = jax.lax.shift_right_logical(
        bits.astype(jnp.uint32), jnp.uint32(8)).astype(jnp.int32)
    return top.astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 25))


def inverse_normal_cdf(u: jnp.ndarray) -> jnp.ndarray:
    """Acklam's rational approximation of the standard normal inverse CDF
    (relative error < 1.15e-9) using only log/sqrt/polynomials — the VPU
    has no trig, which rules out Box-Muller."""
    a = (-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00)
    b = (-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00)
    d = (7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00)
    plow = 0.02425

    q = u - 0.5
    r = q * q
    central = (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4])
               * r + a[5]) * q / (
        ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1.0)

    # tails (evaluated everywhere, selected by where — branch-free VPU)
    ql = jnp.sqrt(-2.0 * jnp.log(jnp.minimum(u, 0.5)))
    lower = (((((c[0] * ql + c[1]) * ql + c[2]) * ql + c[3]) * ql + c[4])
             * ql + c[5]) / (
        (((d[0] * ql + d[1]) * ql + d[2]) * ql + d[3]) * ql + 1.0)
    qh = jnp.sqrt(-2.0 * jnp.log(jnp.minimum(1.0 - u, 0.5)))
    upper = -(((((c[0] * qh + c[1]) * qh + c[2]) * qh + c[3]) * qh + c[4])
              * qh + c[5]) / (
        (((d[0] * qh + d[1]) * qh + d[2]) * qh + d[3]) * qh + 1.0)

    return jnp.where(u < plow, lower,
                     jnp.where(u > 1.0 - plow, upper, central))


def counter_bits(seed: jnp.ndarray, salt: jnp.ndarray,
                 shape: Tuple[int, ...]) -> jnp.ndarray:
    """Stateless counter-based uint32 bits: murmur3-finalizer hash of
    (seed, salt, flat index). Reproducible inside AND outside the kernel
    (pure jnp) — the CPU-test bits source; real runs use the hardware
    PRNG."""
    n = 1
    for s in shape:
        n *= s
    idx = jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 1)
    # mix all leading dims into the counter so every element is distinct
    stride = 1
    for axis in range(len(shape) - 1, -1, -1):
        if axis < len(shape) - 1:
            idx = idx + jax.lax.broadcasted_iota(
                jnp.uint32, shape, axis) * jnp.uint32(stride)
        stride *= shape[axis]
    x = idx ^ (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
    x = x + salt.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B)
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ jax.lax.shift_right_logical(x, jnp.uint32(16))
    return x


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _entropy_terms(logits: jnp.ndarray, class_axis: int):
    """softmax + per-voxel entropy from logits, numerically stable:
    log p = logits - lse, so p*log p never underflows through log(p) —
    the same values as scoring._guarded_plogp on the softmax output
    (0*log 0 -> 0 in the limit) without the NaN round-trip."""
    m = jnp.max(logits, axis=class_axis, keepdims=True)
    e = jnp.exp(logits - m)
    se = jnp.sum(e, axis=class_axis, keepdims=True)
    p = e / se
    logp = (logits - m) - jnp.log(se)
    ent = -jnp.sum(p * logp, axis=class_axis)
    return p, ent


def _sample_stats_kernel(seed_ref, mu_ref, sig_ref, sump_ref, sument_ref,
                         *, n_samples: int, hw_prng: bool):
    im = pl.program_id(2)  # member index — innermost, output revisited
    # program ids must be evaluated OUTSIDE the fori_loop body (inside,
    # they survive as primitives in the loop jaxpr and have no lowering)
    salt = ((pl.program_id(0) * pl.num_programs(1)
             + pl.program_id(1)) * pl.num_programs(2) + im)
    if hw_prng:
        # Mosaic's prng_set_seed takes at most 2 values: fold the full
        # (batch, d-block, member) grid position into one salt word.
        pltpu.prng_seed(seed_ref[0], salt)
    mu = mu_ref[0, :, :, 0]     # (sd, H, C, lanes) f32
    sig = sig_ref[0, :, :, 0]
    seed0 = seed_ref[0]

    def draw(i):
        if hw_prng:
            return pltpu.bitcast(pltpu.prng_random_bits(mu.shape),
                                 jnp.uint32)
        return counter_bits(seed0 + i, salt, mu.shape)

    def body(i, carry):
        acc_p, acc_e = carry
        z = inverse_normal_cdf(uniform_from_bits(draw(i)))
        p, ent = _entropy_terms(mu + sig * z, class_axis=-2)
        return acc_p + p, acc_e + ent

    acc_p = jnp.zeros(mu.shape, jnp.float32)
    acc_e = jnp.zeros(mu.shape[:2] + mu.shape[3:], jnp.float32)
    acc_p, acc_e = jax.lax.fori_loop(0, n_samples, body, (acc_p, acc_e))

    @pl.when(im == 0)
    def _():
        sump_ref[0] = acc_p
        sument_ref[0, :, :, 0] = acc_e

    @pl.when(im > 0)
    def _():
        sump_ref[0] += acc_p
        sument_ref[0, :, :, 0] += acc_e


def sampled_softmax_stats(mu: jnp.ndarray, sigma: jnp.ndarray,
                          seed: jnp.ndarray, *, n_samples: int,
                          sd: Optional[int] = None,
                          interpret: bool = False,
                          bits_source: Optional[str] = None
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sum_softmax, sum_entropy) over members x n_samples aleatoric
    draws, streamed in VMEM.

    Args:
        mu, sigma: (nb, D, H, M, C, lanes) packed member heads (f32).
        seed: int32 scalar; per-(batch, d-block, member) streams are
            derived inside the kernel.
        n_samples: draws per member.
        sd: D-block rows per grid cell (default: largest divisor of D
            keeping the six live tiles within ~8 MB of VMEM).
        bits_source: "hw" (default on TPU) or "counter" (forced under
            interpret — the hardware PRNG has no CPU lowering).

    Returns:
        sum_p (nb, D, H, C, lanes) f32 and sum_ent (nb, D, H, lanes) f32,
        consumable by ``values_tpu.inference.scoring.streaming_finalize``
        with ``n = M * n_samples``.
    """
    nb, d, h, m, c, lanes = mu.shape
    assert lanes == LANES, mu.shape
    # the member axis stays a SEPARATE block dim (blocked at 1): folding
    # it into the class axis would make the second-to-minor block dim c
    # out of m*c, which Mosaic only allows when c is a multiple of 8 or
    # the whole axis — real heads have c ~ 2..5 (caught on-chip, r4)
    mu2 = mu.astype(jnp.float32)
    sig2 = sigma.astype(jnp.float32)
    if bits_source is None:
        bits_source = "counter" if interpret else "hw"
    hw_prng = bits_source == "hw"

    if sd is None:
        # Budget calibrated on-chip (r4): Mosaic's scoped-VMEM stack for
        # this kernel runs ~5x the naive six-live-tile estimate (the
        # fori_loop body's temporaries are not folded), so 2 MB on the
        # estimate keeps the real allocation under the 16 MB limit
        # (sd=16 -> 30.8M OOM, sd=8 -> 27.5M OOM, sd=4 -> fits, at
        # d=h=64, c=2).
        budget = 2 * 2 ** 20
        tile = lambda s: 6 * s * h * c * LANES * 4
        sd = d
        while sd > 1 and (d % sd or tile(sd) > budget):
            sd -= 1
    assert d % sd == 0, (d, sd)

    grid = (nb, d // sd, m)
    kernel = functools.partial(_sample_stats_kernel, n_samples=n_samples,
                               hw_prng=hw_prng)
    sum_p, sum_ent = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, sd, h, 1, c, LANES),
                         lambda ib, idd, im: (ib, idd, 0, im, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sd, h, 1, c, LANES),
                         lambda ib, idd, im: (ib, idd, 0, im, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, sd, h, c, LANES),
                         lambda ib, idd, im: (ib, idd, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sd, h, 1, LANES),
                         lambda ib, idd, im: (ib, idd, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, d, h, c, LANES), jnp.float32),
            jax.ShapeDtypeStruct((nb, d, h, 1, LANES), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32).reshape(1), mu2, sig2)
    return sum_p, sum_ent[:, :, :, 0]


def sampled_softmax_stats_reference(mu, sigma, seed, *, n_samples: int,
                                    sd: int):
    """Pure-jnp oracle reproducing the kernel's counter-bits pipeline
    bit-for-bit (CPU tests): same per-(batch, d-block, member) salts,
    same draws, same accumulation order."""
    nb, d, h, m, c, lanes = mu.shape
    n_db = d // sd
    sum_p = jnp.zeros((nb, d, h, c, lanes), jnp.float32)
    sum_e = jnp.zeros((nb, d, h, lanes), jnp.float32)
    seed = jnp.asarray(seed, jnp.int32)
    for ib in range(nb):
        for idd in range(n_db):
            rows = slice(idd * sd, (idd + 1) * sd)
            for im in range(m):
                salt = jnp.asarray((ib * n_db + idd) * m + im, jnp.int32)
                mu_t = mu[ib, rows, :, im].astype(jnp.float32)
                sig_t = sigma[ib, rows, :, im].astype(jnp.float32)
                for i in range(n_samples):
                    bits = counter_bits(seed + i, salt, mu_t.shape)
                    z = inverse_normal_cdf(uniform_from_bits(bits))
                    p, ent = _entropy_terms(mu_t + sig_t * z,
                                            class_axis=-2)
                    sum_p = sum_p.at[ib, rows].add(p)
                    sum_e = sum_e.at[ib, rows].add(ent)
    return sum_p, sum_e
