"""Backward-weights (dkernel) formulation probes — the round-5 battery
behind ROADMAP's "<=25 ms train-step target: measured structural dead
end".

The packed training step's dominant cost is the backward-weights
contraction dk[kd,kh,kw,ci,co] = sum over (batch, d, h, w) positions of
x_shifted * dy (reference anchor: the training hot loop,
unet3D_module.py:296-373). At the dominant full-res site (packed
x (4, 64, 64, 8, 128) bf16, ci=co=8) this measures, best-of-3
chained-scan like every bench in this repo:

1. the current default: unpack both operands to NDHWC + XLA's
   backward-weights conv, counted with and without the two unpack
   transposes;
2. the 4-spatial-dim alternative: lanes split (bp, W) by a free
   reshape, conv over spatial (D, H, P, W) with kernel extent 1 on P —
   the EXACT dkernel with zero transposes (plus a P-first kernel-spec
   variant);
3. the formulation floor: a pre-materialized ideal im2col dot
   A x B -> (216, 8) at K = 2.1M positions, in both operand layouts
   and at N = 8/32/128.

Round-5 v5e results (ms at this site): unpack conv 5.14, unpack total
6.30, 4-spatial 9.46 / 10.08, ideal dot 4.11-4.55 (N-independent,
~210 GB/s operand feed — the MXU stream binds, not HBM). Conclusion:
XLA's conv is within 25% of the ideal-dot floor and every
transpose-free formulation is slower; see ROADMAP for the full table.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

REPEATS = 8


def _timed(name, chained, *args):
    out = np.asarray(chained(*args))
    assert np.all(np.isfinite(out)), name
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:48s} {best / REPEATS * 1e3:7.2f} ms")


def main():
    import jax
    import jax.numpy as jnp

    nb, bp, W = 4, 2, 64
    d = h = 64
    ci, co, G = 8, 8, 1
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(nb, d, h, G * ci, bp, W).astype(
        np.float32)).astype(jnp.bfloat16)
    dy = jnp.asarray(rs.rand(nb, d, h, G * co, bp, W).astype(
        np.float32)).astype(jnp.bfloat16)
    k4 = jnp.asarray(rs.rand(3, 3, 1, 3, ci, G * co).astype(
        np.float32)).astype(jnp.bfloat16)
    k3 = jnp.squeeze(k4, 2)
    print(f"device={jax.devices()[0]} L1 site: packed "
          f"x ({nb},{d},{h},{G * ci},{bp}x{W}) bf16")

    def scan8(fn):
        @jax.jit
        def chained(*args):
            def body(carry, i):
                s = fn(carry, *args)
                return (s * 1e-30).astype(jnp.float32), s
            return jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(REPEATS))[1]
        return chained

    # --- 1. unpack path: transposes + XLA backward-weights conv -------
    def unpack_dk(x, dy, with_transposes):
        if with_transposes:
            xu = jnp.transpose(x, (0, 4, 1, 2, 5, 3)).reshape(
                nb * bp, d, h, W, G * ci)
            dyu = jnp.transpose(dy, (0, 4, 1, 2, 5, 3)).reshape(
                nb * bp, d, h, W, G * co)
        else:
            xu, dyu = x, dy

        def conv(k):
            return jax.lax.conv_general_dilated(
                xu, k, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                feature_group_count=G)

        _, pb = jax.vjp(conv, k3)
        dk, = pb(dyu)
        return dk.astype(jnp.float32).sum()

    xu0 = jnp.transpose(x, (0, 4, 1, 2, 5, 3)).reshape(
        nb * bp, d, h, W, G * ci)
    dyu0 = jnp.transpose(dy, (0, 4, 1, 2, 5, 3)).reshape(
        nb * bp, d, h, W, G * co)
    _timed("unpack conv only (pre-unpacked operands)",
           scan8(lambda c, a, b: unpack_dk(
               (a + c).astype(jnp.bfloat16), b, False)), xu0, dyu0)
    _timed("unpack TOTAL (2 transposes + conv)",
           scan8(lambda c, a, b: unpack_dk(
               (a + c).astype(jnp.bfloat16), b, True)), x, dy)

    # --- 2. 4-spatial-dim conv on the packed layout (exact, 0 copies) -
    def bpw_dk(x, dy, kern_spec):
        def conv(kk):
            return jax.lax.conv_general_dilated(
                x, kk, (1, 1, 1, 1),
                ((1, 1), (1, 1), (0, 0), (1, 1)) if kern_spec == "DHPW"
                else ((0, 0), (1, 1), (1, 1), (1, 1)),
                dimension_numbers=("NDHCPW",
                                   "DHPWIO" if kern_spec == "DHPW"
                                   else "PDHWIO", "NDHCPW"),
                feature_group_count=G)

        kk = k4 if kern_spec == "DHPW" else jnp.moveaxis(k4, 2, 0)
        _, pb = jax.vjp(conv, kk)
        dk, = pb(dy)
        return dk.astype(jnp.float32).sum()

    # correctness once: 4-spatial dkernel == unpack dkernel
    def _dk4(xx, yy):
        def conv(kk):
            return jax.lax.conv_general_dilated(
                xx, kk, (1, 1, 1, 1), ((1, 1), (1, 1), (0, 0), (1, 1)),
                dimension_numbers=("NDHCPW", "DHPWIO", "NDHCPW"),
                feature_group_count=G)
        _, pb = jax.vjp(conv, k4)
        return pb(yy)[0]

    def _dk3(xx, yy):
        def conv(kk):
            return jax.lax.conv_general_dilated(
                xx, kk, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                feature_group_count=G)
        _, pb = jax.vjp(conv, k3)
        return pb(yy)[0]

    np.testing.assert_allclose(
        np.asarray(jax.jit(_dk4)(x, dy).astype(jnp.float32)).squeeze(2),
        np.asarray(jax.jit(_dk3)(xu0, dyu0).astype(jnp.float32)),
        rtol=2e-2, atol=1e-2)
    _timed("4-spatial (D,H,P,W) conv, DHPW kernel spec",
           scan8(lambda c, a, b: bpw_dk(
               (a + c).astype(jnp.bfloat16), b, "DHPW")), x, dy)
    _timed("4-spatial (D,H,P,W) conv, PDHW kernel spec",
           scan8(lambda c, a, b: bpw_dk(
               (a + c).astype(jnp.bfloat16), b, "PDHW")), x, dy)

    # --- 3. formulation floor: ideal pre-im2col'd dots ----------------
    K = nb * bp * d * h * W
    A_km = jnp.asarray(rs.rand(K, 27 * ci).astype(np.float32)).astype(
        jnp.bfloat16)
    A_mk = jnp.asarray(rs.rand(27 * ci, K).astype(np.float32)).astype(
        jnp.bfloat16)
    for N in (8, 32, 128):
        B = jnp.asarray(rs.rand(K, N).astype(np.float32)).astype(
            jnp.bfloat16)
        _timed(f"ideal dot A(K,216) x B(K,{N})",
               scan8(lambda c, a, b: jax.lax.dot_general(
                   (a + c).astype(jnp.bfloat16), b,
                   (((0,), (0,)), ((), ())),
                   preferred_element_type=jnp.float32).sum()), A_km, B)
    B8 = jnp.asarray(rs.rand(K, 8).astype(np.float32)).astype(
        jnp.bfloat16)
    _timed("ideal dot A(216,K) lane-major x B(K,8)",
           scan8(lambda c, a, b: jax.lax.dot_general(
               (a + c).astype(jnp.bfloat16), b,
               (((1,), (0,)), ((), ())),
               preferred_element_type=jnp.float32).sum()), A_mk, B8)


if __name__ == "__main__":
    main()
