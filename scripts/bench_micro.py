"""Microbenchmarks for the grouped-ensemble forward's component ops on
real TPU: per-level grouped convs, instance norms, pools. Identifies
where the forward's wall time goes (roofline attribution), since xplane
trace parsing is unavailable in this container.

Timing protocol matches scripts/bench_convs.py: lax.scan chains REPEATS
executions inside one compiled program with scalar feedback so steps
serialize; wall / REPEATS = ms per execution.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16 = 197e12
PEAK_HBM = 819e9   # v5e GB/s
REPEATS = 8


def timed(name, fn, *args, flops=0, bytes_moved=0):
    @jax.jit
    def chained(*args):
        def body(carry, i):
            out = fn(*jax.tree_util.tree_map(
                lambda a: a + carry * jnp.asarray(1e-30, a.dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, args))
            s = jnp.ravel(out)[0].astype(jnp.float32)
            return s, s
        _, scalars = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(REPEATS))
        return scalars

    out = np.asarray(chained(*args))
    assert np.all(np.isfinite(out)), (name, out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(*args))
        best = min(best, time.perf_counter() - t0)
    ms = best / REPEATS * 1e3
    cols = [f"{name:<34s} {ms:8.3f} ms"]
    if flops:
        cols.append(f"{flops / (ms / 1e3) / 1e12:6.1f} TF/s "
                    f"({100 * flops / (ms / 1e3) / PEAK_BF16:4.1f}%)")
    if bytes_moved:
        cols.append(f"{bytes_moved / (ms / 1e3) / 1e9:6.0f} GB/s "
                    f"({100 * bytes_moved / (ms / 1e3) / PEAK_HBM:4.0f}%)")
    print("  ".join(cols), flush=True)
    return ms


def _rand(shape, dtype=jnp.bfloat16, scale=1.0):
    """Generate test tensors ON DEVICE (multi-GB host uploads hang the
    relay tunnel)."""
    key = jax.random.PRNGKey(hash(shape) % (2 ** 31))
    return (jax.random.uniform(key, shape, jnp.float32) * scale).astype(dtype)


def main():
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    members = 5
    print(f"device={jax.devices()[0]} batch={batch}")

    # ---- per-level grouped 3x3x3 convs (bf16, NDHWC, feature groups) ----
    levels = [
        # (spatial, cin_group, cout_group)
        (64, 1, 8), (64, 8, 8), (64, 16, 8),
        (32, 8, 16), (32, 16, 16), (32, 32, 16),
        (16, 16, 32), (16, 32, 32),
        (8, 32, 64), (8, 64, 64),
    ]
    for sp, cig, cog in levels:
        ci, co = cig * members, cog * members
        x = _rand((batch, sp, sp, sp, ci))
        w = _rand((3, 3, 3, cig, co), scale=0.01)

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME", feature_group_count=members,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        fl = 2 * batch * sp ** 3 * 27 * cig * co
        by = batch * sp ** 3 * (ci + co) * 2
        timed(f"conv {sp}^3 g5 {cig}->{cog} (C{ci}->{co})", conv, x, w,
              flops=fl, bytes_moved=by)

    # ---- instance norm + leaky relu at the two big levels ----
    for sp, c in ((64, 40), (64, 80), (32, 80)):
        x = _rand((batch, sp, sp, sp, c))

        def inorm(x):
            xf = x.astype(jnp.float32)
            m = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
            v = jnp.var(xf, axis=(1, 2, 3), keepdims=True)
            y = (xf - m) * jax.lax.rsqrt(v + 1e-5)
            return jax.nn.leaky_relu(y).astype(jnp.bfloat16)
        by = batch * sp ** 3 * c * 2 * 3  # ~2 reads + 1 write
        timed(f"inorm+lrelu {sp}^3 C{c}", inorm, x, bytes_moved=by)

    # ---- copy roofline: how fast can we even stream these tensors? ----
    for sp, c in ((64, 40), (64, 128)):
        x = _rand((batch, sp, sp, sp, c))
        timed(f"copy(x*1.0001) {sp}^3 C{c}", lambda x: x * 1.0001, x,
              bytes_moved=batch * sp ** 3 * c * 2 * 2)

    # ---- maxpool 2^3 ----
    x = _rand((batch, 64, 64, 64, 40))
    timed("maxpool2 64^3 C40", lambda x: jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1),
        "VALID"), x, bytes_moved=batch * (64 ** 3 + 32 ** 3) * 40 * 2)


if __name__ == "__main__":
    main()
