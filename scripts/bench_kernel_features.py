"""A/B the v2 kernel features on one conv shape (64^3, C40->C40, g5,
batch 128 packed): plain vs +prologue vs +stats vs split-input.
Chained-scan timing like bench_convs.py."""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from values_tpu.ops.pallas.conv3d import LANES, conv3d_banded_packed

REPEATS = 8


def timed(name, fn, *args):
    @jax.jit
    def chained(*args):
        def body(carry, i):
            xs = list(args)
            xs[0] = xs[0] + (carry * 1e-30).astype(xs[0].dtype)
            out = fn(*xs)
            out = out[0] if isinstance(out, tuple) else out
            s = jnp.ravel(out)[0].astype(jnp.float32)
            return s, s
        _, scalars = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(REPEATS))
        return scalars

    out = np.asarray(chained(*args))
    assert np.all(np.isfinite(out))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:<28s} {best / REPEATS * 1e3:8.2f} ms", flush=True)


def main():
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    g, cg, w = 5, 8, 64
    nb, d, h = 64, 64, 64
    key = jax.random.PRNGKey(0)
    x = (jax.random.uniform(key, (nb, d, h, g * cg, LANES), jnp.float32)
         .astype(jnp.bfloat16))
    x2 = x + 1.0
    k1 = (jax.random.uniform(key, (3, 3, 3, cg, g * cg)) * 0.05
          ).astype(jnp.bfloat16)
    k2 = (jax.random.uniform(key, (3, 3, 3, 2 * cg, g * cg)) * 0.05
          ).astype(jnp.bfloat16)
    bias = jnp.zeros((g * cg,), jnp.float32)
    ones = jnp.ones((nb, g * cg, LANES), jnp.float32)
    maps1 = (ones, ones * 0.1, ones * 0.01)
    ones2 = jnp.ones((nb, 2 * g * cg, LANES), jnp.float32)
    maps2 = (ones2, ones2 * 0.1, ones2 * 0.01)
    print(f"device={jax.devices()[0]}")

    conv = functools.partial(conv3d_banded_packed, groups=g, w_item=w)
    timed("plain", lambda a, kk: conv(a, kk, bias), x, k1)
    timed("epilogue leaky", lambda a, kk: conv(a, kk, bias,
                                               activation="leaky"), x, k1)
    timed("prologue", lambda a, kk: conv(a, kk, bias, prologue=maps1),
          x, k1)
    timed("stats", lambda a, kk: conv(a, kk, bias, emit_stats=True), x, k1)
    timed("prologue+stats", lambda a, kk: conv(a, kk, bias, prologue=maps1,
                                               emit_stats=True), x, k1)
    timed("split", lambda a, kk: conv(a, kk, bias, x2=x2), x, k2)
    timed("split+prologue", lambda a, kk: conv(a, kk, bias, x2=x2,
                                               prologue=maps2), x, k2)


if __name__ == "__main__":
    main()
