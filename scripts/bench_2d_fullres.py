"""Real-scale 2D measurement (VERDICT r2 item 8): HRNet-W48 inference at
the GTA/Cityscapes production geometry on the real chip.

Two regimes (reference: test_2D.py:273-319 runs whole 256x478 images;
preprocess_gta_cityscapes.py:47-182 center-crops 1024x1912 then resizes
x0.25):

1. whole-image forward at 256x478 (the shipped inference input),
   batch 1 / 4 / 8, bf16;
2. full-resolution 1024x1912 sliding-window inference (window2d
   semantics: 256x478 windows, 0.5 overlap, count-averaged stitching).

Prints img/s (chained-scan, best of 3 — same protocol as bench.py) and
the chip's peak HBM after each regime.

Run: python scripts/bench_2d_fullres.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

H_INF, W_INF = 256, 478
H_FULL, W_FULL = 1024, 1912
NUM_CLASSES = 24
REPEATS = 4


def hbm_peak():
    import jax
    stats = jax.devices()[0].memory_stats() or {}
    return stats.get("peak_bytes_in_use", 0) / 2**30


def main():
    import jax
    import jax.numpy as jnp
    from values_tpu.config import compose
    from values_tpu.config.instantiate import instantiate

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1]
                          / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    cfg = compose(Path(__file__).resolve().parents[1] / "configs",
                  "gta_softmax_config", ["MODEL.PRETRAINED=False"])
    model = instantiate(cfg.model.to_container())
    print(f"device={jax.devices()[0]} HRNet-W48 {NUM_CLASSES} classes")

    rng = jax.random.PRNGKey(0)
    x_init = jnp.zeros((1, H_INF, W_INF, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, x_init)
    n_params = sum(np.prod(v.shape) for v in
                   jax.tree_util.tree_leaves(variables["params"]))
    print(f"params: {n_params / 1e6:.1f}M  "
          f"HBM after init: {hbm_peak():.2f} GiB")

    import functools

    def make_chained(batch):
        @jax.jit
        def fwd(variables, x):
            out = model.apply(variables, x, train=False)
            return jax.nn.softmax(out, axis=-1)

        @jax.jit
        def chained(variables, x):
            def body(carry, i):
                xi = x + carry * jnp.float32(1e-30)
                p = fwd(variables, xi)
                return p[0, 0, 0, 0].astype(jnp.float32), ()
            return jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(REPEATS))[0]
        return chained

    rs = np.random.RandomState(0)
    for batch in (1, 4, 8):
        x = jnp.asarray(rs.rand(batch, H_INF, W_INF, 3).astype(np.float32))
        chained = make_chained(batch)
        np.asarray(chained(variables, x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chained(variables, x))
            best = min(best, time.perf_counter() - t0)
        ips = batch * REPEATS / best
        print(f"whole-image {H_INF}x{W_INF} batch={batch}: "
              f"{best / REPEATS * 1e3:8.1f} ms/batch  {ips:6.1f} img/s  "
              f"peak HBM {hbm_peak():.2f} GiB", flush=True)

    # full-res sliding window (window2d path, --sliding_window semantics)
    from values_tpu.inference.window2d import SlidingPredictor2D
    predictor = SlidingPredictor2D(model, (H_INF, W_INF), NUM_CLASSES,
                                   overlap=0.5)
    x_full = rs.rand(H_FULL, W_FULL, 3).astype(np.float32)
    out = predictor(variables, x_full, rng)
    assert out.shape == (H_FULL, W_FULL, NUM_CLASSES), out.shape
    assert np.all(np.isfinite(out))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        predictor(variables, x_full, rng)
        best = min(best, time.perf_counter() - t0)
    print(f"sliding-window {H_FULL}x{W_FULL} (win {H_INF}x{W_INF}, "
          f"overlap 0.5): {best * 1e3:8.1f} ms/img  {1 / best:6.2f} img/s  "
          f"peak HBM {hbm_peak():.2f} GiB", flush=True)


if __name__ == "__main__":
    main()
