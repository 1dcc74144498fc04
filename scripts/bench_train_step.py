"""Training-step throughput on the real chip: f32 vs bf16 mixed
precision x XLA vs packed conv backend (UNet3D softmax config geometry:
batch 8, 64^3, filters 8, Dice+CE, Adam). Staged batch + lax.scan
chaining (the relay tunnel adds multi-hundred-ms per dispatch; the scan
amortizes it like bench.py). Also prints training MFU from the analytic
conv FLOP count (VERDICT r2 item 1a).

Run: python scripts/bench_train_step.py [batch]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

REPEATS = 8


def main():
    import jax
    import jax.numpy as jnp
    from values_tpu.config import make_config
    from values_tpu.training.experiment import Experiment

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rs = np.random.RandomState(0)
    data = jnp.asarray(rs.rand(batch, 64, 64, 64, 1).astype(np.float32))
    seg = jnp.asarray((rs.rand(batch, 64, 64, 64) > 0.5).astype(np.int32))
    print(f"device={jax.devices()[0]} batch={batch} 64^3 f8 Dice+CE Adam")

    # analytic FLOPs: forward conv MACs of UNet3D f8 at 64^3 per volume,
    # x3 for fwd + bwd-data + bwd-weights (standard training cost model)
    FWD_GFLOP_PER_VOL = 7.54  # 37.7 GFLOP / 5 members (bench.py model)
    # bf16 peak TFLOP/s per chip by family (public spec sheets); MFU is
    # meaningless against the wrong peak, so unknown devices fall back
    # to v5e and say so in the printed label
    dev = str(jax.devices()[0]).lower()
    peaks = {"v6e": 918.0, "v5p": 459.0, "v5e": 197.0,
             "v5 lite": 197.0, "v4": 275.0}
    peak_tf = next((p for k, p in peaks.items() if k in dev), 197.0)

    for precision, backend in (("32", "xla"), ("bf16", "xla"),
                               ("32", "packed"), ("bf16", "packed")):
        cfg = make_config({
            "model": {"_target_": "values_tpu.models.unet3d.UNet3D",
                      "num_classes": 2, "initial_filter_size": 8},
            "datamodule": {"ignore_index": 0},
            "learning_rate": 1e-4, "precision": precision, "seed": 1,
            "train_backend": backend,
        })
        exp = Experiment(cfg)
        state = exp.init_state(jax.random.PRNGKey(0), 64, 1)

        import functools

        @functools.partial(jax.jit, donate_argnums=(0,))
        def steps(state, data, seg, rng):
            def body(st, i):
                st, loss = exp.train_step_fn(
                    st, {"data": data, "seg": seg},
                    jax.random.fold_in(rng, i), False)
                return st, loss
            return jax.lax.scan(body, state, jnp.arange(REPEATS))

        rng = jax.random.PRNGKey(1)
        state, losses = steps(state, data, seg, rng)
        jax.block_until_ready(losses)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            state, losses = steps(state, data, seg, rng)
            np.asarray(losses)
            best = min(best, time.perf_counter() - t0)
        ms = best / REPEATS * 1e3
        step_tflop = 3 * FWD_GFLOP_PER_VOL * batch / 1e3
        mfu = step_tflop / (ms / 1e3) / peak_tf
        print(f"precision={precision:<5s} backend={backend:<7s} "
              f"{ms:8.1f} ms/step  {batch / (ms / 1e3):7.1f} vol/s  "
              f"train_mfu={mfu:.3f}  "
              f"final_loss={float(losses[-1]):.4f}", flush=True)


if __name__ == "__main__":
    main()
