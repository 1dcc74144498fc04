"""Attribution of the staged headline pipeline's stats tail at the
batch-128 pool (r5): forward-only vs +C2 stats vs +Dice vs +C3
aggregations, each timed by the chained-scan best-of-3 protocol.

BENCH_r04: forward alone runs 822 vol/s (155.7 ms / 128 vols) but the
full pipeline lands at 631 vol/s — a ~47 ms/batch tail across the C2
statistics, the micro-Dice and the three aggregations of three maps.
This script splits that tail so the r5 optimization targets the right
op. Reference anchor for the workload: hot loops #2/#3
(test_3D.py:399-534, aggregate_uncertainties.py:13-96).

Run: python scripts/bench_tail.py [batch]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

REPEATS = 8
N_MEMBERS = 5
PATCH = 64
AGG_PATCH = 10
THRESHOLD = 0.3


def main():
    import jax
    import jax.numpy as jnp
    from values_tpu.models.ensemble_unet3d import (
        group_member_variables, make_grouped_ensemble_predictor)
    from values_tpu.models.unet3d import UNet3D
    from values_tpu.ops.aggregation import aggregate_all
    from values_tpu.ops.metrics import dice_stats, dice_from_stats
    from values_tpu.ops.uncertainty import fused_sample_statistics

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    base = UNet3D(num_classes=2, initial_filter_size=8)
    init = jax.jit(base.init)
    keys = jax.random.split(jax.random.PRNGKey(0), N_MEMBERS)
    stacked = group_member_variables(
        [init(k, jnp.zeros((1, PATCH, PATCH, PATCH, 1))) for k in keys])
    _, predictor = make_grouped_ensemble_predictor(
        2, N_MEMBERS, 8, dtype=jnp.bfloat16)

    rs = np.random.RandomState(0)
    vols = jnp.asarray(rs.rand(batch, PATCH, PATCH, PATCH, 1)
                       .astype(np.float32))
    gt = jnp.asarray((rs.rand(batch, PATCH, PATCH, PATCH) > 0.7)
                     .astype(np.uint8))

    def fwd_only(stacked_v, v, g, rng):
        stack, _ = predictor(stacked_v, v, rng)
        return stack[..., :1, 0, 0].astype(jnp.float32).sum()

    def fwd_stats(stacked_v, v, g, rng):
        stack, _ = predictor(stacked_v, v, rng)
        stats = fused_sample_statistics(stack.astype(jnp.float32),
                                        class_axis=-1)
        return (stats["pred_entropy"].sum()
                + stats["expected_entropy"].sum()
                + stats["mutual_information"].sum()
                + stats["mean_softmax"][..., 0].sum())

    def fwd_stats_dice(stacked_v, v, g, rng):
        stack, _ = predictor(stacked_v, v, rng)
        stats = fused_sample_statistics(stack.astype(jnp.float32),
                                        class_axis=-1)
        seg = jnp.argmax(stats["mean_softmax"], axis=-1).astype(jnp.int32)

        def per_volume_dice(s, gg):
            return dice_from_stats(*dice_stats(s, gg, ignore_index=0))
        dice = jax.vmap(per_volume_dice)(seg, g)
        return (dice.sum() + stats["pred_entropy"].sum()
                + stats["expected_entropy"].sum()
                + stats["mutual_information"].sum())

    def full(stacked_v, v, g, rng):
        stack, _ = predictor(stacked_v, v, rng)
        stats = fused_sample_statistics(stack.astype(jnp.float32),
                                        class_axis=-1)
        seg = jnp.argmax(stats["mean_softmax"], axis=-1).astype(jnp.int32)

        def per_volume_dice(s, gg):
            return dice_from_stats(*dice_stats(s, gg, ignore_index=0))
        dice = jax.vmap(per_volume_dice)(seg, g)
        rows = [dice]
        for unc in (stats["pred_entropy"], stats["expected_entropy"],
                    stats["mutual_information"]):
            agg = aggregate_all(unc, patch=AGG_PATCH, threshold=THRESHOLD)
            rows.extend([agg["patch_level"], agg["image_level"],
                         agg["threshold"]])
        return jnp.stack(rows).sum()

    def agg_only(stacked_v, v, g, rng):
        # aggregations on a synthetic map (no forward): 3 maps like full
        unc = v[..., 0] * 0.3
        s = jnp.float32(0.0)
        for shift in (0.0, 0.1, 0.2):
            agg = aggregate_all(unc + shift, patch=AGG_PATCH,
                                threshold=THRESHOLD)
            s = s + (agg["patch_level"].sum() + agg["image_level"].sum()
                     + agg["threshold"].sum())
        return s

    rng = jax.random.PRNGKey(7)
    for name, fn in (("fwd_only", fwd_only), ("fwd+stats", fwd_stats),
                     ("fwd+stats+dice", fwd_stats_dice),
                     ("full_pipeline", full), ("agg_only_3maps", agg_only)):
        @jax.jit
        def chained(stacked_v, v, g, key, fn=fn):
            def body(carry, i):
                s = fn(stacked_v, v + carry * jnp.float32(1e-30), g,
                       jax.random.fold_in(key, i))
                return s.astype(jnp.float32) * jnp.float32(1e-30), s
            _, out = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(REPEATS))
            return out

        out = np.asarray(chained(stacked, vols, gt, rng))
        assert np.all(np.isfinite(out)), (name, out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chained(stacked, vols, gt, rng))
            best = min(best, time.perf_counter() - t0)
        ms = best / REPEATS * 1e3
        print(f"{name:<16s} {ms:8.1f} ms/batch  "
              f"{batch / (ms / 1e3):7.1f} vol/s", flush=True)


if __name__ == "__main__":
    main()
