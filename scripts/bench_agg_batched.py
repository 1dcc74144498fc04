"""A/B: per-map vs stacked C3 aggregation inside the staged headline step.

bench_tail.py (r5, v5e) attributes ~18 ms/batch of the batch-128 XLA
pipeline to the three aggregate_all calls (3 maps x 3 separable cumsum
passes + max/threshold/sum reductions) and ~12 ms to the C2 statistics.
This probe measures whether stacking the three uncertainty maps into one
(3B, D, H, W) aggregate_all call (one fused program over 3x the batch
instead of three map-serial programs) recovers any of it, holding the
rest of the step identical. Reference anchor for the workload: hot loop
#3 (aggregate_uncertainties.py:13-96).

Run: python scripts/bench_agg_batched.py [batch]
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

    def head(stacked_v, v, g, rng):
        stack, _ = predictor(stacked_v, v, rng)
        stats = fused_sample_statistics(stack.astype(jnp.float32),
                                        class_axis=-1)
        seg = jnp.argmax(stats["mean_softmax"], axis=-1).astype(jnp.int32)

        def per_volume_dice(s, gg):
            return dice_from_stats(*dice_stats(s, gg, ignore_index=0))
        dice = jax.vmap(per_volume_dice)(seg, g)
        return dice, (stats["pred_entropy"], stats["expected_entropy"],
                      stats["mutual_information"])

    def step_permap(stacked_v, v, g, rng):
        dice, maps = head(stacked_v, v, g, rng)
        rows = [dice]
        for unc in maps:
            agg = aggregate_all(unc, patch=AGG_PATCH, threshold=THRESHOLD)
            rows.extend([agg["patch_level"], agg["image_level"],
                         agg["threshold"]])
        return jnp.stack(rows)

    def step_stacked(stacked_v, v, g, rng):
        dice, maps = head(stacked_v, v, g, rng)
        tri = jnp.concatenate(maps, axis=0)  # (3B, D, H, W)
        agg = aggregate_all(tri, patch=AGG_PATCH, threshold=THRESHOLD)
        rows = [dice]
        for i in range(3):
            sl = slice(i * dice.shape[0], (i + 1) * dice.shape[0])
            rows.extend([agg["patch_level"][sl], agg["image_level"][sl],
                         agg["threshold"][sl]])
        return jnp.stack(rows)

    def step_linear(stacked_v, v, g, rng):
        # Exploit MI = PE - EE through the LINEAR aggregations: stack only
        # PE/EE (2B) for the cumsum box filter and image sums, derive MI's
        # box sums / image sums by subtraction (exact up to f32 rounding).
        # threshold_mean is nonlinear -> all three maps, but it's one
        # cheap elementwise pass.
        from values_tpu.ops.aggregation import (box_filter_sum,
                                                image_level_sum,
                                                threshold_mean)
        dice, maps = head(stacked_v, v, g, rng)
        pe, ee, mi = maps
        duo = jnp.concatenate([pe, ee], axis=0)  # (2B, D, H, W)
        box = box_filter_sum(duo, (AGG_PATCH,) * 3, (1, 2, 3))
        b = pe.shape[0]
        box_pe, box_ee = box[:b], box[b:]
        box_mi = box_pe - box_ee
        img = image_level_sum(duo)
        img_pe, img_ee = img[:b], img[b:]
        img_mi = img_pe - img_ee
        rows = [dice]
        for bx, im, unc in ((box_pe, img_pe, pe), (box_ee, img_ee, ee),
                            (box_mi, img_mi, mi)):
            rows.extend([jnp.max(bx.reshape(b, -1), axis=-1), im,
                         threshold_mean(unc, THRESHOLD)])
        return jnp.stack(rows)

    rng = jax.random.PRNGKey(7)
    outs = {}
    for name, fn in (("per_map", step_permap), ("stacked", step_stacked),
                     ("linear", step_linear)):
        @jax.jit
        def chained(stacked_v, v, g, key, fn=fn):
            def body(carry, i):
                s = fn(stacked_v, v + carry * jnp.float32(1e-30), g,
                       jax.random.fold_in(key, i))
                return s[0, 0] * jnp.float32(1e-30), s
            _, out = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(REPEATS))
            return out

        out = np.asarray(chained(stacked, vols, gt, rng))
        assert np.all(np.isfinite(out)), name
        outs[name] = out
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chained(stacked, vols, gt, rng))
            best = min(best, time.perf_counter() - t0)
        ms = best / REPEATS * 1e3
        print(f"{name:<8s} {ms:8.1f} ms/batch  "
              f"{batch / (ms / 1e3):7.1f} vol/s", flush=True)
    np.testing.assert_allclose(outs["per_map"], outs["stacked"],
                               rtol=1e-5, atol=1e-6)
    # linear derives MI's box/image sums by subtraction: exact in real
    # arithmetic, f32-rounding different (cancellation when the MI box sum
    # is small) -> looser band.
    np.testing.assert_allclose(outs["per_map"], outs["linear"],
                               rtol=1e-4, atol=5e-3)
    print("exactness: stacked == per_map (rtol 1e-5); "
          "linear == per_map (rtol 1e-4 / atol 5e-3)")


if __name__ == "__main__":
    main()
