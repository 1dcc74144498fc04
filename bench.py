"""Headline benchmark: LIDC-style ensemble-5 entropy inference,
volumes/sec/chip (BASELINE.json north star).

Workload per volume (the complete per-volume pipeline of the reference,
fused on device):

- 5-member UNet3D(2 classes, 8 filters) deep-ensemble forward on a 64^3
  volume (the shipped LIDC geometry: one sliding window per volume),
  lowered to grouped convolutions (members fused into the channel
  dimension, values_tpu.models.ensemble_unet3d) in bfloat16 with float32
  softmax/statistics,
- C2: mean softmax + PE / EE / MI reduced over the sample axis,
- segmentation argmax + micro Dice (ignore_index=0) against an uploaded GT,
- C3: patch-level box-filter max (window 10), image-level sum and
  threshold-mean aggregation for each of the three uncertainty maps.

Only per-volume scalars (Dice + 9 aggregation scores) leave the chip; the
per-voxel maps stay on device end to end. This is the TPU-native redesign
of the reference's hot loops #2 and #3 (test_3D.py:399-534 — 5 sequential
f64 forwards per volume with per-window H2D/D2H and CPU scatter-adds;
aggregate_uncertainties.py:13-96 — scipy box filters over full volumes).

``vs_baseline`` divides by an *estimated* reference throughput on A100
(the reference publishes no numbers — SURVEY.md §6): ensemble-5 float64
inference (model.double(), test_3D.py:425) at ~25 GFLOP/volume on A100's
9.7 TFLOP/s FP64 with a generous 50% conv efficiency, plus ~5 ms/volume of
transfer + host numpy accumulation + scipy aggregation => ~90 volumes/s.
This deliberately over-credits the reference; replace with a measured A100
number when that hardware is available.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

REFERENCE_A100_VOLUMES_PER_SEC = 90.0

N_MEMBERS = 5
PATCH = 64
BATCH = 128        # volumes per device batch
N_VOLUMES = 2048   # benchmark total
WARMUP_BATCHES = 2
AGG_PATCH = 10     # reference patch_level_aggregation window
THRESHOLD = 0.3

# VALUES_TPU_BENCH_SMOKE=1: CPU-runnable integration check — tiny
# geometry, one dispatch per measure, and LOUD auxiliary failures
# (collected into the JSON, nonzero exit). The driver runs the real
# bench unattended on the chip; the smoke mode proves every measurement
# code path executes BEFORE a tunnel window gets spent on it. Timings
# produced under smoke are meaningless and flagged as such.
SMOKE = os.environ.get("VALUES_TPU_BENCH_SMOKE") == "1"
if SMOKE:
    PATCH = 16
    BATCH = 8
    N_VOLUMES = 32
    WARMUP_BATCHES = 1
N_TIMING = 1 if SMOKE else 3
SMOKE_FAILURES: list = []


def build_workload():
    import jax
    import jax.numpy as jnp
    from values_tpu.models.ensemble_unet3d import (
        group_member_variables, make_grouped_ensemble_predictor)
    from values_tpu.models.unet3d import UNet3D
    from values_tpu.ops.metrics import dice_stats, dice_from_stats
    from values_tpu.ops.uncertainty import fused_sample_statistics

    base = UNet3D(num_classes=2, initial_filter_size=8)
    init = jax.jit(base.init)
    keys = jax.random.split(jax.random.PRNGKey(0), N_MEMBERS)
    stacked = group_member_variables(
        [init(k, jnp.zeros((1, PATCH, PATCH, PATCH, 1))) for k in keys])
    _, grouped_predictor = make_grouped_ensemble_predictor(
        2, N_MEMBERS, 8, dtype=jnp.bfloat16)

    from values_tpu.ops.aggregation import UNC_KEYS, aggregate_all_maps

    @jax.jit
    def step(stacked_variables, volumes, gt, rng):
        # bf16 softmax stack stays in HBM; statistics upcast to f32
        # elementwise (XLA fuses the cast into the reductions)
        softmax_stack, _ = grouped_predictor(stacked_variables, volumes, rng)
        stats = fused_sample_statistics(
            softmax_stack.astype(jnp.float32), class_axis=-1)
        seg = jnp.argmax(stats["mean_softmax"], axis=-1).astype(jnp.int32)

        def per_volume_dice(s, g):
            return dice_from_stats(*dice_stats(s, g, ignore_index=0))
        dice = jax.vmap(per_volume_dice)(seg, gt)

        rows = [dice]
        # linear C3 aggregation: MI's box/image sums derived from PE/EE
        # (scripts/bench_agg_batched.py A/B; VALUES_TPU_AGG_LINEAR=0 reverts)
        aggs = aggregate_all_maps({k: stats[k] for k in UNC_KEYS},
                                  patch=AGG_PATCH, threshold=THRESHOLD)
        for key in UNC_KEYS:
            agg = aggs[key]
            rows.extend([agg["patch_level"], agg["image_level"],
                         agg["threshold"]])
        return jnp.stack(rows)  # (10, B) scalars per batch

    import functools

    @functools.partial(jax.jit, static_argnames=("repeats",))
    def run_pool(stacked_variables, vol_pool, gt_pool, rng, repeats=1):
        """lax.scan over K staged batches (cycled ``repeats`` times) inside
        ONE compiled program — dispatch overhead amortizes over the whole
        pool."""
        k = vol_pool.shape[0]

        def body(carry, i):
            vols = jax.lax.dynamic_index_in_dim(vol_pool, i % k, 0,
                                                keepdims=False)
            gt = jax.lax.dynamic_index_in_dim(gt_pool, i % k, 0,
                                              keepdims=False)
            return carry, step(stacked_variables, vols, gt, carry)
        _, scores = jax.lax.scan(body, rng,
                                 jnp.arange(k * repeats, dtype=jnp.int32))
        return scores  # (K*repeats, 10, B)

    return step, run_pool, stacked


def build_workload_packed():
    """The same per-volume pipeline with EVERYTHING in the batch-packed
    lane layout (VERDICT r2 item 2): packed forward -> packed softmax +
    PE/EE/MI -> packed Dice -> packed C3 aggregations. No unpack
    transposes anywhere — only the (10, B) scalars leave the layout.
    This is the production `values_tpu.inference.scoring` API."""
    import jax
    import jax.numpy as jnp
    from values_tpu.inference.scoring import make_packed_scorer
    from values_tpu.models.ensemble_unet3d import group_member_variables
    from values_tpu.models.unet3d import UNet3D

    base = UNet3D(num_classes=2, initial_filter_size=8)
    init = jax.jit(base.init)
    keys = jax.random.split(jax.random.PRNGKey(0), N_MEMBERS)
    stacked = group_member_variables(
        [init(k, jnp.zeros((1, PATCH, PATCH, PATCH, 1))) for k in keys])
    score, _ = make_packed_scorer(N_MEMBERS, PATCH, agg_patch=AGG_PATCH,
                                  threshold=THRESHOLD)
    step = jax.jit(score)

    import functools

    @functools.partial(jax.jit, static_argnames=("repeats",))
    def run_pool(stacked_variables, vol_pool, gt_pool, rng, repeats=1):
        k = vol_pool.shape[0]

        def body(carry, i):
            vols = jax.lax.dynamic_index_in_dim(vol_pool, i % k, 0,
                                                keepdims=False)
            gt = jax.lax.dynamic_index_in_dim(gt_pool, i % k, 0,
                                              keepdims=False)
            return carry, step(stacked_variables, vols, gt, carry)
        _, scores = jax.lax.scan(body, rng,
                                 jnp.arange(k * repeats, dtype=jnp.int32))
        return scores

    return step, run_pool, stacked


def build_workload_hybrid():
    """XLA grouped convs + packed C2/C3 consumers (r4): at the staged
    batch-128 pool XLA's batch-minor conv layouts win the forward while
    the packed consumers keep the stats tail in the lane layout — one
    pack transpose of the final logits instead of unpacked statistics
    (the r2 tail) or the banded kernel at a batch where it loses."""
    import jax
    import jax.numpy as jnp
    from values_tpu.inference.scoring import make_hybrid_scorer
    from values_tpu.models.ensemble_unet3d import group_member_variables
    from values_tpu.models.unet3d import UNet3D

    base = UNet3D(num_classes=2, initial_filter_size=8)
    init = jax.jit(base.init)
    keys = jax.random.split(jax.random.PRNGKey(0), N_MEMBERS)
    stacked = group_member_variables(
        [init(k, jnp.zeros((1, PATCH, PATCH, PATCH, 1))) for k in keys])
    score, _ = make_hybrid_scorer(2, N_MEMBERS, PATCH,
                                  initial_filter_size=8,
                                  agg_patch=AGG_PATCH,
                                  threshold=THRESHOLD)
    step = jax.jit(score)

    import functools

    @functools.partial(jax.jit, static_argnames=("repeats",))
    def run_pool(stacked_variables, vol_pool, gt_pool, rng, repeats=1):
        k = vol_pool.shape[0]

        def body(carry, i):
            vols = jax.lax.dynamic_index_in_dim(vol_pool, i % k, 0,
                                                keepdims=False)
            gt = jax.lax.dynamic_index_in_dim(gt_pool, i % k, 0,
                                              keepdims=False)
            return carry, step(stacked_variables, vols, gt, carry)
        _, scores = jax.lax.scan(body, rng,
                                 jnp.arange(k * repeats, dtype=jnp.int32))
        return scores

    return step, run_pool, stacked


USEFUL_FLOPS_PER_VOLUME = 37.7e9   # fwd convs+transpose-convs, ensemble-5
PEAK_BF16 = 197e12                 # v5e


def measure_streaming_aleatoric(batch: int = 32) -> float:
    """The heaviest sampling C1 family: aleatoric deep ensemble,
    5 members x 10 logit samples per volume (reference loop
    test_3D.py:458-469 runs this volume-serially in f64). The streaming
    packed scorer accumulates the 50 softmax samples in O(1) memory, so
    the whole batch stays resident; volumes/sec by the same chained-scan
    best-of-3 protocol as the headline. The Pallas sampling-tail kernel
    (sampler="auto" -> "pallas" on TPU) is cross-checked against the XLA
    sampler on a small batch first — a statistical mismatch falls back
    to XLA rather than timing a wrong kernel."""
    import sys
    import jax
    import jax.numpy as jnp
    from values_tpu.inference.scoring import make_packed_aleatoric_scorer
    from values_tpu.models.ensemble_unet3d import group_member_variables
    from values_tpu.models.unet3d import UNet3D

    base = UNet3D(num_classes=2, initial_filter_size=8,
                  aleatoric_loss=True)
    init = jax.jit(base.init)
    keys = jax.random.split(jax.random.PRNGKey(0), N_MEMBERS)
    stacked = group_member_variables(
        [init(k, jnp.zeros((1, PATCH, PATCH, PATCH, 1))) for k in keys])

    sampler = "auto"
    try:
        rs0 = np.random.RandomState(11)
        v0 = jnp.asarray(rs0.rand(4, PATCH, PATCH, PATCH, 1)
                         .astype(np.float32))
        g0 = jnp.asarray((rs0.rand(4, PATCH, PATCH, PATCH) > 0.7)
                         .astype(np.uint8))
        rows = {}
        for s in ("pallas", "xla"):
            fn, _ = make_packed_aleatoric_scorer(
                N_MEMBERS, PATCH, n_aleatoric_samples=10,
                agg_patch=AGG_PATCH, threshold=THRESHOLD, sampler=s)
            rows[s] = np.asarray(fn(stacked, v0, g0,
                                    jax.random.PRNGKey(2)))
        # dice (row 0) near-deterministic; entropy sums (rows 2, 5)
        # within MC noise of 50 draws
        ok = (np.allclose(rows["pallas"][0], rows["xla"][0], atol=0.05)
              and np.allclose(rows["pallas"][2], rows["xla"][2],
                              rtol=0.05)
              and np.allclose(rows["pallas"][5], rows["xla"][5],
                              rtol=0.05))
        if not ok:
            print("pallas sampler cross-check FAILED; timing the XLA "
                  "sampler instead", file=sys.stderr)
            sampler = "xla"
    except Exception as exc:  # pragma: no cover - defensive bench path
        print(f"pallas sampler cross-check errored ({exc!r}); timing "
              "the XLA sampler", file=sys.stderr)
        sampler = "xla"

    score, _ = make_packed_aleatoric_scorer(
        N_MEMBERS, PATCH, n_aleatoric_samples=10, agg_patch=AGG_PATCH,
        threshold=THRESHOLD, sampler=sampler)
    step = jax.jit(score)
    rs = np.random.RandomState(3)
    vols = jnp.asarray(rs.rand(batch, PATCH, PATCH, PATCH, 1)
                       .astype(np.float32))
    gt = jnp.asarray((rs.rand(batch, PATCH, PATCH, PATCH) > 0.7)
                     .astype(np.uint8))
    rng = jax.random.PRNGKey(0)
    import functools

    @functools.partial(jax.jit, static_argnames=("repeats",))
    def chained(stacked_v, v, g, key, repeats=4):
        def body(carry, _):
            return jax.random.fold_in(carry, 1), step(stacked_v, v, g,
                                                      carry)
        _, out = jax.lax.scan(body, key, None, length=repeats)
        return out

    np.asarray(chained(stacked, vols, gt, rng))  # warm
    best = float("inf")
    for _ in range(N_TIMING):
        t0 = time.perf_counter()
        np.asarray(chained(stacked, vols, gt, rng))
        best = min(best, time.perf_counter() - t0)
    return 4 * batch / best


def measure_streaming_ssn(batch: int = 16, n_pred: int = 10) -> float:
    """SSN deep-ensemble scoring throughput (reference loop
    test_3D.py:361-396): packed grouped trunk + streaming per-member
    low-rank-MVN sampling, n_pred draws per member. Same chained-scan
    best-of-3 protocol; volumes/sec."""
    import functools
    import jax
    import jax.numpy as jnp
    from values_tpu.inference.scoring import make_packed_ssn_scorer
    from values_tpu.models.ensemble_unet3d import group_member_variables
    from values_tpu.models.ssn_unet3d import SsnUNet3D

    base = SsnUNet3D(num_classes=2, initial_filter_size=8, rank=10)
    init = jax.jit(base.init)
    keys = jax.random.split(jax.random.PRNGKey(0), N_MEMBERS)
    stacked = group_member_variables(
        [init(k, jnp.zeros((1, PATCH, PATCH, PATCH, 1))) for k in keys])
    score, _ = make_packed_ssn_scorer(
        2, N_MEMBERS, PATCH, n_pred=n_pred, rank=10, agg_patch=AGG_PATCH,
        threshold=THRESHOLD)
    step = jax.jit(score)
    rs = np.random.RandomState(5)
    vols = jnp.asarray(rs.rand(batch, PATCH, PATCH, PATCH, 1)
                       .astype(np.float32))
    gt = jnp.asarray((rs.rand(batch, PATCH, PATCH, PATCH) > 0.7)
                     .astype(np.uint8))
    rng = jax.random.PRNGKey(0)

    @functools.partial(jax.jit, static_argnames=("repeats",))
    def chained(stacked_v, v, g, key, repeats=4):
        def body(carry, _):
            return jax.random.fold_in(carry, 1), step(stacked_v, v, g,
                                                      carry)
        _, out = jax.lax.scan(body, key, None, length=repeats)
        return out

    np.asarray(chained(stacked, vols, gt, rng))  # warm
    best = float("inf")
    for _ in range(N_TIMING):
        t0 = time.perf_counter()
        np.asarray(chained(stacked, vols, gt, rng))
        best = min(best, time.perf_counter() - t0)
    return 4 * batch / best


def measure_small_batch_forward(backend: str, batch: int = 16) -> float:
    """The production sliding-window regime: real inference feeds the
    chip window CHUNKS (test_batch_size windows of one volume), far below
    the staged pool's batch 128. XLA's batch-minor conv layouts collapse
    there; the batch-packed Pallas pipeline keeps all 128 lanes at any
    batch. Returns ensemble-5 forward volumes/sec at the given batch
    (chained scan, same serialization protocol as the staged bench)."""
    import functools
    import jax
    import jax.numpy as jnp
    from values_tpu.models.ensemble_unet3d import (
        group_member_variables, make_grouped_ensemble_predictor)
    from values_tpu.models.unet3d import UNet3D

    base = UNet3D(num_classes=2, initial_filter_size=8)
    init = jax.jit(base.init)
    keys = jax.random.split(jax.random.PRNGKey(0), N_MEMBERS)
    stacked = group_member_variables(
        [init(k, jnp.zeros((1, PATCH, PATCH, PATCH, 1))) for k in keys])
    if backend == "pallas":
        from values_tpu.models.ensemble_unet3d_pallas import (
            make_grouped_ensemble_predictor_pallas)
        _, pred = make_grouped_ensemble_predictor_pallas(
            2, N_MEMBERS, 8, dtype=jnp.bfloat16)
    else:
        _, pred = make_grouped_ensemble_predictor(
            2, N_MEMBERS, 8, dtype=jnp.bfloat16)
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (batch, PATCH, PATCH, PATCH, 1), jnp.float32)
    # small batches finish in ~30 ms; chain enough steps that the relay
    # tunnel's per-dispatch RTT (hundreds of ms) amortizes below 10%
    repeats = 4 if SMOKE else 64

    @jax.jit
    def chained(stacked, x, rng):
        def body(carry, i):
            xi = x + carry * jnp.float32(1e-30)
            stack, _ = pred(stacked, xi, jax.random.fold_in(rng, i))
            s = stack[0, 0, 0, 0, 0, 0].astype(jnp.float32)
            return s, s
        return jax.lax.scan(body, jnp.float32(0.0), jnp.arange(repeats))[1]

    rng = jax.random.PRNGKey(0)
    out = np.asarray(chained(stacked, x, rng))
    assert np.all(np.isfinite(out))
    best = float("inf")
    for _ in range(N_TIMING):
        t0 = time.perf_counter()
        np.asarray(chained(stacked, x, rng))
        best = min(best, time.perf_counter() - t0)
    return batch * repeats / best


def measure_hrnet_2d(batch: int = 8) -> dict:
    """The reference's 2D workload (test_2D.py:273-319): HRNet-W48
    whole-image softmax inference at the shipped 256x478 GTA/Cityscapes
    geometry, 24 classes, f32. Returns img/s at the given batch plus a
    full-resolution sliding-window line (1024x1912, 256x478 windows,
    overlap 0.5, count-averaged stitching — window2d semantics;
    preprocess_gta_cityscapes.py:47-182 is the geometry source). Same
    chained-scan best-of-N protocol as the headline."""
    import functools
    import jax
    import jax.numpy as jnp
    from values_tpu.config import compose
    from values_tpu.config.instantiate import instantiate
    from pathlib import Path

    h_inf, w_inf = (64, 120) if SMOKE else (256, 478)
    cfg = compose(Path(__file__).resolve().parent / "configs",
                  "gta_softmax_config", ["MODEL.PRETRAINED=False"])
    model = instantiate(cfg.model.to_container())
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        rng, jnp.zeros((1, h_inf, w_inf, 3), jnp.float32))

    repeats = 1 if SMOKE else 8

    @jax.jit
    def chained(variables, x):
        def body(carry, i):
            xi = x + carry * jnp.float32(1e-30)
            p = jax.nn.softmax(model.apply(variables, xi, train=False),
                               axis=-1)
            return p[0, 0, 0, 0].astype(jnp.float32), ()
        return jax.lax.scan(body, jnp.float32(0.0),
                            jnp.arange(repeats))[0]

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(batch, h_inf, w_inf, 3).astype(np.float32))
    out = np.asarray(chained(variables, x))
    assert np.isfinite(out)
    best = float("inf")
    for _ in range(N_TIMING):
        t0 = time.perf_counter()
        np.asarray(chained(variables, x))
        best = min(best, time.perf_counter() - t0)
    result = {"whole_image_256x478_batch8_img_per_sec":
              round(batch * repeats / best, 1)}

    # bf16 speed path: same f32 master weights (param_dtype stays f32),
    # bf16 compute with f32 softmax — the 2D analog of the 3D headline's
    # precision scheme. The reference runs f64 (test_2D.py) and the f32
    # line above is the parity default; this line measures the opt-in
    # TPU-native precision. Cross-checked against f32 on the same batch
    # before timing (deviation reported, not assumed).
    model16 = instantiate(cfg.model.to_container(), dtype=jnp.bfloat16)

    def softmax16(variables, x):
        return jax.nn.softmax(
            model16.apply(variables, x.astype(jnp.bfloat16),
                          train=False).astype(jnp.float32), axis=-1)

    @jax.jit
    def chained16(variables, x):
        def body(carry, i):
            xi = x + carry * jnp.float32(1e-30)
            return softmax16(variables, xi)[0, 0, 0, 0], ()

        return jax.lax.scan(body, jnp.float32(0.0),
                            jnp.arange(repeats))[0]

    p16 = np.asarray(jax.jit(softmax16)(variables, x))
    p32 = np.asarray(jax.jit(
        lambda v, x: jax.nn.softmax(model.apply(v, x, train=False),
                                    axis=-1))(variables, x))
    assert np.all(np.isfinite(p16))
    diff = np.abs(p32 - p16)
    result["bf16_softmax_max_abs_diff"] = round(float(diff.max()), 4)
    result["bf16_softmax_mean_abs_diff"] = round(float(diff.mean()), 6)
    result["bf16_argmax_agreement"] = round(
        float((p32.argmax(-1) == p16.argmax(-1)).mean()), 4)
    np.asarray(chained16(variables, x))  # warm
    best = float("inf")
    for _ in range(N_TIMING):
        t0 = time.perf_counter()
        np.asarray(chained16(variables, x))
        best = min(best, time.perf_counter() - t0)
    result["whole_image_256x478_batch8_bf16_img_per_sec"] = round(
        batch * repeats / best, 1)

    # full-res sliding window (the reference preprocesses 1024x1912
    # center crops; --sliding_window runs the full-res image through
    # 256x478 windows with overlap 0.5 and count-averaged stitching)
    from values_tpu.inference.window2d import SlidingPredictor2D
    h_full, w_full = (128, 240) if SMOKE else (1024, 1912)
    num_classes = int(cfg.datamodule.num_classes)
    predictor = SlidingPredictor2D(model, (h_inf, w_inf), num_classes,
                                   overlap=0.5)
    x_full = rs.rand(h_full, w_full, 3).astype(np.float32)
    out = predictor(variables, x_full, rng)
    assert np.all(np.isfinite(np.asarray(out)))
    # staged: gather -> 7x batch-8 forwards -> quilt stitch on device,
    # image pre-staged (the production geometry needs no host-side pad,
    # so the predictor consumes a device array as-is) and the ~190 MB
    # softmax map kept on the chip (as when C2 measures consume it
    # there)
    x_dev = jnp.asarray(x_full)
    x_dev.block_until_ready()
    best = float("inf")
    for _ in range(max(1, N_TIMING - 1)):
        t0 = time.perf_counter()
        predictor(variables, x_dev, rng,
                  as_numpy=False).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    result["fullres_1024x1912_sliding_window_staged_img_per_sec"] = (
        round(1.0 / best, 2))
    # bf16 sliding window: same predictor machinery over the bf16-compute
    # model (stitch accumulates f32); cross-checked against the f32 map
    predictor16 = SlidingPredictor2D(model16, (h_inf, w_inf), num_classes,
                                     overlap=0.5)
    out16 = np.asarray(predictor16(variables, x_dev, rng, as_numpy=False))
    assert np.all(np.isfinite(out16))
    result["fullres_bf16_max_abs_diff"] = round(
        float(np.abs(np.asarray(out) - out16).max()), 4)
    best = float("inf")
    for _ in range(max(1, N_TIMING - 1)):
        t0 = time.perf_counter()
        predictor16(variables, x_dev, rng,
                    as_numpy=False).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    result["fullres_1024x1912_sliding_window_staged_bf16_img_per_sec"] = (
        round(1.0 / best, 2))
    # end-to-end: + the full (h, w, classes) f32 map D2H (through this
    # harness's relay tunnel that transfer dominates; on a real host
    # it is PCIe)
    best = float("inf")
    for _ in range(max(1, N_TIMING - 1)):
        t0 = time.perf_counter()
        predictor(variables, x_full, rng)
        best = min(best, time.perf_counter() - t0)
    result["fullres_1024x1912_sliding_window_img_per_sec"] = round(
        1.0 / best, 2)
    return result


def measure_hrnet_train_step(batch: int = 6,
                             precision: str = "32") -> dict:
    """2D training-step throughput: HRNet-W48, 24 classes, 256x478
    GTA geometry, reference objective and optimizer (CE with
    ignore_index 255; SGD momentum 0.9, lr 0.01, wd 5e-4, polynomial
    schedule — gta_softmax_config.yaml) at its shipped batch size 6.
    ``precision="32"`` is the reference-parity default;
    ``precision="bf16"`` measures the TPU-native mixed path (bf16
    compute, f32 master weights + loss reduce — the same Experiment
    precision knob as 3D training). Chained-scan best-of-N protocol."""
    import functools
    import jax
    import jax.numpy as jnp
    from pathlib import Path
    from values_tpu.config import compose
    from values_tpu.training.experiment import Experiment

    h, w = (64, 120) if SMOKE else (256, 478)
    cfg = compose(Path(__file__).resolve().parent / "configs",
                  "gta_softmax_config",
                  ["MODEL.PRETRAINED=False", f"precision={precision}"])
    exp = Experiment(cfg)
    state = exp.init_state_2d(jax.random.PRNGKey(0), h, w, 3)
    rs = np.random.RandomState(0)
    data = jnp.asarray(rs.rand(batch, h, w, 3).astype(np.float32))
    seg = rs.randint(0, 24, size=(batch, h, w)).astype(np.int32)
    seg[:, :4] = 255  # exercise the ignore_index path
    seg = jnp.asarray(seg)
    repeats = 1 if SMOKE else 8

    @functools.partial(jax.jit, donate_argnums=(0,))
    def steps(state, data, seg, rng):
        def body(st, i):
            st, loss = exp.train_step_fn(
                st, {"data": data, "seg": seg},
                jax.random.fold_in(rng, i), False)
            return st, loss
        return jax.lax.scan(body, state, jnp.arange(repeats))

    rng = jax.random.PRNGKey(1)
    state, losses = steps(state, data, seg, rng)
    out = np.asarray(losses)
    assert np.all(np.isfinite(out)), out
    best = float("inf")
    for _ in range(N_TIMING):
        t0 = time.perf_counter()
        state, losses = steps(state, data, seg, rng)
        np.asarray(losses)
        best = min(best, time.perf_counter() - t0)
    ms = best / repeats * 1e3
    return {"ms_per_step": round(ms, 1),
            "img_per_sec": round(batch / (ms / 1e3), 1)}


def measure_train_step(backend: str = "packed", batch: int = 8,
                       ssn: bool = False) -> dict:
    """bf16 training-step throughput (batch 8, 64^3, UNet3D f8, Dice+CE,
    Adam) through the given conv backend; returns ms/step, vol/s and
    train MFU from the analytic FLOP count (fwd+bwd ~ 3x fwd).
    train_backend="packed" routes forward AND backward-data convs through
    the batch-packed banded kernel (custom VJP) — the r3 training-step
    redesign (measured: 63 ms vs XLA's 115 ms at batch 8). ``ssn=True``
    measures the SSN family instead (packed trunk + f32 MVN heads,
    10-sample MC loglikelihood; MFU counts trunk convs only)."""
    import functools
    import jax
    import jax.numpy as jnp
    from values_tpu.config import make_config
    from values_tpu.training.experiment import Experiment

    model_cfg = {"_target_": "values_tpu.models.unet3d.UNet3D",
                 "num_classes": 2, "initial_filter_size": 8}
    if ssn:
        model_cfg = {"_target_": "values_tpu.models.ssn_unet3d.SsnUNet3D",
                     "num_classes": 2, "initial_filter_size": 8,
                     "rank": 10}
    cfg = make_config({
        "model": model_cfg,
        "datamodule": {"ignore_index": 0},
        "learning_rate": 1e-4, "precision": "bf16", "seed": 1,
        "train_backend": backend,
    })
    exp = Experiment(cfg)
    state = exp.init_state(jax.random.PRNGKey(0), PATCH, 1)
    rs = np.random.RandomState(0)
    data = jnp.asarray(rs.rand(batch, PATCH, PATCH, PATCH, 1)
                       .astype(np.float32))
    seg = jnp.asarray((rs.rand(batch, PATCH, PATCH, PATCH) > 0.5)
                      .astype(np.int32))
    repeats = 8

    @functools.partial(jax.jit, donate_argnums=(0,))
    def steps(state, data, seg, rng):
        def body(st, i):
            st, loss = exp.train_step_fn(
                st, {"data": data, "seg": seg},
                jax.random.fold_in(rng, i), False)
            return st, loss
        return jax.lax.scan(body, state, jnp.arange(repeats))

    rng = jax.random.PRNGKey(1)
    state, losses = steps(state, data, seg, rng)
    jax.block_until_ready(losses)
    best = float("inf")
    for _ in range(N_TIMING):
        t0 = time.perf_counter()
        state, losses = steps(state, data, seg, rng)
        np.asarray(losses)
        best = min(best, time.perf_counter() - t0)
    ms = best / repeats * 1e3
    fwd_flop_per_vol = USEFUL_FLOPS_PER_VOLUME / N_MEMBERS
    mfu = 3 * fwd_flop_per_vol * batch / (best / repeats) / PEAK_BF16
    return {"ms_per_step": round(ms, 1),
            "volumes_per_sec": round(batch / (ms / 1e3), 1),
            "train_mfu": round(mfu, 4)}


def measure_reference_torch_cpu(n_volumes: int = 2) -> float:
    """Measured anchor: the reference's own UNet3D (imported read-only
    from /root/reference as an oracle, like the parity tests) running
    ensemble-5 float64 inference per its test loop semantics
    (model.double(), test_3D.py:425), on this host's CPU. Returns
    volumes/sec; 0.0 if torch or the reference is unavailable."""
    try:
        import sys
        import torch
        sys.path.insert(0, "/root/reference/uncertainty_modeling/models")
        from unet3D_module import UNet3D as TorchUNet3D  # noqa
        models = []
        torch.manual_seed(0)
        for _ in range(N_MEMBERS):
            m = TorchUNet3D(num_classes=2, initial_filter_size=8)
            m.double()
            m.train()  # reference never calls .eval()
            models.append(m)
        x = torch.rand(1, 1, PATCH, PATCH, PATCH, dtype=torch.float64)
        with torch.no_grad():
            for m in models:   # warmup
                torch.softmax(m(x), dim=1)
            t0 = time.perf_counter()
            for _ in range(n_volumes):
                for m in models:
                    torch.softmax(m(x), dim=1)
            dt = time.perf_counter() - t0
        return n_volumes / dt
    except Exception:
        return 0.0


def probe_backend(attempts: int = 3, backoff_s: float = 20.0,
                  timeout_s: float = 150.0, code: str | None = None
                  ) -> tuple:
    """Verify the JAX backend can initialize and run a trivial program
    before committing to the full benchmark.

    The TPU in this container is reached through a relay tunnel that can
    be transiently down; in round 3 a half-hung connect even blocked
    ``import jax`` in a nanosleep loop. The probe therefore runs in a
    SUBPROCESS with a hard timeout, so both failure modes — an
    UNAVAILABLE backend error and an import hang — become retriable
    failures with exponential backoff instead of a driver-visible
    traceback. Returns ``(ok, detail)``.
    """
    import subprocess
    import sys
    if code is None:
        code = ("import jax, jax.numpy as jnp; "
                "print(float(jnp.ones((4, 4)).sum()))")
    detail = ""
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=timeout_s)
            if r.returncode == 0:
                return True, ""
            detail = (r.stderr or r.stdout).strip()[-500:]
        except subprocess.TimeoutExpired:
            detail = (f"probe timed out after {timeout_s:.0f}s "
                      "(hung backend init)")
        if i + 1 < attempts:
            time.sleep(backoff_s * (2 ** i))
    return False, detail


def emit_unavailable(detail: str, attempts: int) -> None:
    """One well-formed JSON record distinguishing an environment outage
    from a performance regression (round-3 VERDICT: an rc=1 traceback
    record could not tell the two apart)."""
    print(json.dumps({
        "metric": "lidc_ensemble5_entropy_inference_throughput",
        "value": 0.0,
        "unit": "volumes/sec/chip",
        "vs_baseline": 0.0,
        "error": "backend_unavailable",
        "detail": detail,
        "probe_attempts": attempts,
    }))


def _mark(msg: str) -> None:
    """Stage marker on stderr: an unattended run that dies mid-bench
    (tunnel outage, OOM, timeout) leaves a trail saying how far it got —
    the r4 headline run was killed by an outer timeout with ZERO output,
    indistinguishable from a hang."""
    import sys
    print(f"[bench +{time.perf_counter() - _T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def main() -> None:
    import os
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__) or ".",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    _mark("building XLA workload")
    _step, run_pool, stacked = build_workload()  # _step reused for e2e
    rng = jax.random.PRNGKey(7)
    rs = np.random.RandomState(0)

    # Input batches are pre-staged on device: in this container the TPU is
    # reached through a relay tunnel whose H2D latency fluctuates between
    # 5 ms and 450 ms for the same 10 MB batch, and every dispatch is paced
    # to ~300 ms — 2-5 orders of magnitude off a real TPU host. A
    # production input pipeline double-buffers H2D behind compute
    # (values_tpu.data.pipeline), so the steady-state number is the
    # on-device pipeline throughput: one compiled program scans the staged
    # pool, and only the per-volume scalars leave the chip at the end.
    K_POOL = 2 if SMOKE else 4
    vol_pool = jnp.asarray(rs.rand(
        K_POOL, BATCH, PATCH, PATCH, PATCH, 1).astype(np.float32))
    gt_pool = jnp.asarray(
        (rs.rand(K_POOL, BATCH, PATCH, PATCH, PATCH) > 0.7).astype(np.uint8))
    jax.block_until_ready((vol_pool, gt_pool))

    REPEATS = 1 if SMOKE else 8
    _mark("pools staged; warming up XLA pipeline")
    for _ in range(WARMUP_BATCHES):
        out = run_pool(stacked, vol_pool, gt_pool, rng, repeats=REPEATS)
        np.asarray(out)
    jax.block_until_ready(out)

    # The relay tunnel adds multi-hundred-ms jitter per dispatch; take the
    # best of N repetitions (standard practice: measures the machine, not
    # the tunnel weather), each repetition fully synchronized via the
    # scalar fetch of its results.
    n_dispatches = N_TIMING
    per_dispatch_volumes = K_POOL * BATCH * REPEATS
    best = float("inf")
    all_scores = None
    for _ in range(n_dispatches):
        t0 = time.perf_counter()
        out = run_pool(stacked, vol_pool, gt_pool, rng, repeats=REPEATS)
        all_scores = np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    assert all_scores.shape == (K_POOL * REPEATS, 10, BATCH)
    assert np.all(np.isfinite(all_scores))

    xla_vps = per_dispatch_volumes / best
    volumes_per_sec = xla_vps
    _mark(f"XLA pipeline {xla_vps:.1f} vol/s")

    # fully-packed pipeline (packed forward + packed C2/C3 consumers, no
    # unpack transposes): same pools, same protocol. Guarded: a Mosaic
    # compile failure on one kernel variant must not cost the whole
    # benchmark (the driver runs this unattended) — the XLA pipeline
    # number above stands on its own.
    packed_vps = 0.0
    try:
        _mark("building packed workload")
        _pstep, run_pool_packed, stacked_p = build_workload_packed()
        for _ in range(WARMUP_BATCHES):
            outp = run_pool_packed(stacked_p, vol_pool, gt_pool, rng,
                                   repeats=REPEATS)
            np.asarray(outp)
        best_packed = float("inf")
        for _ in range(n_dispatches):
            t0 = time.perf_counter()
            outp = run_pool_packed(stacked_p, vol_pool, gt_pool, rng,
                                   repeats=REPEATS)
            packed_scores = np.asarray(outp)
            best_packed = min(best_packed, time.perf_counter() - t0)
        assert packed_scores.shape == (K_POOL * REPEATS, 10, BATCH)
        assert np.all(np.isfinite(packed_scores))
        packed_vps = per_dispatch_volumes / best_packed
        if packed_vps > volumes_per_sec:
            volumes_per_sec, best = packed_vps, best_packed
    except Exception as exc:  # pragma: no cover - defensive bench path
        import sys
        SMOKE_FAILURES.append(f"packed: {type(exc).__name__}: {exc}")
        print(f"packed pipeline skipped: {type(exc).__name__}: {exc}",
              file=sys.stderr)

    # hybrid pipeline (XLA convs + packed stats consumers): same pools,
    # same protocol — the r4 contender for the staged batch-128 headline
    hybrid_vps = 0.0
    try:
        _mark(f"packed pipeline {packed_vps:.1f} vol/s; building hybrid workload")
        _hstep, run_pool_hybrid, stacked_h = build_workload_hybrid()
        for _ in range(WARMUP_BATCHES):
            outh = run_pool_hybrid(stacked_h, vol_pool, gt_pool, rng,
                                   repeats=REPEATS)
            np.asarray(outh)
        best_hybrid = float("inf")
        for _ in range(n_dispatches):
            t0 = time.perf_counter()
            outh = run_pool_hybrid(stacked_h, vol_pool, gt_pool, rng,
                                   repeats=REPEATS)
            hybrid_scores = np.asarray(outh)
            best_hybrid = min(best_hybrid, time.perf_counter() - t0)
        assert hybrid_scores.shape == (K_POOL * REPEATS, 10, BATCH)
        assert np.all(np.isfinite(hybrid_scores))
        hybrid_vps = per_dispatch_volumes / best_hybrid
        if hybrid_vps > volumes_per_sec:
            volumes_per_sec, best = hybrid_vps, best_hybrid
    except Exception as exc:  # pragma: no cover - defensive bench path
        import sys
        SMOKE_FAILURES.append(f"hybrid: {type(exc).__name__}: {exc}")
        print(f"hybrid pipeline skipped: {type(exc).__name__}: {exc}",
              file=sys.stderr)

    # end-to-end variant: every batch uploaded from HOST memory before its
    # step (device_put + step + scalar fetch per batch). In this container
    # the H2D path crosses a relay tunnel with multi-hundred-ms jitter, so
    # this number measures the environment as much as the machine; on a
    # real TPU host the gap to the staged number is the input pipeline's
    # H2D cost.
    _mark(f"hybrid pipeline {hybrid_vps:.1f} vol/s; e2e next")
    host_vols = np.asarray(vol_pool)
    host_gts = np.asarray(gt_pool)
    e2e_batches = 2 if SMOKE else 8
    _ = np.asarray(_step(stacked, vol_pool[0], gt_pool[0], rng))  # warm
    t0 = time.perf_counter()
    for i in range(e2e_batches):
        vols = jnp.asarray(host_vols[i % K_POOL])
        gts = jnp.asarray(host_gts[i % K_POOL])
        np.asarray(_step(stacked, vols, gts, rng))
    e2e_vps = e2e_batches * BATCH / (time.perf_counter() - t0)

    mfu = volumes_per_sec * USEFUL_FLOPS_PER_VOLUME / PEAK_BF16
    _mark(f"e2e {e2e_vps:.1f} vol/s; auxiliary measures next")
    ref_cpu = measure_reference_torch_cpu()

    def guarded(fn, *args, fallback=0.0, **kw):
        # a failure in one auxiliary measure must not cost the headline
        try:
            return fn(*args, **kw)
        except Exception as exc:  # pragma: no cover - defensive bench
            import sys
            SMOKE_FAILURES.append(
                f"{fn.__name__}{args}: {type(exc).__name__}: {exc}")
            print(f"{fn.__name__}{args} skipped: "
                  f"{type(exc).__name__}: {exc}", file=sys.stderr)
            return fallback

    small_pallas = guarded(measure_small_batch_forward, "pallas",
                           batch=8 if SMOKE else 16)
    small_xla = guarded(measure_small_batch_forward, "xla",
                        batch=8 if SMOKE else 16)
    _mark("window-batch measures done; train-step measures")
    train_packed = guarded(measure_train_step, "packed", fallback={})
    train_ssn_packed = guarded(measure_train_step, "packed", fallback={},
                               ssn=True)
    _mark("train steps done; sampling scorers")
    aleatoric_vps = guarded(measure_streaming_aleatoric,
                            batch=4 if SMOKE else 32)
    ssn_vps = guarded(measure_streaming_ssn, batch=4 if SMOKE else 16)
    _mark("sampling scorers done; 2D HRNet measures")
    hrnet_2d = guarded(measure_hrnet_2d, batch=2 if SMOKE else 8,
                       fallback={})
    hrnet_train = guarded(measure_hrnet_train_step,
                          batch=2 if SMOKE else 6, fallback={})
    hrnet_train_bf16 = guarded(measure_hrnet_train_step,
                               batch=2 if SMOKE else 6,
                               precision="bf16", fallback={})
    record = {
        "metric": "lidc_ensemble5_entropy_inference_throughput",
        "value": round(volumes_per_sec, 2),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(
            volumes_per_sec / REFERENCE_A100_VOLUMES_PER_SEC, 2),
        "baseline_kind": "estimated_a100_fp64",
        "staged_volumes_per_sec": round(volumes_per_sec, 2),
        "staged_xla_volumes_per_sec": round(xla_vps, 2),
        "staged_packed_volumes_per_sec": round(packed_vps, 2),
        "staged_hybrid_volumes_per_sec": round(hybrid_vps, 2),
        "end_to_end_volumes_per_sec": round(e2e_vps, 2),
        "mfu": round(mfu, 4),
        "measured_reference_torch_cpu_volumes_per_sec": round(ref_cpu, 3),
        # production sliding-window regime (window chunks of 16): the
        # batch-packed Pallas pipeline vs XLA grouped convs
        "window_batch16_pallas_volumes_per_sec": round(small_pallas, 1),
        "window_batch16_xla_volumes_per_sec": round(small_xla, 1),
        # bf16 training step, batch 8, packed custom-VJP conv backend
        "train_step_packed_bf16": train_packed,
        # SSN family through the same backend (packed trunk + MVN heads)
        "ssn_train_step_packed_bf16": train_ssn_packed,
        # heaviest sampling family: aleatoric ensemble, 50 softmax
        # samples/volume accumulated streamingly in the packed layout
        "aleatoric50_streaming_volumes_per_sec": round(aleatoric_vps, 1),
        # SSN ensemble scoring: packed trunk + streaming per-member
        # low-rank-MVN draws (10 per member)
        "ssn_streaming_volumes_per_sec": round(ssn_vps, 1),
        # the 2D workload: HRNet-W48 at the GTA/Cityscapes geometry
        # (whole-image 256x478 + full-res sliding window)
        "hrnet_2d": hrnet_2d,
        # 2D training step: reference objective/optimizer at the shipped
        # GTA geometry and batch size (f32, CE ignore_index 255, SGD)
        "hrnet_train_step_f32": hrnet_train,
        # same step through the mixed-precision knob (bf16 compute, f32
        # master weights + loss reduce; precision=bf16)
        "hrnet_train_step_bf16": hrnet_train_bf16,
        # every timing above takes the best of 3 fully-synchronized
        # dispatches of a chained-scan program — the tunnel's multi-
        # hundred-ms per-dispatch jitter is excluded by protocol, so
        # run-to-run variation reflects the chip, not relay weather
        "protocol": "best_of_3_chained_scan",
    }
    if SMOKE:
        record["smoke"] = True
        record["protocol"] = "smoke_cpu_integration_check"
        record["smoke_failures"] = list(SMOKE_FAILURES)
    print(json.dumps(record))
    if SMOKE and SMOKE_FAILURES:
        raise SystemExit(1)


if __name__ == "__main__":
    import os
    import sys
    _attempts = int(os.environ.get("VALUES_TPU_BENCH_PROBE_ATTEMPTS", "3"))
    _timeout = float(os.environ.get("VALUES_TPU_BENCH_PROBE_TIMEOUT", "150"))
    _backoff = float(os.environ.get("VALUES_TPU_BENCH_PROBE_BACKOFF", "20"))
    _code = os.environ.get("VALUES_TPU_BENCH_PROBE_CODE")  # test hook
    if os.environ.get("VALUES_TPU_BENCH_NO_PROBE") != "1":
        _ok, _detail = probe_backend(attempts=_attempts,
                                     backoff_s=_backoff,
                                     timeout_s=_timeout, code=_code)
        if not _ok:
            emit_unavailable(_detail, _attempts)
            sys.exit(0)
    try:
        main()
    except RuntimeError as exc:  # late outage (backend died mid-bench)
        msg = str(exc)
        if "UNAVAILABLE" in msg or "backend" in msg.lower():
            emit_unavailable(msg[-500:], _attempts)
            sys.exit(0)
        raise
