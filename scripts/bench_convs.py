"""A/B benchmark: grouped-ensemble UNet3D forward, XLA convs vs the Pallas
banded-GEMM kernel (values_tpu.ops.pallas.conv3d).

Per-op host timing is meaningless in this environment (dispatch through
the axon relay returns before execution; block_until_ready does not
fence), so each variant is timed like bench.py: a lax.scan chains REPEATS
forwards inside ONE compiled program — iteration i feeds a scalar from
iteration i-1's output back into the input so XLA cannot parallelize or
elide steps — and only the final per-step scalars are fetched. Wall time
divided by REPEATS gives ms/forward.

Run: python scripts/bench_convs.py [batch] [--xla-only|--pallas-only]
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16 = 197e12  # v5e
import os
MEMBERS = int(os.environ.get('BENCH_MEMBERS', 5))
PATCH = 64
REPEATS = 8


def forward_flops(batch, members=None, f=8, patch=PATCH):
    members = MEMBERS if members is None else members
    total = 0
    for level, (sp, fin) in enumerate(
            [(patch, f), (patch // 2, 2 * f), (patch // 4, 4 * f),
             (patch // 8, 8 * f)], start=1):
        cin1 = 1 if level == 1 else fin // 2
        for cin, cout in ((cin1, fin), (fin, fin),
                          (2 * fin, fin), (fin, fin)):
            total += 2 * sp ** 3 * 27 * cin * cout
    sp = patch // 16
    total += 2 * sp ** 3 * 27 * (8 * f) * (16 * f)
    total += 2 * sp ** 3 * 27 * (16 * f) * (16 * f)
    # transpose convs + final
    total += 2 * (patch // 16) ** 3 * 8 * (16 * f) * (8 * f)
    for spu, ci, co in ((patch // 8, 8 * f, 4 * f),
                        (patch // 4, 4 * f, 2 * f),
                        (patch // 2, 2 * f, f)):
        total += 2 * spu ** 3 * 8 * ci * co
    total += 2 * patch ** 3 * f * 2 * 2
    return total * batch * members


def time_variant(name, predict, stacked, batch):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(batch, PATCH, PATCH, PATCH, 1),
                    dtype=jnp.float32)

    @jax.jit
    def chained(stacked, x, rng):
        def body(carry, i):
            # scalar feedback serializes iterations without extra passes
            xi = x + carry * jnp.float32(1e-30)
            stack, _ = predict(stacked, xi, jax.random.fold_in(rng, i))
            s = stack[0, 0, 0, 0, 0, 0].astype(jnp.float32)
            return s, s
        _, scalars = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(REPEATS))
        return scalars

    rng = jax.random.PRNGKey(0)
    out = np.asarray(chained(stacked, x, rng))  # compile + warm
    assert np.all(np.isfinite(out)), out
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = np.asarray(chained(stacked, x, rng))
        best = min(best, time.perf_counter() - t0)
    ms = best / REPEATS * 1e3
    fl = forward_flops(batch)
    print(f"{name:8s} {ms:8.2f} ms/forward(batch {batch})  "
          f"{fl / (ms / 1e3) / 1e12:6.1f} TF/s  "
          f"{100 * fl / (ms / 1e3) / PEAK_BF16:5.1f}% peak  "
          f"{batch / (ms / 1e3):7.1f} vol/s", flush=True)
    return ms


def main():
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else 128

    from values_tpu.models.unet3d import UNet3D
    from values_tpu.models.ensemble_unet3d import (
        group_member_variables, make_grouped_ensemble_predictor)
    from values_tpu.models.ensemble_unet3d_pallas import (
        make_grouped_ensemble_predictor_pallas)

    base = UNet3D(num_classes=2, initial_filter_size=8)
    init = jax.jit(base.init)
    keys = jax.random.split(jax.random.PRNGKey(0), MEMBERS)
    stacked = group_member_variables(
        [init(k, jnp.zeros((1, PATCH, PATCH, PATCH, 1))) for k in keys])
    stacked = jax.tree_util.tree_map(jnp.asarray, stacked)
    print(f"device={jax.devices()[0]} batch={batch} members={MEMBERS} "
          f"patch={PATCH} ({forward_flops(batch) / 1e9:.0f} GFLOP/forward)")

    if "--pallas-only" not in sys.argv:
        _, xla_pred = make_grouped_ensemble_predictor(
            2, MEMBERS, 8, dtype=jnp.bfloat16)
        time_variant("xla", xla_pred, stacked, batch)
    if "--xla-only" not in sys.argv:
        _, pallas_pred = make_grouped_ensemble_predictor_pallas(
            2, MEMBERS, 8, dtype=jnp.bfloat16)
        time_variant("pallas", pallas_pred, stacked, batch)


if __name__ == "__main__":
    main()
