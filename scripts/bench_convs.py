"""Per-shape microbenchmark of the grouped-ensemble UNet3D convolutions.

Times every 3^3 grouped convolution in the flagship bench workload
(ensemble-5, batch 128, bf16, NDHWC) individually on the current device
and reports achieved TFLOP/s vs the GEMM lane-bound (min(Cout/group,128)
/128 of peak). This is the decision tool for the Pallas conv3d kernel:
the gap between "achieved" and "bound" is XLA overhead; the gap between
"bound" and peak is what only a banded-GEMM formulation can recover.

Run: python scripts/bench_convs.py [batch]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16 = 197e12  # v5e


def conv_shapes(batch: int, members: int = 5, f: int = 8):
    """(name, spatial, cin_per_member, cout_per_member) for every 3^3 conv
    in EnsembleUNet3D (values_tpu/models/ensemble_unet3d.py)."""
    shapes = []
    for level, (sp, fin) in enumerate(
            [(64, f), (32, 2 * f), (16, 4 * f), (8, 8 * f)], start=1):
        cin1 = 1 if level == 1 else fin // 2
        shapes.append((f"contr_{level}_1", sp, cin1, fin))
        shapes.append((f"contr_{level}_2", sp, fin, fin))
        shapes.append((f"expand_{level}_1", sp, 2 * fin, fin))
        shapes.append((f"expand_{level}_2", sp, fin, fin))
    shapes.append(("center_conv1", 4, 8 * f, 16 * f))
    shapes.append(("center_conv2", 4, 16 * f, 16 * f))
    return shapes


def main():
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    use_pallas = "--pallas" in sys.argv
    min_w = 32
    members = 5
    rs = np.random.RandomState(0)
    print(f"device={jax.devices()[0]} batch={batch} members={members}"
          + (" [pallas banded-GEMM where W>=%d]" % min_w if use_pallas
             else " [XLA]"))
    if use_pallas:
        from values_tpu.ops.pallas.conv3d import (choose_tiling,
                                                  conv3d_grouped_banded)
    rows = []
    for name, sp, cin, cout in conv_shapes(batch, members):
        k = jnp.asarray(
            rs.rand(3, 3, 3, cin, members * cout) * 0.1, dtype=jnp.bfloat16)
        pallas_here = use_pallas and sp >= min_w

        if pallas_here:
            x = jnp.asarray(rs.rand(batch, sp, sp, members * cin, sp),
                            dtype=jnp.bfloat16)
            conv = jax.jit(lambda x, k: conv3d_grouped_banded(
                x, k, groups=members))
            note = "q=%dx%d bp=%d sd=%d" % choose_tiling(
                cout, batch, sp, sp, sp)
        else:
            x = jnp.asarray(rs.rand(batch, sp, sp, sp, members * cin),
                            dtype=jnp.bfloat16)

            @jax.jit
            def conv(x, k):
                return jax.lax.conv_general_dilated(
                    x, k, (1, 1, 1), "SAME",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                    feature_group_count=members)
            note = ""

        out = conv(x, k)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(conv(x, k))
            best = min(best, time.perf_counter() - t0)
        flops = 2 * batch * sp ** 3 * 27 * cin * cout * members
        tflops = flops / best / 1e12
        bound = min(cout, 128) / 128  # im2col GEMM N-bound per group
        rows.append((name, sp, cin, cout, best * 1e3, tflops,
                     100 * tflops / (PEAK_BF16 / 1e12),
                     100 * bound, note))
        print(f"{name:14s} {sp:3d} {cin:4d} {cout:4d} {best * 1e3:8.2f}ms "
              f"{tflops:7.1f}TF/s {100 * tflops / (PEAK_BF16 / 1e12):5.1f}% "
              f"(im2col bound {100 * bound:5.1f}%) {note}", flush=True)
    total_t = sum(r[4] for r in rows)
    total_f = sum(2 * batch * r[1] ** 3 * 27 * r[2] * r[3] * members
                  for r in rows)
    print(f"TOTAL {total_t:.1f} ms  {total_f / (total_t / 1e3) / 1e12:.1f} "
          f"TF/s  ({100 * total_f / (total_t / 1e3) / PEAK_BF16:.1f}% peak)")


if __name__ == "__main__":
    main()
