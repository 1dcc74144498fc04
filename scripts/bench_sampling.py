"""Sampling-tail A/B (VERDICT r3 item 3): aleatoric deep-ensemble
scoring with the XLA fori_loop sampler vs the Pallas VMEM-resident
streaming-sampler kernel (ops/pallas/sampling.py), plus the SSN
streaming scorer. Reference loops: test_3D.py:458-469 (aleatoric),
:361-396 (SSN).

Run on the chip: python scripts/bench_sampling.py [batch]
Prints vol/s per variant (chained-scan best-of-3, bench.py protocol).
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

MEMBERS = 5
PATCH = 64
N_SAMPLES = 10


def main():
    import jax
    import jax.numpy as jnp
    from values_tpu.inference.scoring import (make_packed_aleatoric_scorer,
                                              make_packed_ssn_scorer)
    from values_tpu.models.ensemble_unet3d import group_member_variables
    from values_tpu.models.ssn_unet3d import SsnUNet3D
    from values_tpu.models.unet3d import UNet3D

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rs = np.random.RandomState(3)
    vols = jnp.asarray(rs.rand(batch, PATCH, PATCH, PATCH, 1)
                       .astype(np.float32))
    gt = jnp.asarray((rs.rand(batch, PATCH, PATCH, PATCH) > 0.7)
                     .astype(np.uint8))
    rng = jax.random.PRNGKey(0)

    def chained_measure(step, stacked, repeats=4):
        @functools.partial(jax.jit, static_argnames=("n",))
        def chained(sv, v, g, key, n=repeats):
            def body(carry, _):
                return jax.random.fold_in(carry, 1), step(sv, v, g, carry)
            _, out = jax.lax.scan(body, key, None, length=n)
            return out

        np.asarray(chained(stacked, vols, gt, rng))  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chained(stacked, vols, gt, rng))
            best = min(best, time.perf_counter() - t0)
        return repeats * batch / best

    # aleatoric: xla vs pallas sampler
    base = UNet3D(num_classes=2, initial_filter_size=8,
                  aleatoric_loss=True)
    init = jax.jit(base.init)
    keys = jax.random.split(jax.random.PRNGKey(0), MEMBERS)
    stacked = group_member_variables(
        [init(k, jnp.zeros((1, PATCH, PATCH, PATCH, 1))) for k in keys])
    for sampler in ("xla", "pallas"):
        score, _ = make_packed_aleatoric_scorer(
            MEMBERS, PATCH, n_aleatoric_samples=N_SAMPLES, agg_patch=10,
            threshold=0.3, sampler=sampler)
        vps = chained_measure(jax.jit(score), stacked)
        print(f"aleatoric50 batch={batch} sampler={sampler}: "
              f"{vps:.1f} vol/s")

    # SSN streaming scorer
    ssn = SsnUNet3D(num_classes=2, initial_filter_size=8, rank=10)
    init = jax.jit(ssn.init)
    stacked_ssn = group_member_variables(
        [init(k, jnp.zeros((1, PATCH, PATCH, PATCH, 1))) for k in keys])
    score, _ = make_packed_ssn_scorer(
        2, MEMBERS, PATCH, n_pred=N_SAMPLES, rank=10, agg_patch=10,
        threshold=0.3)
    vps = chained_measure(jax.jit(score), stacked_ssn)
    print(f"ssn{N_SAMPLES} batch={batch} streaming: {vps:.1f} vol/s")


if __name__ == "__main__":
    main()
