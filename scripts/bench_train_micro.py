"""Decompose the packed bf16 training step (batch 8, 64^3, UNet3D f8,
Dice+CE, Adam) into component costs on real TPU: full step, fwd+bwd
without the optimizer, forward only, loss head, optimizer update, and
the standalone instance-norm passes the trainable path keeps outside
the conv kernels (ROADMAP "remaining train-step headroom").

Timing protocol matches scripts/bench_convs.py: lax.scan chains REPEATS
executions inside one compiled program with scalar feedback so steps
serialize; wall / REPEATS = ms per execution.

Run: python scripts/bench_train_micro.py [batch]
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

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from values_tpu.config import make_config
    from values_tpu.training.experiment import Experiment
    from values_tpu.models.ensemble_unet3d_pallas import (
        packed_train_forward, _instance_norm)
    from values_tpu.ops import losses as L

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rs = np.random.RandomState(0)
    data = jnp.asarray(rs.rand(batch, 64, 64, 64, 1).astype(np.float32))
    seg = jnp.asarray((rs.rand(batch, 64, 64, 64) > 0.5).astype(np.int32))
    print(f"device={jax.devices()[0]} batch={batch} 64^3 f8 packed bf16")

    cfg = make_config({
        "model": {"_target_": "values_tpu.models.unet3d.UNet3D",
                  "num_classes": 2, "initial_filter_size": 8},
        "datamodule": {"ignore_index": 0},
        "learning_rate": 1e-4, "precision": "bf16", "seed": 1,
        "train_backend": "packed",
    })
    exp = Experiment(cfg)
    state = exp.init_state(jax.random.PRNGKey(0), 64, 1)
    params = state.params
    rng = jax.random.PRNGKey(1)

    def timed(name, fn, *args):
        @jax.jit
        def chained(*args):
            def body(carry, i):
                out = fn(jax.random.fold_in(rng, i + carry.astype(
                    jnp.int32) * 0), *args)
                s = out
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
        print(f"{name:42s} {ms:8.2f} ms")
        return ms

    bdata = data.astype(jnp.bfloat16)
    bparams = jax.tree_util.tree_map(
        lambda t: t.astype(jnp.bfloat16), params)

    # 1. full train step (fwd + bwd + clip + adam). The output must
    #    consume the NEW params, not just the loss — returning only the
    #    loss lets XLA dead-code-eliminate the whole backward + Adam
    #    (measured 5.2 ms = forward-only; the r4 battery artifact).
    st = [state]

    def full_step(r):
        new_state, loss = exp.train_step_fn(
            st[0], {"data": data, "seg": seg}, r, False)
        psum = jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b).astype(jnp.float32),
            new_state.params, jnp.float32(0.0))
        return loss.astype(jnp.float32) + psum * 1e-9
    timed("full train step", full_step)

    # 2. loss fwd+bwd only (no optimizer)
    def loss_fn(p, r):
        l, _ = exp._loss(p, state.model_state,
                         {"data": data, "seg": seg}, r, False)
        return l

    def fwd_bwd(r):
        l, g = jax.value_and_grad(loss_fn)(params, r)
        return (l + jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b).astype(jnp.float32), g,
            jnp.float32(0.0))).astype(jnp.float32)
    timed("loss fwd+bwd (no optimizer)", fwd_bwd)

    # 2b/2c. backward attribution A/B: drop the dkernel branch (XLA
    #        bwd-weights conv + the x/dy unpack transposes), then the
    #        dx branch (packed bwd-data conv). Env is read at TRACE
    #        time inside _banded_bwd_core; fresh closures => fresh jits.
    import os as _os
    for flag, label in (("VALUES_TPU_SKIP_DK", "fwd+bwd without dkernel"),
                        ("VALUES_TPU_SKIP_DX", "fwd+bwd without dx")):
        _os.environ[flag] = "1"
        try:
            def fwd_bwd_ab(r):
                l, g = jax.value_and_grad(loss_fn)(params, r)
                return (l + jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(b).astype(jnp.float32), g,
                    jnp.float32(0.0))).astype(jnp.float32)
            timed(label, fwd_bwd_ab)
        finally:
            del _os.environ[flag]

    # 3. forward only (packed, bf16) + loss
    def fwd_only(r):
        return loss_fn(params, r).astype(jnp.float32)
    timed("loss forward only", fwd_only)

    # 4. packed forward only (no loss head)
    def packed_fwd(r):
        out = packed_train_forward(bparams, bdata, do_dropout=False,
                                   rng=r)
        return jnp.sum(out.astype(jnp.float32)) * 1e-9
    timed("packed forward (no loss)", packed_fwd)

    # 5. loss head alone on fixed logits
    logits = jnp.asarray(
        rs.rand(batch, 64, 64, 64, 2).astype(np.float32))
    lch = jnp.moveaxis(logits, -1, 1)

    def loss_head(r):
        return L.dice_ce_loss(lch, seg, ignore_index=0)
    timed("dice_ce loss head", loss_head)

    # 6. the 8 standalone instance norms of the trainable path
    #    (contr blocks; fwd only — bwd roughly doubles it)
    def norms(r):
        tot = jnp.float32(0.0)
        for (nb, d, h, c, w) in ((4, 64, 64, 8, 64), (4, 64, 64, 8, 64),
                                 (2, 32, 32, 16, 32), (2, 32, 32, 16, 32),
                                 (1, 16, 16, 32, 16), (1, 16, 16, 32, 16),
                                 (1, 8, 8, 64, 8), (1, 8, 8, 64, 8)):
            lanes = 128
            bp = lanes // w
            v = jax.random.normal(r, (nb, d, h, c, lanes),
                                  jnp.bfloat16)
            tot = tot + jnp.sum(
                _instance_norm(v, bp).astype(jnp.float32)) * 1e-9
        return tot
    timed("8 instance norms (fwd only)", norms)

    # 7. adam update alone
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    def adam(r):
        updates, _ = exp.optimizer.update(grads, state.opt_state, params)
        return jnp.sum(updates["contr_1_1"]["conv"]["bias"]).astype(
            jnp.float32)
    timed("adam update alone", adam)


if __name__ == "__main__":
    main()
