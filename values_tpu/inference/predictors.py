"""C1 prediction models: the N stochastic forward passes as one vmapped,
device-resident computation.

The reference runs Python loops over ensemble members x n_pred passes x TTA
variants with per-window H2D/D2H transfers (reference:
uncertainty_modeling/test_3D.py:399-483). Here each C1 mode compiles to a
single jitted function producing the full (S, B, *spatial, C) softmax stack:

- ``default``: ensemble members stacked along a leading params axis and
  vmapped; n_pred MC passes vmapped over per-pass dropout keys. Models are
  *never switched to eval mode* in the reference (test_3D.py:222-247), so
  dropout stays active whenever the architecture has it — reproduced by
  deterministic=False iff the model carries dropout.
- ``tta``: clean + Gaussian-noised input x {identity + 7 flip combos}; the
  noise variance is drawn U(0, 0.1) per volume, matching batchgenerators'
  GaussianNoiseTransform defaults used at test_3D.py:432; outputs are
  un-flipped before stacking, order = [clean, clean-flips..., noise,
  noise-flips...] per member (test_3D.py:427-456).
- ``aleatoric``: one (mu, s) forward, then n samples of softmax(mu +
  exp(s/2) * eps) (test_3D.py:458-469).
- ``ssn``: low-rank MVN logit samples (see values_tpu.models.ssn_unet3d).

The sample axis S is an ordinary array axis: shard it over a mesh ``sample``
axis with pjit for multi-chip ensembles (SURVEY.md §2.7).
"""
from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp

# the 7 flip-axis combinations of test_3D.py:434 in NCDHW terms (2,3,4)
# translated to our (B, D, H, W, C) layout -> spatial axes (1, 2, 3)
FLIP_COMBOS: Sequence[tuple] = ((1,), (2,), (3,), (1, 2), (1, 3), (2, 3),
                                (1, 2, 3))


def stack_params(variables_list: List[Any]) -> Any:
    """Stack a list of identically-structured variable pytrees along a new
    leading axis (the ensemble axis)."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *variables_list)


def _apply_softmax(model, variables, x, rng=None, stochastic=False):
    kwargs = {}
    if stochastic:
        out = model.apply(variables, x, deterministic=False,
                          rngs={"dropout": rng})
    else:
        out = model.apply(variables, x, deterministic=True)
    return jax.nn.softmax(out, axis=-1)


def make_default_predictor(model, n_models: int, n_pred: int,
                           stochastic: bool) -> Callable:
    """(stacked_variables, x, rng) -> (n_models * n_pred, B, *sp, C).

    Sample ordering matches the reference's nested loops (models outer,
    preds inner; test_3D.py:424,470).
    """
    def predict(stacked_variables, x, rng):
        keys = jax.random.split(rng, n_models * n_pred).reshape(
            n_models, n_pred, 2)

        def per_model(variables, model_keys):
            def per_pred(key):
                return _apply_softmax(model, variables, x, key, stochastic)
            return jax.vmap(per_pred)(model_keys)  # (n_pred, B, *sp, C)

        out = jax.vmap(per_model)(stacked_variables, keys)
        return out.reshape((n_models * n_pred,) + out.shape[2:]), None

    return predict


def make_tta_predictor(model, n_models: int,
                       stochastic: Optional[bool] = None) -> Callable:
    """(stacked_variables, x, rng) -> (n_models * 16, B, *sp, C).

    ``stochastic`` (default: the model's do_dropout) reproduces the
    reference's TTA x dropout semantics: models are never switched to
    eval mode, so nn.Dropout stays LIVE during every TTA variant
    (test_3D.py:222-247 loads train-mode models; :427-456 runs the TTA
    loop on them) — each of the 16 variants draws its own dropout mask.
    """
    if stochastic is None:
        stochastic = bool(getattr(model, "do_dropout", False))

    def predict(stacked_variables, x, rng):
        var_key, noise_key, drop_key = jax.random.split(rng, 3)
        # batchgenerators' augment_gaussian_noise draws "variance" ~ U(0,0.1)
        # but passes it as np.random.normal's *scale* (std) — reproduce that.
        variance = jax.random.uniform(var_key, (), minval=0.0, maxval=0.1)
        noise = jax.random.normal(noise_key, x.shape, dtype=x.dtype)
        x_noise = x + noise * variance

        def all_variants(variables, inp, keys):
            outs = [_apply_softmax(model, variables, inp, keys[0],
                                   stochastic)]
            for fi, axes in enumerate(FLIP_COMBOS):
                flipped = jnp.flip(inp, axis=axes)
                out = _apply_softmax(model, variables, flipped,
                                     keys[fi + 1], stochastic)
                outs.append(jnp.flip(out, axis=axes))
            return jnp.stack(outs)  # (8, B, *sp, C)

        def per_model(variables, model_key):
            keys = jax.random.split(model_key, 16)
            clean = all_variants(variables, x, keys[:8])
            noisy = all_variants(variables, x_noise, keys[8:])
            return jnp.concatenate([clean, noisy])  # (16, B, *sp, C)

        model_keys = jax.random.split(drop_key, n_models)
        out = jax.vmap(per_model)(stacked_variables, model_keys)
        return out.reshape((n_models * 16,) + out.shape[2:]), None

    return predict


def make_aleatoric_predictor(model, n_models: int,
                             n_aleatoric_samples: int) -> Callable:
    """(stacked_variables, x, rng) -> (n_models * n_samples, B, *sp, C)."""
    def predict(stacked_variables, x, rng):
        keys = jax.random.split(rng, n_models)

        def per_model(variables, key):
            mu, s = model.apply(variables, x, deterministic=True)
            sigma = jnp.exp(s / 2.0)
            eps = jax.random.normal(
                key, (n_aleatoric_samples,) + mu.shape, dtype=mu.dtype)
            logits = mu[None] + sigma[None] * eps
            # reference stores the same per-model sigma for every sample
            # (test_3D.py:461-469)
            sigma_rep = jnp.broadcast_to(
                sigma[None], (n_aleatoric_samples,) + sigma.shape)
            return jax.nn.softmax(logits, axis=-1), sigma_rep

        out, sigmas = jax.vmap(per_model)(stacked_variables, keys)
        s_total = n_models * n_aleatoric_samples
        return (out.reshape((s_total,) + out.shape[2:]),
                sigmas.reshape((s_total,) + sigmas.shape[2:]))

    return predict


def make_ssn_predictor(model, n_pred: int) -> Callable:
    """(stacked_variables, x, rng) -> (n_pred, B, *sp, C).

    One low-rank MVN per window batch, ``n_pred`` draws reshaped to class
    maps (reference: test_3D.py:361-396). Single-model only, matching the
    reference's SSN path.
    """
    def predict(stacked_variables, x, rng):
        variables = jax.tree_util.tree_map(lambda v: v[0], stacked_variables)
        dist = model.apply(variables, x, deterministic=True)
        samples = dist.sample(rng, (n_pred,))  # (S, B, C*V)
        b = x.shape[0]
        spatial = x.shape[1:-1]
        logits = samples.reshape((n_pred, b, model.num_classes) + spatial)
        logits = jnp.moveaxis(logits, 2, -1)
        return jax.nn.softmax(logits, axis=-1), None

    return predict


def total_passes(mode: str, n_models: int, n_pred: int,
                 n_aleatoric_samples: int) -> int:
    """The global stochastic-pass count S for a C1 mode (the sample axis
    the mesh shards; SURVEY.md §2.7 'the headline win')."""
    if mode == "tta":
        return n_models * 16
    if mode == "aleatoric":
        return n_models * n_aleatoric_samples
    if mode == "ssn":
        return n_pred
    return n_models * n_pred


def make_pass_range_predictor(model, mode: str, n_models: int,
                              n_pred: int = 1,
                              n_aleatoric_samples: int = 10,
                              stochastic: Optional[bool] = None) -> Callable:
    """(stacked_variables, x, rng, pass_start, n_local) -> local stacks.

    Computes passes [pass_start, pass_start + n_local) of the GLOBAL
    sample axis, with every random draw keyed by the global pass index
    (``fold_in(rng, global_pass)``) — so any sharding of the pass space
    produces bit-identical slices regardless of shard count. This is the
    per-shard body of the generalized ``mesh_strategy="sample"``
    (VERDICT r2 item 5): params are tiny at these model sizes, so they
    replicate and only the pass index space shards.

    ``pass_start`` is traced (a shard's ``axis_index * n_local``);
    ``n_local`` is static. Pass ordering matches the unsharded
    predictors: models outer, variants/samples inner.
    """
    if stochastic is None:
        stochastic = bool(getattr(model, "do_dropout", False))

    def member(stacked_variables, m):
        return jax.tree_util.tree_map(
            lambda v: jax.lax.dynamic_index_in_dim(v, m, 0, False),
            stacked_variables)

    if mode == "default":
        def predict(stacked_variables, x, rng, pass_start, n_local):
            def per_pass(i):
                p = pass_start + i
                m = p // n_pred
                return _apply_softmax(
                    model, member(stacked_variables, m), x,
                    jax.random.fold_in(rng, p), stochastic)
            return jax.vmap(per_pass)(jnp.arange(n_local)), None
        return predict

    if mode == "tta":
        def predict(stacked_variables, x, rng, pass_start, n_local):
            var_key, noise_key, drop_key = jax.random.split(rng, 3)
            # same noised input on every shard (one draw per volume, as
            # in make_tta_predictor / batchgenerators' defaults)
            variance = jax.random.uniform(var_key, (), minval=0.0,
                                          maxval=0.1)
            noise = jax.random.normal(noise_key, x.shape, dtype=x.dtype)
            x_noise = x + noise * variance

            # All 16 input variants are materialized ONCE (they are
            # pass-independent, cheap elementwise flips) and each pass
            # gathers its own — the model forward stays vmapped and runs
            # exactly once per pass. The earlier lax.switch over whole
            # forwards executed EVERY branch under vmap's batching rule
            # (switch with a batched index lowers to eval-all +
            # select_n): 16x wasted model forwards per pass. Only the
            # cheap output unflip stays a switch (8 elementwise flips).
            flip_axes = ((),) + tuple(FLIP_COMBOS)
            variants = jnp.stack(
                [jnp.flip(src, axis=axes) if axes else src
                 for src in (x, x_noise) for axes in flip_axes])

            unflip = [lambda o, axes=axes: (jnp.flip(o, axis=axes)
                                            if axes else o)
                      for axes in flip_axes]

            def per_pass(i):
                p = pass_start + i
                m = p // 16
                v = p % 16
                inp = jax.lax.dynamic_index_in_dim(variants, v, 0, False)
                out = _apply_softmax(model, member(stacked_variables, m),
                                     inp, jax.random.fold_in(drop_key, p),
                                     stochastic)
                return jax.lax.switch(v % 8, unflip, out)
            return jax.vmap(per_pass)(jnp.arange(n_local)), None
        return predict

    if mode == "aleatoric":
        def predict(stacked_variables, x, rng, pass_start, n_local):
            def per_pass(i):
                p = pass_start + i
                m = p // n_aleatoric_samples
                mu, s = model.apply(member(stacked_variables, m), x,
                                    deterministic=True)
                sigma = jnp.exp(s / 2.0)
                eps = jax.random.normal(jax.random.fold_in(rng, p),
                                        mu.shape, dtype=mu.dtype)
                return jax.nn.softmax(mu + sigma * eps, axis=-1), sigma
            out, sigmas = jax.vmap(per_pass)(jnp.arange(n_local))
            return out, sigmas
        return predict

    if mode == "ssn":
        def predict(stacked_variables, x, rng, pass_start, n_local):
            variables = jax.tree_util.tree_map(lambda v: v[0],
                                               stacked_variables)
            dist = model.apply(variables, x, deterministic=True)
            b = x.shape[0]
            spatial = x.shape[1:-1]

            def per_pass(i):
                sample = dist.sample(
                    jax.random.fold_in(rng, pass_start + i), (1,))
                logits = sample.reshape((b, model.num_classes) + spatial)
                return jax.nn.softmax(jnp.moveaxis(logits, 1, -1), axis=-1)
            return jax.vmap(per_pass)(jnp.arange(n_local)), None
        return predict

    raise ValueError(f"Unknown C1 prediction mode: {mode}")


def make_predictor(model, mode: str, n_models: int, n_pred: int = 1,
                   n_aleatoric_samples: int = 10,
                   stochastic: Optional[bool] = None) -> Callable:
    """Factory returning a jittable (stacked_variables, x, rng) -> softmax
    stack function for the given C1 mode."""
    if stochastic is None:
        stochastic = bool(getattr(model, "do_dropout", False))
    if mode == "tta":
        return make_tta_predictor(model, n_models)
    if mode == "aleatoric":
        return make_aleatoric_predictor(model, n_models, n_aleatoric_samples)
    if mode == "ssn":
        if n_models != 1:
            raise ValueError("SSN inference supports a single model")
        return make_ssn_predictor(model, n_pred)
    if mode == "default":
        return make_default_predictor(model, n_models, n_pred, stochastic)
    raise ValueError(f"Unknown C1 prediction mode: {mode}")
