"""Joint packed deep-ensemble training (values_tpu.training.ensemble).

The reference trains each Deep Ensemble member as an independent run
(reference: uncertainty_modeling/main.py seed override per member;
test_3D.py:424 loads the N checkpoints). The joint grouped step must
reproduce those M independent runs exactly: grouped convs never mix
channel groups, so per-member losses and parameter trajectories must
match M separate Experiment(train_backend=packed) runs on the same
per-member data streams.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from values_tpu.config import make_config
from values_tpu.training.ensemble import EnsembleTrainer


def _cfg(**overrides):
    base = {
        "model": {"_target_": "values_tpu.models.unet3d.UNet3D",
                  "num_classes": 2, "initial_filter_size": 8},
        "datamodule": {"ignore_index": 0},
        "learning_rate": 1e-3, "seed": 7,
        "train_backend": "packed",
    }
    base.update(overrides)
    return make_config(base)


def _member_batches(rs, members, batch=2, patch=16):
    """Independent per-member streams, (M, B, ...) stacked."""
    data = rs.rand(members, batch, patch, patch, patch, 1)
    seg = (rs.rand(members, batch, patch, patch, patch) > 0.5)
    return {"data": jnp.asarray(data.astype(np.float32)),
            "seg": jnp.asarray(seg.astype(np.int32))}


def test_group_ungroup_roundtrip():
    from values_tpu.models.ensemble_unet3d import (group_member_variables,
                                                   ungroup_member_variables)
    ens = EnsembleTrainer(_cfg(), members=3)
    sample = jnp.zeros((1, 16, 16, 16, 1))
    trees = [jax.jit(ens.model.init)(jax.random.PRNGKey(m), sample)
             for m in range(3)]
    grouped = group_member_variables(trees)
    back = ungroup_member_variables(grouped, 3)
    flat_orig = jax.tree_util.tree_leaves_with_path(trees[1])
    flat_back = jax.tree_util.tree_leaves_with_path(back[1])
    assert len(flat_orig) == len(flat_back)
    for (p1, a), (p2, b) in zip(sorted(flat_orig, key=lambda t: str(t[0])),
                                sorted(flat_back, key=lambda t: str(t[0]))):
        assert str(p1) == str(p2)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(p1))


def test_joint_step_matches_independent_runs():
    """Per-member losses and final params of the joint grouped step must
    track M independent packed Experiment runs on the same streams."""
    from values_tpu.training.experiment import Experiment

    members, steps = 2, 3
    cfg = _cfg()
    ens = EnsembleTrainer(cfg, members=members)
    est = ens.init_state(jax.random.PRNGKey(0), 16)

    # independent runs start from the SAME per-member inits
    exp = Experiment(cfg)
    states = [exp.state_from_variables(v)
              for v in ens.member_variables(est)]

    rs = np.random.RandomState(0)
    joint_losses, indep_losses = [], []
    for step in range(steps):
        batch = _member_batches(rs, members)
        est, loss_m = ens.train_step_fn(est, batch,
                                        jax.random.PRNGKey(100 + step))
        joint_losses.append(np.asarray(loss_m))
        row = []
        for m in range(members):
            sb = {"data": batch["data"][m], "seg": batch["seg"][m]}
            states[m], lm = exp.train_step_fn(
                states[m], sb, jax.random.PRNGKey(100 + step))
            row.append(float(lm))
        indep_losses.append(np.asarray(row))

    np.testing.assert_allclose(np.asarray(joint_losses),
                               np.asarray(indep_losses), rtol=2e-4)

    # Final parameter trajectories must agree leaf-by-leaf. Biases of
    # convs feeding an instance norm (contr_* blocks) are excluded: their
    # TRUE gradient is exactly zero (the norm removes constant shifts),
    # so Adam normalizes conv-rounding noise into uncorrelated lr-scale
    # walks on them in ANY two implementations — same exclusion as
    # test_packed_training.py's gradient comparison.
    final_members = ens.member_variables(est)
    for m in range(members):
        got = jax.tree_util.tree_leaves_with_path(
            final_members[m]["params"])
        want = jax.tree_util.tree_leaves_with_path(states[m].params)
        for (pg, a), (pw, b) in zip(
                sorted(got, key=lambda t: str(t[0])),
                sorted(want, key=lambda t: str(t[0]))):
            assert str(pg) == str(pw)
            if "contr_" in str(pg) and "bias" in str(pg):
                continue
            # atol: Adam normalizes per-element gradients, so elements
            # whose true gradient is near zero drift by O(lr) per step
            # wherever the two conv implementations round differently;
            # observed drift after 3 steps is <=2e-4 on <1% of elements.
            # A member-mixing bug would shift MOST elements by O(1e-2).
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4,
                err_msg=f"member {m} {pg}")


def test_dropout_members_decorrelated():
    """With MC-dropout on, members must see different masks (losses on
    IDENTICAL data should differ across members) yet stay finite."""
    cfg = _cfg(model={"_target_": "values_tpu.models.unet3d.UNet3D",
                      "num_classes": 2, "initial_filter_size": 8,
                      "do_dropout": True})
    ens = EnsembleTrainer(cfg, members=2)
    assert ens.has_dropout
    est = ens.init_state(jax.random.PRNGKey(0), 16)
    rs = np.random.RandomState(1)
    one = rs.rand(1, 2, 16, 16, 16, 1).astype(np.float32)
    seg1 = (rs.rand(1, 2, 16, 16, 16) > 0.5).astype(np.int32)
    batch = {"data": jnp.asarray(np.repeat(one, 2, axis=0)),
             "seg": jnp.asarray(np.repeat(seg1, 2, axis=0))}
    # same INIT for both members to isolate the dropout stream
    from values_tpu.models.ensemble_unet3d import group_member_variables
    mv = ens.member_variables(est)
    est = est._replace(params=jax.tree_util.tree_map(
        jnp.asarray, group_member_variables([mv[0], mv[0]])["params"]))
    _, loss_m = ens.train_step_fn(est, batch, jax.random.PRNGKey(3))
    loss_m = np.asarray(loss_m)
    assert np.all(np.isfinite(loss_m))
    assert abs(loss_m[0] - loss_m[1]) > 1e-7


def test_aleatoric_ensemble_step():
    cfg = _cfg(aleatoric_loss=True, n_aleatoric_samples=3)
    ens = EnsembleTrainer(cfg, members=2)
    assert ens.aleatoric
    est = ens.init_state(jax.random.PRNGKey(0), 16)
    rs = np.random.RandomState(2)
    batch = _member_batches(rs, 2)
    est2, loss_m = ens.train_step_fn(est, batch, jax.random.PRNGKey(4))
    assert loss_m.shape == (2,)
    assert np.all(np.isfinite(np.asarray(loss_m)))
    # params moved
    a = jax.tree_util.tree_leaves(est.params)[0]
    b = jax.tree_util.tree_leaves(est2.params)[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_export_feeds_inference(tmp_path):
    """Member checkpoints written by the joint trainer must satisfy the
    L3->L4 contract: load_any_checkpoint reconstructs variables the
    single-member model can apply."""
    from values_tpu.training.checkpoint import load_any_checkpoint

    cfg = _cfg()
    ens = EnsembleTrainer(cfg, members=2)
    est = ens.init_state(jax.random.PRNGKey(0), 16)
    paths = ens.save_member_checkpoints(est, str(tmp_path), epoch=1)
    assert len(paths) == 2
    # random input: on an all-zeros input the affine-free instance norms
    # null every contr-block activation regardless of params
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(1, 16, 16, 16, 1).astype(np.float32))
    outs = []
    for m, path in enumerate(paths):
        hp, variables = load_any_checkpoint(path)
        assert hp["ensemble_member"] == m
        logits = ens.model.apply(variables, x)
        assert logits.shape == (1, 16, 16, 16, 2)
        outs.append(np.asarray(logits))
    assert not np.allclose(outs[0], outs[1])  # distinct inits


def test_rejects_ssn_and_clipping():
    with pytest.raises(ValueError, match="UNet3D family"):
        EnsembleTrainer(make_config({
            "model": {"_target_": "values_tpu.models.ssn_unet3d.SsnUNet3D",
                      "num_classes": 2, "initial_filter_size": 4,
                      "rank": 3},
        }), members=2)
    with pytest.raises(ValueError, match="gradient_clip_val"):
        EnsembleTrainer(_cfg(gradient_clip_val=1.0), members=2)
