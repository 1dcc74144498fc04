"""Packed (banded-kernel) TRAINING path tests (VERDICT r2 item 1).

The train step can route the UNet3D forward+backward through the
batch-packed banded conv (custom VJP): forward numerics must match the
flax module, and gradients must match XLA's autodiff of the flax
forward on every leaf that carries real gradient signal. (Biases of
convs feeding an instance norm have an exactly-zero true gradient —
the norm removes constant shifts — so both backends emit only roundoff
noise there; those leaves are excluded from the relative comparison.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from values_tpu.models.unet3d import UNet3D
from values_tpu.models.ensemble_unet3d_pallas import packed_train_forward
from values_tpu.ops.pallas.conv3d import (LANES, conv3d_banded_packed_ad,
                                          pack_ndhwc, unpack_ndhwc)


def test_single_conv_vjp_matches_lax():
    B, D, H, W, CIN, COUT, G = 8, 16, 16, 16, 8, 16, 2
    bp = LANES // W
    x = jax.random.normal(jax.random.PRNGKey(0), (B, D, H, W, G * CIN),
                          jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, CIN, G * COUT),
                          jnp.float32) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (G * COUT,), jnp.float32)
    xp = pack_ndhwc(x, bp)

    def f_packed(xp_, k_, b_):
        y = conv3d_banded_packed_ad(xp_, k_, b_, G, w_item=W,
                                    interpret=True)
        return jnp.sum(jnp.sin(y))

    def f_ref(xp_, k_, b_):
        flat = unpack_ndhwc(xp_, bp)
        y = jax.lax.conv_general_dilated(
            flat, k_, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=G) + b_
        return jnp.sum(jnp.sin(pack_ndhwc(y, bp)))

    g1 = jax.grad(f_packed, argnums=(0, 1, 2))(xp, k, b)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(xp, k, b)
    for name, a, c in zip(("dx", "dk", "db"), g1, g2):
        scale = float(jnp.max(jnp.abs(c)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=2e-5 * max(scale, 1.0),
                                   err_msg=name)


@pytest.mark.parametrize("act", ["leaky", "relu"])
def test_single_conv_vjp_fused_activation(act):
    """The fused epilogue activation's derivative is recovered from the
    saved post-activation output; grads must match act(conv) in XLA."""
    B, D, H, W, CIN, COUT, G = 8, 16, 16, 16, 8, 16, 2
    bp = LANES // W
    x = jax.random.normal(jax.random.PRNGKey(0), (B, D, H, W, G * CIN),
                          jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, CIN, G * COUT),
                          jnp.float32) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (G * COUT,), jnp.float32)
    xp = pack_ndhwc(x, bp)

    def f_packed(xp_, k_, b_):
        y = conv3d_banded_packed_ad(xp_, k_, b_, G, w_item=W,
                                    activation=act, interpret=True)
        return jnp.sum(jnp.sin(y))

    def f_ref(xp_, k_, b_):
        flat = unpack_ndhwc(xp_, bp)
        y = jax.lax.conv_general_dilated(
            flat, k_, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=G) + b_
        y = (jax.nn.leaky_relu(y, 0.01) if act == "leaky"
             else jax.nn.relu(y))
        return jnp.sum(jnp.sin(pack_ndhwc(y, bp)))

    np.testing.assert_allclose(float(f_packed(xp, k, b)),
                               float(f_ref(xp, k, b)), rtol=1e-5)
    g1 = jax.grad(f_packed, argnums=(0, 1, 2))(xp, k, b)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(xp, k, b)
    # tolerance is wider than the plain-conv test: the two forwards round
    # the pre-activation differently in the last ulp, so voxels that land
    # within roundoff of 0 can take opposite act' branches (1 vs slope) —
    # a benign O(1e-4)-relative disagreement concentrated in db. A wiring
    # bug (wrong slope / missing mask) would show as O(1) errors.
    for name, a, c in zip(("dx", "dk", "db"), g1, g2):
        scale = float(jnp.max(jnp.abs(c)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-3 * max(scale, 1.0),
                                   err_msg=name)


@pytest.fixture(scope="module")
def unet_setup():
    model = UNet3D(num_classes=2, initial_filter_size=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 16, 1),
                          jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    tgt = (jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 16))
           > 0.5).astype(jnp.int32)
    return model, params, x, tgt


def test_packed_train_forward_matches_flax(unet_setup):
    model, params, x, _ = unet_setup
    y_flax = model.apply({"params": params}, x)
    y_packed = packed_train_forward(params, x, interpret=True)
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_flax),
                               atol=2e-5)


def test_packed_train_gradients_match_flax(unet_setup):
    model, params, x, tgt = unet_setup

    def loss_flax(p):
        return jnp.mean((model.apply({"params": p}, x)
                         - tgt[..., None]) ** 2)

    def loss_packed(p):
        return jnp.mean((packed_train_forward(p, x, interpret=True)
                         - tgt[..., None]) ** 2)

    l1, g1 = jax.value_and_grad(loss_flax)(params)
    l2, g2 = jax.value_and_grad(loss_packed)(params)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    from jax.tree_util import keystr, tree_flatten_with_path
    flat1, _ = tree_flatten_with_path(g1)
    flat2, _ = tree_flatten_with_path(g2)
    global_scale = max(float(jnp.max(jnp.abs(a))) for _, a in flat1)
    checked = 0
    for (k1, a), (_k2, b) in zip(flat1, flat2):
        scale = float(jnp.max(jnp.abs(a)))
        if scale < 1e-6 * global_scale:
            continue  # true-zero gradient leaf (bias into instance norm)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4 * scale,
            err_msg=keystr(k1))
        checked += 1
    assert checked >= 20  # all kernels + decoder/final biases


def test_packed_train_forward_pads_ragged_batch(unet_setup):
    model, params, _, _ = unet_setup
    # batch 3 with bp=8 packs: zero-pad to 8, slice back
    x = jax.random.normal(jax.random.PRNGKey(5), (3, 16, 16, 16, 1),
                          jnp.float32)
    y_flax = model.apply({"params": params}, x)
    y_packed = packed_train_forward(params, x, interpret=True)
    assert y_packed.shape == y_flax.shape
    np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_flax),
                               atol=2e-5)


def test_packed_train_aleatoric_head():
    model = UNet3D(num_classes=2, initial_filter_size=8,
                   aleatoric_loss=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 16, 1),
                          jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    mu_f, s_f = model.apply({"params": params}, x)
    mu_p, s_p = packed_train_forward(params, x, interpret=True)
    np.testing.assert_allclose(np.asarray(mu_p), np.asarray(mu_f),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_f),
                               atol=2e-5)


@pytest.mark.slow
def test_fit_with_packed_backend_matches_xla_loss(tmp_path):
    """train_backend=packed must track the XLA backend's loss trajectory
    on identical data/seeds (same math, conv rounding differs)."""
    from values_tpu.config import make_config
    from values_tpu.training.experiment import Experiment

    losses = {}
    for backend in ("xla", "packed"):
        cfg = make_config({
            "model": {"_target_": "values_tpu.models.unet3d.UNet3D",
                      "num_classes": 2, "initial_filter_size": 8},
            "datamodule": {"ignore_index": 0},
            "learning_rate": 1e-3, "seed": 7,
            "train_backend": backend,
        })
        exp = Experiment(cfg)
        state = exp.init_state(jax.random.PRNGKey(0), 16, 1)
        rs = np.random.RandomState(0)
        track = []
        for step in range(3):
            batch = {
                "data": jnp.asarray(
                    rs.rand(2, 16, 16, 16, 1).astype(np.float32)),
                "seg": jnp.asarray(
                    (rs.rand(2, 16, 16, 16) > 0.5).astype(np.int32)),
            }
            state, loss = exp.train_step(state, batch,
                                         jax.random.PRNGKey(step))
            track.append(float(loss))
        losses[backend] = track
    np.testing.assert_allclose(losses["packed"], losses["xla"], rtol=1e-3)


@pytest.fixture(scope="module")
def ssn_setup():
    from values_tpu.models.ssn_unet3d import SsnUNet3D
    model = SsnUNet3D(num_classes=2, initial_filter_size=8, rank=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 16, 1),
                          jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, params, x


@pytest.mark.parametrize("mean_only", [False, True])
def test_packed_ssn_train_forward_matches_flax(ssn_setup, mean_only):
    from values_tpu.models.ensemble_unet3d_pallas import (
        packed_ssn_train_forward)
    model, params, x = ssn_setup
    d_flax = model.apply({"params": params}, x, mean_only=mean_only)
    d_packed = packed_ssn_train_forward(params, x, num_classes=2, rank=3,
                                        mean_only=mean_only,
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(d_packed.mean),
                               np.asarray(d_flax.mean), atol=2e-5)
    np.testing.assert_allclose(np.asarray(d_packed.cov_diag),
                               np.asarray(d_flax.cov_diag), atol=2e-5)
    np.testing.assert_allclose(np.asarray(d_packed.cov_factor),
                               np.asarray(d_flax.cov_factor), atol=2e-5)
    # same key => same sample (distribution parameters agree to roundoff)
    s1 = d_packed.rsample(jax.random.PRNGKey(3), (2,))
    s2 = d_flax.rsample(jax.random.PRNGKey(3), (2,))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=2e-4)


def test_packed_ssn_train_gradients_match_flax(ssn_setup):
    from values_tpu.models.ensemble_unet3d_pallas import (
        packed_ssn_train_forward)
    model, params, x = ssn_setup

    def scalar(dist):
        return (jnp.mean(jnp.sin(dist.mean)) + jnp.mean(dist.cov_diag)
                + jnp.mean(dist.cov_factor ** 2))

    def loss_flax(p):
        return scalar(model.apply({"params": p}, x))

    def loss_packed(p):
        return scalar(packed_ssn_train_forward(p, x, num_classes=2,
                                               rank=3, interpret=True))

    l1, g1 = jax.value_and_grad(loss_flax)(params)
    l2, g2 = jax.value_and_grad(loss_packed)(params)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    from jax.tree_util import keystr, tree_flatten_with_path
    flat1, _ = tree_flatten_with_path(g1)
    flat2, _ = tree_flatten_with_path(g2)
    global_scale = max(float(jnp.max(jnp.abs(a))) for _, a in flat1)
    checked = 0
    for (k1, a), (_k2, b) in zip(flat1, flat2):
        scale = float(jnp.max(jnp.abs(a)))
        if scale < 1e-6 * global_scale:
            continue  # true-zero gradient leaf (bias into instance norm)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-4 * scale,
            err_msg=keystr(k1))
        checked += 1
    assert checked >= 24  # trunk kernels + all three head kernels/biases


@pytest.mark.slow
def test_ssn_fit_with_packed_backend_matches_xla_loss():
    """SSN train_backend=packed must track the XLA backend's loss
    trajectory on identical data/seeds: the rsample key derivation is
    shared, so the MC noise is bitwise-identical and only conv rounding
    differs."""
    from values_tpu.config import make_config
    from values_tpu.training.experiment import Experiment

    losses = {}
    for backend in ("xla", "packed"):
        cfg = make_config({
            "model": {"_target_": "values_tpu.models.ssn_unet3d.SsnUNet3D",
                      "num_classes": 2, "initial_filter_size": 8,
                      "rank": 3},
            "datamodule": {"ignore_index": 0},
            "learning_rate": 1e-3, "seed": 7,
            "n_aleatoric_samples": 4,
            "train_backend": backend,
        })
        exp = Experiment(cfg)
        state = exp.init_state(jax.random.PRNGKey(0), 16, 1)
        rs = np.random.RandomState(0)
        track = []
        for step in range(3):
            batch = {
                "data": jnp.asarray(
                    rs.rand(2, 16, 16, 16, 1).astype(np.float32)),
                "seg": jnp.asarray(
                    (rs.rand(2, 16, 16, 16) > 0.5).astype(np.int32)),
            }
            for pretrain in (True, False):
                state, loss = exp.train_step(state, batch,
                                             jax.random.PRNGKey(step),
                                             pretrain=pretrain)
                track.append(float(loss))
        losses[backend] = track
    np.testing.assert_allclose(losses["packed"], losses["xla"], rtol=2e-3)


@pytest.mark.parametrize("family", ["softmax", "aleatoric", "ssn"])
def test_packed_val_step_matches_xla(family):
    """val_step with train_backend=packed routes the forward through the
    fused banded pipeline; val_loss/val_dice must agree with the XLA
    backend to conv rounding (identical rsample keys for SSN)."""
    from values_tpu.config import make_config
    from values_tpu.training.experiment import Experiment

    model_cfg = {"_target_": "values_tpu.models.unet3d.UNet3D",
                 "num_classes": 2, "initial_filter_size": 8}
    if family == "ssn":
        model_cfg = {"_target_": "values_tpu.models.ssn_unet3d.SsnUNet3D",
                     "num_classes": 2, "initial_filter_size": 8,
                     "rank": 3}
    rs = np.random.RandomState(1)
    batch = {
        "data": jnp.asarray(rs.rand(2, 16, 16, 16, 1).astype(np.float32)),
        "seg": jnp.asarray((rs.rand(2, 16, 16, 16) > 0.5)
                           .astype(np.int32)),
    }
    out = {}
    for backend in ("xla", "packed"):
        cfg = make_config({
            "model": dict(model_cfg),
            "datamodule": {"ignore_index": 0},
            "learning_rate": 1e-3, "seed": 7,
            "n_aleatoric_samples": 4,
            "aleatoric_loss": family == "aleatoric",
            "train_backend": backend,
        })
        exp = Experiment(cfg)
        state = exp.init_state(jax.random.PRNGKey(0), 16, 1)
        out[backend] = {
            k: float(v) for k, v in exp.val_step(
                state.params, state.model_state, batch,
                jax.random.PRNGKey(3)).items()}
    for k in out["xla"]:
        np.testing.assert_allclose(out["packed"][k], out["xla"][k],
                                   rtol=2e-3, err_msg=k)


@pytest.mark.slow
def test_ssn_bf16_training_step_runs():
    """Regression: with precision=bf16 the LowRankMVN degeneracy check
    ran a bfloat16 Cholesky (no CPU kernel -> crash; garbage rounding
    on TPU). The check must upcast to f32; one bf16 SSN train+val step
    must produce finite numbers."""
    from values_tpu.config import make_config
    from values_tpu.training.experiment import Experiment

    cfg = make_config({
        "model": {"_target_": "values_tpu.models.ssn_unet3d.SsnUNet3D",
                  "num_classes": 2, "initial_filter_size": 4, "rank": 3},
        "datamodule": {"ignore_index": 0},
        "learning_rate": 1e-3, "seed": 1, "precision": "bf16",
        "n_aleatoric_samples": 2,
    })
    exp = Experiment(cfg)
    state = exp.init_state(jax.random.PRNGKey(0), 16, 1)
    rs = np.random.RandomState(0)
    batch = {
        "data": jnp.asarray(rs.rand(2, 16, 16, 16, 1).astype(np.float32)),
        "seg": jnp.asarray((rs.rand(2, 16, 16, 16) > 0.5)
                           .astype(np.int32)),
    }
    state, loss = exp.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    out = exp.val_step(state.params, state.model_state, batch,
                       jax.random.PRNGKey(2))
    assert all(np.isfinite(float(v)) for v in out.values())
