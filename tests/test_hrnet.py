"""HRNet parity vs the reference torch module (loaded from the read-only
mount as a numeric oracle), on a scaled-down config for CPU speed."""
import importlib.util
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from values_tpu.models.hrnet import HighResolutionNet, get_seg_model
from values_tpu.models.torch_import import hrnet_params_from_torch

REF = "/root/reference/uncertainty_modeling/models/hrnet_module.py"
needs_ref = pytest.mark.skipif(not os.path.exists(REF),
                               reason="reference mount not available")


def small_cfg(num_classes=5, ssn=False, dropout_final=False):
    model = {
        "NAME": "hrnet", "PRETRAINED": False, "ALIGN_CORNERS": False,
        "INPUT_CHANNELS": 3,
        "EXTRA": {
            "FINAL_CONV_KERNEL": 1,
            "STAGE1": {"NUM_MODULES": 1, "NUM_BRANCHES": 1,
                       "BLOCK": "BOTTLENECK", "NUM_BLOCKS": [2],
                       "NUM_CHANNELS": [8], "FUSE_METHOD": "SUM"},
            "STAGE2": {"NUM_MODULES": 1, "NUM_BRANCHES": 2,
                       "BLOCK": "BASIC", "NUM_BLOCKS": [2, 2],
                       "NUM_CHANNELS": [4, 8], "FUSE_METHOD": "SUM"},
            "STAGE3": {"NUM_MODULES": 2, "NUM_BRANCHES": 3,
                       "BLOCK": "BASIC", "NUM_BLOCKS": [2, 2, 2],
                       "NUM_CHANNELS": [4, 8, 16],
                       "DROPOUT": [False, False, False],
                       "FUSE_METHOD": "SUM"},
            "STAGE4": {"NUM_MODULES": 1, "NUM_BRANCHES": 4,
                       "BLOCK": "BASIC", "NUM_BLOCKS": [2, 2, 2, 2],
                       "NUM_CHANNELS": [4, 8, 16, 32],
                       "DROPOUT": [False, False, False, False],
                       "FUSE_METHOD": "SUM"},
        },
    }
    if dropout_final:
        model["EXTRA"]["DROPOUT_FINAL"] = True
    if ssn:
        model.update({"SSN": True, "SSN_RANK": 3, "SSN_EPS": 1e-5})
    return {"MODEL": model, "DATASET": {"NUM_CLASSES": num_classes}}


class _AttrDict(dict):
    __getattr__ = dict.__getitem__

    def keys(self):
        return super().keys()


def _to_torch_cfg(d):
    if isinstance(d, dict):
        return _AttrDict({k: _to_torch_cfg(v) for k, v in d.items()})
    return d


def _load_reference_hrnet():
    spec = importlib.util.spec_from_file_location("ref_hrnet", REF)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_hrnet"] = mod
    spec.loader.exec_module(mod)
    return mod


@needs_ref
def test_forward_parity(rng):
    ref = _load_reference_hrnet()
    import torch
    cfg = small_cfg()
    with jax.enable_x64(True):
        tm = ref.HighResolutionNet(_to_torch_cfg(cfg)).double().eval()
        # randomize BN running stats so eval-mode normalization is exercised
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.data = torch.randn_like(m.running_mean) * 0.1
                m.running_var.data = torch.rand_like(m.running_var) + 0.5
        x = rng.randn(1, 3, 32, 48).astype(np.float64)
        with torch.no_grad():
            t_out = tm(torch.tensor(x))
        variables = hrnet_params_from_torch(tm.state_dict(),
                                            dtype=np.float64)
        jm = HighResolutionNet(cfg=cfg, dtype=jnp.float64,
                               param_dtype=jnp.float64)
        x_jax = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
        j_out = jax.jit(lambda v, x: jm.apply(v, x))(variables, x_jax)
        j_nchw = np.transpose(np.asarray(j_out), (0, 3, 1, 2))
        np.testing.assert_allclose(j_nchw, t_out.numpy(), atol=1e-8)


@needs_ref
def test_ssn_head_parity_mean(rng):
    ref = _load_reference_hrnet()
    import torch
    cfg = small_cfg(ssn=True)
    with jax.enable_x64(True):
        tm = ref.HighResolutionNet(_to_torch_cfg(cfg)).double().eval()
        x = rng.randn(1, 3, 16, 16).astype(np.float64)
        with torch.no_grad():
            t_dist = tm(torch.tensor(x))
        variables = hrnet_params_from_torch(tm.state_dict(),
                                            dtype=np.float64)
        jm = HighResolutionNet(cfg=cfg, dtype=jnp.float64,
                               param_dtype=jnp.float64)
        x_jax = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
        j_dist = jm.apply(variables, x_jax)
        np.testing.assert_allclose(np.asarray(j_dist.mean),
                                   t_dist.loc.numpy(), atol=1e-8)
        np.testing.assert_allclose(np.asarray(j_dist.cov_diag),
                                   t_dist.cov_diag.numpy(), atol=1e-8)
        np.testing.assert_allclose(np.asarray(j_dist.cov_factor),
                                   t_dist.cov_factor.numpy(), atol=1e-8)


def test_dropout_final_is_stochastic(rng):
    cfg = small_cfg(dropout_final=True)
    jm = HighResolutionNet(cfg=cfg)
    x = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    variables = jax.jit(
        lambda k, x: jm.init({"params": k, "dropout": k}, x))(
        jax.random.PRNGKey(0), x)
    fwd = jax.jit(lambda v, x, k: jm.apply(v, x, rngs={"dropout": k}))
    a = fwd(variables, x, jax.random.PRNGKey(1))
    b = fwd(variables, x, jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_train_mode_updates_batch_stats(rng):
    cfg = small_cfg()
    jm = HighResolutionNet(cfg=cfg)
    x = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    variables = jax.jit(jm.init)(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables
    out, mutated = jax.jit(
        lambda v, x: jm.apply(v, x, train=True,
                              mutable=["batch_stats"]))(variables, x)
    before = np.asarray(variables["batch_stats"]["bn1"]["mean"])
    after = np.asarray(mutated["batch_stats"]["bn1"]["mean"])
    assert not np.allclose(before, after)


def test_get_seg_model_factory():
    model = get_seg_model(small_cfg())
    assert model.num_classes == 5
    assert not model.ssn


def test_pretrained_warm_start_merges_matching_keys(tmp_path):
    """MODEL.PRETRAINED (converted pickle) warm-starts training init:
    matching keys/shapes replaced, the rest (incl. last_layer) kept."""
    import pickle
    import jax
    import jax.numpy as jnp
    from values_tpu.config import make_config
    from values_tpu.models.hrnet import HighResolutionNet
    from values_tpu.training.experiment import Experiment

    cfg_dict = small_cfg(num_classes=5)
    model = HighResolutionNet(cfg=cfg_dict)
    donor = jax.jit(model.init)(jax.random.PRNGKey(7),
                                jnp.zeros((1, 32, 32, 3)))
    donor_np = jax.tree_util.tree_map(np.asarray, donor)
    pk = tmp_path / "pre.pkl"
    with open(pk, "wb") as f:
        pickle.dump({"variables": donor_np}, f)

    cfg = make_config({
        "model": {"_target_": "values_tpu.models.hrnet.HighResolutionNet",
                  "cfg": cfg_dict},
        "MODEL": {"PRETRAINED": str(pk),
                  "INPUT_CHANNELS": 3},
        "AUGMENTATIONS": {"height": 32, "width": 32},
        "datamodule": {"ignore_index": 0},
        "seed": 1,
    })
    exp = Experiment(cfg)
    state = exp.init_state_2d(jax.random.PRNGKey(0), 32, 32, 3)
    got = state.params["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(got),
                                  donor_np["params"]["conv1"]["kernel"])
    cfg2 = make_config({
        "model": {"_target_": "values_tpu.models.hrnet.HighResolutionNet",
                  "cfg": cfg_dict},
        "MODEL": {"PRETRAINED": str(tmp_path / "nope.pkl"),
                  "INPUT_CHANNELS": 3},
        "AUGMENTATIONS": {"height": 32, "width": 32},
        "datamodule": {"ignore_index": 0},
        "seed": 1,
    })
    with pytest.raises(FileNotFoundError):
        Experiment(cfg2).init_state_2d(jax.random.PRNGKey(0), 32, 32, 3)
