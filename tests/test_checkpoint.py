"""Checkpoint contracts: native round trip + reference torch .ckpt loading."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from values_tpu.models.unet3d import UNet3D
from values_tpu.training.checkpoint import (load_any_checkpoint,
                                            load_checkpoint, save_checkpoint)


def test_native_roundtrip(tmp_path):
    model = UNet3D(num_classes=2, initial_filter_size=2)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 16, 16, 16, 1)))
    hparams = {"exp_name": "X", "seed": 1,
               "datamodule": {"patch_size": 16}}
    path = tmp_path / "ckpt" / "last.ckpt"
    save_checkpoint(str(path), variables, hparams, epoch=3, global_step=42)
    payload = load_checkpoint(str(path))
    assert payload["epoch"] == 3 and payload["global_step"] == 42
    hp, var = load_any_checkpoint(str(path))
    assert hp["exp_name"] == "X"
    np.testing.assert_array_equal(
        np.asarray(var["params"]["final"]["kernel"]),
        np.asarray(variables["params"]["final"]["kernel"]))


def test_reference_lightning_ckpt_loads(tmp_path, rng):
    """A torch-saved Lightning-style checkpoint (zip serialization with
    model.-prefixed state_dict + hyper_parameters) must load and
    instantiate our flax UNet3D via the target alias."""
    import torch
    import importlib.util, sys
    ref = "/root/reference/uncertainty_modeling/models/unet3D_module.py"
    import os
    if not os.path.exists(ref):
        pytest.skip("reference mount not available")
    spec = importlib.util.spec_from_file_location("ref_unet3d_ckpt", ref)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_unet3d_ckpt"] = mod
    spec.loader.exec_module(mod)

    tm = mod.UNet3D(num_classes=2, initial_filter_size=2)
    state_dict = {f"model.{k}": v for k, v in tm.state_dict().items()}
    hparams = {
        "exp_name": "Softmax-Case-1", "seed": 123, "version": 0,
        "save_dir": "/tmp", "data_input_dir": "/tmp",
        "model": {
            "_target_": "uncertainty_modeling.models.unet3D_module.UNet3D",
            "num_classes": 2, "in_channels": 1, "initial_filter_size": 2,
            "kernel_size": 3, "do_instancenorm": True},
        "datamodule": {"dataset_name": "Case_1", "num_raters": 3,
                       "data_fold_id": 0, "patch_size": 16,
                       "patch_overlap": 1},
    }
    path = tmp_path / "reference.ckpt"
    torch.save({"state_dict": state_dict, "hyper_parameters": hparams},
               str(path))

    hp, variables = load_any_checkpoint(str(path))
    assert hp["exp_name"] == "Softmax-Case-1"
    # instantiate OUR model from the REFERENCE target path
    from values_tpu.config import instantiate, make_config
    model = instantiate(make_config(hp["model"]))
    assert isinstance(model, UNet3D)
    x = jnp.asarray(rng.rand(1, 16, 16, 16, 1).astype(np.float32))
    out = jax.jit(model.apply)(variables, x)
    assert out.shape == (1, 16, 16, 16, 2)
    # and the converted weights match torch numerics
    with torch.no_grad():
        t_out = tm.eval()(torch.tensor(
            np.transpose(np.asarray(x), (0, 4, 1, 2, 3))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 4, 1, 2, 3)),
        t_out.numpy(), atol=2e-4)


def test_export_roundtrip_to_reference_format(tmp_path, rng):
    """flax -> torch .ckpt -> flax roundtrip, and the exported state_dict
    loads into the reference torch module with matching forwards."""
    import os
    import importlib.util, sys
    import torch
    from values_tpu.models.torch_import import (export_reference_checkpoint,
                                                strip_model_prefix,
                                                unet3d_params_from_torch)

    model = UNet3D(num_classes=2, initial_filter_size=2)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 16, 16, 16, 1)))
    # add the AE head so the exported dict covers the full reference
    # key set it can produce (optional in flax, lazily created)
    hparams = {"exp_name": "X", "seed": 1, "version": 0,
               "model": {"_target_":
                         "uncertainty_modeling.models.unet3D_module.UNet3D",
                         "num_classes": 2, "initial_filter_size": 2},
               "datamodule": {"dataset_name": "Case_1", "num_raters": 3,
                              "data_fold_id": 0, "patch_size": 16,
                              "patch_overlap": 1},
               "save_dir": "/tmp", "data_input_dir": "/tmp"}
    path = tmp_path / "export.ckpt"
    export_reference_checkpoint(str(path), variables, hparams)

    # roundtrip back through our importer
    hp, back = load_any_checkpoint(str(path))
    np.testing.assert_allclose(
        np.asarray(back["params"]["contr_1_1"]["conv"]["kernel"]),
        np.asarray(variables["params"]["contr_1_1"]["conv"]["kernel"]),
        atol=0)

    ref = "/root/reference/uncertainty_modeling/models/unet3D_module.py"
    if not os.path.exists(ref):
        pytest.skip("reference mount not available")
    spec = importlib.util.spec_from_file_location("ref_unet3d_exp", ref)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_unet3d_exp"] = mod
    spec.loader.exec_module(mod)
    tm = mod.UNet3D(num_classes=2, initial_filter_size=2)
    ckpt = torch.load(str(path), weights_only=False)
    missing = tm.load_state_dict(strip_model_prefix(ckpt["state_dict"]),
                                 strict=False)
    # only the lazily-created flax heads may be missing
    assert all("reconstruction" in k or "aleatoric" in k
               for k in missing.missing_keys)
    x = rng.rand(1, 1, 16, 16, 16).astype(np.float32)
    with torch.no_grad():
        t_out = tm.eval()(torch.tensor(x))
    j_out = jax.jit(model.apply)(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(j_out), (0, 4, 1, 2, 3)), t_out.numpy(),
        atol=2e-4)


def test_checkpoint_retention(tmp_path):
    """best-k pruning + every-n-epoch snapshots + always-fresh last.ckpt."""
    from values_tpu.training.checkpoint import (CheckpointRetention,
                                                load_checkpoint)

    ret = CheckpointRetention(str(tmp_path), save_top_k=2, every_n_epochs=3,
                              monitor="val_loss")
    losses = [0.9, 0.5, 0.7, 0.3, 0.8, 0.4]
    for epoch, v in enumerate(losses):
        ret.save({"params": {"w": np.zeros(2)}}, {"cfg": 1}, epoch=epoch,
                 global_step=10 * (epoch + 1), monitored=v)

    names = sorted(p.name for p in tmp_path.iterdir())
    # top-2 by val_loss: 0.3 (epoch 3) and 0.4 (epoch 5)
    assert "epoch=3-val_loss=0.3000.ckpt" in names
    assert "epoch=5-val_loss=0.4000.ckpt" in names
    assert not any("0.5000" in n or "0.9000" in n for n in names)
    # every-3-epochs snapshots at epochs 2 and 5
    assert "epoch=2.ckpt" in names and "epoch=5.ckpt" in names
    assert "epoch=1.ckpt" not in names
    # last.ckpt tracks the final epoch
    last = load_checkpoint(str(tmp_path / "last.ckpt"))
    assert last["epoch"] == 5 and last["global_step"] == 60
    assert ret.best_path.endswith("epoch=3-val_loss=0.3000.ckpt")


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax format: save/load payload parity with the pickle format and
    transparent loading through load_checkpoint/load_any_checkpoint."""
    import jax.numpy as jnp
    from values_tpu.training.checkpoint import (
        load_any_checkpoint, load_checkpoint, save_checkpoint_orbax)

    variables = {"params": {"conv": {"kernel": np.arange(12.).reshape(3, 4),
                                     "bias": np.zeros(4)}}}
    opt_state = {"mu": {"conv": {"kernel": np.ones((3, 4))}}}
    path = str(tmp_path / "ck_orbax")
    save_checkpoint_orbax(path, variables, {"exp_name": "E", "seed": 7},
                          epoch=3, global_step=42, opt_state=opt_state)
    payload = load_checkpoint(path)
    assert payload["epoch"] == 3 and payload["global_step"] == 42
    np.testing.assert_array_equal(
        payload["state_dict"]["params"]["conv"]["kernel"],
        variables["params"]["conv"]["kernel"])
    np.testing.assert_array_equal(
        payload["opt_state"]["mu"]["conv"]["kernel"], 1.0)
    hparams, vs = load_any_checkpoint(path)
    assert hparams["exp_name"] == "E"
    assert vs["params"]["conv"]["bias"].shape == (4,)


def test_retention_orbax_format(tmp_path):
    from values_tpu.training.checkpoint import (CheckpointRetention,
                                                load_checkpoint)

    ret = CheckpointRetention(str(tmp_path), save_top_k=1, fmt="orbax")
    for epoch, v in enumerate((0.5, 0.2, 0.9)):
        ret.save({"params": {"w": np.zeros(2)}}, {"c": 1}, epoch=epoch,
                 global_step=epoch, monitored=v)
    names = sorted(p.name for p in tmp_path.iterdir())
    assert "last.ckpt" in names
    assert "epoch=1-val_loss=0.2000.ckpt" in names
    assert not any("0.5000" in n or "0.9000" in n for n in names)
    assert load_checkpoint(str(tmp_path / "last.ckpt"))["epoch"] == 2


def test_orbax_async_retention(tmp_path):
    """fmt='orbax-async': writes complete on a background thread; after
    wait_for_async_checkpoints the payload round-trips like sync."""
    from values_tpu.training.checkpoint import (CheckpointRetention,
                                                load_checkpoint,
                                                wait_for_async_checkpoints)

    ret = CheckpointRetention(str(tmp_path), fmt="orbax-async")
    for epoch in range(3):
        ret.save({"params": {"w": np.full((4,), float(epoch))}},
                 {"c": 1}, epoch=epoch, global_step=epoch * 5,
                 monitored=None)
    wait_for_async_checkpoints()
    payload = load_checkpoint(str(tmp_path / "last.ckpt"))
    assert payload["epoch"] == 2
    np.testing.assert_array_equal(payload["state_dict"]["params"]["w"],
                                  2.0)
