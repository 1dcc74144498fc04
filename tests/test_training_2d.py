"""HRNet training path: BatchNorm state threading through the train step."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from values_tpu.config import make_config
from values_tpu.training.experiment import Experiment
from tests.test_hrnet import small_cfg

H, W = 32, 32


def _experiment(ssn=False):
    cfg = make_config({
        "exp_name": "gta-test", "seed": 1,
        "learning_rate": 0.01, "weight_decay": 0.0005,
        "pretrain_epochs": 1, "n_aleatoric_samples": 2,
        "datamodule": {"ignore_index": 255, "num_classes": 5},
        "model": {"_target_": "values_tpu.models.hrnet.get_seg_model",
                  "cfg": small_cfg(num_classes=5, ssn=ssn)},
        "optimizer": {"_target_": "torch.optim.SGD", "lr": 0.01,
                      "momentum": 0.9, "weight_decay": 0.0005},
        "lr_scheduler": {"_target_":
                         "torch.optim.lr_scheduler.PolynomialLR",
                         "power": 0.9},
    })
    return Experiment(cfg)


def test_hrnet_train_step_updates_batch_stats(rng):
    exp = _experiment()
    state = exp.init_state_2d(jax.random.PRNGKey(0), H, W, 3)
    assert exp.has_model_state
    before = np.asarray(state.model_state["batch_stats"]["bn1"]["mean"])
    batch = {
        "data": jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32)),
        "seg": jnp.asarray(rng.randint(0, 5, size=(2, H, W))),
    }
    state2, loss = exp.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    after = np.asarray(state2.model_state["batch_stats"]["bn1"]["mean"])
    assert not np.allclose(before, after)  # BN stats updated
    # params changed too
    k0 = np.asarray(state2.params["conv1"]["kernel"])
    # val step consumes the running stats
    out = exp.val_step(state2.params, state2.model_state, batch,
                       jax.random.PRNGKey(2))
    assert np.isfinite(float(out["val_loss"]))
    assert 0 <= float(out["val_dice"]) <= 1


def test_hrnet_ignore_index_255_loss_path(rng):
    exp = _experiment()
    assert exp.ignore_index == 255
    state = exp.init_state_2d(jax.random.PRNGKey(0), H, W, 3)
    seg = rng.randint(0, 5, size=(1, H, W))
    seg[:, :4] = 255  # ignore region
    batch = {"data": jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32)),
             "seg": jnp.asarray(seg)}
    _, loss = exp.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_hrnet_ssn_train_step(rng):
    exp = _experiment(ssn=True)
    assert exp.is_ssn
    state = exp.init_state_2d(jax.random.PRNGKey(0), H, W, 3)
    batch = {"data": jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32)),
             "seg": jnp.asarray(rng.randint(0, 5, size=(1, H, W)))}
    _, loss = exp.train_step(state, batch, jax.random.PRNGKey(1),
                             False)
    assert np.isfinite(float(loss))


@pytest.mark.slow
def test_fit_2d_end_to_end(tmp_path):
    """fit() through the 2D path: BaseDataModule + augmentation pipeline +
    HRNet + SGD/polynomial LR, checkpoint usable by the 2D tester."""
    import pickle
    import numpy as np
    from values_tpu.config import make_config
    from values_tpu.training.loops import fit
    from tests.test_2d_path import AUG_CONFIG, H as H2, W as W2

    rng = np.random.RandomState(0)
    root = tmp_path / "GTA"
    names = {"gta": [f"{i:05d}.npy" for i in range(4)],
             "cs": [f"city_{i:03d}.npy" for i in range(2)]}
    for ds, sub in (("gta", "OriginalData"),
                    ("cs", "CityScapesOriginalData")):
        img_dir = root / sub / "preprocessed" / "images"
        lbl_dir = root / sub / "preprocessed" / "labels"
        img_dir.mkdir(parents=True)
        lbl_dir.mkdir(parents=True)
        for name in names[ds]:
            np.save(img_dir / name,
                    (rng.rand(H2, W2, 3) * 255).astype(np.uint8))
            np.save(lbl_dir / name,
                    rng.randint(0, 5, size=(H2, W2)).astype(np.int64))
    splits = [{
        "train": [(n, "gta") for n in names["gta"][:2]],
        "val": [(names["gta"][2], "gta")],
        "id_test": [(names["gta"][3], "gta")],
        "ood_test": [(names["cs"][0], "cs")],
        "id_unlabeled_pool": [],
        "ood_unlabeled_pool": [(names["cs"][1], "cs")],
    }]
    splits_dir = root / "splits" / "firstCycle"
    splits_dir.mkdir(parents=True)
    with open(splits_dir / "splits.pkl", "wb") as f:
        pickle.dump(splits, f)

    aug = {k: v for k, v in AUG_CONFIG.items()}
    aug["height"], aug["width"] = H2, W2
    cfg = make_config({
        "exp_name": "Softmax-GTA-fit", "version": 0, "seed": 1,
        "save_dir": str(tmp_path / "exp"),
        "data_input_dir": str(root),
        "max_epochs": 2, "batch_size": 2,
        "learning_rate": 0.01, "weight_decay": 0.0005,
        "MODEL": small_cfg(num_classes=5)["MODEL"],
        "model": {"_target_": "values_tpu.models.hrnet.get_seg_model",
                  "cfg": small_cfg(num_classes=5)},
        "optimizer": {"_target_": "torch.optim.SGD", "lr": 0.01,
                      "momentum": 0.9, "weight_decay": 0.0005},
        "lr_scheduler": {"_target_":
                         "torch.optim.lr_scheduler.PolynomialLR",
                         "power": 0.9},
        "datamodule": {
            "_target_": "values_tpu.data.base_datamodule.BaseDataModule",
            "num_classes": 5, "ignore_index": 255, "num_workers": 0,
            "batch_size": 2, "val_batch_size": 1, "data_fold_id": 0,
            "dataset": {
                "_target_":
                    "values_tpu.data.cityscapes_dataset.CityscapesDataset",
                "splits_path": str(splits_dir / "splits.pkl")},
        },
        "AUGMENTATIONS": aug,
    })
    ckpt = fit(cfg)
    from values_tpu.training.checkpoint import load_checkpoint
    payload = load_checkpoint(ckpt)
    assert "batch_stats" in payload["state_dict"]
    assert payload["epoch"] == 1


def test_hrnet_bf16_train_step(rng):
    """precision=bf16 for the 2D family: HRNet takes the dtype knob
    (get_seg_model forwards it), the loss reduces in f32, and the first
    step's loss stays close to the f32 path on the same init/batch."""
    losses = {}
    for prec in ("32", "bf16"):
        cfg = make_config({
            "exp_name": "gta-test", "seed": 1, "precision": prec,
            "learning_rate": 0.01, "weight_decay": 0.0005,
            "datamodule": {"ignore_index": 255, "num_classes": 5},
            "model": {"_target_": "values_tpu.models.hrnet.get_seg_model",
                      "cfg": small_cfg(num_classes=5)},
        })
        exp = Experiment(cfg)
        assert exp.mixed_bf16 == (prec == "bf16")
        state = exp.init_state_2d(jax.random.PRNGKey(0), H, W, 3)
        r = np.random.RandomState(0)
        seg = r.randint(0, 5, size=(2, H, W))
        seg[:, :4] = 255
        batch = {"data": jnp.asarray(r.rand(2, H, W, 3)
                                     .astype(np.float32)),
                 "seg": jnp.asarray(seg)}
        _, loss = exp.train_step(state, batch, jax.random.PRNGKey(1))
        losses[prec] = float(loss)
        assert np.isfinite(losses[prec])
    assert abs(losses["32"] - losses["bf16"]) < 0.05 * abs(losses["32"])
