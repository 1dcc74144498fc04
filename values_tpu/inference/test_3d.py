"""3D inference CLI (C1 + C2): checkpoint-driven, reference-compatible.

Reference entry: ``python uncertainty_modeling/test_3D.py`` (reference:
test_3D.py:28-120,625-701). Everything is reconstructed from the
checkpoint's ``hyper_parameters``: model, data dirs, splits, patch
geometry, save paths. Multiple ``--checkpoint_paths`` form a deep
ensemble; ``--n_pred`` controls MC/SSN/aleatoric sample counts; ``-tta``
switches to test-time augmentation. Both native values_tpu checkpoints and
reference PyTorch-Lightning ``.ckpt`` files are accepted.
"""
from __future__ import annotations

import argparse
import os
from typing import Dict, List, Tuple

import numpy as np

from ..config import instantiate, make_config
from ..core.io import load_pickle
from ..core.seed import set_seed
from ..data.samples import get_val_test_data_samples
from ..models.ssn_unet3d import SsnUNet3D
from ..training.checkpoint import load_any_checkpoint
from .carrier import VolumeCarrier
from .engine import SlidingWindowEngine


def test_cli(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint_paths", type=str, nargs="+",
                        required=True)
    parser.add_argument("-i", "--data_input_dir", type=str, default=None)
    parser.add_argument("--save_dir", type=str, default=None)
    parser.add_argument("--exp_name", type=str, default=None)
    parser.add_argument("--test_data_dir", type=str, default=None)
    parser.add_argument("--subject_ids", type=str, nargs="*", default=None)
    parser.add_argument("--n_pred", type=int, default=1)
    parser.add_argument("--n_reference_samples", type=int, default=5)
    parser.add_argument("--test_batch_size", type=int, default=12, nargs="?")
    parser.add_argument("--test_split", type=str, default="id")
    parser.add_argument("--test_time_augmentations", "-tta", dest="tta",
                        action="store_true")
    parser.add_argument("--no-grouped-ensemble", dest="grouped_ensemble",
                        action="store_false", default=True,
                        help="disable the MXU-optimized grouped-conv "
                             "ensemble lowering")
    parser.add_argument("--weight_mode", type=str, default="uniform",
                        choices=("uniform", "gaussian"),
                        help="stitching weight for overlapping windows: "
                             "uniform (reference parity) or a Gaussian "
                             "importance map")
    parser.add_argument("--backend", type=str, default="auto",
                        choices=("auto", "xla", "pallas"),
                        help="conv lowering for the grouped ensemble: "
                             "the batch-packed Pallas pipeline is 3-5x "
                             "faster at small window chunks (auto picks "
                             "it when eligible)")
    parser.add_argument("--sliding_window", type=int, nargs=2,
                        default=None, metavar=("PH", "PW"),
                        help="2D tester only: window the forward over "
                             "full-resolution images (PH x PW patches, "
                             "count-averaged overlaps) instead of one "
                             "whole-image pass")
    parser.add_argument("--sliding_overlap", type=float, default=0.5,
                        help="2D sliding-window stride fraction")
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=("float32", "float64", "bfloat16"),
                        help="engine compute dtype; float64 is the parity-"
                             "harness mode (requires JAX_ENABLE_X64=1)")
    parser.add_argument("--shape_bucket", type=int, default=None,
                        help="pad volume dims up to this multiple so "
                             "near-sized volumes share one compiled "
                             "program (outputs are cropped back; "
                             "numerically identical)")
    parser.add_argument("--seed", type=int, default=None,
                        help="override the sampling seed (default: the "
                             "checkpoint's hparams seed, matching the "
                             "reference's set_seed(hparams['seed']))")
    return parser.parse_args(argv)


def dir_and_subjects_from_train(hparams: Dict, args) -> Tuple[str, List[str]]:
    """Toy path (reference: test_3D.py:123-155): splits.pkl keyed by
    args.test_split; preprocessed dir under the dataset."""
    data_input_dir = args.data_input_dir or hparams["data_input_dir"]
    dataset_name = hparams["datamodule"]["dataset_name"]
    splits = load_pickle(os.path.join(data_input_dir, dataset_name,
                                      "splits.pkl"))
    fold = hparams["datamodule"]["data_fold_id"]
    subject_ids = list(splits[fold][args.test_split])
    return os.path.join(data_input_dir, dataset_name, "preprocessed"), \
        subject_ids


def dir_and_subjects_from_train_lidc(hparams: Dict, args,
                                     test_split: str = "id"):
    """LIDC path (reference: test_3D.py:158-219): shift-feature splits,
    split keys {id,ood}_test / val / train / unlabeled pools."""
    data_input_dir = args.data_input_dir or hparams["data_input_dir"]
    shift_feature = hparams["datamodule"].get("shift_feature")
    splits_path = hparams["datamodule"].get("splits_path")
    if splits_path:
        if args.data_input_dir is not None:
            splits_path = splits_path.replace(hparams["data_input_dir"],
                                              args.data_input_dir)
    else:
        splits_path = os.path.join(
            data_input_dir,
            f"splits_{shift_feature}.pkl" if shift_feature else "all")
    splits = load_pickle(splits_path)
    fold = hparams["datamodule"]["data_fold_id"]
    if test_split == "unlabeled":
        subject_ids = list(splits[fold]["id_unlabeled_pool"]) + list(
            splits[fold]["ood_unlabeled_pool"])
    elif test_split in ("val", "train"):
        subject_ids = list(splits[fold][test_split])
    else:
        subject_ids = list(splits[fold][f"{test_split}_test"])
    return os.path.join(data_input_dir, "preprocessed"), subject_ids


def build_engine(hparams: Dict, variables_list: List, args,
                 dtype=None) -> Tuple[SlidingWindowEngine, bool]:
    """Instantiate the model + engine for the checkpoint's C1 mode.
    Returns (engine, is_ssn)."""
    import jax
    import jax.numpy as jnp
    dtype = dtype or jnp.dtype(getattr(args, "dtype", None) or "float32")
    if dtype == jnp.float64 and not jax.config.jax_enable_x64:
        # without x64, jnp silently demotes f64 to f32 — the parity
        # harness would report f32 numbers as f64
        raise ValueError("--dtype float64 requires x64 mode; set "
                         "JAX_ENABLE_X64=1 (or jax.config.update"
                         "('jax_enable_x64', True)) before running")
    model_cfg = make_config(dict(hparams["model"]))
    extra = {}
    if hparams.get("aleatoric_loss") is not None:
        extra["aleatoric_loss"] = hparams.get("aleatoric_loss")
    try:
        # the model's COMPUTE dtype must match the engine dtype — casting
        # variables alone is not enough (flax modules cast activations to
        # their own dtype, silently demoting an f64 parity run to f32)
        model = instantiate(model_cfg, dtype=dtype, **extra)
    except TypeError:
        model = instantiate(model_cfg, **extra)
    is_ssn = isinstance(model, SsnUNet3D) and len(variables_list) == 1
    if is_ssn:
        mode = "ssn"
    elif args.tta:
        mode = "tta"
    elif getattr(model, "aleatoric_loss", False):
        mode = "aleatoric"
    else:
        mode = "default"
    engine = SlidingWindowEngine(
        model, variables_list, mode=mode, n_pred=args.n_pred,
        n_aleatoric_samples=hparams.get("n_aleatoric_samples", 10),
        patch_size=hparams["datamodule"]["patch_size"],
        patch_overlap=hparams["datamodule"]["patch_overlap"],
        dtype=dtype,
        seed=(args.seed if getattr(args, "seed", None) is not None
              else hparams.get("seed", 123)),
        window_batch=getattr(args, "test_batch_size", 12) or 12,
        use_grouped_ensemble=getattr(args, "grouped_ensemble", True),
        weight_mode=getattr(args, "weight_mode", "uniform"),
        backend=getattr(args, "backend", "auto"),
        shape_bucket=getattr(args, "shape_bucket", None))
    return engine, is_ssn


def save_results(carrier: VolumeCarrier, hparams: Dict, args) -> None:
    """Reference: test_3D.py:578-622."""
    save_dir = args.save_dir or hparams["save_dir"]
    data_input_dir = args.data_input_dir or hparams["data_input_dir"]
    exp_name = args.exp_name or hparams["exp_name"]
    if "shift_feature" in hparams["datamodule"]:
        org_data_path = os.path.join(data_input_dir, "images")
    elif args.test_data_dir is not None:
        org_data_path = None
    else:
        images_dir = ("imagesTr" if args.test_split in ("val", "train")
                      else "imagesTs")
        org_data_path = os.path.join(
            data_input_dir, hparams["datamodule"]["dataset_name"], images_dir)
    carrier.save_data(root_dir=save_dir, exp_name=exp_name,
                      version=hparams["version"],
                      org_data_path=org_data_path,
                      test_split=args.test_split)
    carrier.log_metrics()


def run_test(args) -> VolumeCarrier:
    all_hparams = []
    all_variables = []
    for path in args.checkpoint_paths:
        hparams, variables = load_any_checkpoint(path)
        all_hparams.append(hparams)
        all_variables.append(variables)
    hparams = all_hparams[0]
    set_seed(hparams.get("seed", 123))

    is_lidc = "shift_feature" in hparams["datamodule"]
    test_data_dir = args.test_data_dir
    subject_ids = args.subject_ids
    if test_data_dir is None:
        if is_lidc:
            test_data_dir, subject_ids = dir_and_subjects_from_train_lidc(
                hparams, args, args.test_split)
        else:
            test_data_dir, subject_ids = dir_and_subjects_from_train(
                hparams, args)

    data_samples = get_val_test_data_samples(
        base_dir=test_data_dir, subject_ids=subject_ids,
        test=args.test_split not in ("val", "train"),
        num_raters=hparams["datamodule"]["num_raters"],
        patch_size=hparams["datamodule"]["patch_size"],
        patch_overlap=hparams["datamodule"]["patch_overlap"],
        label_suffix="_mask" if is_lidc else "",
        flat_dirs=is_lidc)

    engine, is_ssn = build_engine(hparams, all_variables, args)
    carrier = engine.run_samples(data_samples)
    if args.n_pred > 1 or len(all_variables) > 1 or args.tta or (
            engine.total_samples > 1):
        carrier.compute_uncertainty(ssn=is_ssn)
    carrier.compute_metrics()
    save_results(carrier, hparams, args)
    return carrier


def main(argv=None) -> None:
    from ..core.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    run_test(test_cli(argv))


if __name__ == "__main__":
    main()
