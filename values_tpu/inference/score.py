"""Scores-only inference CLI: per-volume Dice + C3 aggregation scores
with NO per-voxel volumes ever leaving the chip.

This is the batch front-end of :mod:`values_tpu.inference.scoring` — the
TPU-native replacement for the reference's scores-producing composition
(test_3D.py:399-534 inference -> aggregate_uncertainties.py:13-96 ->
per-image score JSONs) for the workloads that only consume image-level
scores: OoD detection, failure detection and active-learning
acquisition. Where ``test_3d`` materializes the full ``test_results/``
nii.gz tree (the contract the evaluation CLIs read), ``score`` runs one
compiled program per batch and writes a single JSON of
``{subject: {row: value}}`` — 10 scalars per volume.

Single-window volumes only (the shipped LIDC geometry: 64^3 crops =
one window); multi-window volumes need the stitching engine — use
``values_tpu.inference.test_3d``.

Usage:
    python -m values_tpu.inference.score \
        --checkpoint_paths ckpt1 ckpt2 ... -i <data> --out scores.json \
        --test_split id
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List

import numpy as np

from ..config import instantiate, make_config
from ..core.seed import set_seed
from ..data.samples import get_val_test_data_samples
from ..parallel.mesh import resolve_device_count
from ..models.ssn_unet3d import SsnUNet3D
from ..training.checkpoint import load_any_checkpoint
from .test_3d import (dir_and_subjects_from_train,
                      dir_and_subjects_from_train_lidc)


def score_cli(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint_paths", type=str, nargs="+",
                        required=True)
    parser.add_argument("-i", "--data_input_dir", type=str, default=None)
    parser.add_argument("--out", type=str, required=True,
                        help="output JSON path")
    parser.add_argument("--test_split", type=str, default="id")
    parser.add_argument("--n_pred", type=int, default=None,
                        help="stochastic passes (MC dropout) / SSN "
                        "samples; default: 1 MC pass, the checkpoint's "
                        "n_aleatoric_samples for SSN")
    parser.add_argument("--test_time_augmentations", "-tta", dest="tta",
                        action="store_true")
    parser.add_argument("--batch_size", type=int, default=32,
                        help="volumes per compiled step")
    parser.add_argument("--agg_patch", type=int, default=10)
    parser.add_argument("--threshold", type=float, default=0.3,
                        help="scalar threshold for all three "
                        "uncertainty classes (ignored with "
                        "--threshold_path)")
    parser.add_argument("--threshold_path", type=str, default=None,
                        help="threshold_analysis.json from "
                        "evaluation.find_threshold: per-class "
                        "thresholds keyed by --pred_model")
    parser.add_argument("--pred_model", type=str, default="Ensemble",
                        help="threshold_analysis.json row to use")
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"])
    parser.add_argument("--devices", type=str, default=None,
                        help="data-parallel scoring over N chips "
                        "(or 'all'): the batch shards over the mesh "
                        "data axis, params replicate, only the score "
                        "matrix crosses ICI")
    return parser.parse_args(argv)


def _build_scorer(hparams: Dict, model, members: int, args, interpret):
    import jax.numpy as jnp
    from . import scoring
    dtype = jnp.dtype(args.dtype)
    patch = hparams["datamodule"]["patch_size"]
    threshold = args.threshold
    if args.threshold_path:
        # per-class thresholds, reference scheme: "Mean <class> threshold"
        # with PE->predictive, EE->aleatoric, MI->epistemic
        with open(args.threshold_path) as f:
            tj = json.load(f)[args.pred_model]
        threshold = tuple(tj[f"Mean {c} threshold"]
                          for c in ("predictive", "aleatoric", "epistemic"))
    common = dict(agg_patch=args.agg_patch, threshold=threshold,
                  dtype=dtype, interpret=interpret)
    if isinstance(model, SsnUNet3D):
        # --n_pred overrides the training-time sample count (reference
        # test_3D.py: SSN draws n_pred samples per volume); the SSN
        # scorer streams member by member, so ensembles work too
        n_pred = (args.n_pred if args.n_pred
                  else hparams.get("n_aleatoric_samples", 10))
        return scoring.make_packed_ssn_scorer(
            model.num_classes, members, patch, n_pred=n_pred,
            rank=model.rank, epsilon=model.epsilon, **common)
    if args.tta:
        if getattr(model, "aleatoric_loss", False):
            raise ValueError(
                "TTA on an aleatoric-head checkpoint is not a reference "
                "C1 family; drop -tta or use values_tpu.inference.test_3d")
        # reference TTA runs dropout live per variant when the model has it
        return scoring.make_packed_tta_scorer(
            members, patch,
            do_dropout=bool(getattr(model, "do_dropout", False)), **common)
    if getattr(model, "aleatoric_loss", False):
        return scoring.make_packed_aleatoric_scorer(
            members, patch,
            n_aleatoric_samples=hparams.get("n_aleatoric_samples", 10),
            **common)
    if args.n_pred and args.n_pred > 1:
        if not getattr(model, "do_dropout", False):
            raise ValueError(
                "--n_pred > 1 needs a dropout model (MC dropout); this "
                "checkpoint's model has do_dropout=False")
        return scoring.make_packed_dropout_scorer(
            members, patch, n_pred=args.n_pred, **common)
    return scoring.make_packed_scorer(members, patch, **common)


def run_score(args) -> Dict[str, Dict[str, float]]:
    import jax
    import jax.numpy as jnp

    all_variables = []
    all_hparams = []
    for path in args.checkpoint_paths:
        hparams, variables = load_any_checkpoint(path)
        all_hparams.append(hparams)
        all_variables.append(variables)
    hparams = all_hparams[0]  # first member pins the config (test_3d.run_test)
    set_seed(hparams.get("seed", 123))

    is_lidc = "shift_feature" in hparams["datamodule"]
    if is_lidc:
        test_data_dir, subject_ids = dir_and_subjects_from_train_lidc(
            hparams, args, args.test_split)
    else:
        test_data_dir, subject_ids = dir_and_subjects_from_train(
            hparams, args)
    patch = hparams["datamodule"]["patch_size"]
    samples = get_val_test_data_samples(
        base_dir=test_data_dir, subject_ids=subject_ids,
        test=args.test_split not in ("val", "train"),
        num_raters=hparams["datamodule"]["num_raters"],
        patch_size=patch,
        patch_overlap=hparams["datamodule"]["patch_overlap"],
        label_suffix="_mask" if is_lidc else "", flat_dirs=is_lidc)
    by_image: Dict[str, List[Dict]] = {}
    for s in samples:
        by_image.setdefault(s["image_path"], []).append(s)
    multi = [p for p, ws in by_image.items() if len(ws) > 1]
    if multi:
        raise ValueError(
            f"{len(multi)} volumes have >1 sliding window (e.g. "
            f"{os.path.basename(multi[0])}); the scores-only path takes "
            "single-window volumes — use values_tpu.inference.test_3d")

    model_cfg = make_config(dict(hparams["model"]))
    extra = {}
    if hparams.get("aleatoric_loss") is not None:
        extra["aleatoric_loss"] = hparams.get("aleatoric_loss")
    model = instantiate(model_cfg, **extra)

    from ..models.ensemble_unet3d import group_member_variables
    stacked = group_member_variables(all_variables)
    interpret = jax.devices()[0].platform != "tpu"
    score, rows = _build_scorer(hparams, model, len(all_variables), args,
                                interpret)
    n_devices = (resolve_device_count(args.devices)
                 if getattr(args, "devices", None) else 1)
    if n_devices > 1:
        from ..parallel.mesh import make_mesh, make_sharded_scorer
        mesh = make_mesh(n_data=n_devices, n_sample=1,
                         devices=jax.devices()[:n_devices])
        score = make_sharded_scorer(score, mesh)
    else:
        score = jax.jit(score)
    rng = jax.random.PRNGKey(hparams.get("seed", 123))

    paths = sorted(by_image)
    results: Dict[str, Dict[str, float]] = {}
    bs = args.batch_size
    for i in range(0, len(paths), bs):
        chunk = paths[i:i + bs]
        vols = np.stack([np.load(p).astype(np.float32) for p in chunk])
        # all raters: the dice row is the reference's mean-over-raters
        gt = np.stack([
            np.stack([np.load(lp)
                      for lp in by_image[p][0]["label_paths"]])
            for p in chunk]).astype(np.int32)
        out = np.asarray(score(stacked, jnp.asarray(vols[..., None]),
                               jnp.asarray(gt),
                               jax.random.fold_in(rng, i)))
        for j, p in enumerate(chunk):
            subject = os.path.basename(p).rsplit(".", 1)[0]
            results[subject] = {r: float(out[k, j])
                                for k, r in enumerate(rows)}
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {len(results)} volumes x {len(rows)} scores -> "
          f"{args.out}")
    return results


def main(argv=None) -> None:
    from ..core.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    run_score(score_cli(argv))


if __name__ == "__main__":
    main()
