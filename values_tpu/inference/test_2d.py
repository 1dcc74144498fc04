"""2D inference CLI (GTA5->Cityscapes path).

Behavior parity with the reference's class-based tester (reference:
uncertainty_modeling/test_2D.py:26-336):

- datamodule re-instantiated from checkpoint hparams with
  ``n_reference_samples`` patched into the test-time
  StochasticLabelSwitches (:61-114),
- prediction loops for SSN / TTA (4 dataset-provided variants, hflip
  outputs un-flipped) / plain+ensemble n_pred passes (:273-319),
- a zeros "extra class" channel appended so Dice/GED can ignore-index
  outside the softmax classes; gt==ignore_index remapped onto it
  (:205-222),
- per image: mean Dice vs the N switched reference masks (ignore_index =
  extra class), GED (ged_only), PE/EE/MI or 1-MSR (:227-248),
- saves color PNGs (mean + each pred, ignore pixels black) and float TIF
  uncertainty maps (:116-158), metrics.json with per-image + mean.
"""
from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp

from ..config import instantiate, make_config
from ..core.seed import set_seed
from ..data import cityscapes_labels as cs_labels
from ..ops import metrics as ops_metrics
from ..ops import uncertainty as ops_uncertainty
from ..training.checkpoint import load_any_checkpoint
from .test_3d import test_cli


class Tester2D:
    def __init__(self, args):
        self.checkpoints = [load_any_checkpoint(p)
                            for p in args.checkpoint_paths]
        hparams = dict(self.checkpoints[0][0])
        if "MODEL" in hparams:
            hparams["MODEL"] = dict(hparams["MODEL"])
            hparams["MODEL"]["PRETRAINED"] = False
        self.hparams = hparams
        set_seed(hparams["seed"])
        self.ignore_index = hparams["datamodule"]["ignore_index"]
        self.tta = args.tta
        self.n_pred = args.n_pred
        self.test_split = args.test_split
        self.test_dataloader = self._get_test_dataloader(args, hparams)
        # --dtype bfloat16: bf16 compute with f32 softmax (measured ~2e-3
        # mean softmax deviation on HRNet-W48; the TPU speed path). The
        # f32 default and the float64 parity mode pass the dtype through
        # to the model so activations match the requested precision.
        self.dtype = jnp.dtype(getattr(args, "dtype", None) or "float32")
        if self.dtype == jnp.float64 and not jax.config.jax_enable_x64:
            # without x64, jnp silently demotes f64 to f32 — the parity
            # harness would report f32 numbers as f64
            raise ValueError("--dtype float64 requires x64 mode; set "
                             "JAX_ENABLE_X64=1 (or jax.config.update"
                             "('jax_enable_x64', True)) before running")
        self.models = []
        for hp, variables in self.checkpoints:
            model_cfg = make_config(dict(hp["model"]))
            if self.dtype != jnp.float32:
                try:
                    model = instantiate(model_cfg, dtype=self.dtype)
                except TypeError:
                    raise ValueError(
                        f"--dtype {self.dtype} requested but the model "
                        f"config {hp['model'].get('_target_')} takes no "
                        "dtype")
            else:
                model = instantiate(model_cfg)
            self.models.append((model, variables))
        self.is_ssn = bool(getattr(self.models[0][0], "ssn", False))
        if self.is_ssn and self.dtype == jnp.bfloat16:
            raise ValueError("--dtype bfloat16 is not supported for SSN "
                             "models (the low-rank-MVN head needs f32; "
                             "use float32)")
        self.results_dict: Dict[str, Dict] = {}
        self.rng = jax.random.PRNGKey(int(hparams["seed"]))
        # full-resolution sliding-window forward (values_tpu extension;
        # the reference always runs whole 0.25x images)
        self.sliding_window = getattr(args, "sliding_window", None)
        self.sliding_overlap = getattr(args, "sliding_overlap", 0.5)
        self._sliding_cache: Dict[int, object] = {}
        if self.sliding_window is not None and self.is_ssn:
            raise ValueError("--sliding_window is not supported for SSN "
                             "models (distribution sampling needs the "
                             "whole-image covariance)")

        save_root = args.save_dir or hparams["save_dir"]
        exp_name = args.exp_name or hparams["exp_name"]
        self.save_dir = os.path.join(save_root, exp_name, "test_results",
                                     str(hparams["version"]),
                                     args.test_split)
        self.save_pred_dir = os.path.join(self.save_dir, "pred_seg")
        os.makedirs(self.save_pred_dir, exist_ok=True)

    # ------------------------------------------------------------------
    @staticmethod
    def set_n_reference_samples(hparams: Dict, n_reference_samples: int):
        transforms = hparams["AUGMENTATIONS"]["TEST"][0]["Compose"][
            "transforms"]
        for aug in transforms:
            if "StochasticLabelSwitches" in aug:
                node = aug["StochasticLabelSwitches"] or {}
                node["n_reference_samples"] = n_reference_samples
                aug["StochasticLabelSwitches"] = node
        return hparams

    def _get_test_dataloader(self, args, hparams):
        data_input_dir = args.data_input_dir or hparams["data_input_dir"]
        if args.data_input_dir is not None:
            ds = hparams["datamodule"]["dataset"]
            ds["splits_path"] = ds["splits_path"].replace(
                hparams["data_input_dir"], args.data_input_dir)
        hparams = self.set_n_reference_samples(hparams,
                                               args.n_reference_samples)
        if args.test_batch_size:
            hparams["datamodule"]["val_batch_size"] = args.test_batch_size
        dm = instantiate(make_config(dict(hparams["datamodule"],
                                          _recursive_=False)),
                         data_input_dir=data_input_dir,
                         augmentations=hparams["AUGMENTATIONS"],
                         seed=hparams["seed"], test_split=args.test_split,
                         tta=self.tta)
        dm.setup("test")
        return dm.test_dataloader()

    # ------------------------------------------------------------------
    def _forward(self, model, variables, x) -> jnp.ndarray:
        """One softmax forward, channels-first output (C, stays per image).

        DROPOUT_FINAL models need a dropout rng every pass — that IS the
        2D MC-dropout mechanism.
        """
        self.rng, key = jax.random.split(self.rng)
        if self.sliding_window is not None:
            from .window2d import SlidingPredictor2D
            sp = self._sliding_cache.get(id(model))
            if sp is None:
                sp = SlidingPredictor2D(
                    model, self.sliding_window, model.num_classes,
                    overlap=self.sliding_overlap)
                self._sliding_cache[id(model)] = sp
            x = np.asarray(x)
            return jnp.stack([
                jnp.asarray(sp(variables, x[i],
                               jax.random.fold_in(key, i)))
                for i in range(x.shape[0])])
        needs_rng = bool(getattr(model, "dropout_final", False))
        kwargs = {"rngs": {"dropout": key}} if needs_rng else {}
        logits = model.apply(variables, jnp.asarray(x), **kwargs)
        if logits.dtype == jnp.bfloat16:  # softmax/statistics stay f32
            logits = logits.astype(jnp.float32)
        return jax.nn.softmax(logits, axis=-1)

    def predict_cases(self) -> None:
        for batch in self.test_dataloader:
            preds: List[np.ndarray] = []
            for model, variables in self.models:
                if self.is_ssn:
                    dist = model.apply(variables,
                                       jnp.asarray(batch["data"]))
                    self.rng, key = jax.random.split(self.rng)
                    samples = dist.sample(key, (self.n_pred,))
                    b = batch["data"].shape[0]
                    h, w = batch["data"].shape[1:3]
                    logits = samples.reshape(
                        (self.n_pred, b, model.num_classes, h, w))
                    probs = jax.nn.softmax(logits, axis=2)
                    preds.extend(np.asarray(probs))
                elif self.tta:
                    # batch["data"]: B items x 4 variants; the reference
                    # iterates VARIANTS (each a full batch) and un-flips
                    # hflip outputs along W (test_2D.py:296-311)
                    per_item = batch["data"]
                    transforms = batch["transforms"][0]
                    for v, names in enumerate(transforms):
                        x = np.stack([item[v] for item in per_item])
                        out = self._forward(model, variables, x)
                        out_cf = np.moveaxis(np.asarray(out), -1, 1)
                        if "HorizontalFlip" in names:
                            out_cf = np.ascontiguousarray(
                                out_cf[..., ::-1])
                        preds.append(out_cf)
                else:
                    for _ in range(self.n_pred):
                        out = self._forward(model, variables, batch["data"])
                        preds.append(np.moveaxis(np.asarray(out), -1, 1))
            softmax_pred = np.stack(preds)  # (S, B, C, H, W)
            self.process_output({
                "softmax_pred": softmax_pred,
                "image_id": batch["image_id"],
                "gt": np.asarray(batch["seg"]),
                "dataset": batch["dataset"],
            }, is_ssn=self.is_ssn)
        self.save_results_dict()

    # ------------------------------------------------------------------
    def calculate_test_metrics(self, mean_softmax: np.ndarray,
                               ground_truth: np.ndarray) -> Dict:
        dices = []
        ignore = mean_softmax.shape[0] - 1
        for rater in ground_truth:
            dices.append(float(ops_metrics.dice_score(
                mean_softmax[None], rater[None], ignore_index=ignore)))
        return {"dice": float(np.mean(dices))}

    def process_output(self, all_preds: Dict, is_ssn: bool) -> None:
        softmax = all_preds["softmax_pred"]  # (S, B, C, H, W)
        s, b, c, h, w = softmax.shape
        # extra channel so ignore_index lies outside the softmax classes
        softmax = np.concatenate(
            [softmax, np.zeros((s, b, 1, h, w), dtype=softmax.dtype)],
            axis=2)
        gt = all_preds["gt"].copy()
        if gt.ndim == 3:  # single reference mask -> rater axis
            gt = gt[:, None]
        ignore_index_map = gt == self.ignore_index
        gt[ignore_index_map] = c  # the extra class index

        for image_idx in range(b):
            image_preds = softmax[:, image_idx]  # (S, C+1, H, W)
            image_id = all_preds["image_id"][image_idx]
            mean_softmax = np.mean(image_preds, axis=0)
            entry = {"dataset": all_preds["dataset"][image_idx],
                     "metrics": {}}
            entry["metrics"].update(self.calculate_test_metrics(
                mean_softmax, gt[image_idx]))
            ged = ops_metrics.generalized_energy_distance(
                image_preds, gt[image_idx], ignore_index=c, ged_only=True)
            entry["metrics"].update(
                {k: float(v) for k, v in ged.items()})
            self.results_dict[image_id] = entry

            if image_preds.shape[0] > 1:
                unc = ops_uncertainty.uncertainty_measures(image_preds,
                                                           ssn=is_ssn)
            else:
                unc = ops_uncertainty.one_minus_msr(image_preds[0])
            self.save_prediction(
                image_id, image_preds, mean_softmax,
                ignore_index_map[image_idx][0])
            self.save_uncertainty(image_id,
                                  {k: np.asarray(v)
                                   for k, v in unc.items()})

    # ------------------------------------------------------------------
    def save_prediction(self, image_id: str, image_preds: np.ndarray,
                        mean_pred: np.ndarray,
                        ignore_index_map: np.ndarray) -> None:
        import cv2
        multiple = image_preds.shape[0] > 1
        stack = (np.concatenate([mean_pred[None], image_preds])
                 if multiple else image_preds)
        for output_idx, output in enumerate(stack):
            labels = np.argmax(output, axis=0).astype(np.int32)
            labels[ignore_index_map.astype(bool)] = \
                cs_labels.name2trainId["unlabeled"]
            color = np.zeros((*labels.shape, 3), dtype=np.uint8)
            for k, v in cs_labels.trainId2color.items():
                color[labels == k] = np.array(v)
            idx = output_idx if multiple else output_idx + 1
            img_name = (f"{image_id}_mean" if idx == 0 and multiple
                        else f"{image_id}_{idx:02d}")
            cv2.imwrite(os.path.join(self.save_pred_dir, f"{img_name}.png"),
                        cv2.cvtColor(color, cv2.COLOR_BGR2RGB))

    def save_uncertainty(self, image_id: str,
                         uncertainty_dict: Dict[str, np.ndarray]) -> None:
        import cv2
        for unc_type, unc_map in uncertainty_dict.items():
            unc_dir = os.path.join(self.save_dir, unc_type)
            os.makedirs(unc_dir, exist_ok=True)
            cv2.imwrite(os.path.join(unc_dir, f"{image_id}.tif"),
                        np.asarray(unc_map, dtype=np.float32))

    def save_results_dict(self) -> None:
        mean_metrics: Dict[str, List[float]] = {}
        for value in self.results_dict.values():
            for metric, score in value["metrics"].items():
                mean_metrics.setdefault(metric, []).append(score)
        self.results_dict["mean"] = {"metrics": {
            metric: float(np.mean(scores))
            for metric, scores in mean_metrics.items()}}
        with open(os.path.join(self.save_dir, "metrics.json"), "w") as f:
            json.dump(self.results_dict, f, indent=2)


def run_test(args) -> Tester2D:
    tester = Tester2D(args)
    tester.predict_cases()
    return tester


def main(argv=None) -> None:
    from ..core.platform import honor_jax_platforms_env
    honor_jax_platforms_env()
    run_test(test_cli(argv))


if __name__ == "__main__":
    main()
