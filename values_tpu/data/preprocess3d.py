"""Shared 3D preprocessing: z-score normalization + padding to npy (L0->L1).

Reproduces the reference's preprocessing numerics (reference:
uncertainty_modeling/toy_datamodule_3D.py:119-196 and
datasets/preprocess_datasets_3d.py:66-168):

- z-score normalize with eps 1e-8,
- pad each axis to ``shape + (shape % stride)`` (the reference's exact —
  quirky — formula; a no-op for the shipped 64^3 data) with the image
  minimum as constant, split centered like batchgenerators' pad_nd_image
  (below = diff//2, above = diff//2 + diff%2),
- save as ``preprocessed/images{Tr,Ts}/<id>.npy`` and
  ``preprocessed/labels{Tr,Ts}/<id>_<rater:02d>.npy``.
"""
from __future__ import annotations

import os
from typing import Sequence

import numpy as np

from ..core import nifti
from ..core.io import subfiles


def pad_to_shape(image: np.ndarray, new_shape: Sequence[int],
                 constant_value: float) -> np.ndarray:
    pads = []
    for old, new in zip(image.shape, new_shape):
        diff = max(0, new - old)
        pads.append((diff // 2, diff // 2 + diff % 2))
    return np.pad(image, pads, mode="constant", constant_values=constant_value)


def reference_pad_shape(shape: Sequence[int], stride: int) -> tuple:
    """``shape + (shape % stride)`` per axis (toy_datamodule_3D.py:144-152)."""
    return tuple(int(s) + (int(s) % stride) for s in shape)


def normalize_zscore(image: np.ndarray) -> np.ndarray:
    return (image - image.mean()) / (image.std() + 1e-8)


def preprocess_dataset(root_dir: str, num_raters: int, patch_size: int = 64,
                       patch_overlap: float = 1.0,
                       label_suffix: str = "") -> None:
    """Normalize+pad nii.gz into preprocessed npy (both Tr and Ts splits).

    ``label_suffix`` supports the LIDC naming ``<id>_<rater:02d>_mask``
    (preprocess_datasets_3d.py:113-119).
    """
    stride = int(patch_size * patch_overlap)
    for folder in ("Tr", "Ts"):
        image_dir = os.path.join(root_dir, f"images{folder}")
        label_dir = os.path.join(root_dir, f"labels{folder}")
        if not os.path.isdir(image_dir):
            continue
        out_images = os.path.join(root_dir, "preprocessed", f"images{folder}")
        out_labels = os.path.join(root_dir, "preprocessed", f"labels{folder}")
        os.makedirs(out_images, exist_ok=True)
        os.makedirs(out_labels, exist_ok=True)

        for fname in subfiles(image_dir, suffix=".nii.gz", prefix="0",
                              join=False):
            image, _ = nifti.load(os.path.join(image_dir, fname))
            image = normalize_zscore(image)
            new_shape = reference_pad_shape(image.shape, stride)
            image = pad_to_shape(image, new_shape, image.min())
            image_id = fname.split(".")[0]
            np.save(os.path.join(out_images, image_id + ".npy"), image)
            for rater in range(num_raters):
                label_name = f"{image_id}_{rater:02d}{label_suffix}.nii.gz"
                label_path = os.path.join(label_dir, label_name)
                if not os.path.exists(label_path):
                    continue
                label, _ = nifti.load(label_path)
                label = pad_to_shape(label, new_shape, label.min())
                np.save(os.path.join(
                    out_labels,
                    f"{image_id}_{rater:02d}{label_suffix}.npy"), label)


def create_kfold_splits(output_dir: str, image_dir: str, test_dir: str,
                        seed: int, n_splits: int = 5) -> None:
    """splits.pkl: list of {train, val, test} (toy_datamodule_3D.py:198-228)."""
    import pickle
    from sklearn.model_selection import KFold
    np.random.seed(seed)
    train_files = subfiles(image_dir, suffix=".npy", join=False, sort=True)
    test_files = subfiles(test_dir, suffix=".npy", join=False, sort=True)
    splits = []
    kfold = KFold(n_splits=n_splits, shuffle=True, random_state=seed)
    for train_idx, val_idx in kfold.split(train_files):
        splits.append({
            "train": np.array(train_files)[train_idx],
            "val": np.array(train_files)[val_idx],
            "test": np.array(test_files),
        })
    with open(os.path.join(output_dir, "splits.pkl"), "wb") as f:
        pickle.dump(splits, f)


def main(argv=None) -> None:
    """CLI: shared 3D preprocessing (reference:
    datasets/preprocess_datasets_3d.py) — z-score + pad nii.gz -> npy for
    the toy (imagesTr/Ts) or LIDC (flat images/labels, _mask suffix)
    layouts, plus KFold split creation."""
    import argparse
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)
    prep = sub.add_parser("preprocess")
    prep.add_argument("--root_dir", required=True)
    prep.add_argument("--num_raters", type=int, default=1)
    prep.add_argument("--patch_size", type=int, default=64)
    prep.add_argument("--patch_overlap", type=float, default=1.0)
    prep.add_argument("--label_suffix", default="",
                      help="e.g. _mask for the LIDC naming")
    spl = sub.add_parser("splits")
    spl.add_argument("--output_dir", required=True)
    spl.add_argument("--image_dir", required=True)
    spl.add_argument("--test_dir", required=True)
    spl.add_argument("--seed", type=int, default=123)
    spl.add_argument("--n_splits", type=int, default=5)
    args = parser.parse_args(argv)
    if args.command == "preprocess":
        preprocess_dataset(args.root_dir, args.num_raters, args.patch_size,
                           args.patch_overlap, label_suffix=args.label_suffix)
    else:
        create_kfold_splits(args.output_dir, args.image_dir, args.test_dir,
                            seed=args.seed, n_splits=args.n_splits)


if __name__ == "__main__":
    main()
