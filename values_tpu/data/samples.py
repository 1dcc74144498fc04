"""Sample enumeration shared by the 3D datamodules.

Mirrors the reference's module-level helpers (reference:
toy_datamodule_3D.py:526-665, duplicated in lidc_idri_datamodule_3D.py):

- train samples: one dict per image (random crop happens at load time),
- val/test samples: one dict per sliding-window position (the reference's
  "long-context" mechanism, SURVEY.md §5).
"""
from __future__ import annotations

import fnmatch
import os
from typing import Dict, List, Optional

import numpy as np

from ..ops.window import enumerate_window_starts, window_crop_tuples


def _resolve_label_paths(label_dir: str, label_filenames: List[str],
                         image_filename: str, num_raters: int,
                         label_suffix: str = "") -> Optional[List[str]]:
    stem = image_filename.split(".")[0]
    label_paths = []
    for rater in range(num_raters):
        name = f"{stem}_{rater:02d}{label_suffix}.npy"
        if name in label_filenames:
            label_paths.append(os.path.join(label_dir, name))
    return label_paths if label_paths else None


def get_train_data_samples(base_dir: str, pattern: str = "*.npy",
                           subject_ids: Optional[List[str]] = None,
                           num_raters: int = 1, label_suffix: str = "",
                           flat_dirs: bool = False) -> List[Dict]:
    """``flat_dirs`` selects the LIDC/GTA layout ``images/``+``labels/``
    (lidc_idri_datamodule_3D.py:632-633) instead of imagesTr/labelsTr."""
    image_dir = os.path.join(base_dir, "images" if flat_dirs else "imagesTr")
    label_dir = os.path.join(base_dir, "labels" if flat_dirs else "labelsTr")
    image_filenames = sorted(os.listdir(image_dir))
    label_filenames = (sorted(os.listdir(label_dir))
                       if os.path.isdir(label_dir) else [])
    samples = []
    for image_filename in sorted(fnmatch.filter(image_filenames, pattern)):
        if subject_ids is not None and image_filename not in subject_ids:
            continue
        samples.append({
            "image_path": os.path.join(image_dir, image_filename),
            "label_paths": _resolve_label_paths(
                label_dir, label_filenames, image_filename, num_raters,
                label_suffix),
        })
    return samples


def get_val_test_data_samples(base_dir: str, pattern: str = "*.npy",
                              subject_ids: Optional[List[str]] = None,
                              num_raters: int = 1, test: bool = False,
                              patch_size: int = 64,
                              patch_overlap: float = 1.0,
                              label_suffix: str = "",
                              flat_dirs: bool = False) -> List[Dict]:
    """One sample per sliding window (toy_datamodule_3D.py:581-665)."""
    train_test = "Ts" if test else "Tr"
    image_dir = os.path.join(
        base_dir, "images" if flat_dirs else f"images{train_test}")
    label_dir = os.path.join(
        base_dir, "labels" if flat_dirs else f"labels{train_test}")
    image_filenames = sorted(os.listdir(image_dir))
    label_filenames = (sorted(os.listdir(label_dir))
                       if os.path.isdir(label_dir) else [])
    samples = []
    for image_filename in sorted(fnmatch.filter(image_filenames, pattern)):
        if subject_ids is not None and image_filename not in subject_ids:
            continue
        image_path = os.path.join(image_dir, image_filename)
        label_paths = _resolve_label_paths(
            label_dir, label_filenames, image_filename, num_raters,
            label_suffix)
        shape = np.load(image_path, mmap_mode="r").shape
        starts = enumerate_window_starts(shape, patch_size, patch_overlap)
        for crop_idx in window_crop_tuples(starts, patch_size):
            samples.append({
                "image_path": image_path,
                "label_paths": label_paths,
                "crop_idx": crop_idx,
            })
    return samples
