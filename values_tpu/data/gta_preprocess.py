"""GTA5 / Cityscapes preprocessing + first-cycle splits (L0, 2D path).

Parity with the reference scripts (reference:
datasets/gta_cityscapes/preprocess_gta_cityscapes.py:47-182 and
gta_cs_splits_first_cycle.py:56-146):

- preprocessing: CenterCrop 1024x1912, 0.25x resize (linear for images,
  nearest for masks), Cityscapes labelIds -> trainIds via the label table,
  GTA color masks -> trainIds via color lookup (asserting no unknown
  colors), saving ``preprocessed/{images,labels}/<id>.npy`` plus vis PNGs,
- splits: GTA-only training — CS train cities = ood_unlabeled_pool, CS val
  cities = ood_test, an equal-size random GTA id_unlabeled_pool, 25% GTA
  id_test, 5-fold KFold on the rest; entries are (filename, "gta"|"cs")
  tuples.
"""
from __future__ import annotations

import os
import pickle
from pathlib import Path
from typing import List, Tuple

import numpy as np

from ..core.io import subfiles
from . import cityscapes_labels as cs_labels


def center_crop(arr: np.ndarray, height: int, width: int) -> np.ndarray:
    h, w = arr.shape[:2]
    y = max(0, (h - height) // 2)
    x = max(0, (w - width) // 2)
    return arr[y:y + height, x:x + width]


def color_mask_to_train_ids(mask_color: np.ndarray) -> np.ndarray:
    """Vectorized color->trainId lookup (reference uses a slow
    apply_along_axis; same mapping, fused via a 24-bit key table)."""
    keys = (mask_color[..., 0].astype(np.int32) << 16) \
        | (mask_color[..., 1].astype(np.int32) << 8) \
        | mask_color[..., 2].astype(np.int32)
    table = np.full(1 << 24, 128, dtype=np.int32)
    for color, train_id in cs_labels.color2trainId.items():
        table[(color[0] << 16) | (color[1] << 8) | color[2]] = train_id
    return table[keys]


def label_ids_to_train_ids(mask_labels: np.ndarray) -> np.ndarray:
    out = mask_labels.copy()
    for k, v in cs_labels.id2trainId.items():
        out[mask_labels == k] = v
    return out


def train_ids_to_color(mask_train: np.ndarray) -> np.ndarray:
    color = np.zeros((*mask_train.shape, 3), dtype=np.uint8)
    for k, v in cs_labels.trainId2color.items():
        color[mask_train == k] = np.array(v)
    return color


def preprocess_dataset(dataset_dir: str, save_dir: str,
                       dataset: str) -> None:
    """``dataset`` is 'cityscapes' or 'gta'."""
    import cv2
    dataset_dir = Path(dataset_dir)
    save_dir = Path(save_dir)
    out_images = save_dir / "preprocessed" / "images"
    out_labels = save_dir / "preprocessed" / "labels"
    out_labels_vis = out_labels / "vis"
    out_images_vis = out_images / "vis"
    for d in (out_images, out_labels, out_labels_vis, out_images_vis):
        os.makedirs(d, exist_ok=True)

    if dataset == "cityscapes":
        image_dirs, label_dirs = [], []
        for split in ("train", "val"):
            split_img = dataset_dir / "images" / "leftImg8bit" / split
            split_lbl = dataset_dir / "labels" / "gtFine" / split
            for city in sorted(os.listdir(split_img)):
                if (split_img / city).is_dir():
                    image_dirs.append(split_img / city)
                    label_dirs.append(split_lbl / city)
    else:
        image_dirs = [dataset_dir / "images"]
        label_dirs = [dataset_dir / "labels"]

    for image_dir, label_dir in zip(sorted(image_dirs), sorted(label_dirs)):
        png_images = [f for f in subfiles(image_dir, suffix=".png",
                                          join=False)
                      if not f.startswith(".")]
        for image_name in png_images:
            if image_name in ("15188.png", "17705.png"):  # corrupt GTA files
                continue
            image_id = (image_name.split("_leftImg8bit")[0]
                        if dataset == "cityscapes"
                        else image_name.split(".")[0])
            if (out_images / f"{image_id}.npy").is_file() and (
                    out_labels / f"{image_id}.npy").is_file():
                continue
            label_name = (f"{image_id}_gtFine_labelIds.png"
                          if dataset == "cityscapes" else image_name)
            image = cv2.imread(str(image_dir / image_name), -1)
            image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
            mask_raw = cv2.imread(str(label_dir / label_name), -1)
            if image.shape[:2] != mask_raw.shape[:2]:
                print(f"Different resolutions for {image_name}!")
                continue

            image = center_crop(image, 1024, 1912).astype(np.uint8)
            mask_raw = center_crop(mask_raw, 1024, 1912)
            image = cv2.resize(image, (0, 0), fx=0.25, fy=0.25,
                               interpolation=cv2.INTER_LINEAR)
            if dataset == "cityscapes":
                mask_labels = cv2.resize(
                    mask_raw.astype(np.uint8), (0, 0), fx=0.25, fy=0.25,
                    interpolation=cv2.INTER_NEAREST)
                mask_train = label_ids_to_train_ids(mask_labels)
                mask_color = train_ids_to_color(mask_train)
            else:
                mask_color = cv2.cvtColor(mask_raw.astype(np.uint8),
                                          cv2.COLOR_BGR2RGB)
                mask_color = cv2.resize(mask_color, (0, 0), fx=0.25,
                                        fy=0.25,
                                        interpolation=cv2.INTER_NEAREST)
                mask_train = color_mask_to_train_ids(mask_color)
                assert 128 not in mask_train, \
                    f"Unknown color value in mask for image {image_name}!"

            np.save(out_images / f"{image_id}.npy", image)
            cv2.imwrite(str(out_images_vis / f"{image_id}.png"),
                        cv2.cvtColor(image, cv2.COLOR_RGB2BGR))
            np.save(out_labels / f"{image_id}.npy", mask_train)
            cv2.imwrite(str(out_labels_vis / f"{image_id}.png"),
                        cv2.cvtColor(mask_color, cv2.COLOR_RGB2BGR))


def create_splits(base_dir: str, orig_base_dir: str, splits_path: str,
                  seed: int = 123, n_splits: int = 5) -> None:
    """(filename, 'gta'|'cs') tuple splits — gta_cs_splits_first_cycle."""
    np.random.seed(seed)
    base_dir = Path(base_dir)
    orig_base_dir = Path(orig_base_dir)
    gta_dir = base_dir / "OriginalData" / "preprocessed" / "images"
    cs_dir = base_dir / "CityScapesOriginalData" / "preprocessed" / "images"

    gta_images: List[Tuple[str, str]] = sorted(
        (f, "gta") for f in os.listdir(gta_dir)
        if f.endswith(".npy") and not f.startswith("._"))
    cs_images: List[Tuple[str, str]] = sorted(
        (f, "cs") for f in os.listdir(cs_dir)
        if f.endswith(".npy") and not f.startswith("._"))

    def cs_cities(split):
        root = (orig_base_dir / "CityScapesOriginalData" / "images"
                / "leftImg8bit" / split)
        return sorted(d for d in os.listdir(root) if (root / d).is_dir())

    cs_train_images = [img for city in cs_cities("train")
                       for img in cs_images if city in img[0]]
    cs_test_images = [img for city in cs_cities("val")
                      for img in cs_images if city in img[0]]

    pool_idx = set(np.random.choice(len(gta_images),
                                    size=len(cs_train_images),
                                    replace=False).tolist())
    gta_pool = [img for i, img in enumerate(gta_images) if i in pool_idx]
    gta_rest = [img for i, img in enumerate(gta_images) if i not in pool_idx]

    num_test = int(0.25 * len(gta_rest))
    test_idx = set(np.random.choice(len(gta_rest), size=num_test,
                                    replace=False).tolist())
    gta_test = [img for i, img in enumerate(gta_rest) if i in test_idx]
    gta_train_val = [img for i, img in enumerate(gta_rest)
                     if i not in test_idx]

    from sklearn.model_selection import KFold
    splits = []
    kfold = KFold(n_splits=n_splits, shuffle=True, random_state=seed)
    for train_idx, val_idx in kfold.split(gta_train_val):
        train_set = set(train_idx.tolist())
        splits.append({
            "train": [img for i, img in enumerate(gta_train_val)
                      if i in train_set],
            "val": [img for i, img in enumerate(gta_train_val)
                    if i not in train_set],
            "id_test": gta_test,
            "ood_test": cs_test_images,
            "id_unlabeled_pool": gta_pool,
            "ood_unlabeled_pool": cs_train_images,
        })
    splits_path = Path(splits_path)
    splits_path.parent.mkdir(parents=True, exist_ok=True)
    with open(splits_path, "wb") as f:
        pickle.dump(splits, f)


def main(argv=None) -> None:
    """CLI: preprocess GTA/Cityscapes or create the first-cycle splits."""
    import argparse
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)
    prep = sub.add_parser("preprocess")
    prep.add_argument("--dataset_path", required=True)
    prep.add_argument("--save_path", default=None)
    prep.add_argument("--dataset", choices=["cityscapes", "gta"],
                      required=True)
    spl = sub.add_parser("splits")
    spl.add_argument("--dataset_path", required=True)
    spl.add_argument("--original_dataset_path", default=None)
    spl.add_argument("--splits_path", default=None)
    spl.add_argument("--seed", type=int, default=123)
    args = parser.parse_args(argv)
    if args.command == "preprocess":
        preprocess_dataset(args.dataset_path,
                           args.save_path or args.dataset_path,
                           args.dataset)
    else:
        splits_path = args.splits_path or str(
            Path(args.dataset_path) / "splits" / "firstCycle" /
            "splits.pkl")
        create_splits(args.dataset_path,
                      args.original_dataset_path or args.dataset_path,
                      splits_path, seed=args.seed)


if __name__ == "__main__":
    main()
