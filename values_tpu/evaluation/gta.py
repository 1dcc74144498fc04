"""GTA-specific evaluation loaders (reference: evaluation/utils/gta.py).

- :func:`pred_seg_loading`: decode the tester's color PNG predictions back
  to trainIds (the eval layer's ``pred_seg_loading`` hook).
- :func:`gt_unc_map`: the analytic GT uncertainty of the stochastic label
  switches — per-pixel Bernoulli variance p(1-p) with p = 1/3 at switchable
  classes, transposed to match the TIF uncertainty maps.
"""
from __future__ import annotations

import numpy as np

from ..data import cityscapes_labels as cs_labels
from ..data.gta_preprocess import color_mask_to_train_ids


def pred_seg_loading(pred_seg_path) -> np.ndarray:
    import cv2
    mask_color = cv2.imread(str(pred_seg_path), -1)
    mask_color = cv2.cvtColor(mask_color, cv2.COLOR_BGR2RGB)
    return color_mask_to_train_ids(mask_color)


def gt_unc_map(image_id: str, dataloader) -> np.ndarray:
    idx = dataloader.dataset.image_ids.index(image_id)
    label = np.load(str(dataloader.dataset.masks[idx]))
    unc_map = np.zeros_like(label, dtype=np.single)
    for c, p in cs_labels.LABEL_SWITCHES.items():
        init_id = cs_labels.name2trainId[c]
        variance = (1 - p) * np.square(0 - p) + p * np.square(1 - p)
        unc_map[label == init_id] = variance
    return np.swapaxes(unc_map, 0, 1)
