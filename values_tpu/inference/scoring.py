"""Fully-packed per-volume scoring: only scalars leave the chip.

This is the production home of the TPU-native redesign of the
reference's hot loops #2 and #3 (test_3D.py:399-534 — N sequential
forwards per volume with per-window H2D/D2H and CPU scatter-adds;
aggregate_uncertainties.py:13-96 — scipy box filters over full
volumes): a single compiled program runs the grouped ensemble forward,
softmax + PE/EE/MI, micro Dice against an uploaded GT, and the three
C3 aggregations for each uncertainty map — all in the batch-packed
lane layout (values_tpu.models.ensemble_unet3d_pallas /
values_tpu.ops.packed_stats). Per volume, only 10 scalars ever leave
the layout.

Use this when only image-level scores are needed (OoD / failure /
active-learning acquisition pipelines); use SlidingWindowEngine when
the per-voxel volumes must be materialized for the `test_results/`
tree contract. `bench.py` measures this scorer as the headline
packed pipeline.
"""
from __future__ import annotations

from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp

from ..models.ensemble_unet3d_pallas import grouped_forward_packed
from ..ops import packed_stats
from ..ops.pallas.conv3d import LANES, pack_ndhwc

UNC_KEYS = ("pred_entropy", "expected_entropy", "mutual_information")
AGG_KEYS = ("patch_level", "image_level", "threshold")


def score_rows() -> List[str]:
    """Row labels of the (10, B) score matrix."""
    return ["dice"] + [f"{u}/{a}" for u in UNC_KEYS for a in AGG_KEYS]


def make_packed_scorer(members: int, patch: int, *,
                       agg_patch: int = 10, threshold: float = 0.3,
                       ignore_index: int = 0, dtype=jnp.bfloat16,
                       interpret: bool = False
                       ) -> Tuple[Callable, List[str]]:
    """Build the jittable packed scorer.

    Returns (score_fn, rows): ``score_fn(stacked_variables, volumes,
    gt, rng) -> (10, B) float32`` where volumes is (B, p, p, p) or
    (B, p, p, p, 1) with B a multiple of ``128 // p`` and gt an
    integer (B, p, p, p) segmentation. ``stacked_variables`` comes
    from ensemble_unet3d.group_member_variables.
    """
    if LANES % patch:
        raise ValueError(f"patch={patch} must divide {LANES} for the "
                         "packed layout; use SlidingWindowEngine")
    bp = LANES // patch

    def score(stacked_variables, volumes, gt, rng):
        del rng  # deterministic ensemble forward
        if volumes.ndim == 4:
            volumes = volumes[..., None]
        gv = jax.tree_util.tree_map(lambda a: a.astype(dtype),
                                    stacked_variables)
        xp = pack_ndhwc(volumes.astype(dtype), bp)
        logits = grouped_forward_packed(gv, xp, members, patch,
                                        interpret=interpret)
        stats = packed_stats.fused_sample_statistics_packed(logits)
        seg = jnp.argmax(stats["mean_softmax"], axis=-2).astype(jnp.int32)
        gtp = packed_stats.pack_labels(gt.astype(jnp.int32), bp)
        rows = [packed_stats.packed_dice(seg, gtp, bp,
                                         ignore_index=ignore_index)]
        for key in UNC_KEYS:
            agg = packed_stats.packed_aggregate_all(
                stats[key], bp, patch=agg_patch, threshold=threshold)
            rows.extend(agg[a] for a in AGG_KEYS)
        return jnp.stack(rows)

    return score, score_rows()
