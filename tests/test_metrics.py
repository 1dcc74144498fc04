"""Dice / GED numerics vs independent brute-force oracles.

The oracle reimplements torchmetrics 0.11.4 `dice(average='micro')`
semantics from its documented behavior: one-hot both label maps, delete the
ignore_index column from both, micro-aggregate 2tp/(2tp+fp+fn), safe-divide
to 0 (the semantics the reference relies on at test_3D.py:275,284-358).
"""
import numpy as np
import pytest

from values_tpu.ops import metrics as M


def oracle_micro_dice(pred_labels, target_labels, ignore_index=None,
                      num_classes=None):
    pred_labels = np.asarray(pred_labels).ravel()
    target_labels = np.asarray(target_labels).ravel()
    if num_classes is None:
        num_classes = int(max(pred_labels.max(), target_labels.max())) + 1
    pred_oh = np.eye(num_classes, dtype=np.int64)[pred_labels]
    tgt_oh = np.eye(num_classes, dtype=np.int64)[target_labels]
    if ignore_index is not None:
        keep = [c for c in range(num_classes) if c != ignore_index]
        pred_oh = pred_oh[:, keep]
        tgt_oh = tgt_oh[:, keep]
    tp = int((pred_oh * tgt_oh).sum())
    fp = int((pred_oh * (1 - tgt_oh)).sum())
    fn = int(((1 - pred_oh) * tgt_oh).sum())
    denom = 2 * tp + fp + fn
    return 0.0 if denom == 0 else 2 * tp / denom


@pytest.mark.parametrize("ignore_index", [None, 0, 2])
@pytest.mark.parametrize("num_classes", [2, 5])
def test_dice_matches_oracle(rng, ignore_index, num_classes):
    pred = rng.randint(0, num_classes, size=(3, 7, 7))
    tgt = rng.randint(0, num_classes, size=(3, 7, 7))
    got = float(M.dice_score(pred, tgt, ignore_index=ignore_index,
                             num_classes=num_classes))
    want = oracle_micro_dice(pred, tgt, ignore_index, num_classes)
    assert got == pytest.approx(want, abs=1e-7)


def test_dice_probabilities_argmax(rng):
    probs = rng.rand(2, 3, 4, 4).astype(np.float32)
    probs /= probs.sum(axis=1, keepdims=True)
    tgt = rng.randint(0, 3, size=(2, 4, 4))
    got = float(M.dice_score(probs, tgt, ignore_index=0))
    want = oracle_micro_dice(np.argmax(probs, axis=1), tgt, 0, 3)
    assert got == pytest.approx(want, abs=1e-7)


def test_dice_all_ignored_is_zero():
    pred = np.zeros((1, 4, 4), dtype=np.int32)
    tgt = np.zeros((1, 4, 4), dtype=np.int32)
    assert float(M.dice_score(pred, tgt, ignore_index=0, num_classes=2)) == 0.0


def test_perfect_dice():
    tgt = np.array([[0, 1, 1, 2]])
    assert float(M.dice_score(tgt, tgt, ignore_index=0,
                              num_classes=3)) == pytest.approx(1.0)


def oracle_ged(pred_softmax, gt, ignore_index=0):
    """Brute-force GED using the repeat/tile stacking of test_3D.py:284-321."""
    n = pred_softmax.shape[0]
    m = gt.shape[0]
    pred_labels = np.argmax(pred_softmax, axis=1)

    def stacked_dice(a, b, ig):
        # one micro dice over all stacked pairs
        return oracle_micro_dice(
            np.concatenate([x.ravel() for x in a]),
            np.concatenate([x.ravel() for x in b]), ig,
            num_classes=int(max(pred_labels.max(), gt.max())) + 1)

    gp_a = [pred_labels[i] for _ in range(m) for i in range(n)]
    gp_b = [gt[j] for j in range(m) for _ in range(n)]
    d_gp = 1 - stacked_dice(gp_a, gp_b, ignore_index)

    pp_a = [pred_labels[i] for i in range(n) for _ in range(n)]
    pp_b = [pred_labels[j] for _ in range(n) for j in range(n)]
    d_pp = 1 - stacked_dice(pp_a, pp_b, ignore_index if ignore_index == 0 else None)

    gg_a = [gt[i] for i in range(m) for _ in range(m)]
    gg_b = [gt[j] for _ in range(m) for j in range(m)]
    ig_gg = ignore_index if (gt == ignore_index).any() else None
    d_gg = 1 - stacked_dice(gg_a, gg_b, ig_gg)
    return 2 * d_gp - d_pp - d_gg


def test_ged_matches_oracle(rng):
    n, m, c = 3, 4, 2
    logits = rng.rand(n, c, 6, 6, 6)
    probs = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    gt = rng.randint(0, c, size=(m, 6, 6, 6))
    out = M.generalized_energy_distance(probs, gt)
    assert float(out["ged"]) == pytest.approx(oracle_ged(probs, gt), abs=1e-6)
    # diagnostics present for multi-rater input
    assert "max dice pred" in out
    assert "max dice rater 0" in out


def test_ged_identical_pred_gt_is_small(rng):
    gt = rng.randint(0, 2, size=(2, 8, 8))
    probs = np.stack([np.eye(2)[g].transpose(2, 0, 1) for g in gt])
    out = M.generalized_energy_distance(probs.astype(np.float64), gt)
    # d(gt,pred) == d(gt,gt) == d(pred,pred) => GED == 0
    assert float(out["ged"]) == pytest.approx(0.0, abs=1e-7)


def test_per_rater_metrics_against_manual(rng):
    c = 2
    probs = rng.rand(1, c, 5, 5, 5)
    probs /= probs.sum(axis=1, keepdims=True)
    gt = rng.randint(0, c, size=(2, 5, 5, 5))
    out = M.per_rater_test_metrics(probs, gt)

    # manual: per rater soft dice + NLL
    dices, losses = [], []
    for r in range(2):
        g = gt[r:r + 1]
        oh = np.stack([(g == k).astype(float) for k in range(c)], axis=1)
        inter = (probs * oh).sum(axis=(2, 3, 4))
        denom = (probs + oh).sum(axis=(2, 3, 4))
        sd = float(np.mean(-(2 * inter + 1e-5) / (denom + 1e-5)))
        nll = float(-np.mean(np.log(
            np.take_along_axis(probs, g[:, None], axis=1))))
        losses.append(sd + nll)
        dices.append(oracle_micro_dice(np.argmax(probs, 1), g, 0, c))
    assert float(out["loss"]) == pytest.approx(np.mean(losses), rel=1e-5)
    assert float(out["dice"]) == pytest.approx(np.mean(dices), rel=1e-6)
