"""torchmetrics.functional shim.

``dice`` follows torchmetrics 0.11.x ``average="micro"`` /
``mdmc_average="global"`` semantics as the reference calls it
(test_3D.py:274,294-317): float preds are argmaxed over the class dim,
the ``ignore_index`` column is deleted from BOTH one-hot maps, then
``2·Σtp / (2·Σtp + Σfp + Σfn)`` over everything, safe-dividing to 0.
Same spec as values_tpu.ops.metrics (torchmetrics itself is not
installable in this image).
"""
import torch


def dice(preds, target, ignore_index=None, average="micro",
         mdmc_average="global", **_kwargs):
    if average != "micro" or mdmc_average != "global":
        raise NotImplementedError("shim supports micro/global only")
    if preds.is_floating_point():
        preds = preds.argmax(dim=1)
    p = preds.reshape(-1).long()
    t = target.reshape(-1).long()
    agree = p == t
    if ignore_index is None:
        tp = agree.sum()
        fp = (~agree).sum()
        fn = fp
    else:
        pred_keep = p != ignore_index
        tgt_keep = t != ignore_index
        tp = (agree & tgt_keep).sum()
        fp = (pred_keep & ~agree).sum()
        fn = (tgt_keep & ~agree).sum()
    denom = 2 * tp + fp + fn
    if int(denom) == 0:
        return torch.tensor(0.0, dtype=torch.float64)
    return (2.0 * tp.double()) / denom.double()


class classification:
    dice = staticmethod(dice)
