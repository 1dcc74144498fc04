"""C2 measure numerics: closed-form cases + the reference's NaN-guard and
SSN-swap semantics (test_3D.py:486-534)."""
import numpy as np
import pytest

from values_tpu.ops import uncertainty as U


def test_entropy_uniform_binary():
    # uniform p=0.5 over 2 classes -> entropy ln 2
    p = np.full((1, 2, 3, 3), 0.5)
    out = U.uncertainty_measures(p)
    assert np.allclose(np.asarray(out["pred_entropy"]), np.log(2))
    # single sample: EE == PE, MI == 0
    assert np.allclose(np.asarray(out["aleatoric_uncertainty"]), np.log(2))
    assert np.allclose(np.asarray(out["epistemic_uncertainty"]), 0.0,
                       atol=1e-12)


def test_zero_prob_guard():
    # one-hot probabilities: 0*log0 positions must contribute exactly 0
    p = np.zeros((1, 3, 2, 2))
    p[:, 1] = 1.0
    out = U.uncertainty_measures(p)
    assert np.all(np.asarray(out["pred_entropy"]) == 0.0)
    assert np.all(np.isfinite(np.asarray(out["epistemic_uncertainty"])))


def test_disagreeing_onehot_samples_give_mi():
    # two samples fully disagreeing: PE = ln2, EE = 0, MI = ln2
    p = np.zeros((2, 2, 2, 2))
    p[0, 0] = 1.0
    p[1, 1] = 1.0
    out = U.uncertainty_measures(p)
    assert np.allclose(np.asarray(out["pred_entropy"]), np.log(2))
    assert np.allclose(np.asarray(out["aleatoric_uncertainty"]), 0.0)
    assert np.allclose(np.asarray(out["epistemic_uncertainty"]), np.log(2))


def test_ssn_swap():
    p = np.random.RandomState(1).dirichlet([1, 1], size=(4, 5, 5))
    p = np.transpose(p, (0, 3, 1, 2))  # (N, C, H, W)
    plain = U.uncertainty_measures(p, ssn=False)
    swapped = U.uncertainty_measures(p, ssn=True)
    assert np.allclose(np.asarray(plain["aleatoric_uncertainty"]),
                       np.asarray(swapped["epistemic_uncertainty"]))
    assert np.allclose(np.asarray(plain["epistemic_uncertainty"]),
                       np.asarray(swapped["aleatoric_uncertainty"]))


def test_one_minus_msr():
    p = np.array([[0.7, 0.2], [0.3, 0.8]])[:, :, None]  # (C=2, 2, 1)
    out = U.one_minus_msr(p)
    assert np.allclose(np.asarray(out["pred_entropy"]).ravel(), [0.3, 0.2])


def test_unnormalized_sums_match_reference_torch(rng):
    """Reference computes uncertainty on raw scatter-added sums; verify our
    guard semantics against a direct torch transcript of the formula."""
    import jax
    import torch
    sums = rng.rand(3, 2, 4, 4, 4) * 2.0
    sums[0, :, 0, 0, 0] = 0.0  # raw sums can exceed 1 and contain exact zeros
    mean_softmax = torch.tensor(sums).mean(dim=0)
    pe = torch.zeros(*sums.shape[2:])
    for y in range(mean_softmax.shape[0]):
        val = mean_softmax[y] * torch.log(mean_softmax[y])
        nan = torch.isnan(val)
        pe[~nan] += val[~nan]
    pe *= -1
    with jax.enable_x64(True):
        out = U.uncertainty_measures(sums)
        got = np.asarray(out["pred_entropy"])
    assert np.allclose(got, pe.numpy(), atol=1e-12)


def test_fused_sample_statistics_consistency(rng):
    p = rng.rand(5, 3, 4, 4).astype(np.float32)
    fused = U.fused_sample_statistics(p)
    ref = U.uncertainty_measures(p)
    assert np.allclose(np.asarray(fused["pred_entropy"]),
                       np.asarray(ref["pred_entropy"]), atol=1e-6)
    assert np.allclose(np.asarray(fused["mutual_information"]),
                       np.asarray(ref["epistemic_uncertainty"]), atol=1e-6)
    assert np.allclose(np.asarray(fused["mean_softmax"]), p.mean(0), atol=1e-6)
