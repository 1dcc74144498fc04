"""Mesh parallelism on the virtual 8-device CPU mesh: data-parallel train
step, sample-sharded prediction, spatially-sharded volume inference."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from values_tpu.config import compose
from values_tpu.models.unet3d import UNet3D
from values_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                      make_parallel_train_step, replicated,
                                      sample_sharding)
from values_tpu.parallel.spatial import (make_sharded_volume_predictor,
                                         pad_starts_to_shards)
from values_tpu.inference.predictors import (make_default_predictor,
                                             stack_params)
from values_tpu.ops.window import enumerate_window_starts
from values_tpu.training.experiment import Experiment

P = 16

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_data_parallel_train_step_matches_single_device(tmp_path):
    cfg = compose("configs", "softmax_config", overrides=[
        "model.initial_filter_size=2", "datamodule.patch_size=16",
        f"data_input_dir={tmp_path}", f"save_dir={tmp_path}"])
    exp = Experiment(cfg)
    state = exp.init_state(jax.random.PRNGKey(0), P)
    rng = jax.random.PRNGKey(1)
    rs = np.random.RandomState(0)
    batch = {
        "data": jnp.asarray(rs.rand(8, P, P, P, 1).astype(np.float32)),
        "seg": jnp.asarray(rs.randint(0, 2, size=(8, P, P, P))),
    }
    # single-device result
    state_ref, loss_ref = exp.train_step(state, batch, rng)

    mesh = make_mesh(n_data=8, n_sample=1)
    pstate = jax.device_put(exp.init_state(jax.random.PRNGKey(0), P),
                            replicated(mesh))
    sharded_batch = {k: jax.device_put(v, batch_sharding(mesh))
                     for k, v in batch.items()}
    pstep = make_parallel_train_step(exp, mesh)
    pstate2, loss_par = pstep(pstate, sharded_batch, rng)
    assert float(loss_par) == pytest.approx(float(loss_ref), abs=1e-5)
    # parameters agree after one step
    k_ref = np.asarray(state_ref.params["final"]["kernel"])
    k_par = np.asarray(pstate2.params["final"]["kernel"])
    np.testing.assert_allclose(k_par, k_ref, atol=1e-5)


def test_spatially_sharded_inference_matches_single_device(rng):
    mesh = make_mesh(n_data=8, n_sample=1)
    model = UNet3D(num_classes=2, initial_filter_size=2)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, P, P, P, 1)))
    stacked = stack_params([variables])
    predictor = make_default_predictor(model, 1, 1, False)

    vol_shape = (P, 2 * P, 2 * P)  # 4 windows
    vol = rng.rand(*vol_shape).astype(np.float32)
    starts = enumerate_window_starts(vol_shape, P, 1.0)
    starts_padded = pad_starts_to_shards(starts, 8)
    assert starts_padded.shape[0] == 8

    sharded = make_sharded_volume_predictor(
        predictor, mesh, P, vol_shape, num_classes=2)
    sums, counts = sharded(stacked, jnp.asarray(vol),
                           jnp.asarray(starts_padded),
                           jax.random.PRNGKey(1))

    # single-device reference with the same padded window list (duplicate
    # windows raise counts; count normalization cancels them)
    from values_tpu.ops.window import extract_windows, stitch_windows
    wins = extract_windows(jnp.asarray(vol), jnp.asarray(starts_padded), P)
    stack, _ = jax.jit(predictor)(stacked, wins[..., None],
                                  jax.random.PRNGKey(1))
    ref_sums = stitch_windows(stack[0], jnp.asarray(starts_padded),
                              vol_shape + (2,))
    norm = np.asarray(sums[0]) / np.maximum(np.asarray(counts)[..., None], 1)
    ref_norm = (np.asarray(ref_sums)
                / np.maximum(np.asarray(counts)[..., None], 1))
    np.testing.assert_allclose(norm, ref_norm, atol=2e-3)
    # every voxel covered at least once; duplicated window counted twice
    assert np.asarray(counts).min() >= 1
    assert np.asarray(counts).max() >= 2


def test_sample_sharded_ensemble(rng):
    from values_tpu.parallel.mesh import make_parallel_sample_predict
    mesh = make_mesh(n_data=2, n_sample=4)
    model = UNet3D(num_classes=2, initial_filter_size=2)
    init = jax.jit(model.init)
    members = [init(k, jnp.zeros((1, P, P, P, 1)))
               for k in jax.random.split(jax.random.PRNGKey(0), 4)]
    stacked = jax.device_put(stack_params(members), sample_sharding(mesh))
    x = jax.device_put(jnp.asarray(rng.rand(1, P, P, P, 1),
                                   dtype=jnp.float32), replicated(mesh))
    fn = make_parallel_sample_predict(model, 4, mesh)
    stack = fn(stacked, x, jax.random.PRNGKey(1))
    assert stack.shape == (4, 1, P, P, P, 2)
    assert np.all(np.isfinite(np.asarray(stack)))

    # member outputs match the unsharded vmapped predictor
    predictor = make_default_predictor(model, 4, 1, False)
    ref_stack, _ = jax.jit(predictor)(stack_params(members), x,
                                      jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(stack), np.asarray(ref_stack),
                               atol=2e-3)


# -- production-path mesh integration (VERDICT r1 item 2) ------------------

def test_engine_window_sharded_matches_single_device(rng):
    """SlidingWindowEngine(mesh=..., mesh_strategy='window') must produce
    identical raw sums/counts to the single-device engine, including the
    zero-masked padding of ragged shards (5 windows over 8 chips)."""
    from values_tpu.inference.engine import SlidingWindowEngine
    mesh = make_mesh(n_data=8, n_sample=1)
    model = UNet3D(num_classes=2, initial_filter_size=2)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, P, P, P, 1)))
    vol = rng.rand(P, 5 * P, P).astype(np.float32)  # 5 windows
    labels = (rng.rand(2, P, 5 * P, P) > 0.5).astype(np.intc)

    single = SlidingWindowEngine(model, [variables, variables],
                                 patch_size=P, window_batch=16)
    sharded = SlidingWindowEngine(model, [variables, variables],
                                  patch_size=P, window_batch=16, mesh=mesh)
    sf, cf, df, segf, _ = single.run_volume(vol, labels)
    sc, cc, dc, segc, _ = sharded.run_volume(vol, labels)
    np.testing.assert_array_equal(cc, cf)
    np.testing.assert_allclose(sc, sf, atol=2e-5)
    np.testing.assert_allclose(dc, df, atol=1e-5)
    np.testing.assert_array_equal(segc, segf)


def test_engine_sample_sharded_matches_single_device(rng):
    from values_tpu.inference.engine import SlidingWindowEngine
    mesh = make_mesh(n_data=2, n_sample=4)
    model = UNet3D(num_classes=2, initial_filter_size=2)
    init = jax.jit(model.init)
    members = [init(k, jnp.zeros((1, P, P, P, 1)))
               for k in jax.random.split(jax.random.PRNGKey(0), 4)]
    vol = rng.rand(P, P, P).astype(np.float32)
    single = SlidingWindowEngine(model, members, patch_size=P)
    sharded = SlidingWindowEngine(model, members, patch_size=P, mesh=mesh,
                                  mesh_strategy="sample")
    sf, *_ = single.run_volume(vol)
    sc, *_ = sharded.run_volume(vol)
    assert sc.shape == sf.shape == (4, 2, P, P, P)
    np.testing.assert_allclose(sc, sf, atol=2e-3)


@pytest.fixture(scope="module")
def toy_dataset_parallel(tmp_path_factory):
    import random
    from values_tpu.data.toy_generation import ToyGenConfig, generate_samples
    root = tmp_path_factory.mktemp("ToyDataPar")
    case = root / "Case_1"
    for split, n in (("Tr", 16), ("Ts", 2)):
        gen_cfg = ToyGenConfig(
            input_files=["ballSphere.stl"],
            save_path=str(case / f"images{split}"), n_samples=n,
            image_size=(P, P, P), min_object_ratio=5, max_object_ratio=2,
            gauss_sigma=2, blur=True, segmentation=True, n_raters=3,
            seed=1 if split == "Tr" else 2)
        random.seed(gen_cfg.seed)
        np.random.seed(gen_cfg.seed)
        generate_samples(gen_cfg)
        seg = case / f"images{split}" / "segmentation"
        (case / f"labels{split}").mkdir(exist_ok=True)
        for f in seg.iterdir():
            f.rename(case / f"labels{split}" / f.name)
        seg.rmdir()
    return root


def test_fit_data_parallel_production_path(toy_dataset_parallel, tmp_path):
    """fit() with devices=8 runs the sharded train step end to end and
    produces a loadable checkpoint (the production mesh path, not a
    bespoke dryrun copy)."""
    from values_tpu.training.loops import fit
    from values_tpu.training.checkpoint import load_any_checkpoint

    cfg = compose("configs", "softmax_config", overrides=[
        f"data_input_dir={toy_dataset_parallel}",
        f"save_dir={tmp_path}/exp",
        "max_epochs=1", "batch_size=8", "datamodule.patch_size=16",
        "datamodule.batch_size=8", "datamodule.data_num_folds=3",
        "model.initial_filter_size=2", "version=0", "devices=8",
    ])
    ckpt = fit(cfg, max_steps_override=2)
    hparams, variables = load_any_checkpoint(ckpt)
    assert variables is not None
    assert int(hparams["devices"]) == 8


def test_resolve_device_count():
    from values_tpu.parallel.mesh import resolve_device_count
    assert resolve_device_count(None) == 1
    assert resolve_device_count("1") == 1
    assert resolve_device_count(4) == 4
    assert resolve_device_count("all", available=8) == 8
    assert resolve_device_count(-1, available=8) == 8


def test_hybrid_mesh_single_slice_fallback():
    """Without multiple DCN granules the hybrid mesh is the plain
    (data, sample) ICI mesh over all visible devices."""
    from values_tpu.parallel.mesh import make_hybrid_mesh

    m = make_hybrid_mesh(n_sample=2)
    assert m.shape == {"data": 4, "sample": 2}
    m1 = make_hybrid_mesh()
    assert m1.shape == {"data": 8, "sample": 1}


def test_hybrid_mesh_dcn_layout():
    """With dcn_data=2 the data axis must be granule-major: all devices of
    DCN granule 0 before granule 1 (collectives decompose hierarchically)."""
    from values_tpu.parallel.mesh import make_hybrid_mesh

    m = make_hybrid_mesh(n_sample=2, dcn_data=2)
    assert m.shape == {"data": 4, "sample": 2}
    ids = np.array([[d.id for d in row] for row in m.devices])
    # CPU virtual devices enumerate granule-free; the contract is that the
    # first data half is one granule's device set, disjoint from the second
    first, second = set(ids[:2].ravel()), set(ids[2:].ravel())
    assert first.isdisjoint(second)
    assert first | second == set(range(8))


def test_initialize_distributed_noop_and_ordering(monkeypatch):
    """Without COORDINATOR_ADDRESS it is a no-op returning 1; with the
    env set after the backend is already up it must raise the clear
    relaunch message, NOT the raw jax.distributed error (code-review r2:
    the old version always self-defeated by touching process_count
    first)."""
    import pytest
    from values_tpu.parallel.mesh import initialize_distributed

    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert initialize_distributed() == 1

    # backend is initialized in this test process (jax ops ran already)
    monkeypatch.setenv("COORDINATOR_ADDRESS", "127.0.0.1:9999")
    monkeypatch.setenv("NUM_PROCESSES", "2")
    monkeypatch.setenv("PROCESS_ID", "0")
    with pytest.raises(RuntimeError, match="values_tpu.training.main"):
        initialize_distributed()


# -- generalized sample-axis sharding (VERDICT r2 item 5) --------------------

def _pass_predict_outputs(mode, n_sample, **kwargs):
    """Run make_parallel_pass_predict for one mode on an (8/n, n) mesh."""
    from values_tpu.parallel.mesh import make_parallel_pass_predict
    if mode == "ssn":
        from values_tpu.models.ssn_unet3d import SsnUNet3D
        model = SsnUNet3D(num_classes=2, initial_filter_size=2, rank=3)
        n_models = 1
    else:
        model = UNet3D(num_classes=2, initial_filter_size=2,
                       do_dropout=kwargs.pop("do_dropout", False),
                       aleatoric_loss=(mode == "aleatoric"))
        n_models = kwargs.pop("n_models", 2)
    x = jnp.asarray(np.random.RandomState(3).rand(2, P, P, P, 1)
                    .astype(np.float32))
    members = [jax.jit(model.init)(jax.random.PRNGKey(s), x[:1])
               for s in range(n_models)]
    stacked = stack_params(members)
    mesh = make_mesh(n_data=8 // n_sample, n_sample=n_sample)
    fn = make_parallel_pass_predict(model, mode, n_models, mesh, **kwargs)
    stack, sigma = fn(stacked, x, jax.random.PRNGKey(9))
    return (np.asarray(stack),
            np.asarray(sigma) if sigma is not None else None)


@pytest.mark.slow  # compiles 3 mesh variants per mode (minutes on CPU)
@pytest.mark.parametrize("mode,kwargs,s_total", [
    ("default", {"n_pred": 4, "do_dropout": True}, 8),   # MC dropout
    ("tta", {}, 32),                                     # 2 models x 16
    ("aleatoric", {"n_aleatoric_samples": 4}, 8),
    ("ssn", {"n_pred": 8}, 8),
])
def test_pass_sharding_shard_count_invariant(mode, kwargs, s_total):
    """The same passes must come out bit-identical for 1, 2 and 4 sample
    shards (every draw is keyed by the GLOBAL pass index)."""
    outs = {}
    for n_sample in (1, 2, 4):
        np.random.seed(0)
        outs[n_sample] = _pass_predict_outputs(mode, n_sample,
                                               **dict(kwargs))
    for n_sample in (2, 4):
        # every random draw is keyed by the global pass index, so the
        # MATH is shard-count invariant; different shard counts compile
        # different programs whose fusion order moves the last float bit
        np.testing.assert_allclose(outs[n_sample][0], outs[1][0],
                                   atol=1e-6,
                                   err_msg=f"{mode} stack n={n_sample}")
        if outs[1][1] is not None:
            np.testing.assert_allclose(
                outs[n_sample][1], outs[1][1], atol=1e-6,
                err_msg=f"{mode} sigma n={n_sample}")
    assert outs[1][0].shape[0] == s_total


def test_pass_sharding_deterministic_matches_unsharded_default():
    """With no stochasticity (n_pred=1, no dropout) the sharded default
    mode must equal the unsharded vmapped predictor exactly."""
    from values_tpu.parallel.mesh import make_parallel_pass_predict
    model = UNet3D(num_classes=2, initial_filter_size=2)
    x = jnp.asarray(np.random.RandomState(3).rand(2, P, P, P, 1)
                    .astype(np.float32))
    members = [jax.jit(model.init)(jax.random.PRNGKey(s), x[:1])
               for s in range(4)]
    stacked = stack_params(members)
    ref = make_default_predictor(model, 4, 1, False)(
        stacked, x, jax.random.PRNGKey(0))[0]
    mesh = make_mesh(n_data=2, n_sample=4)
    fn = make_parallel_pass_predict(model, "default", 4, mesh)
    stack, _ = fn(stacked, x, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(stack), np.asarray(ref),
                               atol=1e-6)


@pytest.mark.slow  # two full TTA compiles
def test_engine_sample_strategy_tta(tmp_path):
    """SlidingWindowEngine(mesh_strategy='sample') now shards TTA's 16
    variants; the full engine run must match the mesh-free engine on
    a deterministic model."""
    from values_tpu.inference.engine import SlidingWindowEngine
    model = UNet3D(num_classes=2, initial_filter_size=2)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, P, P, P, 1)))
    volume = np.random.RandomState(1).rand(2 * P, P, P).astype(np.float32)
    mesh = make_mesh(n_data=2, n_sample=4)
    kwargs = dict(mode="tta", patch_size=P, window_batch=4, seed=5)
    eng_ref = SlidingWindowEngine(model, [variables], **kwargs)
    eng_sharded = SlidingWindowEngine(model, [variables], mesh=mesh,
                                      mesh_strategy="sample", **kwargs)
    ref = eng_ref.run_volume(volume)
    out = eng_sharded.run_volume(volume)
    np.testing.assert_allclose(out[0], ref[0], atol=2e-5)  # softmax sums
    np.testing.assert_allclose(out[1], ref[1], atol=1e-6)  # counts


def test_tta_pass_predictor_traces_one_forward_per_pass():
    """Regression: lax.switch over whole TTA forwards under jax.vmap
    executes EVERY branch (vmap batches the index -> eval-all +
    select_n), i.e. 16 model forwards per pass. The predictor must
    lower to ~one (vmapped) forward total: the HLO convolution count
    must stay within 2x a single model forward's count."""
    from values_tpu.inference.predictors import (
        make_pass_range_predictor, total_passes)
    model = UNet3D(num_classes=2, initial_filter_size=2)
    x = jnp.zeros((1, P, P, P, 1), jnp.float32)
    members = [jax.jit(model.init)(jax.random.PRNGKey(s), x)
               for s in range(2)]
    stacked = stack_params(members)
    rng = jax.random.PRNGKey(0)

    def count_convs(txt):
        return txt.count("stablehlo.convolution") + txt.count(
            " convolution(")

    single = jax.jit(lambda v, xx: model.apply(v, xx)).lower(
        members[0], x).as_text()
    n_single = count_convs(single)

    local = make_pass_range_predictor(model, "tta", 2)
    n_total = total_passes("tta", 2, 1, 10)
    fn = jax.jit(lambda v, xx, key: local(v, xx, key, 0, n_total))
    hlo = fn.lower(stacked, x, rng).as_text()
    n_tta = count_convs(hlo)
    assert n_single > 0
    assert n_tta <= 2 * n_single, (
        f"TTA predictor traces {n_tta} convolutions vs {n_single} for a "
        "single forward — branch blowup is back")


def test_data_parallel_packed_backend_matches_single_device(tmp_path):
    """train_backend=packed inside the sharded train step: the banded
    custom-VJP conv (interpret mode on CPU) must compose with shard_map
    data parallelism — loss and updated params equal the single-device
    packed step."""
    cfg = compose("configs", "softmax_config", overrides=[
        "model.initial_filter_size=2", "datamodule.patch_size=16",
        "+train_backend=packed",
        f"data_input_dir={tmp_path}", f"save_dir={tmp_path}"])
    exp = Experiment(cfg)
    state = exp.init_state(jax.random.PRNGKey(0), P)
    rng = jax.random.PRNGKey(1)
    rs = np.random.RandomState(0)
    batch = {
        "data": jnp.asarray(rs.rand(8, P, P, P, 1).astype(np.float32)),
        "seg": jnp.asarray(rs.randint(0, 2, size=(8, P, P, P))),
    }
    state_ref, loss_ref = exp.train_step(state, batch, rng)

    mesh = make_mesh(n_data=4, n_sample=1, devices=jax.devices()[:4])
    pstate = jax.device_put(exp.init_state(jax.random.PRNGKey(0), P),
                            replicated(mesh))
    sharded_batch = {k: jax.device_put(v, batch_sharding(mesh))
                     for k, v in batch.items()}
    pstep = make_parallel_train_step(exp, mesh)
    pstate2, loss_par = pstep(pstate, sharded_batch, rng)
    assert float(loss_par) == pytest.approx(float(loss_ref), abs=1e-4)
    k_ref = np.asarray(state_ref.params["final"]["kernel"])
    k_par = np.asarray(pstate2.params["final"]["kernel"])
    np.testing.assert_allclose(k_par, k_ref, atol=1e-4)


def _score_fixture(members=2, b=8, do_dropout=False, seed=0):
    from values_tpu.models.ensemble_unet3d import group_member_variables
    base = UNet3D(num_classes=2, initial_filter_size=2,
                  do_dropout=do_dropout)
    keys = jax.random.split(jax.random.PRNGKey(seed), members)
    stacked = group_member_variables(
        [base.init(k, jnp.zeros((1, P, P, P, 1))) for k in keys])
    rs = np.random.RandomState(seed)
    vols = jnp.asarray(rs.rand(b, P, P, P, 1).astype(np.float32))
    gt = jnp.asarray((rs.rand(b, P, P, P) > 0.7).astype(np.int32))
    return stacked, vols, gt


def test_sharded_scorer_deterministic_matches_unsharded():
    """Data-sharded scores-only pipeline (make_sharded_scorer): the
    deterministic ensemble scorer over a 4-shard data mesh matches the
    unsharded scorer to float-association tolerance — per-volume score
    math is independent of which volumes share a pack group, but the
    banded kernel's tiling differs between nb=4 and nb=1 packed rows
    (measured max rel diff 5e-6) — and only (10, B) crosses ICI."""
    from values_tpu.inference.scoring import make_packed_scorer
    from values_tpu.parallel.mesh import make_sharded_scorer
    # local batch 8 = bp (128 // 16): every shard runs full lanes
    stacked, vols, gt = _score_fixture(b=32)
    score, _ = make_packed_scorer(2, P, agg_patch=4, dtype=jnp.float32,
                                  interpret=True)
    rng = jax.random.PRNGKey(1)
    want = np.asarray(jax.jit(score)(stacked, vols, gt, rng))

    mesh = make_mesh(n_data=4, n_sample=1, devices=jax.devices()[:4])
    got = np.asarray(make_sharded_scorer(score, mesh)(
        stacked, vols, gt, rng))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_sharded_scorer_pads_ragged_batch():
    """A batch that does not divide the shard count is zero-padded up
    and the pad scores sliced off; surviving volumes score identically
    (allclose: pack-group composition differs between the two runs)."""
    from values_tpu.inference.scoring import make_packed_scorer
    from values_tpu.parallel.mesh import make_sharded_scorer
    stacked, vols, gt = _score_fixture(b=6)
    score, _ = make_packed_scorer(2, P, agg_patch=4, dtype=jnp.float32,
                                  interpret=True)
    rng = jax.random.PRNGKey(1)
    want = np.asarray(jax.jit(score)(stacked, vols, gt, rng))
    mesh = make_mesh(n_data=4, n_sample=1, devices=jax.devices()[:4])
    got = np.asarray(make_sharded_scorer(score, mesh)(
        stacked, vols, gt, rng))
    assert got.shape == want.shape == (10, 6)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_sharded_scorer_stochastic_per_shard_streams():
    """Stochastic families run each shard with fold_in(rng, shard_idx):
    the sharded MC-dropout result equals composing the local scorer on
    each batch shard with its folded key — the documented contract."""
    from values_tpu.inference.scoring import make_packed_dropout_scorer
    from values_tpu.parallel.mesh import make_sharded_scorer
    stacked, vols, gt = _score_fixture(b=16, do_dropout=True)
    score, _ = make_packed_dropout_scorer(2, P, n_pred=2, agg_patch=4,
                                          dtype=jnp.float32,
                                          interpret=True)
    rng = jax.random.PRNGKey(7)
    mesh = make_mesh(n_data=2, n_sample=1, devices=jax.devices()[:2])
    got = np.asarray(make_sharded_scorer(score, mesh)(
        stacked, vols, gt, rng))
    jscore = jax.jit(score)
    want = np.concatenate([
        np.asarray(jscore(stacked, vols[i * 8:(i + 1) * 8],
                          gt[i * 8:(i + 1) * 8],
                          jax.random.fold_in(rng, i)))
        for i in range(2)], axis=1)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)
