"""Banded-GEMM Pallas conv3d: correctness vs lax.conv and full-model parity.

CPU tests run the kernel in interpreter mode; the same code path compiles
on real TPU (exercised by bench.py and scripts/bench_convs.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from values_tpu.ops.pallas.conv3d import (banded_weights, choose_tiling,
                                          conv3d_grouped_banded, pack_ndhwc,
                                          unpack_ndhwc)

rs = np.random.RandomState(0)


def _ref_conv(x, k, bias, groups):
    out = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=groups)
    return out + bias


def test_pack_roundtrip():
    x = jnp.asarray(rs.randn(8, 4, 4, 16, 3), dtype=jnp.float32)
    packed = pack_ndhwc(x, 8)
    assert packed.shape == (1, 4, 4, 3, 128)
    np.testing.assert_array_equal(np.asarray(unpack_ndhwc(packed, 8)),
                                  np.asarray(x))
    # item i occupies lane block [i*W, (i+1)*W)
    np.testing.assert_array_equal(np.asarray(packed[0, ..., 16:32]),
                                  np.asarray(x[1].transpose(0, 1, 3, 2)))


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 8, 1, 8, 8),     # plain
    (2, 8, 8, 8, 2, 8, 16),    # grouped
    (1, 8, 16, 8, 2, 8, 8),    # non-cubic, batch < bp (padded internally)
    (4, 8, 8, 16, 1, 16, 8),   # wider items, cout < lanes
    (32, 4, 4, 4, 2, 8, 8),    # deep-level geometry (bp = 32)
])
def test_matches_lax_conv(shape):
    B, D, H, W, G, cin, cout = shape
    x = jnp.asarray(rs.randn(B, D, H, W, G * cin), dtype=jnp.float32)
    k = jnp.asarray(rs.randn(3, 3, 3, cin, G * cout) * 0.2,
                    dtype=jnp.float32)
    bias = jnp.asarray(rs.randn(G * cout), dtype=jnp.float32)
    ref = _ref_conv(x, k, bias, G)
    got = conv3d_grouped_banded(x, k, bias, groups=G, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_explicit_tiling_override():
    B, D, H, W, G, cin, cout = 2, 8, 8, 8, 1, 8, 8
    x = jnp.asarray(rs.randn(B, D, H, W, G * cin), dtype=jnp.float32)
    k = jnp.asarray(rs.randn(3, 3, 3, cin, G * cout) * 0.2,
                    dtype=jnp.float32)
    bias = jnp.zeros((G * cout,), jnp.float32)
    ref = _ref_conv(x, k, bias, G)
    for tiling in [(1, 1, 8), (2, 4, 4), (4, 2, 8), (2, 2, 2)]:
        got = conv3d_grouped_banded(x, k, bias, groups=G, tiling=tiling,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, err_msg=str(tiling))


def test_forms_agree_with_lax_conv():
    """All kernel forms (x3 prebuild / outroll / hband) reproduce
    lax.conv — the production default is outroll, the others stay
    selectable for chip A/Bs."""
    from values_tpu.ops.pallas.conv3d import (conv3d_banded_packed,
                                              pack_ndhwc, unpack_ndhwc)
    B, D, H, W, G, cin, cout = 2, 8, 8, 8, 2, 8, 8
    x = jnp.asarray(rs.randn(B, D, H, W, G * cin), dtype=jnp.float32)
    k = jnp.asarray(rs.randn(3, 3, 3, cin, G * cout) * 0.2,
                    dtype=jnp.float32)
    bias = jnp.asarray(rs.randn(G * cout), dtype=jnp.float32)
    ref = _ref_conv(x, k, bias, G)
    bp = 128 // W
    pad_b = (-B) % bp
    xp = pack_ndhwc(jnp.concatenate(
        [x, jnp.zeros((pad_b,) + x.shape[1:], x.dtype)]), bp)
    for form in ("outroll", "x3", "hband"):
        got = unpack_ndhwc(conv3d_banded_packed(
            xp, k, bias, G, w_item=W, form=form, interpret=True), bp)[:B]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, err_msg=form)
    # hband with a lane batch (nq > 1: the A concat path) and stats
    got, (s1, s2) = conv3d_banded_packed(
        xp, k, bias, G, w_item=W, form=form, tiling=(1, 2, 4, 2),
        emit_stats=True, interpret=True)
    np.testing.assert_allclose(np.asarray(unpack_ndhwc(got, bp)[:B]),
                               np.asarray(ref), atol=1e-4)
    # activation="none" => the stats sum equals the packed output's sum
    # (including the zero-padded pack items, whose conv output is bias)
    np.testing.assert_allclose(
        np.asarray(s1).sum(),
        np.asarray(got).astype(np.float64).sum(), rtol=1e-4)


def test_banded_weights_structure():
    """Band rows reproduce the kernel taps in (kw, rd, rh, ci) column
    order; outside the band is zero."""
    G, cin, cout, qd, qh = 2, 3, 4, 2, 2
    k = jnp.asarray(rs.randn(3, 3, 3, cin, G * cout), dtype=jnp.float32)
    bw = np.asarray(banded_weights(k, G, qd, qh))
    assert bw.shape == (G, qd * qh * cout, 3 * (qd + 2) * (qh + 2) * cin)
    kn = np.asarray(k)
    for g in range(G):
        for dd in range(qd):
            for dh in range(qh):
                for co in range(cout):
                    n = (dd * qh + dh) * cout + co
                    for kw in range(3):
                        for rd in range(qd + 2):
                            for rh in range(qh + 2):
                                for ci in range(cin):
                                    kk = ((kw * (qd + 2) + rd) * (qh + 2)
                                          + rh) * cin + ci
                                    inside = (0 <= rd - dd < 3
                                              and 0 <= rh - dh < 3)
                                    want = (kn[rd - dd, rh - dh, kw, ci,
                                               g * cout + co]
                                            if inside else 0.0)
                                    assert bw[g, n, kk] == want


def test_choose_tiling_bounds():
    budget = 13 * 2 ** 20
    for form, n_bufs, k_div in (("x3", 4, 1), ("outroll", 2, 3),
                                ("hband", 2, 9)):
        for itemsize in (2, 4):
            for cin in (8, 16, 32):
                for cout, d, h in [(8, 64, 64), (16, 32, 32), (32, 16, 16),
                                   (64, 8, 8), (128, 4, 4)]:
                    chosen = choose_tiling(cout, d, h, cin, itemsize,
                                           form=form)
                    if chosen is None:
                        # genuinely unfittable (e.g. f32 cin=32 at h=64
                        # with the x3 prebuild): callers fall back to
                        # the XLA conv
                        assert itemsize == 4 and cin == 32 and h == 64
                        continue
                    qd, qh, sd, nq = chosen
                    assert qd * qh * cout <= 128
                    assert d % qd == 0 and h % qh == 0
                    assert d % sd == 0 and sd % qd == 0
                    assert (h // qh) % nq == 0
                    # the full scoped set must fit the budget: x3 keeps
                    # 4 haloed tile buffers + the 3-variant A temp + one
                    # f32 dot output; outroll keeps 2 buffers + a
                    # single-variant A temp + THREE f32 product blocks
                    # padded dims: VMEM tiles round the second-minor dim
                    # up to the sublane multiple (16 bf16 / 8 f32) and
                    # the minor dim up to 128 lanes
                    sub = 16 if itemsize == 2 else 8
                    spad = lambda c: -(-c // sub) * sub
                    lpad = lambda c: -(-c // 128) * 128
                    k = 3 * (qd + 2) * (qh + 2) * cin
                    n = qd * qh * cout
                    n_dots = 1 if form == "x3" else 3
                    # plus the d-boundary fix-up temp, the A pieces
                    # (live alongside the concat result: 2x A) and the
                    # current dot's raw output block (n_dots + 1)
                    scoped = (n_bufs * (sd + 2) * (h + 2) * spad(cin) * 128
                              * itemsize
                              + 2 * sd * h * spad(cout) * 128 * itemsize
                              + 2 * spad(n) * lpad(k) * itemsize
                              + (sd + 1) * h * spad(cin) * 128 * itemsize
                              + 2 * spad(k // k_div) * nq * 128 * itemsize
                              + (n_dots + 1) * spad(n) * nq * 128 * 4)
                    assert scoped <= budget, (form, itemsize, cin, cout,
                                              d, scoped)


def test_grouped_forward_matches_flax_ensemble():
    """Full-model parity: the packed/Pallas forward reproduces the flax
    grouped EnsembleUNet3D to float tolerance (same variable tree)."""
    from values_tpu.models.ensemble_unet3d import (
        EnsembleUNet3D, group_member_variables)
    from values_tpu.models.ensemble_unet3d_pallas import (
        make_grouped_ensemble_predictor_pallas)
    from values_tpu.models.unet3d import UNet3D

    P, members, f = 16, 2, 2
    base = UNet3D(num_classes=2, initial_filter_size=f)
    keys = jax.random.split(jax.random.PRNGKey(0), members)
    init = jax.jit(base.init)
    grouped = group_member_variables(
        [init(k, jnp.zeros((1, P, P, P, 1))) for k in keys])

    x = jnp.asarray(rs.rand(2, P, P, P, 1), dtype=jnp.float32)
    flax_model = EnsembleUNet3D(num_classes=2, members=members,
                                initial_filter_size=f)
    ref_logits = flax_model.apply(
        jax.tree_util.tree_map(jnp.asarray, grouped), x)
    ref_probs = jnp.moveaxis(jax.nn.softmax(ref_logits, axis=-1), -2, 0)

    _, predict = make_grouped_ensemble_predictor_pallas(
        2, members, f, dtype=jnp.float32, interpret=True)
    got_probs, sigma = predict(grouped, x, jax.random.PRNGKey(1))
    assert sigma is None
    np.testing.assert_allclose(np.asarray(got_probs), np.asarray(ref_probs),
                               atol=5e-5)


def test_grouped_forward_mc_dropout_stochastic():
    from values_tpu.models.ensemble_unet3d import group_member_variables
    from values_tpu.models.ensemble_unet3d_pallas import (
        make_grouped_ensemble_predictor_pallas)
    from values_tpu.models.unet3d import UNet3D

    P, f, S = 16, 2, 3
    base = UNet3D(num_classes=2, initial_filter_size=f, do_dropout=True)
    v = jax.jit(base.init)(jax.random.PRNGKey(0),
                           jnp.zeros((1, P, P, P, 1)))
    grouped = group_member_variables([v] * S)
    x = jnp.asarray(rs.rand(1, P, P, P, 1), dtype=jnp.float32)
    _, predict = make_grouped_ensemble_predictor_pallas(
        2, S, f, dtype=jnp.float32, do_dropout=True, interpret=True)
    probs, _ = predict(grouped, x, jax.random.PRNGKey(3))
    assert probs.shape == (S, 1, P, P, P, 2)
    # same weights, different masks -> samples differ
    assert not np.allclose(np.asarray(probs[0]), np.asarray(probs[1]))


def _ref_conv(x_ndhwc, kernel, bias, groups):
    import jax
    return jax.lax.conv_general_dilated(
        x_ndhwc, kernel, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=groups) + bias


def test_banded_conv_split_input_and_prologue_and_stats(rng):
    """v2 kernel features vs composed XLA reference: fused skip concat
    (x2), normalize prologue with per-channel slopes, epilogue activation,
    and instance-norm statistics side outputs."""
    import jax
    import jax.numpy as jnp
    from values_tpu.ops.pallas.conv3d import (conv3d_banded_packed,
                                              pack_ndhwc, unpack_ndhwc)

    groups, cin1, cin2, cout = 2, 8, 8, 8
    b, dd, hh, ww = 4, 8, 8, 32
    bp = 128 // ww
    x1 = rng.rand(b, dd, hh, ww, groups * cin1).astype(np.float32)
    x2 = rng.rand(b, dd, hh, ww, groups * cin2).astype(np.float32)
    kernel = (rng.rand(3, 3, 3, cin1 + cin2, groups * cout)
              .astype(np.float32) - 0.5) * 0.2
    bias = rng.rand(groups * cout).astype(np.float32) * 0.1

    # prologue maps: per (item, channel) scale/shift; slope 0.01 on the
    # x2 half (leaky), identity on the x1 half
    n_items = b
    scale_i = rng.rand(n_items, groups * (cin1 + cin2)).astype(np.float32) + 0.5
    shift_i = rng.rand(n_items, groups * (cin1 + cin2)).astype(np.float32) - 0.5
    slope_i = np.ones_like(scale_i)
    for g in range(groups):
        slope_i[:, g * (cin1 + cin2) + cin1:(g + 1) * (cin1 + cin2)] = 0.01

    # reference: prologue -> concat -> conv -> relu epilogue
    xc = np.concatenate([x1.reshape(b, dd, hh, ww, groups, cin1),
                         x2.reshape(b, dd, hh, ww, groups, cin2)],
                        axis=-1).reshape(b, dd, hh, ww, -1)
    v = xc * scale_i[:, None, None, None] - shift_i[:, None, None, None]
    v = np.maximum(v, v * slope_i[:, None, None, None])
    ref = _ref_conv(jnp.asarray(v), jnp.asarray(kernel), jnp.asarray(bias),
                    groups)
    ref_relu = np.maximum(np.asarray(ref), 0.0)

    # packed v2 kernel
    def lane_maps(m):  # (items, C) -> (nb, C, 128) per-lane maps
        nb = b // bp
        out = np.zeros((nb, m.shape[1], 128), np.float32)
        for item in range(b):
            blk = item % bp
            out[item // bp, :, blk * ww:(blk + 1) * ww] = m[item][:, None]
        return jnp.asarray(out)

    p1 = pack_ndhwc(jnp.asarray(x1), bp)
    p2 = pack_ndhwc(jnp.asarray(x2), bp)
    out, (ssum, ssq) = conv3d_banded_packed(
        p1, jnp.asarray(kernel), jnp.asarray(bias), groups, w_item=ww,
        x2=p2, prologue=(lane_maps(scale_i), lane_maps(shift_i),
                         lane_maps(slope_i)),
        activation="relu", emit_stats=True, interpret=True)
    got = np.asarray(unpack_ndhwc(out, bp))
    np.testing.assert_allclose(got, ref_relu, atol=2e-4, rtol=2e-4)

    # stats are of conv+bias PRE-activation, lane-resolved
    pre = np.asarray(ref)
    ssum = np.asarray(ssum)
    ssq = np.asarray(ssq)
    for item in range(b):
        nb_i, blk = item // bp, item % bp
        lanes = slice(blk * ww, (blk + 1) * ww)
        want_sum = pre[item].sum((0, 1))  # (W, C) summed over D,H -> per W
        np.testing.assert_allclose(
            ssum[nb_i, :, lanes], want_sum.T, atol=2e-3, rtol=2e-3)
        np.testing.assert_allclose(
            ssq[nb_i, :, lanes], (pre[item] ** 2).sum((0, 1)).T,
            atol=5e-3, rtol=2e-3)


def test_grouped_forward_non_cubic_matches_flax(rng):
    """Anisotropic patches (D != H != W): the fused path's norm stats
    must use the true per-level voxel counts (code-review r2 finding)."""
    import jax
    import jax.numpy as jnp
    from values_tpu.models.ensemble_unet3d import (EnsembleUNet3D,
                                                   group_member_variables)
    from values_tpu.models.ensemble_unet3d_pallas import (
        make_grouped_ensemble_predictor_pallas)
    from values_tpu.models.unet3d import UNet3D

    members, d, h, w = 2, 16, 32, 32
    base = UNet3D(num_classes=2, initial_filter_size=2)
    init = jax.jit(base.init)
    keys = jax.random.split(jax.random.PRNGKey(0), members)
    stacked = group_member_variables(
        [init(k, jnp.zeros((1, d, h, w, 1))) for k in keys])
    x = jnp.asarray(rng.rand(4, d, h, w, 1).astype(np.float32))

    ref_model = EnsembleUNet3D(num_classes=2, members=members,
                               initial_filter_size=2)
    ref_logits = ref_model.apply(stacked, x)       # (B, d, h, w, M, C)
    ref_probs = jnp.moveaxis(jax.nn.softmax(ref_logits, axis=-1), -2, 0)

    _, pred = make_grouped_ensemble_predictor_pallas(
        2, members, 2, dtype=jnp.float32, interpret=True)
    got, _ = pred(stacked, x, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_probs),
                               atol=2e-4, rtol=2e-4)


# -- deep-level lane refill (fold-with-halos) ---------------------------------

def test_fold_unfold_roundtrip():
    from values_tpu.ops.pallas.conv3d import fold_halo, unfold_halo
    x = jnp.asarray(rs.randn(1, 8, 8, 16, 32), dtype=jnp.float32)
    for f, axis in ((4, 2), (2, 2), (2, 1), (4, 1)):
        y = fold_halo(x, f, axis)
        n = x.shape[axis]
        assert y.shape[axis] == n // f + 2 and y.shape[-1] == 32 * f
        np.testing.assert_array_equal(np.asarray(unfold_halo(y, f, axis)),
                                      np.asarray(x))


@pytest.mark.parametrize("geom", [
    # (B, D, H, W, G, cin, cout): lanes = (B*W) < 128 deep-level shapes
    (4, 8, 8, 8, 2, 8, 8),     # lanes 32, fold H by 4
    (8, 8, 8, 8, 2, 8, 16),    # lanes 64, fold H by 2
    (4, 8, 2, 8, 2, 8, 8),     # H not divisible by 4 -> folds D
])
def test_fold_deep_conv_matches_lax(geom, monkeypatch):
    """_conv's lane-refill branch (fold slabs with real halos into the
    lanes, trim the halo outputs) is exact vs lax.conv."""
    from values_tpu.models.ensemble_unet3d_pallas import _conv
    B, D, H, W, G, cin, cout = geom
    x = jnp.asarray(rs.randn(B, D, H, W, G * cin), dtype=jnp.float32)
    k = jnp.asarray(rs.randn(3, 3, 3, cin, G * cout) * 0.2,
                    dtype=jnp.float32)
    bias = jnp.asarray(rs.randn(G * cout), dtype=jnp.float32)
    ref = _ref_conv(x, k, bias, G)
    bp = B  # all items in one pack => lanes = B*W < 128
    xp = pack_ndhwc(x, bp)
    assert xp.shape[-1] < 128
    monkeypatch.setenv("VALUES_TPU_FOLD_DEEP", "1")
    got = unpack_ndhwc(_conv(xp, {"kernel": k, "bias": bias}, G, W, bp,
                             interpret=True), bp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    # activation epilogue rides the folded kernel too
    got_act = unpack_ndhwc(_conv(xp, {"kernel": k, "bias": bias}, G, W, bp,
                                 activation="leaky", interpret=True), bp)
    np.testing.assert_allclose(np.asarray(got_act),
                               np.asarray(jax.nn.leaky_relu(ref, 0.01)),
                               atol=1e-4)


def test_fold_deep_conv_grad_matches_lax(monkeypatch):
    """The AD (training) path through the fold: dx/dk/db match lax.conv
    gradients exactly — halo-row cotangents are zero and the fold's
    transpose re-accumulates overlapping slab contributions."""
    from values_tpu.models.ensemble_unet3d_pallas import _conv
    B, D, H, W, G, cin, cout = 4, 8, 8, 8, 2, 8, 8
    x = jnp.asarray(rs.randn(B, D, H, W, G * cin), dtype=jnp.float32)
    k = jnp.asarray(rs.randn(3, 3, 3, cin, G * cout) * 0.2,
                    dtype=jnp.float32)
    bias = jnp.asarray(rs.randn(G * cout), dtype=jnp.float32)
    cot = jnp.asarray(rs.randn(B, D, H, W, G * cout), dtype=jnp.float32)
    monkeypatch.setenv("VALUES_TPU_FOLD_DEEP", "1")
    bp = B

    def loss_ref(x, k, b):
        return jnp.sum(jax.nn.leaky_relu(_ref_conv(x, k, b, G), 0.01) * cot)

    def loss_fold(x, k, b):
        out = _conv(pack_ndhwc(x, bp), {"kernel": k, "bias": b}, G, W, bp,
                    activation="leaky", interpret=True, ad=True)
        return jnp.sum(unpack_ndhwc(out, bp) * cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, bias)
    g_got = jax.grad(loss_fold, argnums=(0, 1, 2))(x, k, bias)
    for a, b, name in zip(g_got, g_ref, ("dx", "dk", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3, err_msg=name)


def test_fold_deep_stats_and_prologue(monkeypatch):
    """emit_stats through the fold returns PRE-activation (sum, sumsq)
    over (d, h) with no halo double-counting; prologue maps tile into
    the folded lanes."""
    from values_tpu.models.ensemble_unet3d_pallas import _conv
    B, D, H, W, G, cin, cout = 4, 8, 8, 8, 2, 8, 8
    x = jnp.asarray(rs.randn(B, D, H, W, G * cin), dtype=jnp.float32)
    k = jnp.asarray(rs.randn(3, 3, 3, cin, G * cout) * 0.2,
                    dtype=jnp.float32)
    bias = jnp.asarray(rs.randn(G * cout), dtype=jnp.float32)
    bp = B
    xp = pack_ndhwc(x, bp)
    lanes = xp.shape[-1]
    sc = jnp.asarray(1.0 + 0.1 * rs.rand(1, G * cin, lanes),
                     dtype=jnp.float32)
    sh = jnp.asarray(0.1 * rs.randn(1, G * cin, lanes), dtype=jnp.float32)
    sl = jnp.full((1, G * cin, lanes), 0.01, jnp.float32)
    monkeypatch.setenv("VALUES_TPU_FOLD_DEEP", "1")
    got, (ssum, ssq) = _conv(xp, {"kernel": k, "bias": bias}, G, W, bp,
                             prologue=(sc, sh, sl), activation="leaky",
                             emit_stats=True, interpret=True)
    # reference: prologue in XLA on the unpacked layout
    xin = unpack_ndhwc(
        jnp.maximum(xp * sc[:, None, None] - sh[:, None, None],
                    (xp * sc[:, None, None] - sh[:, None, None])
                    * sl[:, None, None]), bp)
    pre = _ref_conv(xin, k, bias, G)
    np.testing.assert_allclose(np.asarray(unpack_ndhwc(got, bp)),
                               np.asarray(jax.nn.leaky_relu(pre, 0.01)),
                               atol=1e-4)
    prep = pack_ndhwc(pre, bp).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(ssum),
                               np.asarray(prep.sum(axis=(1, 2))),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(ssq),
                               np.asarray((prep * prep).sum(axis=(1, 2))),
                               atol=5e-3, rtol=2e-3)


def test_ad_stats_conv_grad_matches_lax():
    """conv3d_banded_packed_ad_stats: values AND gradients of the
    (conv, (sum, sumsq)) pair match the lax.conv + jnp-reduction
    composite — including cotangents flowing in through the stats
    (the training instance norm consumes them, VERDICT r3 item 5)."""
    from values_tpu.ops.pallas.conv3d import (LANES,
                                              conv3d_banded_packed_ad_stats)
    B, D, H, W, G, cin, cout = 8, 8, 8, 16, 2, 8, 8
    bp = LANES // W
    x = jnp.asarray(rs.randn(B, D, H, W, G * cin), dtype=jnp.float32)
    k = jnp.asarray(rs.randn(3, 3, 3, cin, G * cout) * 0.2,
                    dtype=jnp.float32)
    bias = jnp.asarray(rs.randn(G * cout), dtype=jnp.float32)
    cot = jnp.asarray(rs.randn(B, D, H, W, G * cout), dtype=jnp.float32)
    cs = jnp.asarray(rs.randn(B, G * cout), dtype=jnp.float32)

    def consume(y_flat, mean, sq_mean):
        # a norm-like consumer: elementwise use of y plus per-item use of
        # BOTH statistics, so ds1 and ds2 are exercised
        return (jnp.sum(y_flat * cot)
                + jnp.sum(mean * cs) + jnp.sum(sq_mean * (cs ** 2)))

    def loss_ref(x, k, b):
        y = _ref_conv(x, k, b, G)
        n_vox = D * H * W
        mean = jnp.sum(y, axis=(1, 2, 3)) / n_vox
        sq = jnp.sum(y * y, axis=(1, 2, 3)) / n_vox
        return consume(y, mean, sq)

    def loss_got(x, k, b):
        yp, (s1, s2) = conv3d_banded_packed_ad_stats(
            pack_ndhwc(x, bp), k, b, G, w_item=W, interpret=True)
        y = unpack_ndhwc(yp, bp)
        # lane-resolved stats -> per-item sums (what the norm consumes)
        from values_tpu.models.ensemble_unet3d_pallas import (
            _lane_block_sum_matrix)
        s = jnp.asarray(_lane_block_sum_matrix(LANES, bp), jnp.float32)
        dims = (((2,), (0,)), ((), ()))
        n_vox = D * H * W
        per_item = lambda a: jnp.transpose(
            jax.lax.dot_general(a, s, dims), (0, 2, 1)).reshape(
                B, G * cout)
        return consume(y, per_item(s1) / n_vox, per_item(s2) / n_vox)

    np.testing.assert_allclose(loss_got(x, k, bias), loss_ref(x, k, bias),
                               rtol=2e-4)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, bias)
    g_got = jax.grad(loss_got, argnums=(0, 1, 2))(x, k, bias)
    for a, b, name in zip(g_got, g_ref, ("dx", "dk", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3, err_msg=name)


@pytest.mark.parametrize("geom,wantbp", [
    # (B, D, H, W, G, cin, cout); bp = item-packs per 128 lanes
    ((8, 6, 6, 16, 5, 8, 8), 8),     # LIDC ensemble geometry, 7 boundaries
    ((4, 5, 7, 32, 2, 4, 6), 4),     # odd spatial dims, uneven channels
    ((2, 4, 4, 128, 1, 8, 8), 1),    # bp=1: no boundary corrections
])
def test_dkernel_fakegeom_matches_unpack(geom, wantbp, monkeypatch):
    """The fake-geometry backward-weights contraction (dk on the packed
    layout, lane axis as a fake spatial dim + cross-item boundary
    corrections) equals the unpack-to-NDHWC reference for every tap —
    including the kw=+-1 taps whose fake-conv lane pairs cross item
    boundaries. Runs through the public AD conv so the env switch is
    covered end to end."""
    from values_tpu.ops.pallas.conv3d import (_dkernel_fakegeom,
                                              conv3d_banded_packed_ad)
    B, D, H, W, G, cin, cout = geom
    bp = min(128 // W, B)
    assert bp == wantbp
    x = jnp.asarray(rs.randn(B, D, H, W, G * cin), dtype=jnp.float32)
    dy = jnp.asarray(rs.randn(B, D, H, W, G * cout), dtype=jnp.float32)
    k = jnp.asarray(rs.randn(3, 3, 3, cin, G * cout) * 0.2,
                    dtype=jnp.float32)

    def conv_ref(kk):
        return jax.lax.conv_general_dilated(
            x, kk, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=G)

    _, pb = jax.vjp(conv_ref, k)
    dk_ref, = pb(dy)
    dk_fake = _dkernel_fakegeom(pack_ndhwc(x, bp), pack_ndhwc(dy, bp),
                                k, G, W)
    np.testing.assert_allclose(np.asarray(dk_fake), np.asarray(dk_ref),
                               atol=1e-4, rtol=1e-4)

    # and through the full custom VJP (grad wrt kernel), fake vs unpack
    if B * W != 128:  # the AD wrapper requires full lanes
        pytest.skip(f"AD leg needs B*W == 128 (got {B}*{W}={B * W}); "
                    "kernel-level check above already passed")
    bias = jnp.asarray(rs.randn(G * cout), dtype=jnp.float32)
    cot = pack_ndhwc(dy, bp)

    def loss(kk, impl):
        monkeypatch.setenv("VALUES_TPU_DK_IMPL", impl)
        out = conv3d_banded_packed_ad(
            pack_ndhwc(x, bp), kk, bias, G, w_item=W, interpret=True)
        return jnp.sum(out * cot)

    g_fake = jax.grad(lambda kk: loss(kk, "fake"))(k)
    g_unpack = jax.grad(lambda kk: loss(kk, "unpack"))(k)
    np.testing.assert_allclose(np.asarray(g_fake),
                               np.asarray(g_unpack),
                               atol=1e-4, rtol=1e-4)
