"""2D full-resolution sliding-window inference (values_tpu extension;
the reference runs whole 0.25x images — test_2D.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from values_tpu.inference.window2d import (SlidingPredictor2D,
                                           enumerate_window_starts_2d,
                                           predict_sliding_2d)


def test_starts_cover_and_flush_to_edge():
    starts = enumerate_window_starts_2d((100, 70), (64, 64), overlap=0.5)
    # H starts: 0, 32, 36(flush); W starts: 0, 6(flush)
    assert starts.tolist() == [[0, 0], [0, 6], [32, 0], [32, 6],
                               [36, 0], [36, 6]]
    cov = np.zeros((100, 70), np.int32)
    for a, b in starts:
        cov[a:a + 64, b:b + 64] += 1
    assert (cov > 0).all()


def test_pixel_local_forward_exact():
    """For a pixel-local forward, sliding output == whole-image output
    exactly (overlap averaging of identical values)."""
    rng = np.random.RandomState(0)
    img = rng.rand(50, 37, 3).astype(np.float32)

    def forward(x):  # (1, h, w, 3) -> (1, h, w, 4) softmax, pixel-local
        logits = jnp.stack([x[..., 0], 2 * x[..., 1], x[..., 2] ** 2,
                            x.sum(-1)], axis=-1)
        return jax.nn.softmax(logits, axis=-1)

    whole = np.asarray(forward(img[None]))[0]
    tiled = predict_sliding_2d(forward, img, (16, 16), 4, overlap=0.5)
    np.testing.assert_allclose(tiled, whole, atol=1e-6)
    # short-axis reflect-pad path: image narrower than the patch
    narrow = img[:, :9]
    tiled_n = predict_sliding_2d(forward, narrow, (16, 16), 4,
                                 overlap=0.5)
    np.testing.assert_allclose(tiled_n,
                               np.asarray(forward(narrow[None]))[0],
                               atol=1e-6)


def test_sliding_predictor_hrnet_smoke():
    """SlidingPredictor2D drives a real (tiny) HRNet: finite softmax,
    sums to 1, one compiled program reused across images."""
    from values_tpu.models.hrnet import HighResolutionNet
    from tests.test_hrnet import small_cfg

    model = HighResolutionNet(cfg=small_cfg(num_classes=5))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 32, 32, 3)))
    sp = SlidingPredictor2D(model, (32, 32), 5, overlap=0.5)
    rng = np.random.RandomState(1)
    for i in range(2):
        img = rng.rand(48, 40, 3).astype(np.float32)
        out = sp(variables, img, jax.random.PRNGKey(i))
        assert out.shape == (48, 40, 5)
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)


def test_sliding_predictor_as_numpy_false():
    """as_numpy=False (r5: keep the ~190 MB full-res softmax map on
    device for packed C2 consumers / honest compute timing) returns a
    device array bit-identical to the numpy path, including the
    pad-then-crop geometry."""
    from values_tpu.models.hrnet import HighResolutionNet
    from tests.test_hrnet import small_cfg

    model = HighResolutionNet(cfg=small_cfg(num_classes=5))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 32, 32, 3)))
    sp = SlidingPredictor2D(model, (32, 32), 5, overlap=0.5)
    img = np.random.RandomState(2).rand(48, 40, 3).astype(np.float32)
    host = sp(variables, img, jax.random.PRNGKey(0))
    dev = sp(variables, img, jax.random.PRNGKey(0), as_numpy=False)
    assert isinstance(dev, jax.Array)
    assert dev.shape == (48, 40, 5)
    np.testing.assert_array_equal(host, np.asarray(dev))


class _PixelLocalModel:
    """Minimal model shim (apply(variables, x) -> logits), pixel-local
    so any count-averaged window placement reproduces the whole-image
    softmax exactly."""
    dropout_final = False
    num_classes = 24

    def apply(self, variables, x, **kwargs):
        return jnp.stack([x[..., i % 3] * (0.3 + 0.1 * i)
                          for i in range(24)], axis=-1)


def test_quilt_predictor_matches_whole_image():
    """SlidingPredictor2D's parity-quilt stitch (static-offset assembly;
    replaces the per-window dynamic_update_slice scatter that hit
    Mosaic's unaligned slow path at 9.3 s/img) is exact for a
    pixel-local forward at the production 1024x1912 geometry, including
    the regular-grid padding on the non-divisible 1912 axis and at an
    irregular (not window_batch-divisible) window count."""
    rng = np.random.RandomState(0)
    model = _PixelLocalModel()
    for shape in ((1024, 1912), (300, 200)):
        img = rng.rand(*shape, 3).astype(np.float32)
        sp = SlidingPredictor2D(model, (256, 478), 24, overlap=0.5)
        out = sp({}, img, jax.random.PRNGKey(0))
        whole = np.asarray(jax.nn.softmax(
            model.apply({}, jnp.asarray(img[None])), axis=-1))[0]
        assert out.shape == shape + (24,)
        np.testing.assert_allclose(out, whole, atol=1e-5)


def test_production_geometry_full_res():
    """The GTA/Cityscapes production geometry (VERDICT r2 item 8):
    1024x1912 full-resolution image, 256x478 inference windows
    (preprocess_gta_cityscapes.py center-crop 1024x1912, 0.25x train
    size 256x478 — reference test_2D.py:273-319), 24 classes. A
    pixel-local forward makes the sliding output bit-comparable to the
    whole-image one at real shapes: flush-to-edge starts on the
    non-divisible 1912 axis, overlap count-averaging, 24-class softmax."""
    rng = np.random.RandomState(0)
    img = rng.rand(1024, 1912, 3).astype(np.float32)

    def forward(x):  # (1, h, w, 3) -> (1, h, w, 24) pixel-local softmax
        feats = [x[..., i % 3] * (0.3 + 0.1 * i) for i in range(24)]
        return jax.nn.softmax(jnp.stack(feats, axis=-1), axis=-1)

    starts = enumerate_window_starts_2d((1024, 1912), (256, 478), 0.5)
    # full coverage incl. the flush-to-edge column on the 1912 axis
    cov = np.zeros((1024, 1912), np.int32)
    for a, b in starts:
        cov[a:a + 256, b:b + 478] += 1
    assert (cov > 0).all()
    assert starts[-1].tolist() == [1024 - 256, 1912 - 478]

    tiled = predict_sliding_2d(forward, img, (256, 478), 24, overlap=0.5)
    whole = np.asarray(forward(img[None]))[0]
    assert tiled.shape == (1024, 1912, 24)
    np.testing.assert_allclose(tiled, whole, atol=1e-5)
