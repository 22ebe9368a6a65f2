"""Image IO round trips + metrics (reference: floatimage.cpp, rgbe.cpp)."""
import numpy as np

from evplp_tpu.utils import image as im


def _rand_img(h=17, w=23):
    rng = np.random.default_rng(0)
    return (rng.random((h, w, 3)) * 4.0).astype(np.float32)


def test_pfm_roundtrip(tmp_path):
    img = _rand_img()
    p = str(tmp_path / "x.pfm")
    im.save(p, img)
    out = im.load(p)
    np.testing.assert_array_equal(out, img)


def test_hdr_roundtrip(tmp_path):
    img = _rand_img()
    p = str(tmp_path / "x.hdr")
    im.save(p, img)
    out = im.load(p)
    # RGBE has ~1% mantissa quantization
    np.testing.assert_allclose(out, img, atol=0.02, rtol=0.02)


def test_png_roundtrip(tmp_path):
    img = np.clip(_rand_img() / 4.0, 0, 1)
    p = str(tmp_path / "x.png")
    im.save(p, img)
    out = im.load(p)
    np.testing.assert_allclose(out, img, atol=1 / 255 + 1e-6)


def test_mse_relmse():
    a = np.zeros((4, 4, 3), np.float32)
    b = np.ones((4, 4, 3), np.float32) * 2.0
    assert im.mse(a, b) == 12.0  # 3 channels * 2^2
    np.testing.assert_allclose(im.rel_mse(a, b), 12.0 / (12.0 + 0.001), rtol=1e-6)
    mask = np.zeros((4, 4)); mask[0, 0] = 1
    assert im.mse(a, b, mask) == 12.0


def test_flip_and_power():
    img = _rand_img(4, 5)
    np.testing.assert_array_equal(im.flip_y(im.flip_y(img)), img)
    np.testing.assert_allclose(im.power(img, 2.0), img * img, rtol=1e-6)


def test_resize_blur_run():
    img = _rand_img(16, 16)
    out = im.resize_bilinear(img, 8, 8)
    assert out.shape == (8, 8, 3)
    blurred = im.gaussian_blur(img, 1.0)
    assert blurred.shape == img.shape
    # blur preserves mean approximately (edge clamping)
    np.testing.assert_allclose(blurred.mean(), img.mean(), rtol=0.05)
