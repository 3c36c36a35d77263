"""Native C++ image ops vs numpy oracle parity."""

import numpy as np
import pytest

from datr_tpu import native
from datr_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


def test_native_builds_and_matches_numpy():
    if native.get_lib() is None:
        pytest.skip("g++ unavailable")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3), np.uint8)
    got = native.resize_normalize_pad(img, (20, 30), (24, 32),
                                      IMAGENET_MEAN, IMAGENET_STD)
    want = native._numpy_resize_normalize_pad(
        img, (20, 30), (24, 32), IMAGENET_MEAN, IMAGENET_STD
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert np.all(got[20:] == 0) and np.all(got[:, 30:] == 0)


def test_identity_resize_matches_plain_normalize():
    if native.get_lib() is None:
        pytest.skip("g++ unavailable")
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    got = native.resize_normalize_pad(img, (16, 16), (16, 16),
                                      IMAGENET_MEAN, IMAGENET_STD)
    want = (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_resize_pad_u8_native_matches_fallback():
    """The serving wire-format op: native u8 resize vs the numpy oracle.
    Both must use the same sampling AND the same trunc(v+0.5) rounding."""
    if native.get_lib() is None:
        pytest.skip("g++ unavailable")
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (41, 59, 3), np.uint8)
    got = native.resize_pad_u8(img, (22, 33), (24, 40))
    # force the numpy fallback by bypassing the lib
    lib, native._lib = native._lib, None
    try:
        import unittest.mock as mock
        with mock.patch.object(native, "get_lib", return_value=None):
            want = native.resize_pad_u8(img, (22, 33), (24, 40))
    finally:
        native._lib = lib
    assert got.dtype == np.uint8 and got.shape == (24, 40, 3)
    # identical sampling; allow 1 count where float rounding straddles .5
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    assert np.all(got[22:] == 0) and np.all(got[:, 33:] == 0)


def test_resize_pad_u8_quantization_vs_f32_pipeline():
    """u8 ingest (serve.py) deviates from the f32 preprocess only by pixel
    quantization: <= (0.5/255)/std per channel after normalization."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (37, 53, 3), np.uint8)
    u8 = native.resize_pad_u8(img, (20, 30), (24, 32))
    f32 = native.resize_normalize_pad(img, (20, 30), (24, 32),
                                      IMAGENET_MEAN, IMAGENET_STD)
    norm = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    norm[20:] = 0.0
    norm[:, 30:] = 0.0
    bound = (0.5 / 255.0) / np.asarray(IMAGENET_STD) + 1e-5
    assert (np.abs(norm - f32) <= bound).all()


# ---------------- native JPEG decode (serving front-end) ----------------


def _jpeg_bytes(img_u8, quality=90, mode=None):
    import io

    from PIL import Image

    im = Image.fromarray(img_u8) if mode is None else Image.fromarray(
        img_u8, mode=mode)
    buf = io.BytesIO()
    im.save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def test_decode_jpeg_rgb_matches_pil():
    """Full-scale native decode is bit-identical to PIL (both run the same
    libjpeg-turbo baseline islow IDCT)."""
    import io

    from PIL import Image

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (120, 200, 3), np.uint8)
    raw = _jpeg_bytes(img)
    got = native.decode_jpeg_rgb(raw)
    if got is None:
        pytest.skip("libjpeg build unavailable")
    want = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"), np.uint8)
    assert got.shape == want.shape == (120, 200, 3)
    assert np.array_equal(got, want)


def test_decode_jpeg_rgb_grayscale_promotes_to_rgb():
    import io

    from PIL import Image

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (64, 80), np.uint8)
    raw = _jpeg_bytes(img, mode="L")
    got = native.decode_jpeg_rgb(raw)
    if got is None:
        pytest.skip("libjpeg build unavailable")
    want = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"), np.uint8)
    assert got.shape == (64, 80, 3)
    assert np.array_equal(got, want)


def test_decode_jpeg_rgb_dct_scaling_dims():
    """scale_num/8 DCT scaling yields libjpeg's ceil(dim*num/8) output."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (101, 163, 3), np.uint8)
    raw = _jpeg_bytes(img)
    if native.decode_jpeg_rgb(raw) is None:
        pytest.skip("libjpeg build unavailable")
    for s in (1, 3, 4, 6, 8):
        out = native.decode_jpeg_rgb(raw, scale_num=s)
        assert out.shape == (-(-101 * s // 8), -(-163 * s // 8), 3), s


def test_decode_jpeg_rgb_rejects_non_jpeg():
    assert native.decode_jpeg_rgb(b"") is None
    assert native.decode_jpeg_rgb(b"not a jpeg at all") is None
    assert native.decode_jpeg_rgb(b"\x89PNG\r\n\x1a\n" + b"\0" * 64) is None


def test_decode_jpeg_rgb_truncated_stream():
    """A truncated JPEG must fail cleanly (error-exit longjmp), not crash
    or hang — serving receives arbitrary client bytes."""
    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, (64, 64, 3), np.uint8)
    raw = _jpeg_bytes(img)
    if native.decode_jpeg_rgb(raw) is None:
        pytest.skip("libjpeg build unavailable")
    # libjpeg treats a hard-truncated scan as a warning + gray fill, so a
    # header-only prefix is the reliable "must fail" case
    assert native.decode_jpeg_rgb(raw[:20]) is None


def test_rgb_to_yuv420_native_matches_fallback():
    """Native I420 conversion == the numpy oracle, bit-exact, including
    the real-extent clamp at odd real sizes (pad zeros must not bleed
    into boundary chroma)."""
    if native.get_lib() is None:
        pytest.skip("g++ unavailable")
    rng = np.random.default_rng(7)
    canvas = np.zeros((24, 32, 3), np.uint8)
    canvas[:17, :23] = rng.integers(0, 256, (17, 23, 3), np.uint8)
    for real_hw in ((17, 23), (24, 32), (16, 22)):
        got = native.rgb_to_yuv420(canvas, real_hw)
        want = native._numpy_rgb_to_yuv420(canvas, real_hw)
        assert got.shape == (24 * 32 * 3 // 2,)
        np.testing.assert_array_equal(got, want)


def test_rgb_to_yuv420_saturated_chroma_no_overflow():
    """Pure blue/red hit Cb/Cr = 256.0 before rounding — must clamp to
    255, not wrap (u8 cast of an out-of-range float is UB in the native
    kernel)."""
    canvas = np.zeros((4, 4, 3), np.uint8)
    canvas[:2, :, 2] = 255  # pure blue rows -> Cb saturates
    canvas[2:, :, 0] = 255  # pure red rows  -> Cr saturates
    for fn in ([native.rgb_to_yuv420] if native.get_lib() else []) + [
        lambda c, r: native._numpy_rgb_to_yuv420(c, r)
    ]:
        out = fn(canvas, (4, 4))
        u = out[16:20].reshape(2, 2)
        v = out[20:24].reshape(2, 2)
        assert u[0].max() == 255 and v[1].max() == 255


def test_rgb_to_yuv420_roundtrip_error_bound():
    """I420 -> nearest-upsample -> inverse matrix reconstructs a smooth
    image within a few LSB: Y rounds +-0.5 and chroma is a 2x2 block
    average, so the error is bounded by the intra-block chroma variation
    (small on smooth content — and zero information lost relative to a
    4:2:0 JPEG source)."""
    H, W = 32, 48
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.stack([
        60 + 3.0 * xx, 90 + 2.0 * yy, 120 + 1.5 * (xx + yy) / 2
    ], -1).clip(0, 255).astype(np.uint8)
    buf = native._numpy_rgb_to_yuv420(img, (H, W))
    y = buf[: H * W].reshape(H, W).astype(np.float32)
    u = buf[H * W: H * W + H * W // 4].reshape(H // 2, W // 2)
    v = buf[H * W + H * W // 4:].reshape(H // 2, W // 2)
    u = np.repeat(np.repeat(u.astype(np.float32) - 128, 2, 0), 2, 1)
    v = np.repeat(np.repeat(v.astype(np.float32) - 128, 2, 0), 2, 1)
    rec = np.stack([
        y + 1.402 * v,
        y - 0.344136 * u - 0.714136 * v,
        y + 1.772 * u,
    ], -1).clip(0, 255)
    err = np.abs(rec - img.astype(np.float32))
    assert err.max() <= 6.0, err.max()
    assert err.mean() <= 2.0, err.mean()
