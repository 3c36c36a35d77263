"""ctypes bindings for the native image-preprocessing kernels.

Builds image_ops.cpp on first import if needed (g++ is baked into the image;
pybind11 is not, hence ctypes). Falls back to a numpy implementation when the
toolchain is unavailable so the framework stays importable everywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libimage_ops.so")
_SRC = os.path.join(_DIR, "image_ops.cpp")

_lib = None


def _build() -> bool:
    # -ffp-contract=off: tests assert the float kernels bit-match the numpy
    # oracle; on targets where contraction is the default (e.g. aarch64
    # hardware FMA) a contracted luma/chroma combination can round 1 ulp
    # differently and flip a trunc.
    base = ["g++", "-O3", "-ffp-contract=off", "-shared", "-fPIC",
            "-fopenmp", "-std=c++17", _SRC, "-o", _SO]
    # Prefer a libjpeg-linked build (native GIL-free JPEG decode for the
    # serving front-end); fall back to a jpeg-less build where the dev
    # headers are absent (decode_jpeg_rgb then returns None -> PIL path).
    for cmd in (base + ["-ljpeg"], base + ["-DDATR_NO_JPEG"]):
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            return True
        except Exception:
            continue
    return False


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
        _SRC
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.resize_normalize_pad.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.resize_bilinear_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
    ]
    lib.rgb_to_yuv420.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.jpeg_probe.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.jpeg_probe.restype = ctypes.c_int
    lib.jpeg_decode_rgb.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.jpeg_decode_rgb.restype = ctypes.c_int
    _lib = lib
    return _lib


def resize_normalize_pad(
    img_u8: np.ndarray,  # [sh, sw, 3] uint8
    out_hw,  # resized extent (dh, dw)
    canvas_hw,  # full canvas (H, W)
    mean: np.ndarray,
    std: np.ndarray,
) -> np.ndarray:
    """Fused bilinear resize + ImageNet normalize + zero-pad (native when
    available). Returns float32 [H, W, 3]."""
    sh, sw = img_u8.shape[:2]
    dh, dw = out_hw
    H, W = canvas_hw
    lib = get_lib()
    if lib is not None:
        src = np.ascontiguousarray(img_u8, np.uint8)
        dst = np.empty((H, W, 3), np.float32)
        m = np.ascontiguousarray(mean, np.float32)
        s = np.ascontiguousarray(std, np.float32)
        lib.resize_normalize_pad(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), sh, sw,
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw,
            H, W,
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return dst
    return _numpy_resize_normalize_pad(img_u8, out_hw, canvas_hw, mean, std)


def _numpy_resize_normalize_pad(img_u8, out_hw, canvas_hw, mean, std):
    """Fallback with the same align_corners=False sampling (also the test
    oracle for the native kernel)."""
    sh, sw = img_u8.shape[:2]
    dh, dw = out_hw
    H, W = canvas_hw
    ys = (np.arange(dh) + 0.5) * (sh / dh) - 0.5
    xs = (np.arange(dw) + 0.5) * (sw / dw) - 0.5
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    y0c = np.clip(y0, 0, sh - 1)
    y1c = np.clip(y0 + 1, 0, sh - 1)
    x0c = np.clip(x0, 0, sw - 1)
    x1c = np.clip(x0 + 1, 0, sw - 1)
    f = img_u8.astype(np.float32)
    out = (
        f[y0c][:, x0c] * (1 - wy) * (1 - wx)
        + f[y0c][:, x1c] * (1 - wy) * wx
        + f[y1c][:, x0c] * wy * (1 - wx)
        + f[y1c][:, x1c] * wy * wx
    )
    out = (out / 255.0 - mean) / std
    canvas = np.zeros((H, W, 3), np.float32)
    canvas[:dh, :dw] = out
    return canvas


def decode_jpeg_rgb(data: bytes, scale_num: int = 8):
    """Decode JPEG bytes to an RGB uint8 array via libjpeg, GIL-free.

    ctypes releases the GIL for the whole call, so concurrent HTTP handler
    threads (serve.py) decode in parallel — PIL's open/convert/asarray chain
    serializes on the GIL and was the measured 0.35 s/img gap between the
    HTTP surface and the in-process serving API (ROADMAP.md round 4).

    scale_num/8 applies libjpeg-turbo's DCT-domain scaling: decoding a
    1024x2048 source at scale_num=6 yields 768x1536 directly at ~(6/8)^2 of
    the full-decode cost — useful when the serving canvas is smaller than
    the source (the result is bilinearly resized to target afterwards
    anyway).

    Returns None when the input is not a decodable JPEG (or the native lib
    is unavailable) — callers fall back to PIL.
    """
    lib = get_lib()
    if lib is None or not data or not hasattr(lib, "jpeg_probe"):
        return None
    buf = np.frombuffer(data, np.uint8)
    src = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.jpeg_probe(src, buf.size, ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    s = min(max(int(scale_num), 1), 8)
    dh = -(-h.value * s // 8)  # libjpeg's ceil(dim * num / 8)
    dw = -(-w.value * s // 8)
    out = np.empty((dh, dw, 3), np.uint8)
    oh = ctypes.c_int()
    ow = ctypes.c_int()
    rc = lib.jpeg_decode_rgb(
        src, buf.size, s,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size,
        ctypes.byref(oh), ctypes.byref(ow),
    )
    if rc != 0:
        return None
    if (oh.value, ow.value) != (dh, dw):  # defensive: trust the decoder
        out = out.reshape(-1)[: oh.value * ow.value * 3].reshape(
            oh.value, ow.value, 3
        ).copy()
    return out


def rgb_to_yuv420(canvas_u8: np.ndarray, real_hw=None) -> np.ndarray:
    """Planar I420 (YUV 4:2:0, full-range BT.601/JFIF) from an RGB canvas.

    The serving wire format below uint8 RGB: 1.5 bytes/px. JPEG-sourced
    inputs are already 4:2:0-subsampled, so this discards nothing the
    client's JPEG kept (serve.py wire_format='yuv420' reconstructs RGB on
    device). Chroma 2x2 averages clamp to `real_hw` so zero pads never
    bleed into real boundary pixels' chroma. Returns flat uint8
    [H*W*3//2]: Y plane then U then V; H, W must be even."""
    H, W = canvas_u8.shape[:2]
    if H % 2 or W % 2:
        raise ValueError(f"yuv420 needs an even canvas, got {(H, W)}")
    rh, rw = (int(real_hw[0]), int(real_hw[1])) if real_hw else (H, W)
    if not (0 < rh <= H and 0 < rw <= W):
        raise ValueError(f"real extent {(rh, rw)} outside canvas {(H, W)}")
    lib = get_lib()
    if lib is not None:
        src = np.ascontiguousarray(canvas_u8, np.uint8)
        out = np.empty(H * W * 3 // 2, np.uint8)
        lib.rgb_to_yuv420(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), H, W,
            rh, rw, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out
    return _numpy_rgb_to_yuv420(canvas_u8, (rh, rw))


def _numpy_rgb_to_yuv420(canvas_u8, real_hw):
    """Fallback with the native kernel's exact math (also its test oracle)."""
    H, W = canvas_u8.shape[:2]
    rh, rw = real_hw
    f = canvas_u8.astype(np.float32)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    yp = np.trunc(y + 0.5).astype(np.uint8)
    # chroma: 2x2 block average with sample coords clamped to the real extent
    ri = np.minimum(np.arange(H), rh - 1)
    ci = np.minimum(np.arange(W), rw - 1)
    g = f[ri][:, ci]
    blk = g.reshape(H // 2, 2, W // 2, 2, 3).mean(axis=(1, 3))
    u = 128.0 - 0.168736 * blk[..., 0] - 0.331264 * blk[..., 1] \
        + 0.5 * blk[..., 2]
    v = 128.0 + 0.5 * blk[..., 0] - 0.418688 * blk[..., 1] \
        - 0.081312 * blk[..., 2]
    up = np.trunc(np.clip(u + 0.5, 0, 255)).astype(np.uint8)
    vp = np.trunc(np.clip(v + 0.5, 0, 255)).astype(np.uint8)
    return np.concatenate([yp.ravel(), up.ravel(), vp.ravel()])


def resize_pad_u8(img_u8: np.ndarray, out_hw, canvas_hw) -> np.ndarray:
    """Bilinear resize kept in uint8, zero-padded into the canvas.

    The serving ingest path: the server ships this 1-byte/px canvas to the
    device and normalizes there (datr_tpu/serve.py) — through a bandwidth-
    limited host<->device link the f32 canvas upload, not the device step,
    caps the serving rate (4x the bytes)."""
    sh, sw = img_u8.shape[:2]
    dh, dw = out_hw
    H, W = canvas_hw
    canvas = np.zeros((H, W, 3), np.uint8)
    lib = get_lib()
    if lib is not None:
        src = np.ascontiguousarray(img_u8, np.uint8)
        dst = np.empty((dh, dw, 3), np.uint8)
        lib.resize_bilinear_u8(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), sh, sw,
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dh, dw,
        )
        canvas[:dh, :dw] = dst
        return canvas
    # numpy fallback with the native kernel's exact sampling + rounding
    # (u8 = trunc(v + 0.5), v a convex combination so already in [0, 255])
    ys = (np.arange(dh) + 0.5) * (sh / dh) - 0.5
    xs = (np.arange(dw) + 0.5) * (sw / dw) - 0.5
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    y0c = np.clip(y0, 0, sh - 1)
    y1c = np.clip(y0 + 1, 0, sh - 1)
    x0c = np.clip(x0, 0, sw - 1)
    x1c = np.clip(x0 + 1, 0, sw - 1)
    f = img_u8.astype(np.float32)
    out = (
        f[y0c][:, x0c] * (1 - wy) * (1 - wx)
        + f[y0c][:, x1c] * (1 - wy) * wx
        + f[y1c][:, x0c] * wy * (1 - wx)
        + f[y1c][:, x1c] * wy * wx
    )
    canvas[:dh, :dw] = (out + 0.5).astype(np.uint8)
    return canvas
