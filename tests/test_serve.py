"""Serving runtime tests: micro-batching correctness, single-vs-batched
equivalence, timeout flush, pipelined throughput, HTTP front-end.

The reference has no server (inference.py is one image per process); these
pin the InferenceServer contract: batched results == direct forward, and a
lone request is flushed by the batch timeout, not stuck waiting for a full
batch.
"""

import io
import threading
import time
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from datr_tpu.models.dino import DINO
from datr_tpu.serve import InferenceServer, serve_http

CANVAS = (96, 128)
K = 4


@pytest.fixture(scope="module")
def tiny_model_params():
    model = DINO(num_classes=K, num_queries=12, hidden_dim=32, nheads=2,
                 enc_layers=1, dec_layers=1, dim_feedforward=64,
                 dn_number=2, dn_single_pad=2, dn_labelbook_size=K,
                 use_remat=False)
    x = jnp.zeros((1, *CANVAS, 3))
    m = jnp.zeros((1, *CANVAS), bool)
    params = model.init(jax.random.PRNGKey(0), x, m, train=False)
    return model, params


def _server(model, params, **kw):
    kw.setdefault("canvas_hw", CANVAS)
    kw.setdefault("batch_size", 2)
    kw.setdefault("num_select", 8)
    kw.setdefault("score_threshold", 0.0)
    kw.setdefault("resize_short", 64)
    kw.setdefault("resize_max", 128)
    kw.setdefault("batch_timeout_s", 0.05)
    return InferenceServer(model, params, **kw)


def _rand_img(rng, h, w):
    return (rng.random((h, w, 3)) * 255).astype(np.uint8)


class _ColorProbeDetector:
    """Deterministic content-coupled detector for wire-format AP bounds.

    Pools the normalized canvas into 16x16-px cells and scores each cell's
    mean color against the synthetic CLASS_COLORS; each cell is one query
    whose box is the cell rectangle. Detections therefore track image
    CONTENT with real margins (a full-rectangle cell matches its class
    color exactly; noise cells match nothing), so they are invariant to
    LSB-level wire rounding — but any real decode bug (plane offset/stride,
    U/V swap, pad-extent error) shifts cell means or boxes and collapses
    the AP. A learned net can't play this role: a random init's top-k
    flips wholesale under 1-LSB perturbations (measured AP 0.03-0.1 for a
    bit-correct decode), and training one to stability costs ~1500 steps.

    Duck-types the DINO surface InferenceServer uses: .apply(params,
    images, pad_mask, train=False) -> pred_logits/pred_boxes, .with_masks.
    """

    CELL = 16
    with_masks = False

    def apply(self, params, images, pad_mask, train=False):
        from datr_tpu.data.synthetic import CLASS_COLORS
        from datr_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

        del params, train
        B, H, W, _ = images.shape
        gh, gw = H // self.CELL, W // self.CELL
        x = images.reshape(B, gh, self.CELL, gw, self.CELL, 3).mean((2, 4))
        colors = (np.asarray(CLASS_COLORS[: K - 1], np.float32) / 255.0
                  - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
        d2 = ((x[..., None, :] - jnp.asarray(colors)) ** 2).sum(-1)
        # column 0 dead (the serve/eval chain treats labels as category
        # ids 1..K-1; postprocess labels = topk % n_logits)
        logits = jnp.concatenate(
            [jnp.full((B, gh, gw, 1), -30.0), 0.05 - d2], -1
        ).reshape(B, gh * gw, K)
        cy = (jnp.arange(gh) + 0.5) / gh
        cx = (jnp.arange(gw) + 0.5) / gw
        boxes = jnp.stack(
            jnp.broadcast_arrays(
                cx[None, :], cy[:, None],
                jnp.full((gh, gw), 1.0 / gw), jnp.full((gh, gw), 1.0 / gh),
            ), -1,
        ).reshape(1, gh * gw, 4)
        return {"pred_logits": logits,
                "pred_boxes": jnp.broadcast_to(boxes, (B, gh * gw, 4))}


def _grid_rect_img(rng, rects=3):
    """Canvas-sized image: low-noise background + flat class-color
    rectangles aligned to the 16-px probe grid (and 2-px YUV blocks), each
    covering >= 1 full cell, mutually disjoint cells."""
    from datr_tpu.data.synthetic import CLASS_COLORS

    H, W = CANVAS
    img = rng.integers(90, 110, (H, W, 3)).astype(np.uint8)
    cells = [(1, 1), (3, 4), (1, 6)]  # (cy, cx) in the 6x8 cell grid
    for i, (cy, cx) in enumerate(cells[:rects]):
        y0, x0 = cy * 16, cx * 16
        img[y0 - 4: y0 + 20, x0 - 4: x0 + 20] = CLASS_COLORS[i % (K - 1)]
    return img


def test_batched_equals_direct(tiny_model_params):
    """A request served through the batching pipeline returns exactly what
    a hand-built single forward on the same preprocessed canvas returns."""
    model, params = tiny_model_params
    rng = np.random.default_rng(0)
    img = _rand_img(rng, 80, 110)
    with _server(model, params) as srv:
        res = srv.detect(img)

        canvas, real_hw = srv._preprocess(img)
        images = np.zeros((2, *CANVAS, 3), np.uint8)
        sizes = np.zeros((2, 2), np.int32)
        images[0], sizes[0] = canvas, real_hw
        (packed,) = srv._step(srv._params, jnp.asarray(images),
                              jnp.asarray(sizes))
        packed = np.asarray(packed, np.float32)
        s, l, b = packed[..., 0], packed[..., 1].astype(np.int32), packed[..., 2:6]
    h0, w0 = img.shape[:2]
    scale = np.array([w0, h0, w0, h0], np.float32)
    want_b = np.clip(np.asarray(b)[0] * scale, 0,
                     [w0, h0, w0, h0]).astype(np.float32)
    np.testing.assert_allclose(res["scores"], np.asarray(s)[0], rtol=1e-6)
    np.testing.assert_array_equal(res["labels"], np.asarray(l)[0])
    np.testing.assert_allclose(res["boxes"], want_b, rtol=1e-5, atol=1e-4)
    # boxes live in original-image pixel space
    assert res["boxes"].shape == (8, 4)
    assert (res["boxes"][:, 2] <= w0).all() and (res["boxes"][:, 3] <= h0).all()


def test_lone_request_flushed_by_timeout(tiny_model_params):
    """batch_size=4 but a single request must not wait forever."""
    model, params = tiny_model_params
    rng = np.random.default_rng(1)
    with _server(model, params, batch_size=4,
                 batch_timeout_s=0.02) as srv:
        srv.warmup()
        fut = srv.submit(_rand_img(rng, 60, 90))
        res = fut.result(timeout=30)
    assert len(res["scores"]) == 8
    st = srv.stats()
    assert st["batches"] == 1 and st["requests"] == 1
    assert st["mean_batch_occupancy"] == pytest.approx(0.25)


def test_many_requests_batched_and_independent(tiny_model_params):
    """A burst of distinct images: every future resolves, per-image results
    are independent of which batch/slot they landed in, and batching
    actually happened (fewer batches than requests)."""
    model, params = tiny_model_params
    rng = np.random.default_rng(2)
    imgs = [_rand_img(rng, 50 + 7 * i, 70 + 5 * i) for i in range(7)]
    with _server(model, params, batch_size=4,
                 batch_timeout_s=0.2) as srv:
        srv.warmup()
        futs = [srv.submit(im) for im in imgs]
        got = [f.result(timeout=60) for f in futs]
        with _server(model, params, batch_size=1) as one:
            singles = [one.detect(im) for im in imgs]
        st = srv.stats()
    assert st["requests"] == 7 and st["batches"] < 7
    for g, s in zip(got, singles):
        np.testing.assert_allclose(g["scores"], s["scores"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(g["labels"], s["labels"])
        np.testing.assert_allclose(g["boxes"], s["boxes"],
                                   rtol=1e-4, atol=1e-3)


def test_score_threshold_filters(tiny_model_params):
    model, params = tiny_model_params
    rng = np.random.default_rng(3)
    with _server(model, params, score_threshold=1.1) as srv:
        res = srv.detect(_rand_img(rng, 64, 64))
    assert len(res["scores"]) == 0 and res["boxes"].shape == (0, 4)


def test_submit_rejects_bad_shape_and_closed(tiny_model_params):
    model, params = tiny_model_params
    srv = _server(model, params)
    with pytest.raises(ValueError):
        srv.submit(np.zeros((32, 32), np.uint8))
    srv.close()
    with pytest.raises(RuntimeError):
        srv.submit(np.zeros((32, 32, 3), np.uint8))


def test_mesh_data_parallel_serving(tiny_model_params):
    """Multi-chip serving: the micro-batch sharded over an 8-device 'data'
    mesh returns the same detections as single-device serving."""
    model, params = tiny_model_params
    from datr_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    rng = np.random.default_rng(5)
    imgs = [_rand_img(rng, 40 + 4 * i, 60 + 3 * i) for i in range(8)]
    with _server(model, params, batch_size=8, mesh=mesh,
                 batch_timeout_s=0.5) as srv:
        srv.warmup()
        futs = [srv.submit(im) for im in imgs]
        got = [f.result(timeout=120) for f in futs]
    with _server(model, params, batch_size=1) as one:
        singles = [one.detect(im) for im in imgs]
    for g, s in zip(got, singles):
        np.testing.assert_allclose(g["scores"], s["scores"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(g["labels"], s["labels"])
        np.testing.assert_allclose(g["boxes"], s["boxes"],
                                   rtol=1e-4, atol=1e-3)


def test_mesh_batch_divisibility(tiny_model_params):
    model, params = tiny_model_params
    from datr_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError):
        _server(model, params, batch_size=3, mesh=make_mesh(8))


def test_masks_model_serving(tiny_model_params):
    """A with_masks model serves per-detection RLE masks that match the
    hand-finished det_mask_rles path on the same step outputs."""
    from datr_tpu.models.segmentation import det_mask_rles
    from datr_tpu.utils.rle import decode_counts

    model = DINO(num_classes=K, num_queries=6, hidden_dim=128, nheads=8,
                 enc_layers=1, dec_layers=2, dim_feedforward=32,
                 dn_number=0, with_masks=True, use_remat=False)
    x = jnp.zeros((1, *CANVAS, 3))
    m = jnp.zeros((1, *CANVAS), bool)
    params = model.init(jax.random.PRNGKey(1), x, m, train=False)

    rng = np.random.default_rng(6)
    img = _rand_img(rng, 70, 100)
    with _server(model, params, num_select=6, mask_top_k=4) as srv:
        res = srv.detect(img)
        canvas, real_hw = srv._preprocess(img)
        images = np.zeros((2, *CANVAS, 3), np.uint8)
        sizes = np.zeros((2, 2), np.int32)
        images[0], sizes[0] = canvas, real_hw
        _, pm = srv._step(srv._params, jnp.asarray(images),
                          jnp.asarray(sizes))
    assert len(res["masks"]) == 6  # threshold 0 keeps all num_select
    assert res["masks"][4] is None and res["masks"][5] is None  # > top_k
    h0, w0 = img.shape[:2]
    want = det_mask_rles(np.asarray(pm, np.float32)[0], CANVAS, real_hw,
                         (h0, w0))
    for got_rle, want_rle in zip(res["masks"][:4], want):
        assert got_rle is not None
        dm = decode_counts(got_rle, h0, w0)
        np.testing.assert_array_equal(dm, decode_counts(want_rle, h0, w0))
        assert dm.shape == (h0, w0)


def test_http_front_end(tiny_model_params):
    model, params = tiny_model_params
    rng = np.random.default_rng(4)
    img = _rand_img(rng, 48, 72)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    with _server(model, params) as srv:
        srv.warmup()
        httpd = serve_http(srv, "127.0.0.1", 0, start=False)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            import json

            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10
            ) as r:
                assert json.load(r)["ok"] is True
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/detect", data=buf.getvalue(),
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                out = json.load(r)
            assert len(out["boxes"]) == len(out["scores"]) == 8
            want = srv.detect(img)
            np.testing.assert_allclose(
                np.array(out["boxes"]), want["boxes"], rtol=1e-4, atol=1e-3
            )
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=10
            ) as r:
                st = json.load(r)
            assert st["requests"] >= 1
        finally:
            httpd.shutdown()
            httpd.server_close()


@pytest.mark.parametrize("wire", ["u8", "yuv420"])
def test_collector_survives_cancelled_future(tiny_model_params, wire):
    """A client that cancels its Future (deadline fired) must not kill the
    collector thread or strand the other requests in the same batch —
    under both wire formats (their batcher fill paths differ)."""
    model, params = tiny_model_params
    rng = np.random.default_rng(7)
    with _server(model, params, batch_size=2, batch_timeout_s=0.3,
                 wire_format=wire) as srv:
        srv.warmup()
        f1 = srv.submit(_rand_img(rng, 40, 60))
        assert f1.cancel()  # cancelled while still queued
        f2 = srv.submit(_rand_img(rng, 44, 64))
        res = f2.result(timeout=60)  # same batch as the cancelled one
        assert len(res["scores"]) == 8
        # collectors still alive and serving afterwards
        res2 = srv.detect(_rand_img(rng, 48, 68))
        assert len(res2["scores"]) == 8
        assert all(c.is_alive() for c in srv._collectors)


@pytest.mark.parametrize("wire", ["u8", "yuv420"])
def test_stalled_device_sheds_fast(tiny_model_params, wire):
    """With the device step artificially stalled, the HTTP front-end must
    answer quickly with 503 (deadline or overloaded) instead of parking an
    unbounded thread pile, and the server must recover afterwards — under
    both wire formats (stall shedding must not depend on payload rank)."""
    import json
    import urllib.error

    model, params = tiny_model_params
    rng = np.random.default_rng(8)
    img = _rand_img(rng, 40, 60)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    body = buf.getvalue()

    with _server(model, params, batch_size=1, batch_timeout_s=0.01,
                 max_in_flight=1, wire_format=wire) as srv:
        srv.warmup()
        real_step = srv._step
        stall = threading.Event()

        def slow_step(*a):
            stall.wait(timeout=20)
            return real_step(*a)

        srv._step = slow_step
        httpd = serve_http(srv, "127.0.0.1", 0, start=False,
                           result_timeout_s=0.5, max_concurrent=2)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            codes, times = [], []

            def hit():
                t0 = time.monotonic()
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/detect", data=body,
                    method="POST")
                try:
                    with urllib.request.urlopen(req, timeout=30) as r:
                        codes.append(r.status)
                except urllib.error.HTTPError as e:
                    codes.append(e.code)
                times.append(time.monotonic() - t0)

            threads = [threading.Thread(target=hit) for _ in range(6)]
            for th in threads:
                th.start()
            for th in threads:
                th.join(timeout=30)
            # every request answered, none took anywhere near 120 s:
            # max_concurrent=2 sheds 4 immediately, the 2 in-flight hit the
            # 0.5 s result deadline and 503
            assert len(codes) == 6
            assert all(c == 503 for c in codes), codes
            assert max(times) < 10, times
            # oversize body: 413 without reading
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/detect", data=b"x" * 10,
                method="POST")
            req.add_header("Content-Length", str(1 << 40))
            try:
                urllib.request.urlopen(req, timeout=10)
                assert False, "expected 413"
            except urllib.error.HTTPError as e:
                assert e.code == 413
            except urllib.error.URLError:
                pass  # some stacks abort the connection on the huge length
            # un-stall: server recovers, new requests succeed, and the
            # stats now include tail latency
            stall.set()
            srv._step = real_step
            deadline = time.monotonic() + 60
            ok = False
            while time.monotonic() < deadline and not ok:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/detect", data=body,
                    method="POST")
                try:
                    with urllib.request.urlopen(req, timeout=30) as r:
                        ok = r.status == 200
                        out = json.load(r)
                except urllib.error.HTTPError:
                    time.sleep(0.2)
            assert ok and len(out["scores"]) == 8
            st = srv.stats()
            assert "p50_latency_s" in st and "p95_latency_s" in st
            assert st["p95_latency_s"] >= st["p50_latency_s"]
        finally:
            stall.set()
            httpd.shutdown()
            httpd.server_close()


def test_close_drains_raced_submit(tiny_model_params):
    """A submit whose queue.put lands after the batcher's own drain must
    still get its Future failed by close()'s final drain (never hang)."""
    model, params = tiny_model_params
    srv = _server(model, params)
    # simulate the race: stop the batcher loop first, then enqueue
    srv._stop.set()
    srv._queue.put(None)
    srv._batcher.join(timeout=30)
    from concurrent.futures import Future

    from datr_tpu.serve import _Request

    fut = Future()
    srv._queue.put(_Request(np.zeros((*CANVAS, 3), np.uint8),
                            (10, 10), (10, 10), fut))
    srv.close()
    with pytest.raises(RuntimeError, match="closed"):
        fut.result(timeout=5)


class TestYUV420Wire:
    """yuv420 wire format: half the u8 upload bytes again (1.5/px), for
    link-bound serving of JPEG-sourced (already 4:2:0) inputs."""

    def test_wire_decode_matches_u8_path(self):
        """Device-side I420 reconstruction lands within a few LSB of the
        u8 RGB path's normalized canvas on smooth content (Y rounds +-0.5,
        chroma is the 2x2 block average the client's JPEG already took),
        and the pad mask + pad zeroing are identical."""
        from datr_tpu import native
        from datr_tpu.data.transforms import IMAGENET_STD
        from datr_tpu.serve import wire_decode

        H, W = 32, 48
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
        img = np.stack(
            [50 + 3.0 * xx, 80 + 2.0 * yy, 110 + 1.2 * (xx + yy)], -1
        ).clip(0, 255).astype(np.uint8)
        canvas = np.zeros((H, W, 3), np.uint8)
        rh, rw = 27, 41  # odd: exercises the chroma real-extent clamp
        canvas[:rh, :rw] = img[:rh, :rw]
        sizes = np.int32([[rh, rw]])

        u8_imgs, u8_mask = wire_decode(
            jnp.asarray(canvas[None]), jnp.asarray(sizes), (H, W), "u8")
        buf = native.rgb_to_yuv420(canvas, (rh, rw))
        yuv_imgs, yuv_mask = wire_decode(
            jnp.asarray(buf[None]), jnp.asarray(sizes), (H, W), "yuv420")

        np.testing.assert_array_equal(np.asarray(u8_mask),
                                      np.asarray(yuv_mask))
        # pads exactly zero in both
        assert np.all(np.asarray(yuv_imgs)[0, rh:] == 0)
        assert np.all(np.asarray(yuv_imgs)[0, :, rw:] == 0)
        # real pixels: bound in normalized units = (6/255)/min(std)
        err = np.abs(np.asarray(u8_imgs) - np.asarray(yuv_imgs))
        bound = (6.0 / 255.0) / float(np.min(IMAGENET_STD))
        assert err.max() <= bound, (err.max(), bound)

    def test_batched_equals_direct_yuv420(self, tiny_model_params):
        """The full pipeline contract holds under the yuv420 wire format:
        a batched detect() == a hand-built single forward on the same
        wire payload."""
        model, params = tiny_model_params
        rng = np.random.default_rng(3)
        img = _rand_img(rng, 80, 110)
        with _server(model, params, wire_format="yuv420") as srv:
            res = srv.detect(img)
            wire, real_hw = srv._preprocess(img)
            assert wire.shape == (CANVAS[0] * CANVAS[1] * 3 // 2,)
            images = np.zeros((2, wire.size), np.uint8)
            sizes = np.zeros((2, 2), np.int32)
            images[0], sizes[0] = wire, real_hw
            (packed,) = srv._step(srv._params, jnp.asarray(images),
                                  jnp.asarray(sizes))
            packed = np.asarray(packed, np.float32)
        h0, w0 = img.shape[:2]
        scale = np.array([w0, h0, w0, h0], np.float32)
        want_b = np.clip(packed[0, :, 2:6] * scale, 0, scale)
        np.testing.assert_allclose(res["scores"], packed[0, :, 0],
                                   rtol=1e-6)
        np.testing.assert_array_equal(res["labels"],
                                      packed[0, :, 1].astype(np.int32))
        np.testing.assert_allclose(res["boxes"], want_b, rtol=1e-5,
                                   atol=1e-4)

    def test_mesh_data_parallel_serving_yuv420(self, tiny_model_params):
        """Pod serving x yuv420 combined: the batch sharding spec depends
        on the payload rank (flat [B, H*W*3//2] here vs rank-4 u8,
        serve.py _img_sharding), so the mesh path must be validated under
        this wire format too — detections must match single-device yuv420
        serving exactly."""
        model, params = tiny_model_params
        from datr_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8)
        rng = np.random.default_rng(13)
        imgs = [_rand_img(rng, 40 + 4 * i, 60 + 3 * i) for i in range(8)]
        with _server(model, params, batch_size=8, mesh=mesh,
                     batch_timeout_s=0.5, wire_format="yuv420") as srv:
            srv.warmup()
            futs = [srv.submit(im) for im in imgs]
            got = [f.result(timeout=120) for f in futs]
        with _server(model, params, batch_size=1,
                     wire_format="yuv420") as one:
            singles = [one.detect(im) for im in imgs]
        for g, s in zip(got, singles):
            np.testing.assert_allclose(g["scores"], s["scores"],
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_array_equal(g["labels"], s["labels"])
            np.testing.assert_allclose(g["boxes"], s["boxes"],
                                       rtol=1e-4, atol=1e-3)

    @pytest.mark.slow
    def test_yuv420_detection_ap_delta(self):
        """AP-level bound on the yuv420 wire format (VERDICT r4 #2): the
        pixel error (chroma 2x2 subsample + u8 rounding) is bounded
        elsewhere (test_native_image_ops); here the DETECTION-level effect
        is bounded the way a deployment would see it — score the yuv420
        path's detections against GT derived from the u8 path's confident
        detections and require a matching summary. Uses the deterministic
        _ColorProbeDetector (see its docstring for why a learned net
        cannot distinguish a correct decode from a broken one here)."""
        from datr_tpu.eval.coco_eval import CocoEvaluator

        model, params = _ColorProbeDetector(), {}
        rng = np.random.default_rng(21)
        imgs = [_grid_rect_img(rng) for _ in range(16)]
        dets = {}
        for wire in ("u8", "yuv420"):
            with _server(model, params, wire_format=wire,
                         resize_short=CANVAS[0],
                         resize_max=CANVAS[1]) as srv:
                dets[wire] = [srv.detect(im) for im in imgs]

        cats = list(range(1, K))

        def top_dets(d, h, w, k=3):
            """Deployment-style per-image detection set: top-k confident,
            real categories, non-sliver. Both wire paths are scored on
            THIS set so the u8 self-score is exactly 1.0 — submitting the
            full ranked list instead lets the random-init model's
            duplicate/sliver detections interleave as false positives
            above true positives and caps the self-score well below 1
            (observed 0.63), drowning the wire-format signal in ranking
            noise."""
            order = np.argsort(-np.asarray(d["scores"]))
            bs, ss, ls = [], [], []
            for j in order:
                lab = int(d["labels"][j])
                box = np.clip(d["boxes"][j], 0, [w, h, w, h])
                if lab not in cats or len(bs) >= k:
                    continue
                if box[2] - box[0] < 4 or box[3] - box[1] < 4:
                    continue
                bs.append(box)
                ss.append(float(d["scores"][j]))
                ls.append(lab)
            return (np.asarray(bs, np.float64).reshape(-1, 4),
                    np.asarray(ss, np.float64), np.asarray(ls, np.int64))

        evs = {w: CocoEvaluator(cats) for w in dets}
        n_gt = 0
        for i, im in enumerate(imgs):
            h, w = im.shape[:2]
            gb, _, gl = top_dets(dets["u8"][i], h, w)
            n_gt += len(gl)
            for wire, ev in evs.items():
                db, dscore, dl = top_dets(dets[wire][i], h, w)
                ev.add_image(
                    i, gb, gl, db, dscore, dl,
                    gt_iscrowd=np.zeros(len(gl), np.int64),
                    gt_areas=(gb[:, 2] - gb[:, 0]) * (gb[:, 3] - gb[:, 1]),
                )
        assert n_gt >= 16, f"too few GT dets ({n_gt}) for a meaningful AP"
        s_u8 = np.asarray(evs["u8"].summarize(), np.float64)
        s_yuv = np.asarray(evs["yuv420"].summarize(), np.float64)
        assert s_u8[1] > 0.99, s_u8  # u8 scores 1.0 on its own top dets
        # the wire format may move any summary number by < 2 AP points
        assert np.abs(s_yuv - s_u8).max() < 0.02, (
            f"yuv420 moved the summary: u8={s_u8.round(3).tolist()} "
            f"yuv={s_yuv.round(3).tolist()}"
        )

    def test_yuv420_rejects_odd_canvas(self, tiny_model_params):
        model, params = tiny_model_params
        with pytest.raises(ValueError, match="even canvas"):
            _server(model, params, canvas_hw=(95, 128),
                    wire_format="yuv420")
