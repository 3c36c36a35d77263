"""Serving-path throughput bench: end-to-end img/s through the
InferenceServer pipeline (host preprocess -> micro-batch -> jit forward ->
postprocess -> device->host fetch of the detections).

Unlike bench.py (pure device-step rate via the chained fori_loop method),
this measures what a deployment sees, including the pipelined dispatch and
the per-batch result fetches. Futures resolve only after jax.device_get of
the real detections, so the wall-clock here is an honest completion signal
even through this environment's TPU relay (the collector thread overlaps
fetch latency with the next batch's dispatch).

Usage: python tools/serve_bench.py [--batch 2] [--images 64] [--chip]
  (default runs a tiny model on CPU as a smoke/pipeline check; --chip runs
  the flagship DINO-R50 4-scale at the 800x1344 eval canvas)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--chip", action="store_true",
                    help="flagship model at the real eval canvas")
    ap.add_argument("--warm_images", type=int, default=8)
    ap.add_argument("--warm_timeout", type=float, default=2400.0)
    ap.add_argument("--in_flight", type=int, default=4)
    ap.add_argument("--collectors", type=int, default=4)
    ap.add_argument("--dispatchers", type=int, default=4,
                    help="concurrent upload+dispatch threads (the serial "
                         "host->device upload caps the rate through a "
                         "bandwidth-limited link)")
    ap.add_argument("--canvas", type=int, nargs=2, default=None,
                    help="serving canvas (H W); default 800 1344 on chip. "
                         "Deployment tuning: for 1:2-AR inputs (Cityscapes "
                         "1024x2048 -> resized 667x1333) a 672x1344 canvas "
                         "holds the same pixels with 16% less padding — "
                         "identical detections (pads are masked), less "
                         "compute AND less upload")
    ap.add_argument("--points", type=int, default=4,
                    help="enc/dec sampling points (2 = the fast config)")
    ap.add_argument("--clients", type=int, default=4,
                    help="concurrent submitter threads (emulates the HTTP "
                         "front-end's handler threads; host preprocess "
                         "runs in the submitter, so 1 client serializes it)")
    ap.add_argument("--http", action="store_true",
                    help="drive the real HTTP front-end instead of the "
                         "in-process API: spins serve_http on --port and "
                         "POSTs JPEG-encoded images from --clients threads "
                         "(includes JPEG decode + JSON encode in the "
                         "measured path)")
    ap.add_argument("--port", type=int, default=18731)
    ap.add_argument("--content", default="noise",
                    choices=["noise", "smooth"],
                    help="test image entropy: 'noise' is the worst-case "
                         "(incompressible ~6 MB JPEGs), 'smooth' is the "
                         "realistic production regime (~0.5 MB JPEGs)")
    ap.add_argument("--wire", default="u8", choices=["u8", "yuv420"],
                    help="host->device wire format (yuv420: 1.5 bytes/px, "
                         "halves the upload again — the lever when the "
                         "host<->device link caps the rate)")
    args = ap.parse_args()

    if not args.chip:
        jax.config.update("jax_platforms", "cpu")

    from datr_tpu.models.dino import DINO
    from datr_tpu.serve import InferenceServer

    if args.chip:
        canvas = tuple(args.canvas) if args.canvas else (800, 1344)
        model = DINO(
            num_classes=9, num_queries=900, hidden_dim=256, nheads=8,
            enc_layers=6, dec_layers=6, dim_feedforward=2048,
            dn_number=100, dn_single_pad=20, dn_labelbook_size=9,
            enc_n_points=args.points, dec_n_points=args.points,
            use_remat=False, dtype=jnp.bfloat16,
        )
        src_hw = (1024, 2048)  # Cityscapes-like input
    else:
        canvas = (96, 128)
        model = DINO(
            num_classes=4, num_queries=12, hidden_dim=32, nheads=2,
            enc_layers=1, dec_layers=1, dim_feedforward=64,
            dn_number=2, dn_single_pad=2, dn_labelbook_size=4,
            use_remat=False,
        )
        src_hw = (120, 200)
        if args.canvas:
            canvas = tuple(args.canvas)

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, *canvas, 3))
    m = jnp.zeros((1, *canvas), bool)
    params = model.init(rng, x, m, train=False)

    nprng = np.random.default_rng(0)
    if args.content == "noise":
        # incompressible noise: the WORST case for --http (a 1024x2048
        # noise JPEG is ~6 MB and maximally slow to decode)
        imgs = [
            (nprng.random((*src_hw, 3)) * 255).astype(np.uint8)
            for _ in range(max(8, args.batch * 2))
        ]
    else:
        # realistic entropy: low-frequency fields + hard object edges.
        # Upsampled coarse noise gives photo-like spectra; the rectangles
        # add the block/edge structure streetscapes have. 1024x2048 JPEGs
        # land ~0.4-0.8 MB at q90 — the production regime for --http.
        imgs = []
        h, w = src_hw
        for _ in range(max(8, args.batch * 2)):
            coarse = nprng.random(
                (-(-h // 32), -(-w // 32), 3)).astype(np.float32)
            smooth = np.kron(coarse, np.ones((32, 32, 1), np.float32))
            smooth = smooth[:h, :w]
            for _ in range(12):  # rectangles: cars/signs/windows stand-ins
                y0 = int(nprng.integers(0, h - 32))
                x0 = int(nprng.integers(0, w - 64))
                bh = int(nprng.integers(16, h // 4))
                bw = int(nprng.integers(32, w // 4))
                smooth[y0:y0 + bh, x0:x0 + bw] = nprng.random(3)
            imgs.append((smooth * 255).astype(np.uint8))

    srv = InferenceServer(
        model, params, canvas_hw=canvas, batch_size=args.batch,
        num_select=300 if args.chip else 8, score_threshold=0.0,
        resize_short=800 if args.chip else 64,
        resize_max=1333 if args.chip else 128,
        batch_timeout_s=0.5,
        max_in_flight=args.in_flight,
        collector_threads=args.collectors,
        dispatcher_threads=args.dispatchers,
        wire_format=args.wire,
    )
    httpd = None
    try:
        srv.warmup()
        # warm the full path incl. result fetches (first fetch pays the
        # one-time tunnel warm-up on the relay)
        for f in [srv.submit(imgs[i % len(imgs)])
                  for i in range(args.warm_images)]:
            # generous: the FIRST dispatch pays the remote XLA compile of
            # the serving graph (observed >600 s for new wire formats)
            f.result(timeout=args.warm_timeout)
        srv.reset_stats()  # tails must reflect steady state, not warm-up

        if args.http:
            # the production surface: JPEG POST -> JSON detections
            import io
            import threading
            import urllib.request

            from PIL import Image

            from datr_tpu.serve import serve_http

            httpd = serve_http(srv, port=args.port, start=False,
                               result_timeout_s=600.0)
            th = threading.Thread(target=httpd.serve_forever, daemon=True)
            th.start()
            url = f"http://127.0.0.1:{args.port}/detect"
            jpegs = []
            for im in imgs:
                buf = io.BytesIO()
                Image.fromarray(im).save(buf, format="JPEG", quality=90)
                jpegs.append(buf.getvalue())
            lat_lock = threading.Lock()
            client_lats = []

            def post(i):
                t = time.perf_counter()
                with urllib.request.urlopen(
                    urllib.request.Request(
                        url, data=jpegs[i % len(jpegs)], method="POST"
                    ), timeout=600,
                ) as r:
                    json.loads(r.read())
                with lat_lock:
                    client_lats.append(time.perf_counter() - t)

            post(0)  # warm the HTTP path itself
            srv.reset_stats()
            client_lats.clear()
            t0 = time.perf_counter()
            per = [range(c, args.images, args.clients)
                   for c in range(max(1, args.clients))]

            def run_http_client(idxs):
                for i in idxs:
                    post(i)

            ts = [threading.Thread(target=run_http_client, args=(p,))
                  for p in per]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            dt = time.perf_counter() - t0
            st = srv.stats()
            client_lats.sort()
            st["p50_latency_s"] = client_lats[len(client_lats) // 2]
            st["p95_latency_s"] = client_lats[
                min(len(client_lats) - 1, int(len(client_lats) * 0.95))]
        elif args.clients <= 1:
            t0 = time.perf_counter()
            for f in [srv.submit(imgs[i % len(imgs)])
                      for i in range(args.images)]:
                f.result(timeout=600)
            dt = time.perf_counter() - t0
            st = srv.stats()
        else:
            import threading

            per = [range(c, args.images, args.clients)
                   for c in range(args.clients)]

            def run_client(idxs):
                for i in idxs:
                    srv.submit(imgs[i % len(imgs)]).result(timeout=600)

            ts = [threading.Thread(target=run_client, args=(p,))
                  for p in per]
            t0 = time.perf_counter()
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            dt = time.perf_counter() - t0
            st = srv.stats()
    finally:
        if httpd is not None:
            httpd.shutdown()
        srv.close()

    print(json.dumps({
        "metric": "serving images/sec (%s, batch %d)" % (
            "HTTP end-to-end" if args.http else "end-to-end", args.batch),
        "value": round(args.images / dt, 2),
        "unit": "images/sec",
        "images": args.images,
        "mean_batch_occupancy": round(st["mean_batch_occupancy"], 3),
        "mean_latency_s": round(st["mean_latency_s"], 4),
        "p50_latency_s": round(st.get("p50_latency_s", 0.0), 4),
        "p95_latency_s": round(st.get("p95_latency_s", 0.0), 4),
        "points": args.points,
        "clients": args.clients,
        "in_flight": args.in_flight,
        "collectors": args.collectors,
        "dispatchers": args.dispatchers,
        "canvas": list(canvas),
        "wire": args.wire,
        "content": args.content,
    }))


if __name__ == "__main__":
    main()
