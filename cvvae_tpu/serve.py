"""Production serving daemon: the VideoVAE behind an HTTP boundary.

The reference ships batch CLIs only (cvvae_inference_video.py); real
deployments serve a resident model — compile once, keep the params on
device, stream requests through the warm programs.  This daemon is that
front:

* one chip, one model, one worker thread: requests queue (bounded) and
  execute strictly sequentially — the TPU is a serial resource and the
  streaming/serving programs already saturate it; concurrency belongs
  at the replica level (one daemon per chip, DP at the balancer).
* binary .npy bodies (stdlib-only wire format: no proto/grpc deps;
  numpy arrays round-trip exactly).  uint8 pixels on the wire — the
  device-side normalise keeps host<->device traffic at 1 B/px
  (PERF.md round-2: 3.9x sustained throughput vs fp wire).
* endpoints:
    GET  /healthz          -> {"ok": true} once warm
    GET  /stats            -> request counts, fps, queue depth
    POST /encode           -> body: (T,H,W,3) uint8 .npy
                              response: latent (1,t',h',w',z) .npy (fp32)
    POST /decode           -> body: latent .npy
                              response: (T,H,W,3) uint8 .npy
    POST /reconstruct      -> encode+decode in one trip
  Query param ?sample=1 on /encode draws from the posterior (else mode).
* warm-up happens at startup: the configured (height, width) serving
  programs compile before the socket accepts work, so the first request
  pays milliseconds, not minutes.

Usage:
    python -m cvvae_tpu.serve --port 8400 --variant v1 --dtype int8 \
        --height 720 --width 1280 [--vae_path HF_DIR]

Ref: serving semantics follow the reference CLI contract
(cvvae_inference_video.py:10-52 — 4k+1 frame truncation, /127.5-1
normalisation) with the TPU serving preset from cvvae_tpu/cli.py.
"""

from __future__ import annotations

import argparse
import dataclasses
import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def _npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr, allow_pickle=False)
    return buf.getvalue()


def _npy_load(data: bytes) -> np.ndarray:
    return np.load(io.BytesIO(data), allow_pickle=False)


class VAEWorker:
    """Owns the device model; executes requests strictly in order."""

    def __init__(self, vae, *, max_queue: int = 8, act_dtype=None,
                 put_timeout: float = 5.0):
        import collections

        import jax
        import jax.numpy as jnp
        self._jax, self._jnp = jax, jnp
        self.vae = vae
        # activation dtype: explicit (main() knows it as --dtype) or
        # inferred from the params' floating leaves — never from leaf #0,
        # whose dtype on a quantized tree (int8 kernels, fp32 scales,
        # bf16 biases) depends on tree ordering
        if act_dtype is None:
            leaf_dtypes = {a.dtype for a in jax.tree.leaves(vae.params)
                           if jnp.issubdtype(a.dtype, jnp.floating)}
            act_dtype = (jnp.bfloat16 if jnp.bfloat16 in leaf_dtypes
                         else jnp.float32)
        self.dtype = act_dtype
        # device-side denormalise + uint8 cast: the wire (and the
        # device->host copy) carries 1 B/px, not 4
        self._to_u8 = jax.jit(lambda x: jnp.clip(
            (x.astype(jnp.float32) + 1.0) * 127.5, 0, 255
        ).astype(jnp.uint8))
        self._q: "queue.Queue" = queue.Queue(maxsize=max_queue)
        #: how long submit() waits for queue space before the caller
        #: sees queue.Full (-> HTTP 503).  Tests shrink this.
        self.put_timeout = put_timeout
        self._key = jax.random.PRNGKey(0)
        self.stats = {"encode": 0, "decode": 0, "reconstruct": 0,
                      "errors": 0, "frames": 0, "busy_s": 0.0}
        # per-request wall latency (queue wait + device time), most
        # recent 512 requests — /stats reports p50/p95
        self.latencies_ms = collections.deque(maxlen=512)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ---- device ops (worker thread only) ----
    def _encode(self, frames_u8: np.ndarray, sample: bool):
        jnp = self._jnp
        x = jnp.asarray(frames_u8)[None].astype(self.dtype) / 127.5 - 1.0
        post = self.vae.encode(x)
        if sample:
            self._key, sub = self._jax.random.split(self._key)
            z = post.sample(sub)
        else:
            z = post.mode()
        return np.asarray(z.astype(jnp.float32))

    def _decode(self, z_np: np.ndarray):
        z = self._jnp.asarray(z_np, self.dtype)
        return np.asarray(self._to_u8(self.vae.decode(z)[0]))

    def _loop(self):
        while True:
            kind, payload, sample, box = self._q.get()
            t0 = time.perf_counter()
            try:
                if kind == "encode":
                    out = self._encode(payload, sample)
                elif kind == "decode":
                    out = self._decode(payload)
                else:  # reconstruct
                    out = self._decode(self._encode(payload, sample))
                self.stats[kind] += 1
                if kind != "decode":
                    self.stats["frames"] += int(payload.shape[0])
                box["out"] = out
            except Exception as e:  # surfaced as HTTP 400/500
                self.stats["errors"] += 1
                box["err"] = e
            finally:
                self.stats["busy_s"] += time.perf_counter() - t0
                box["done"].set()

    # ---- caller side ----
    def submit(self, kind: str, payload: np.ndarray, sample: bool,
               timeout: float = 600.0) -> np.ndarray:
        t0 = time.perf_counter()
        box = {"done": threading.Event()}
        self._q.put((kind, payload, sample, box), timeout=self.put_timeout)
        if not box["done"].wait(timeout):
            raise TimeoutError(f"{kind} timed out after {timeout}s")
        self.latencies_ms.append((time.perf_counter() - t0) * 1e3)
        if "err" in box:
            raise box["err"]
        return box["out"]

    @property
    def queue_depth(self) -> int:
        return self._q.qsize()


from cvvae_tpu.data.video_io import truncate_to_4k1  # noqa: E402  (one
# contract, one implementation — re-exported for tests/callers)


def _make_handler(worker: VAEWorker, started: float,
                  max_body_bytes: int = 512 * 1024 * 1024):
    class Handler(BaseHTTPRequestHandler):
        # one worker; ThreadingHTTPServer only parallelises socket IO
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, body: bytes,
                  ctype: str = "application/octet-stream"):
            try:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except BrokenPipeError:
                pass  # client gave up (e.g. timeout during warm-up)

        def _send_json(self, code: int, obj):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path == "/healthz":
                return self._send_json(200, {"ok": True})
            if self.path == "/stats":
                s = dict(worker.stats)
                s["queue_depth"] = worker.queue_depth
                s["uptime_s"] = round(time.time() - started, 1)
                busy = s["busy_s"] or 1e-9
                s["frames_per_busy_s"] = round(s["frames"] / busy, 2)
                s["busy_s"] = round(s["busy_s"], 2)
                lats = sorted(worker.latencies_ms)
                if lats:
                    s["latency_ms_p50"] = round(
                        lats[len(lats) // 2], 1)
                    s["latency_ms_p95"] = round(
                        lats[min(len(lats) - 1,
                                 int(len(lats) * 0.95))], 1)
                return self._send_json(200, s)
            return self._send_json(404, {"error": "unknown path"})

        def do_POST(self):
            path, _, query = self.path.partition("?")
            sample = "sample=1" in query
            kind = path.lstrip("/")
            if kind not in ("encode", "decode", "reconstruct"):
                return self._send_json(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                if n > max_body_bytes:
                    # reject before reading: an oversized body must not
                    # be buffered into host memory at all
                    return self._send_json(413, {
                        "error": f"body {n} B exceeds cap "
                                 f"{max_body_bytes} B"})
                arr = _npy_load(self.rfile.read(n))
                if kind in ("encode", "reconstruct"):
                    if arr.ndim != 4 or arr.shape[-1] != 3 \
                            or arr.dtype != np.uint8:
                        raise ValueError(
                            f"expected (T,H,W,3) uint8, got "
                            f"{arr.shape} {arr.dtype}")
                    arr = arr[:truncate_to_4k1(arr.shape[0])]
                elif arr.ndim != 5:
                    raise ValueError(f"expected 5-D latent, got {arr.shape}")
            except Exception as e:
                return self._send_json(400, {"error": str(e)})
            try:
                out = worker.submit(kind, arr, sample)
            except queue.Full:
                return self._send_json(503, {"error": "queue full"})
            except Exception as e:
                return self._send_json(500, {"error": str(e)})
            return self._send(200, _npy_bytes(out))

    return Handler


class DrainingHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer whose shutdown actually drains.

    ThreadingHTTPServer defaults to daemon handler threads, so once
    ``shutdown()`` unblocks ``serve_forever()`` the process can exit
    mid-request.  Non-daemon threads + ``block_on_close`` (the mixin
    default) make ``server_close()`` join every in-flight handler — and
    each handler blocks on its VAEWorker result, so the worker queue is
    empty by the time ``server_close()`` returns."""
    daemon_threads = False


def build_server(vae, port: int = 8400, host: str = "127.0.0.1",
                 max_queue: int = 8, act_dtype=None,
                 max_body_bytes: int = 512 * 1024 * 1024,
                 put_timeout: float = 5.0) -> ThreadingHTTPServer:
    """Wrap a ready VideoVAE in the HTTP boundary (tests use this
    directly with a tiny config; __main__ adds model build + warm-up)."""
    worker = VAEWorker(vae, max_queue=max_queue, act_dtype=act_dtype,
                       put_timeout=put_timeout)
    server = DrainingHTTPServer((host, port), _make_handler(
        worker, time.time(), max_body_bytes))
    server.worker = worker
    return server


def _quantized(vae, args):
    """int8 path: restore calibrated params from --quantized_cache when
    present, else run the calibration pass (and persist it for the next
    restart — the eager calibration is the slowest startup stage)."""
    import os

    cache = args.quantized_cache and os.path.abspath(args.quantized_cache)
    if cache and os.path.isdir(cache):
        import orbax.checkpoint as ocp
        t0 = time.perf_counter()
        params = ocp.PyTreeCheckpointer().restore(cache)
        print(f"[serve] restored quantized params from {cache} "
              f"in {time.perf_counter() - t0:.1f}s", flush=True)
        return type(vae)(vae.config, params)

    ch, cw = min(args.height, 256), min(args.width, 256)
    if args.calibration_video:
        from cvvae_tpu.data.video_io import read_video
        frames, _ = read_video(args.calibration_video, height=ch,
                               width=cw, max_frames=17)
        calib = np.asarray(frames)[None][:, :truncate_to_4k1(len(frames))]
    else:
        print("[serve] WARNING: int8 without --calibration_video — "
              "activation scales come from synthetic noise; pass a "
              "representative clip for serving quality", flush=True)
        calib = np.random.default_rng(0).integers(
            0, 255, (1, min(17, args.warm_frames), ch, cw, 3))
    vae = vae.quantize(calibration=(calib.astype(np.float32) / 127.5 - 1.0))
    if cache:
        import orbax.checkpoint as ocp
        ocp.PyTreeCheckpointer().save(cache, vae.params)
        print(f"[serve] wrote quantized params to {cache}", flush=True)
    return vae


def main(argv=None):
    import jax.numpy as jnp

    from cvvae_tpu.cli import serving_decode_tiles
    from cvvae_tpu.models.video_vae import VideoVAE, config_for_variant
    from cvvae_tpu.utils.profiling import enable_compilation_cache

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--port", type=int, default=8400)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--variant", default="v1", choices=["v1", "sd3"])
    ap.add_argument("--vae_path", default=None)
    ap.add_argument("--subfolder", default=None)
    ap.add_argument("--dtype", default="int8",
                    choices=["int8", "bf16", "fp32"])
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--warm_frames", type=int, default=17,
                    help="frame-window size compiled at warm-up "
                         "(truncated to the 4k+1 contract, so warm-up "
                         "compiles exactly the programs requests hit)")
    ap.add_argument("--max_queue", type=int, default=8)
    ap.add_argument("--max_body_mb", type=int, default=512,
                    help="reject request bodies larger than this with "
                         "HTTP 413 before reading them into memory")
    ap.add_argument("--calibration_video", default=None,
                    help="int8 only: video whose frames calibrate the "
                         "static activation scales (content statistics "
                         "— strongly preferred over the synthetic "
                         "fallback for serving quality)")
    ap.add_argument("--quantized_cache", default=None,
                    help="int8 only: directory for the calibrated "
                         "quantized params (orbax).  Present -> restored "
                         "(startup skips the eager calibration pass, the "
                         "slowest startup stage); absent -> written "
                         "after calibration for the next restart")
    ap.add_argument("--spatial_shards", type=int, default=1,
                    help="multi-chip serving: shard the height axis of "
                         "every net call over this many devices "
                         "(VideoVAE.with_mesh; the SPMD partitioner "
                         "inserts conv halo exchanges over ICI).  "
                         "Composes with int8; outputs match the "
                         "single-device server within SPMD "
                         "reduction-order tolerance — partitioned "
                         "GroupNorm sums reorder the last ulp, so NOT "
                         "byte-identical across shard counts "
                         "(tests/test_serve.py).  1 = single device")
    args = ap.parse_args(argv)
    args.warm_frames = truncate_to_4k1(args.warm_frames)

    enable_compilation_cache()
    dtype = jnp.float32 if args.dtype == "fp32" else jnp.bfloat16
    if args.vae_path:
        vae = VideoVAE.from_pretrained(args.vae_path,
                                       subfolder=args.subfolder, dtype=dtype)
    else:
        vae = VideoVAE.from_config(config_for_variant(args.variant),
                                   dtype=dtype)
    # TPU serving preset (cli.py --serving): rectangular decode tiles,
    # untiled v1 encode
    tile, ratio = serving_decode_tiles(args.height, args.width)
    enc_tile = None if vae.config.family == "v1" else "inherit"
    vae = VideoVAE(dataclasses.replace(
        vae.config, tile_spatial_size=tile, tile_overlap_ratio=ratio,
        encode_tile_spatial_size=enc_tile), vae.params)
    if args.dtype == "int8":
        vae = _quantized(vae, args)
    if args.spatial_shards > 1:
        import jax

        from cvvae_tpu.parallel.mesh import make_mesh
        n_dev = len(jax.devices())
        if args.spatial_shards > n_dev:
            raise SystemExit(f"--spatial_shards {args.spatial_shards} "
                             f"> {n_dev} visible devices")
        vae = vae.with_mesh(make_mesh(args.spatial_shards))
        print(f"[serve] height axis sharded over "
              f"{args.spatial_shards} devices", flush=True)

    print(f"[serve] warming {args.height}x{args.width} x"
          f"{args.warm_frames}f {args.dtype} programs ...", flush=True)
    server = build_server(vae, port=args.port, host=args.host,
                          max_queue=args.max_queue, act_dtype=dtype,
                          max_body_bytes=args.max_body_mb * 1024 * 1024)
    warm = np.zeros((args.warm_frames, args.height, args.width, 3),
                    np.uint8)
    t0 = time.perf_counter()
    server.worker.submit("reconstruct", warm, False, timeout=3600.0)
    # The warm-up request went through the same submit() path, so its
    # multi-minute compile latency sits in latencies_ms and would
    # dominate /stats p50/p95 until real traffic dilutes it (and its
    # frames would inflate frames_per_busy_s).  Reset the serving
    # counters so /stats reflects steady-state requests only.
    server.worker.latencies_ms.clear()
    server.worker.stats.update(reconstruct=0, frames=0, busy_s=0.0)
    print(f"[serve] warm in {time.perf_counter() - t0:.1f}s; "
          f"listening on {args.host}:{args.port}", flush=True)

    # graceful drain on SIGTERM/SIGINT: stop accepting new connections
    # (shutdown() exits the accept loop), then server_close() joins the
    # non-daemon handler threads (DrainingHTTPServer) — each of which is
    # blocked on its VAEWorker result — so every accepted request
    # completes before the process exits
    import signal

    def _stop(signum, frame):
        print(f"[serve] signal {signum}: draining and shutting down",
              flush=True)
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _stop)
    signal.signal(signal.SIGINT, _stop)
    server.serve_forever()
    server.server_close()
    print("[serve] stopped", flush=True)


if __name__ == "__main__":
    main()
