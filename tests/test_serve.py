"""Serving daemon: HTTP boundary == direct VideoVAE calls.

Spins cvvae_tpu.serve's server on a tiny v1 config (port 0 = ephemeral)
and drives /encode, /decode, /reconstruct, /healthz, /stats over real
sockets; responses must match direct model calls exactly (same device
math, .npy wire round-trips losslessly).
"""

import http.client
import io
import threading

import numpy as np
import pytest

import jax.numpy as jnp

from cvvae_tpu.models.vae_v1 import VAE1Config
from cvvae_tpu.models.video_vae import VideoVAE, VideoVAEConfig
from cvvae_tpu.serve import build_server, truncate_to_4k1


@pytest.fixture(scope="module")
def served():
    cfg = VideoVAEConfig(
        family="v1",
        net=VAE1Config(ch=8, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                       z_channels=4, norm_num_groups=4),
        en_de_n_frames_a_time=None, tile_spatial_size=None)
    vae = VideoVAE.from_config(cfg, seed=0)
    server = build_server(vae, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield vae, server.server_address[1]
    server.shutdown()


def _post(port, path, arr):
    buf = io.BytesIO()
    np.save(buf, arr, allow_pickle=False)
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, body=buf.getvalue())
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


def _get_json(port, path):
    import json
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", path)
    resp = conn.getresponse()
    out = json.loads(resp.read())
    conn.close()
    return resp.status, out


def test_truncate_to_4k1():
    assert [truncate_to_4k1(n) for n in (1, 4, 5, 8, 9, 17)] \
        == [1, 1, 5, 5, 9, 17]


def test_healthz_and_stats(served):
    _, port = served
    status, body = _get_json(port, "/healthz")
    assert status == 200 and body == {"ok": True}
    status, body = _get_json(port, "/stats")
    assert status == 200 and "queue_depth" in body


def test_encode_decode_roundtrip_matches_direct(served):
    vae, port = served
    rs = np.random.RandomState(0)
    frames = rs.randint(0, 255, (9, 32, 32, 3), np.uint8)

    status, z_bytes = _post(port, "/encode", frames)
    assert status == 200
    z_np = np.load(io.BytesIO(z_bytes), allow_pickle=False)

    dtype = jnp.float32
    x = jnp.asarray(frames)[None].astype(dtype) / 127.5 - 1.0
    z_ref = np.asarray(vae.encode(x).mode().astype(jnp.float32))
    np.testing.assert_array_equal(z_np, z_ref)

    status, x_bytes = _post(port, "/decode", z_np)
    assert status == 200
    x_srv = np.load(io.BytesIO(x_bytes), allow_pickle=False)
    x_dec = vae.decode(jnp.asarray(z_np, dtype))
    x_ref = np.asarray(jnp.clip(
        (x_dec[0].astype(jnp.float32) + 1.0) * 127.5, 0, 255)) \
        .astype(np.uint8)
    np.testing.assert_array_equal(x_srv, x_ref)
    assert x_srv.shape == (9, 32, 32, 3)

    status, r_bytes = _post(port, "/reconstruct", frames)
    assert status == 200
    np.testing.assert_array_equal(
        np.load(io.BytesIO(r_bytes), allow_pickle=False), x_ref)


def test_frame_count_contract(served):
    """Non-4k+1 frame counts truncate exactly like the reference CLI."""
    _, port = served
    rs = np.random.RandomState(1)
    frames = rs.randint(0, 255, (8, 32, 32, 3), np.uint8)
    status, z_bytes = _post(port, "/encode", frames)
    assert status == 200
    z = np.load(io.BytesIO(z_bytes), allow_pickle=False)
    assert z.shape[1] == (truncate_to_4k1(8) - 1) // 4 + 1  # 5 -> 2


def test_bad_requests(served):
    _, port = served
    status, body = _post(port, "/encode",
                         np.zeros((4, 8, 8, 3), np.float32))  # not uint8
    assert status == 400
    status, body = _post(port, "/decode", np.zeros((3, 3), np.float32))
    assert status == 400
    status, body = _post(port, "/nonsense", np.zeros((1,), np.uint8))
    assert status == 404


def test_sd3_family_through_daemon():
    """The daemon serves the SD3 (16-ch latent) family unchanged."""
    from cvvae_tpu.models.vae_sd3 import VAESD3Config
    cfg = VideoVAEConfig(
        family="sd3",
        net=VAESD3Config(block_out_channels=(8, 16, 16, 16),
                         layers_per_block=1, latent_channels=16,
                         norm_num_groups=4),
        scaling_factor=1.5305,
        en_de_n_frames_a_time=None, tile_spatial_size=None)
    vae = VideoVAE.from_config(cfg, seed=0)
    server = build_server(vae, port=0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        port = server.server_address[1]
        frames = np.random.RandomState(2).randint(
            0, 255, (5, 32, 32, 3), np.uint8)
        status, z_bytes = _post(port, "/encode", frames)
        assert status == 200
        z = np.load(io.BytesIO(z_bytes), allow_pickle=False)
        assert z.shape == (1, 2, 4, 4, 16)
        status, rec_bytes = _post(port, "/decode", z)
        assert status == 200
        rec = np.load(io.BytesIO(rec_bytes), allow_pickle=False)
        assert rec.shape == (5, 32, 32, 3) and rec.dtype == np.uint8
    finally:
        server.shutdown()


def test_quantized_cache_roundtrip(tmp_path):
    """--quantized_cache: calibrated params save/restore bit-exactly
    (int8 kernels, scales, bf16 remainder) through orbax.

    ch=16 so the top level reaches 64 channels and convs actually
    quantize (min_cin=64) — the cache must round-trip real int8 leaves,
    not just the fp remainder."""
    import argparse
    import jax
    import jax.numpy as jnp

    from cvvae_tpu.serve import _quantized
    cfg = VideoVAEConfig(
        family="v1",
        net=VAE1Config(ch=16, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                       z_channels=4, norm_num_groups=4),
        en_de_n_frames_a_time=None, tile_spatial_size=None)
    vae = VideoVAE.from_config(cfg, seed=0, dtype=jnp.bfloat16)
    args = argparse.Namespace(
        quantized_cache=str(tmp_path / "qcache"), calibration_video=None,
        height=32, width=32, warm_frames=5)
    q1 = _quantized(vae, args)          # calibrates + writes the cache
    q2 = _quantized(vae, args)          # restores from the cache
    assert any(np.asarray(v).dtype == np.int8
               for v in jax.tree_util.tree_leaves(q1.params))
    l1 = jax.tree_util.tree_leaves_with_path(q1.params)
    l2 = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_leaves_with_path(q2.params)}
    assert len(l1) == len(l2)
    for k, v in l1:
        r = l2[jax.tree_util.keystr(k)]
        assert np.asarray(v).dtype == np.asarray(r).dtype
        np.testing.assert_array_equal(np.asarray(v), np.asarray(r))

    x = np.random.RandomState(3).randint(0, 255, (5, 32, 32, 3), np.uint8)
    xj = jnp.asarray(x)[None].astype(jnp.float32) / 127.5 - 1.0
    np.testing.assert_array_equal(
        np.asarray(q1.decode(q1.encode(xj).mode())),
        np.asarray(q2.decode(q2.encode(xj).mode())))


# ---------------------------------------------------------------------------
# Concurrency / load behaviour (VERDICT r4 item 8).  A controllable-
# latency stand-in replaces the model so the tests pin the *queueing*
# semantics — bounded queue, 503 at max_queue, serialized execution,
# drain-on-shutdown — without device time.
# ---------------------------------------------------------------------------

import time


class _FakePosterior:
    def __init__(self, z):
        self._z = z

    def mode(self):
        return self._z

    def sample(self, key):
        return self._z


class _SlowVAE:
    """encode/decode sleep ``delay`` s; an optional ``gate`` Event holds
    the FIRST request until the test releases it (keeps the worker busy
    while the queue is filled)."""

    def __init__(self, delay=0.02, gate=None):
        self.delay = delay
        self._gate = gate
        self.params = {}

    def encode(self, x):
        if self._gate is not None:
            gate, self._gate = self._gate, None
            gate.wait(30.0)
        time.sleep(self.delay)
        return _FakePosterior(jnp.zeros((1, 1, 2, 2, 4), jnp.float32))

    def decode(self, z):
        time.sleep(self.delay)
        return jnp.zeros((1, 4, 8, 8, 3), jnp.float32)


def _serve_fake(vae, max_queue, put_timeout):
    server = build_server(vae, port=0, max_queue=max_queue,
                          put_timeout=put_timeout)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server, server.server_address[1]


def test_queue_full_returns_503():
    """With the worker held busy and the queue at max_queue, the next
    request is rejected with HTTP 503 (not buffered unboundedly)."""
    gate = threading.Event()
    server, port = _serve_fake(_SlowVAE(gate=gate), max_queue=2,
                               put_timeout=0.2)
    frames = np.zeros((5, 8, 8, 3), np.uint8)
    results = []

    def post():
        results.append(_post(port, "/encode", frames)[0])

    try:
        threads = [threading.Thread(target=post) for _ in range(3)]
        threads[0].start()           # worker picks it up, blocks on gate
        time.sleep(0.3)
        for t in threads[1:]:        # fill the 2-slot queue
            t.start()
        time.sleep(0.3)
        assert server.worker.queue_depth == 2
        status, body = _post(port, "/encode", frames)   # 3rd waiter
        assert status == 503
        assert b"queue full" in body
        gate.set()
        for t in threads:
            t.join(30.0)
        assert results.count(200) == 3   # the queued ones all completed
    finally:
        gate.set()
        server.shutdown()
        server.server_close()


def test_concurrent_clients_serialize_and_report_latency():
    """N parallel clients: every request succeeds, execution is strictly
    sequential (total busy time ~= N * per-request device time), and
    /stats carries the latency distribution."""
    n, delay = 8, 0.03
    server, port = _serve_fake(_SlowVAE(delay=delay), max_queue=16,
                               put_timeout=5.0)
    frames = np.zeros((5, 8, 8, 3), np.uint8)
    lat = {}

    def post(i):
        t0 = time.perf_counter()
        status, _ = _post(port, "/reconstruct", frames)
        lat[i] = (time.perf_counter() - t0, status)

    try:
        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(60.0)
        assert len(lat) == n
        assert all(s == 200 for _, s in lat.values())
        # serialized: the slowest client waited behind ~n-1 others
        per_req = 2 * delay                   # encode + decode
        times = sorted(v for v, _ in lat.values())
        assert times[-1] >= (n - 1) * per_req * 0.5
        status, stats = _get_json(port, "/stats")
        assert status == 200
        assert stats["reconstruct"] == n
        assert stats["queue_depth"] == 0
        assert stats["latency_ms_p50"] > 0
        assert stats["latency_ms_p95"] >= stats["latency_ms_p50"]
        assert stats["busy_s"] >= n * per_req * 0.9
    finally:
        server.shutdown()
        server.server_close()


def test_shutdown_drains_inflight_requests():
    """shutdown() + server_close() under load: every accepted request
    completes with 200 before the server is torn down."""
    server, port = _serve_fake(_SlowVAE(delay=0.05), max_queue=16,
                               put_timeout=5.0)
    frames = np.zeros((5, 8, 8, 3), np.uint8)
    results = []

    def post():
        results.append(_post(port, "/reconstruct", frames)[0])

    threads = [threading.Thread(target=post) for _ in range(4)]
    for t in threads:
        t.start()
    time.sleep(0.08)                 # let them reach the worker queue
    server.shutdown()                # stop accepting; drain in-flight
    server.server_close()            # joins the non-daemon handlers
    for t in threads:
        t.join(30.0)
    assert results == [200, 200, 200, 200]


def test_sharded_server_matches_unsharded(served):
    """Multi-chip serving (serve --spatial_shards): a VideoVAE wrapped
    with with_mesh behind the daemon matches the single-device server —
    fp latents within the SPMD reduction-order tolerance the parallel
    suite pins (GroupNorm statistics are partitioned sums, so last-ulp
    accumulation order differs; tests/test_parallel.py uses the same
    atol), uint8 reconstructions within +-1 count — for the fp path AND
    for int8 (quantize composes with the mesh)."""
    import dataclasses

    from cvvae_tpu.parallel.mesh import make_mesh

    vae, port = served
    # production --spatial_shards always runs behind the tiled-decode
    # wrappers (serve.main installs rect tiles before with_mesh), so
    # exercise the _sp_dec/_sp_enc mesh re-jits too: 16-px tiles on a
    # 32-px input force the multi-tile path.
    tiled = VideoVAE(dataclasses.replace(
        vae.config, tile_spatial_size=16, tile_overlap_ratio=0.5),
        vae.params)
    rs = np.random.RandomState(3)
    frames = rs.randint(0, 255, (5, 32, 32, 3), np.uint8)

    def quantized(v):
        return v.quantize(min_cin=8, calibration=jnp.asarray(
            frames[None], jnp.float32) / 127.5 - 1.0)

    for base in (vae, quantized(vae), tiled):
        mesh_vae = base.with_mesh(make_mesh(4))
        ref_server = build_server(base, port=0)
        sh_server = build_server(mesh_vae, port=0)
        for srv in (ref_server, sh_server):
            threading.Thread(target=srv.serve_forever,
                             daemon=True).start()
        try:
            rport = ref_server.server_address[1]
            sport = sh_server.server_address[1]
            for path in ("/encode", "/reconstruct"):
                s_ref, b_ref = _post(rport, path, frames)
                s_sh, b_sh = _post(sport, path, frames)
                assert (s_ref, s_sh) == (200, 200)
                a = np.load(io.BytesIO(b_ref), allow_pickle=False)
                b = np.load(io.BytesIO(b_sh), allow_pickle=False)
                if a.dtype == np.uint8:   # reconstruct: rounding flips
                    assert np.max(np.abs(a.astype(int)
                                         - b.astype(int))) <= 1, path
                else:                      # latents: SPMD sum order
                    np.testing.assert_allclose(a, b, atol=2e-5,
                                               rtol=1e-4, err_msg=path)
        finally:
            for srv in (ref_server, sh_server):
                srv.shutdown()
                srv.server_close()
