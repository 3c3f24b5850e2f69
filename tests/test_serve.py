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
