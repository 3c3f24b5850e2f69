"""Streaming encode/decode must match the whole-video tiled path
bit-for-bit (same chunk semantics, bounded memory)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cvvae_tpu.models.vae_v1 import VAE1Config
from cvvae_tpu.models.video_vae import VideoVAE, VideoVAEConfig
from cvvae_tpu.streaming import (
    _chunk_frames, streaming_decode, streaming_encode)


@pytest.fixture(scope="module")
def vae():
    cfg = VideoVAEConfig(
        family="v1",
        net=VAE1Config(ch=8, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                       z_channels=4, norm_num_groups=4),
        en_de_n_frames_a_time=8, tile_spatial_size=None)
    return VideoVAE.from_config(cfg, seed=0)


def test_chunk_frames_overlap():
    frames = [np.full((2, 2, 3), i, np.uint8) for i in range(21)]
    chunks = list(_chunk_frames(iter(frames), 8))
    # first chunk 9 frames (0..8); then overlap: 8..16; 16..20
    assert [c.shape[0] for c in chunks] == [9, 9, 5]
    assert chunks[1][0, 0, 0, 0] == 8 and chunks[2][0, 0, 0, 0] == 16


@pytest.mark.slow
def test_streaming_encode_matches_batch(vae):
    rs = np.random.RandomState(0)
    frames_u8 = rs.randint(0, 255, (21, 16, 16, 3), np.uint8)
    x = jnp.asarray(frames_u8, jnp.float32)[None] / 127.5 - 1.0
    z_batch = vae.encode(x).mode()

    z_chunks = list(streaming_encode(vae, iter(frames_u8),
                                     dtype=jnp.float32))
    z_stream = jnp.concatenate(z_chunks, axis=1)
    assert z_stream.shape == z_batch.shape == (1, 6, 2, 2, 4)
    np.testing.assert_allclose(np.asarray(z_stream), np.asarray(z_batch),
                               atol=1e-5)


@pytest.mark.slow
def test_streaming_decode_matches_batch(vae):
    rs = np.random.RandomState(1)
    z = jnp.asarray(rs.randn(1, 6, 2, 2, 4).astype(np.float32))
    x_batch = np.asarray(vae.tiled_decode(z))
    x_batch_u8 = np.clip((x_batch[0] + 1) * 127.5, 0, 255).astype(np.uint8)

    # feed latents in awkward chunk sizes to exercise the buffering
    blocks = list(streaming_decode(
        vae, iter([z[:, :1], z[:, 1:4], z[:, 4:]])))
    x_stream = np.concatenate(blocks, axis=0)
    assert x_stream.shape == x_batch_u8.shape == (21, 16, 16, 3)
    np.testing.assert_array_equal(x_stream, x_batch_u8)


def test_streaming_roundtrip_file(vae, tmp_path):
    import cv2
    from cvvae_tpu.streaming import reconstruct_video_streaming
    path = tmp_path / "in.mp4"
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (16, 16))
    for f in range(13):
        w.write(np.full((16, 16, 3), f * 15, np.uint8))
    w.release()
    out = tmp_path / "out.mp4"
    stats = reconstruct_video_streaming(vae, str(path), str(out),
                                        dtype=jnp.float32)
    assert stats["frames_out"] == 13
    cap = cv2.VideoCapture(str(out))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 13
    cap.release()


def test_streaming_encode_chunk_batched(vae):
    """chunk_batch>1 stacks windows on the batch axis — identical
    latents, fewer/larger device calls."""
    rs = np.random.RandomState(2)
    frames_u8 = rs.randint(0, 255, (33, 16, 16, 3), np.uint8)  # 4 windows
    z1 = jnp.concatenate(list(streaming_encode(
        vae, iter(frames_u8), dtype=jnp.float32)), axis=1)
    z2 = jnp.concatenate(list(streaming_encode(
        vae, iter(frames_u8), dtype=jnp.float32, chunk_batch=3)), axis=1)
    assert z1.shape == z2.shape == (1, 9, 2, 2, 4)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z1), atol=1e-5)


def test_streaming_encode_chunk_batched_ragged_tail(vae):
    """A short final window (different shape) must flush separately."""
    rs = np.random.RandomState(3)
    frames_u8 = rs.randint(0, 255, (21, 16, 16, 3), np.uint8)  # 9,9,5
    z1 = jnp.concatenate(list(streaming_encode(
        vae, iter(frames_u8), dtype=jnp.float32)), axis=1)
    z2 = jnp.concatenate(list(streaming_encode(
        vae, iter(frames_u8), dtype=jnp.float32, chunk_batch=2)), axis=1)
    assert z1.shape == z2.shape == (1, 6, 2, 2, 4)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z1), atol=1e-5)


def test_streaming_decode_prefetch_bit_identical(vae):
    """prefetch>0 (async fetch pipeline) emits the exact bytes of the
    serial loop, including the ragged-tail window."""
    rs = np.random.RandomState(2)
    z = jnp.asarray(rs.randn(1, 6, 2, 2, 4).astype(np.float32))
    ser = list(streaming_decode(vae, iter([z[:, :3], z[:, 3:]])))
    for prefetch in (1, 3):
        pipe = list(streaming_decode(vae, iter([z[:, :3], z[:, 3:]]),
                                     prefetch=prefetch))
        assert len(pipe) == len(ser)
        for a, b in zip(pipe, ser):
            np.testing.assert_array_equal(a, b)


def test_streaming_roundtrip_pipelined_matches_serial(vae, tmp_path):
    """The pipelined host loop (decode thread + async fetch + writer
    thread) writes the same video as the serial path."""
    import cv2
    from cvvae_tpu.streaming import reconstruct_video_streaming
    path = tmp_path / "in.mp4"
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (16, 16))
    rs = np.random.RandomState(3)
    for f in range(21):
        w.write(rs.randint(0, 255, (16, 16, 3), dtype=np.uint8))
    w.release()

    def read_all(p):
        cap = cv2.VideoCapture(str(p))
        frames = []
        while True:
            ok, f = cap.read()
            if not ok:
                break
            frames.append(f)
        cap.release()
        return np.stack(frames)

    out_s, out_p = tmp_path / "serial.mp4", tmp_path / "pipe.mp4"
    st_s = reconstruct_video_streaming(vae, str(path), str(out_s),
                                       dtype=jnp.float32)
    st_p = reconstruct_video_streaming(vae, str(path), str(out_p),
                                       dtype=jnp.float32, pipelined=True)
    assert st_s["frames_out"] == st_p["frames_out"] == 21
    np.testing.assert_array_equal(read_all(out_s), read_all(out_p))
