"""Streaming long-video encode/decode with bounded memory.

The reference materialises the full video tensor on the GPU and loops
over temporal windows eagerly (models/modeling_vae.py:193-210,279-296).
Here the host reads/normalises 16+1-frame windows while the device
encodes the previous one — JAX dispatch is async, so compute overlaps
video IO naturally (the double-buffering of BASELINE's north star) — and
only one window of pixels plus the accumulated latents are ever
resident.  Chunk semantics are exactly the reference's: consecutive
windows share one frame and later windows drop their first latent, so
the result matches `VideoVAE.encode` bit-for-bit.

Covers BASELINE config 5: "long-video streaming: chunked temporal
encode, 720p 30s clip".
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cvvae_tpu.models.video_vae import VideoVAE


def _chunk_frames(frame_iter: Iterator[np.ndarray], window: int
                  ) -> Iterator[np.ndarray]:
    """Group frames into window+1-sized chunks with one-frame overlap."""
    chunk = []
    prev_last: Optional[np.ndarray] = None
    for frame in frame_iter:
        chunk.append(frame)
        if (prev_last is None and len(chunk) == window + 1) or \
           (prev_last is not None and len(chunk) == window):
            if prev_last is not None:
                yield np.stack([prev_last] + chunk)
                prev_last = chunk[-1]
                chunk = []
            else:
                yield np.stack(chunk)
                prev_last = chunk[-1]
                chunk = []
    if chunk:
        if prev_last is not None:
            yield np.stack([prev_last] + chunk)
        else:
            yield np.stack(chunk)


def read_video_frames(path: str, *, height: Optional[int] = None,
                      width: Optional[int] = None,
                      max_frames: Optional[int] = None
                      ) -> Tuple[Iterator[np.ndarray], float]:
    """Lazily decode frames (RGB uint8) one at a time."""
    import cv2
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0

    def gen():
        n = 0
        while True:
            ok, frame = cap.read()
            if not ok or (max_frames is not None and n >= max_frames):
                break
            if height is not None and width is not None:
                frame = cv2.resize(frame, (width, height),
                                   interpolation=cv2.INTER_LINEAR)
            yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            n += 1
        cap.release()

    return gen(), fps


def streaming_encode(vae: VideoVAE, frame_iter: Iterator[np.ndarray], *,
                     dtype=jnp.bfloat16, sample: bool = False,
                     key: Optional[jax.Array] = None,
                     chunk_batch: int = 1) -> Iterator[jax.Array]:
    """frames (H,W,3) uint8 -> latent chunks (1, t', h', w', z).

    Device work for chunk k overlaps host decode of chunk k+1 (async
    dispatch); each yielded chunk is left on device for the consumer.

    ``chunk_batch > 1`` stacks consecutive temporal windows along the
    batch axis before encoding — identical per-sample math (everything
    in the encoder is batch-independent), bigger MXU tiles and fewer
    dispatches for long clips.
    """
    window = vae.config.en_de_n_frames_a_time
    assert window is not None
    first = True
    pending = []

    # upload uint8 (1 B/px) and normalise on device: the host->device
    # link carries half the bytes vs shipping bf16 (and 4x less than
    # fp32); u8 -> bf16 is exact
    normalize = jax.jit(lambda u: u.astype(dtype) / 127.5 - 1.0)

    def encode_batch(chunks):
        nonlocal key
        x = normalize(jnp.asarray(np.stack(chunks)))
        posterior = vae.encode(x)
        if sample:
            key, sub = jax.random.split(key)
            return posterior.sample(sub)
        return posterior.mode()

    def flush():
        nonlocal first
        z = encode_batch(pending)
        for i in range(z.shape[0]):
            zi = z[i:i + 1]
            yield zi if first else zi[:, 1:]
            first = False

    for chunk_np in _chunk_frames(frame_iter, window):
        # full windows batch together; ragged tails flush alone
        if pending and pending[0].shape != chunk_np.shape:
            yield from flush()
            pending = []
        pending.append(chunk_np)
        if len(pending) == chunk_batch:
            yield from flush()
            pending = []
    if pending:
        yield from flush()


def streaming_decode(vae: VideoVAE, latent_iter: Iterator[jax.Array], *,
                     prefetch: int = 0) -> Iterator[np.ndarray]:
    """latent chunks -> uint8 frame blocks.

    Windows of ``decode_n_frames_a_time``+1 latents with one-latent
    overlap; every window after the first drops its first output frame —
    byte-identical to the reference's tiled_decode over the full latent
    sequence (modeling_vae.py:279-296).

    ``prefetch > 0`` keeps that many decoded windows in flight: the
    device->host copy of window k is started asynchronously
    (``copy_to_host_async``) right after its decode is dispatched, and
    materialised only once k+prefetch has been dispatched — so the
    fetch of window k rides the link while the device decodes k+1,
    instead of serialising fetch -> dispatch per window.  Output is
    bit-identical to prefetch=0."""
    import collections

    window = vae.config.decode_n_frames_a_time
    assert window is not None

    # denormalise to uint8 ON DEVICE, fetch 1 B/px: the device->host
    # link is the bottleneck for long-clip serving (fp32 frames are 4x
    # the bytes; same float math + truncating cast as the host version)
    denorm = jax.jit(lambda x: jnp.clip(
        (x.astype(jnp.float32) + 1.0) * 127.5, 0, 255).astype(jnp.uint8))

    pending = collections.deque()

    def submit(x, drop_first):
        u8 = denorm(x[0])
        try:
            u8.copy_to_host_async()
        except AttributeError:   # non-array backends
            pass
        pending.append((u8, drop_first))

    def materialize():
        u8, drop_first = pending.popleft()
        frames = np.asarray(u8)
        return frames[1:] if drop_first else frames

    buf = None
    first = True
    for z in latent_iter:
        buf = z if buf is None else jnp.concatenate([buf, z], axis=1)
        while buf.shape[1] >= window + 1:
            piece = buf[:, :window + 1]
            buf = buf[:, window:]          # keep the overlap latent
            submit(vae.spatial_tiled_decode(piece), drop_first=not first)
            first = False
            while len(pending) > prefetch:
                yield materialize()
    # tail: a partial window (first latent is the overlap unless nothing
    # was emitted yet)
    if buf is not None and (buf.shape[1] > 1 or (first and buf.shape[1] == 1)):
        submit(vae.spatial_tiled_decode(buf), drop_first=not first)
    while pending:
        yield materialize()


def reconstruct_video_streaming(vae: VideoVAE, in_path: str, out_path: str,
                                *, height: Optional[int] = None,
                                width: Optional[int] = None,
                                max_frames: Optional[int] = None,
                                dtype=jnp.bfloat16,
                                pipelined: bool = False) -> dict:
    """End-to-end bounded-memory reconstruction of an arbitrarily long
    video.  Returns stats.

    ``pipelined=True`` overlaps the three host stages with device
    compute: a background thread runs cv2 frame decode (cv2 releases
    the GIL, so this helps even single-core and scales on real
    multi-core serving hosts), the device->host fetch of each decoded
    window is started asynchronously one window early
    (streaming_decode(prefetch=1)), and mp4 encoding runs on a writer
    thread behind a bounded queue.  Output bytes are identical to the
    serial loop."""
    import cv2
    frames, fps = read_video_frames(in_path, height=height, width=width,
                                    max_frames=max_frames)
    fetch_prefetch = 0
    if pipelined:
        from cvvae_tpu.data.pipeline import prefetched
        window = vae.config.en_de_n_frames_a_time or 16
        frames = prefetched(frames, size=2 * (window + 1))
        fetch_prefetch = 1

    blocks = streaming_decode(vae, streaming_encode(vae, frames,
                                                    dtype=dtype),
                              prefetch=fetch_prefetch)
    state = {"writer": None, "n_out": 0}

    def write_block(block):
        if state["writer"] is None:
            h, w = block.shape[1:3]
            state["writer"] = cv2.VideoWriter(
                out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        for f in block:
            state["writer"].write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        state["n_out"] += len(block)

    try:
        if pipelined:
            import queue
            import threading
            q: "queue.Queue" = queue.Queue(maxsize=4)
            err = []

            def writer_loop():
                while True:
                    block = q.get()
                    if block is None:
                        return
                    try:
                        write_block(block)
                    except BaseException as e:  # surface in the main thread
                        err.append(e)
                        # keep draining so the producer's put() never
                        # blocks on a full queue after the death
                        while q.get() is not None:
                            pass
                        return

            th = threading.Thread(target=writer_loop, daemon=True)
            th.start()
            try:
                for block in blocks:
                    if err:
                        break
                    # bounded wait: if the writer died between the err
                    # check and a full queue, don't block forever
                    while True:
                        try:
                            q.put(block, timeout=1.0)
                            break
                        except queue.Full:
                            if err:
                                break
                    if err:
                        break
            finally:
                q.put(None)
                th.join()
            if err:
                raise err[0]
        else:
            for block in blocks:
                write_block(block)
    finally:
        # always finalise the container, also on a writer error —
        # partial output stays playable and the handle is not leaked
        if state["writer"] is not None:
            state["writer"].release()
    return {"frames_out": state["n_out"], "fps": fps, "out_path": out_path}
