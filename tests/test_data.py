"""Data pipeline tests: tar/csv readers, sharding, weighted mixing,
decoders, transforms — against synthetic shards built on the fly."""

import csv
import io
import tarfile

import numpy as np
import pytest

from cvvae_tpu.data import pipeline as pl
from cvvae_tpu.data import transforms as tfm


@pytest.fixture(scope="module")
def wds_dir(tmp_path_factory):
    """Two webdataset tars of 4 jpg+txt samples each."""
    import cv2
    d = tmp_path_factory.mktemp("wds")
    for t in range(2):
        with tarfile.open(d / f"shard{t}.tar", "w") as tf:
            for i in range(4):
                key = f"s{t}_{i}"
                img = np.full((64, 48, 3), 10 * i, np.uint8)
                ok, enc = cv2.imencode(".jpg", img)
                assert ok
                for ext, data in (("jpg", enc.tobytes()),
                                  ("txt", f"caption {key}".encode())):
                    info = tarfile.TarInfo(f"{key}.{ext}")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
    return str(d)


@pytest.fixture(scope="module")
def video_csv_dir(tmp_path_factory):
    """A csv pointing at two tiny synthetic mp4s."""
    import cv2
    d = tmp_path_factory.mktemp("vids")
    rows = []
    for i in range(2):
        path = d / f"v{i}.mp4"
        w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                            10, (64, 64))
        for f in range(40):
            w.write(np.full((64, 64, 3), (f * 5) % 255, np.uint8))
        w.release()
        rows.append({"path": f"v{i}.mp4", "name": f"video {i}"})
    with open(d / "meta.csv", "w", newline="") as f:
        wtr = csv.DictWriter(f, fieldnames=["path", "name"])
        wtr.writeheader()
        wtr.writerows(rows)
    return str(d)


def test_tar_reader_groups_and_sorts(wds_dir):
    samples = list(pl.tar_sample_reader(pl.list_files(wds_dir, "*.tar")))
    assert len(samples) == 8
    assert all({"jpg", "txt", "__key__"} <= set(s) for s in samples)


def test_tar_reader_warns_on_corrupt_shard(tmp_path):
    bad = tmp_path / "bad.tar"
    bad.write_bytes(b"this is not a tar file")
    with pytest.warns(UserWarning):
        assert list(pl.tar_sample_reader([str(bad)])) == []


def test_sharding_partitions_disjointly():
    items = list(range(20))
    shards = [list(pl.shard(iter(items), i, 4)) for i in range(4)]
    assert sorted(sum(shards, [])) == items
    assert all(len(s) == 5 for s in shards)


def test_multiplexer_weights():
    a = iter(["a"] * 300)
    b = iter(["b"] * 300)
    out = []
    mux = pl.sample_multiplexer({a: 0.9, b: 0.1}, seed=0)
    for _ in range(200):
        out.append(next(mux))
    frac_a = out.count("a") / len(out)
    assert 0.8 < frac_a < 0.98


def test_image_pipeline_end_to_end(wds_dir):
    from cvvae_tpu.data.decoders import make_image_decoder
    it = pl.build_webdataset_pipeline(
        urls_or_dir=wds_dir, repeat=1, batch_size=4,
        decoder=make_image_decoder(size=32),
        select_keys=("frames", "caption"))
    batch = next(it)
    assert batch["frames"].shape == (4, 1, 32, 32, 3)
    assert batch["frames"].dtype == np.float32
    assert batch["frames"].min() >= -1.0 and batch["frames"].max() <= 1.0
    assert len(batch["caption"]) == 4


def test_video_pipeline_end_to_end(video_csv_dir):
    from cvvae_tpu.data.decoders import make_webvid_decoder
    it = pl.build_metadata_pipeline(
        urls_or_dir=video_csv_dir, file_mask="*.csv", repeat=1, batch_size=1,
        decoder=make_webvid_decoder(num_frames=9, resize=64, crop_size=32,
                                    video_root=video_csv_dir),
        select_keys=("frames", "caption", "fps_id", "cond_aug"))
    batch = next(it)
    assert batch["frames"].shape == (1, 9, 32, 32, 3)
    assert np.isfinite(batch["frames"]).all()


def test_mixed_dataset(wds_dir, video_csv_dir):
    from cvvae_tpu.data.decoders import make_image_decoder, make_webvid_decoder
    img = pl.build_webdataset_pipeline(
        urls_or_dir=wds_dir, repeat=10, batch_size=2,
        decoder=make_image_decoder(size=32), select_keys=("frames",))
    vid = pl.build_metadata_pipeline(
        urls_or_dir=video_csv_dir, file_mask="*.csv", repeat=10, batch_size=1,
        decoder=make_webvid_decoder(num_frames=5, resize=64, crop_size=32,
                                    video_root=video_csv_dir),
        select_keys=("frames",))
    mix = pl.build_multi_dataset({"image": img, "video": vid},
                                 {"image": 0.5, "video": 0.5}, seed=58,
                                 shard_id=0)
    shapes = {next(mix)["frames"].shape for _ in range(8)}
    assert (2, 1, 32, 32, 3) in shapes and (1, 5, 32, 32, 3) in shapes


def test_cover_resize():
    x = np.zeros((30, 60, 3), np.uint8)
    out = tfm.cover_resize(x, (32, 32))
    assert out.shape == (32, 32, 3)
    vid = np.zeros((3, 30, 60, 3), np.uint8)
    assert tfm.cover_resize(vid, (16, 24)).shape == (3, 16, 24, 3)


def test_parallel_mapped_preserves_order_and_skips_failures():
    def fn(i):
        if i == 5:
            raise ValueError("bad sample")
        return i * 2

    with pytest.warns(UserWarning):
        out = list(pl.parallel_mapped(range(20), fn, num_workers=4))
    assert out == [i * 2 for i in range(20) if i != 5]


def test_parallel_mapped_single_worker_fallback():
    out = list(pl.parallel_mapped(range(5), lambda i: i + 1, num_workers=1))
    assert out == [1, 2, 3, 4, 5]


def test_prefetched_yields_all_and_propagates_errors():
    assert list(pl.prefetched(iter(range(10)), size=3)) == list(range(10))

    def bad():
        yield 1
        raise RuntimeError("upstream died")

    it = pl.prefetched(bad(), size=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="upstream died"):
        list(it)


def test_device_prefetch_moves_batches():
    import jax
    batches = [{"frames": np.full((2, 3), i, np.float32), "meta": [i]}
               for i in range(4)]
    out = list(pl.device_prefetch(iter(batches), size=2))
    assert len(out) == 4
    for i, b in enumerate(out):
        assert isinstance(b["frames"], jax.Array)
        np.testing.assert_array_equal(np.asarray(b["frames"]),
                                      batches[i]["frames"])
        assert b["meta"] == [i]


def test_webdataset_pipeline_parallel_decode(wds_dir):
    from cvvae_tpu.data.decoders import make_image_decoder
    it = pl.build_webdataset_pipeline(
        urls_or_dir=wds_dir, repeat=1, decoder=make_image_decoder(size=32),
        select_keys=("frames",), batch_size=2, num_workers=4, prefetch=2)
    batches = list(it)
    assert len(batches) == 4  # 8 samples / bs 2
    assert all(b["frames"].shape == (2, 1, 32, 32, 3) for b in batches)


def test_dict_collate_concat():
    """dict_collation_fn_with_concat semantics (datapipe_utils.py:145-183):
    key intersection, concat_keys concatenated on axis 0, rank0_keys
    scalar-reduced to the first sample's value."""
    samples = [
        {"frames": np.zeros((2, 4, 4, 3)), "fps": 24, "id": "a",
         "extra": 1.0},
        {"frames": np.ones((3, 4, 4, 3)), "fps": 30, "id": "b"},
    ]
    out = pl.dict_collate_concat(samples, concat_keys=("frames",),
                                 rank0_keys=("fps",))
    assert "extra" not in out                     # intersection of keys
    assert out["frames"].shape == (5, 4, 4, 3)    # concatenated, not stacked
    assert out["fps"] == 24                       # rank-0 scalar
    assert out["id"] == ["a", "b"]                # passthrough list
    # without concat_keys, equal-shaped arrays stack
    sam2 = [{"frames": np.zeros((2, 4, 4, 3))},
            {"frames": np.ones((2, 4, 4, 3))}]
    assert pl.dict_collate_concat(sam2)["frames"].shape == (2, 2, 4, 4, 3)


def _square_sample(s):  # module-level: must be picklable for processes
    return {"v": s["v"] * s["v"]}


def test_parallel_mapped_processes():
    """use_processes=True runs the map in worker processes (for decoders
    that hold the GIL), preserving order."""
    items = [{"v": i} for i in range(12)]
    out = list(pl.parallel_mapped(iter(items), _square_sample,
                                  num_workers=2, use_processes=True))
    assert [o["v"] for o in out] == [i * i for i in range(12)]


def test_metadata_pipeline_process_decode(video_csv_dir):
    """decode_processes=True drives the full metadata pipeline through a
    process pool."""
    it = pl.build_metadata_pipeline(
        urls_or_dir=video_csv_dir, repeat=1, decoder=_csv_passthrough,
        batch_size=1, num_workers=2, decode_processes=True)
    rows = list(it)
    assert rows and all("path" in r for r in rows)


def _csv_passthrough(row):  # picklable decoder for the process pool
    return dict(row)
