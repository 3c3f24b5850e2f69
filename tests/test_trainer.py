"""Trainer loop tests: fit runs, logs CSV metrics, writes image panels,
checkpoints roll, and resume restores the step counter."""

import glob
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cvvae_tpu.losses.vae_loss import LossConfig
from cvvae_tpu.models.discriminator import Disc3DConfig
from cvvae_tpu.models.vae_sd3 import VAESD3Config
from cvvae_tpu.training.engine import EngineConfig, TrainingEngine
from cvvae_tpu.training.optim import OptimConfig
from cvvae_tpu.training.trainer import Trainer


def make_engine():
    net = VAESD3Config(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                       latent_channels=4, norm_num_groups=4)
    cfg = EngineConfig(
        family="sd3", net=net,
        disc=Disc3DConfig(ndf=8, n_layers=2, norm_groups=4),
        loss=LossConfig(perceptual_weight=0.0), constraint="none",
        optim=OptimConfig(num_warmup_steps=0, num_training_steps=100),
        remat=False)
    return TrainingEngine(cfg, seed=0)


def data_iter():
    rng = np.random.RandomState(0)
    while True:
        yield {"frames": rng.randn(1, 5, 16, 16, 3).astype(np.float32) * 0.3}


@pytest.mark.slow
def test_fit_logs_and_checkpoints(tmp_path):
    logdir = str(tmp_path / "run")
    engine = make_engine()
    trainer = Trainer(engine, logdir, max_steps=6, ckpt_every=2,
                      permanent_every=4, image_every=0, log_every=1)
    state = trainer.fit(data_iter())
    assert int(state.step) == 6

    csv_path = os.path.join(logdir, "metrics.csv")
    assert os.path.exists(csv_path)
    rows = open(csv_path).read().strip().splitlines()
    assert len(rows) >= 7  # header + 6 steps
    assert "train/loss/total" in rows[0] and "lr" in rows[0]

    assert glob.glob(os.path.join(logdir, "rolling", "*"))
    assert glob.glob(os.path.join(logdir, "permanent", "*"))

    # resume restores the step counter and parameters
    trainer2 = Trainer(make_engine(), logdir, max_steps=6, ckpt_every=2,
                       image_every=0)
    s0 = trainer2.engine.init_state(jax.random.PRNGKey(0))
    restored = trainer2.ckpt.restore(s0)
    assert int(restored.step) == 6
    a = jax.tree_util.tree_leaves(restored.params)
    b = jax.tree_util.tree_leaves(state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_image_logger_panels(tmp_path):
    from cvvae_tpu.training.logging import ImageLogger, should_log_images
    assert should_log_images(250, 250) and should_log_images(4, 250)
    assert not should_log_images(251, 250)
    il = ImageLogger(str(tmp_path), every=1)
    x = np.random.RandomState(0).randn(1, 2, 8, 8, 3).astype(np.float32)
    path = il.maybe_log(1, x, x * 0.5)
    assert path and os.path.exists(path)
    import cv2
    img = cv2.imread(path)
    assert img.shape == (4 * 8, 2 * 8, 3)  # 4 panels x T frames wide


def test_config_system(tmp_path):
    from cvvae_tpu.utils.config import instantiate_from_config, load_configs
    p = tmp_path / "a.yaml"
    p.write_text("model:\n  lr: 1\n  net:\n    ch: [1, 2]\n")
    cfg = load_configs([str(p)], ["model.lr=5", "model.extra=hi"])
    assert cfg["model"]["lr"] == 5 and cfg["model"]["extra"] == "hi"

    obj = instantiate_from_config({
        "target": "cvvae_tpu.models.vae_sd3.VAESD3Config",
        "params": {"block_out_channels": [8, 8], "latent_channels": 4}})
    assert obj.block_out_channels == (8, 8)

    nested = instantiate_from_config({
        "target": "cvvae_tpu.training.engine.EngineConfig",
        "params": {
            "family": "sd3", "constraint": "none",
            "net": {"target": "cvvae_tpu.models.vae_sd3.VAESD3Config",
                    "params": {"block_out_channels": [8, 8, 8, 8],
                               "latent_channels": 4, "norm_num_groups": 4}},
        }})
    assert nested.net.latent_channels == 4


@pytest.mark.slow
def test_resume_equivalence(tmp_path):
    """fit k steps, 'crash', resume -> bit-identical params/opt state to
    an uninterrupted run (step-keyed rng + abstract-state restore)."""

    def batches():
        rng = np.random.RandomState(7)
        fixed = [
            {"frames": rng.randn(1, 5, 16, 16, 3).astype(np.float32) * 0.3}
            for _ in range(6)]
        step = 0
        while True:
            yield fixed[step % len(fixed)]
            step += 1

    # uninterrupted run: 4 steps
    t_full = Trainer(make_engine(), str(tmp_path / "full"), max_steps=4,
                     ckpt_every=1, image_every=0, log_every=0)
    s_full = t_full.fit(batches())

    # interrupted: 2 steps, then resume from the checkpoint for 2 more.
    # the data iterator is step-keyed here (batches() % step), matching
    # what a seekable/sharded pipeline provides on real resume.
    logdir = str(tmp_path / "resumed")
    t_a = Trainer(make_engine(), logdir, max_steps=2, ckpt_every=1,
                  image_every=0, log_every=0)
    t_a.fit(batches())

    def batches_from(start):
        g = batches()
        for _ in range(start):
            next(g)
        return g

    t_b = Trainer(make_engine(), logdir, max_steps=4, ckpt_every=1,
                  image_every=0, log_every=0)
    s_res = t_b.fit(batches_from(2), resume=True)

    assert int(s_res.step) == int(s_full.step) == 4
    for a, b in zip(jax.tree_util.tree_leaves(s_full.params),
                    jax.tree_util.tree_leaves(s_res.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(s_full.disc_params),
                    jax.tree_util.tree_leaves(s_res.disc_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_best_k_checkpointing(tmp_path):
    """best/ keeps the lowest-monitor checkpoints (reference
    ModelCheckpoint save_top_k on train/loss/rec, main.py:718-737)."""
    from cvvae_tpu.training.checkpoint import CheckpointManager
    engine = make_engine()
    state = engine.init_state(jax.random.PRNGKey(0))
    ckpt = CheckpointManager(str(tmp_path), rolling_every=1, keep=2,
                             permanent_every=0, best_k=2)
    losses = {1: 5.0, 2: 1.0, 3: 4.0, 4: 0.5}
    for step, loss in losses.items():
        state = state._replace(step=jnp.asarray(step, jnp.int32))
        ckpt.maybe_save(step, state, metrics={"train/loss/rec": loss})
    ckpt.close()
    assert ckpt.best_step() == 4
    kept = sorted(int(p) for p in os.listdir(os.path.join(str(tmp_path),
                                                          "best"))
                  if p.isdigit())
    assert kept == [2, 4]  # the two lowest-loss steps survive


@pytest.mark.slow
def test_validate_full_metric_dict(tmp_path):
    """val/* carries the SAME loss keys as training plus psnr/ssim, and
    EMA weights get a second val_ema/* pass (autoencoder.py:380-443)."""
    logdir = str(tmp_path / "valrun")
    net = VAESD3Config(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                       latent_channels=4, norm_num_groups=4)
    cfg = EngineConfig(
        family="sd3", net=net,
        disc=Disc3DConfig(ndf=8, n_layers=2, norm_groups=4),
        loss=LossConfig(perceptual_weight=0.0), constraint="none",
        optim=OptimConfig(num_warmup_steps=0, num_training_steps=100),
        ema_decay=0.999, remat=False)
    engine = TrainingEngine(cfg, seed=0)
    trainer = Trainer(engine, logdir, max_steps=2, ckpt_every=100,
                      image_every=0, log_every=1)
    state = trainer.fit(data_iter())

    out = trainer.validate(state, data_iter(), step=2, n_batches=2)
    train_keys = {"loss/total", "loss/nll", "loss/rec", "loss/g",
                  "scalars/logvar", "scalars/d_weight", "kl_loss",
                  "loss/disc", "logits/real", "logits/fake"}
    for k in train_keys | {"psnr_db", "ssim"}:
        assert f"val/{k}" in out, f"missing val/{k}"
        assert f"val_ema/{k}" in out, f"missing val_ema/{k}"
        assert np.isfinite(out[f"val/{k}"])
    # test-split runner writes the same dict under test/
    out_t = trainer.test(state, data_iter(), n_batches=1)
    assert "test/loss/rec" in out_t and "test/psnr_db" in out_t
    # CSV row landed
    rows = open(os.path.join(logdir, "metrics.csv")).read()
    assert "val/psnr_db" in rows and "val_ema/loss/disc" in rows


@pytest.mark.slow
def test_validate_tiled_full_res(tmp_path):
    logdir = str(tmp_path / "tiledval")
    engine = make_engine()
    state = engine.init_state(jax.random.PRNGKey(0))
    trainer = Trainer(engine, logdir, image_every=0)

    def clips():
        rng = np.random.RandomState(1)
        while True:
            yield {"frames": rng.randn(1, 5, 56, 56, 3).astype(np.float32) * .3}

    # 56px / 32px tiles / 0.25 overlap: exact multi-tile grid on both the
    # pixel (24+32) and latent (3+4) sides
    out = trainer.validate_tiled(state, clips(), step=0, n_clips=1,
                                 tile_spatial_size=32,
                                 tile_overlap_ratio=0.25)
    assert {"val_tiled/psnr_db", "val_tiled/ssim", "val_tiled/l1"} <= set(out)
    assert np.isfinite(out["val_tiled/psnr_db"])


@pytest.mark.slow
def test_fit_writes_image_panels(tmp_path):
    logdir = str(tmp_path / "imgrun")
    engine = make_engine()
    trainer = Trainer(engine, logdir, max_steps=2, ckpt_every=100,
                      image_every=1, log_every=0)
    trainer.fit(data_iter())
    assert glob.glob(os.path.join(logdir, "images", "train_*.png"))


def test_polynomial_schedule_matches_hf_formula():
    from cvvae_tpu.training.optim import get_schedule
    lr0, lr_end, warm, total, power = 1e-4, 1e-7, 10, 100, 1.0
    s = get_schedule("polynomial", lr0, num_warmup_steps=warm,
                     num_training_steps=total)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(5)), lr0 * 0.5, rtol=1e-6)
    for step in (10, 40, 100, 150):
        rem = max(0.0, 1 - (step - warm) / (total - warm))
        want = (lr0 - lr_end) * rem ** power + lr_end if step <= total \
            else lr_end
        np.testing.assert_allclose(float(s(step)), want, rtol=1e-5,
                                   err_msg=str(step))


def test_image_logger_logit_overlays(tmp_path):
    from cvvae_tpu.training.logging import ImageLogger
    il = ImageLogger(str(tmp_path), every=1)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 4, 16, 16, 3).astype(np.float32)
    lg = rng.randn(1, 2, 4, 4, 1).astype(np.float32)
    path = il.log(1, x, x * 0.5, logits_real=lg, logits_fake=-lg)
    import cv2
    img = cv2.imread(path)
    assert img.shape == (6 * 16, 4 * 16, 3)  # 4 std rows + 2 overlay rows


def test_scale_lr_rule():
    """--scale_lr: base_lr *= n_devices * uniform train batch size
    (reference main.py:868-878); heterogeneous batch sizes refuse."""
    import pytest

    from cvvae_tpu.train import apply_lr_scaling

    def cfg(sizes):
        return {
            "model": {"engine": {"params": {"optim": {
                "params": {"base_lr": 2.0e-5}}}}},
            "data": {"train": {"datasets": {
                f"d{i}": {"batch_size": b} for i, b in enumerate(sizes)
            }}},
        }

    c = cfg([8, 8])
    got = apply_lr_scaling(c, n_devices=4)
    assert got == pytest.approx(4 * 8 * 2.0e-5)
    assert (c["model"]["engine"]["params"]["optim"]["params"]["base_lr"]
            == pytest.approx(6.4e-4))
    with pytest.raises(SystemExit):
        apply_lr_scaling(cfg([8, 1]), n_devices=4)
