"""Training engine tests: one G step + one D step run, update the right
parameter sets, and produce finite reference-keyed metrics."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from cvvae_tpu.losses.vae_loss import LossConfig, constraint_targets
from cvvae_tpu.models.discriminator import Disc3DConfig
from cvvae_tpu.models.vae2d import VAE2DConfig
from cvvae_tpu.models.vae_sd3 import VAESD3Config
from cvvae_tpu.training.engine import EngineConfig, TrainingEngine
from cvvae_tpu.training.optim import OptimConfig


def tiny_engine(constraint="latent", **loss_kw):
    net = VAESD3Config(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                       latent_channels=4, norm_num_groups=4)
    cfg = EngineConfig(
        family="sd3", net=net,
        disc=Disc3DConfig(ndf=8, n_layers=2, norm_groups=4),
        loss=LossConfig(perceptual_weight=0.0, time_n_compress=4, **loss_kw),
        optim=OptimConfig(base_lr=1e-3, num_warmup_steps=0,
                          num_training_steps=100),
        constraint=constraint,
        constraint_decoder=VAE2DConfig(
            naming="sd3", latent_channels=4, block_out_channels=(8, 8, 8, 8),
            layers_per_block=1, norm_num_groups=4),
        constraint_encoder=VAE2DConfig(
            naming="sd3", latent_channels=4, block_out_channels=(8, 8, 8, 8),
            layers_per_block=1, norm_num_groups=4),
        remat=False,
    )
    return TrainingEngine(cfg, seed=0)


def leaf_equal(a, b):
    return all(bool(jnp.all(x == y)) for x, y in
               zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


@pytest.mark.parametrize("constraint", ["none", "latent", "encoder", "all"])
def test_gd_alternation(constraint):
    eng = tiny_engine(constraint)
    state = eng.init_state(jax.random.PRNGKey(0))
    batch = {"frames": jax.random.normal(jax.random.PRNGKey(1),
                                         (1, 5, 16, 16, 3)) * 0.5}
    # G step (step 0): generator params move, disc params don't
    s1, m1 = eng.train_step(state, batch, jax.random.PRNGKey(2))
    assert int(s1.step) == 1
    assert not leaf_equal(s1.params["encoder"], state.params["encoder"])
    assert not leaf_equal(s1.params["decoder"], state.params["decoder"])
    assert leaf_equal(s1.disc_params, state.disc_params)
    assert np.isfinite(float(m1["loss/total"]))
    assert float(m1["loss/rec"]) > 0
    assert np.isfinite(float(m1["scalars/d_weight"]))

    # D step (step 1): disc params move, generator params don't
    s2, m2 = eng.train_step(s1, batch, jax.random.PRNGKey(3))
    assert int(s2.step) == 2
    assert leaf_equal(s2.params["encoder"], s1.params["encoder"])
    assert not leaf_equal(s2.disc_params, s1.disc_params)
    assert np.isfinite(float(m2["loss/disc"]))
    assert float(m2["loss/disc"]) > 0


def test_logvar_learned():
    eng = tiny_engine("latent", learn_logvar=True)
    state = eng.init_state(jax.random.PRNGKey(0))
    assert "logvar" in state.params and "logvar_2d" in state.params
    batch = {"frames": jax.random.normal(jax.random.PRNGKey(1),
                                         (1, 5, 16, 16, 3))}
    s1, _ = eng.train_step(state, batch, jax.random.PRNGKey(2))
    assert float(s1.params["logvar"]) != float(state.params["logvar"])


def test_loss_decreases_over_g_steps():
    """Pure-AE sanity: with the GAN gated off, repeated G steps on one
    batch must reduce the reconstruction loss."""
    eng = tiny_engine("none", disc_start=10**9)
    state = eng.init_state(jax.random.PRNGKey(0))
    batch = {"frames": jax.random.normal(jax.random.PRNGKey(1),
                                         (1, 5, 16, 16, 3)) * 0.3}
    first = None
    for i in range(8):
        state, m = eng.train_step(state, batch, jax.random.PRNGKey(i))
        if int(state.step) % 2 == 1:  # was a G step
            if first is None:
                first = float(m["loss/rec"])
            last = float(m["loss/rec"])
    assert last < first


def test_constraint_targets_shapes():
    cfg = LossConfig(time_n_compress=4)
    x = jnp.arange(2 * 9 * 2 * 2 * 3, dtype=jnp.float32).reshape(2, 9, 2, 2, 3)
    for tt in ("slice", "mean", "random"):
        c = LossConfig(time_n_compress=4, target_type=tt)
        out = constraint_targets(c, x, jax.random.PRNGKey(0))
        assert out.shape == (2, 3, 2, 2, 3)
    # slice picks frames 0, 4, 8
    sl = constraint_targets(LossConfig(target_type="slice"), x, None)
    np.testing.assert_array_equal(np.asarray(sl), np.asarray(x[:, ::4]))
    # random picks frame 0 then one per group of four
    rnd = constraint_targets(LossConfig(target_type="random"), x,
                             jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(rnd[:, 0]), np.asarray(x[:, 0]))


def test_schedule_matches_reference_formula():
    import math
    from cvvae_tpu.training.optim import cosine_schedule_with_warmup
    sched = cosine_schedule_with_warmup(1.0, 1000, 60000, min_lr_ratio=0.005)
    # reference formula (lvdm/lr_scheduler.py:161-184)
    def ref(step):
        if step < 1000:
            return step / 1000
        progress = (step - 1000) / (60000 - 1000)
        return max(0.0, 0.5 * ((1 + 0.005) + (1 - 0.005)
                               * math.cos(math.pi * 1.0 * progress)))
    for s in (0, 500, 1000, 5000, 30000, 59999, 60000):
        assert abs(float(sched(s)) - ref(s)) < 1e-6, s


def test_frozen_modules_not_updated():
    """Reference `trainable` freeze modes (autoencoder.py:223-234)."""
    import dataclasses
    eng = tiny_engine("none")
    eng.cfg = dataclasses.replace(eng.cfg, frozen_modules=("encoder",))
    import jax
    eng._jitted_step = jax.jit(eng._train_step)  # re-jit with new cfg
    state = eng.init_state(jax.random.PRNGKey(0))
    batch = {"frames": jax.random.normal(jax.random.PRNGKey(1),
                                         (1, 5, 16, 16, 3))}
    s1, _ = eng.train_step(state, batch, jax.random.PRNGKey(2))
    assert leaf_equal(s1.params["encoder"], state.params["encoder"])
    assert not leaf_equal(s1.params["decoder"], state.params["decoder"])


def test_ema_updates():
    eng = tiny_engine("none")
    import dataclasses, jax
    eng.cfg = dataclasses.replace(eng.cfg, ema_decay=0.99)
    eng._jitted_step = jax.jit(eng._train_step)
    state = eng.init_state(jax.random.PRNGKey(0))
    assert state.ema is not None
    batch = {"frames": jax.random.normal(jax.random.PRNGKey(1),
                                         (1, 5, 16, 16, 3))}
    s1, _ = eng.train_step(state, batch, jax.random.PRNGKey(2))
    assert int(s1.ema.num_updates) == 1
    assert not leaf_equal(s1.ema.shadow, state.ema.shadow)


def test_single_frame_image_batch():
    """The shipped recipe alternates image (T=1) and video batches
    (yaml data: image bs 8 + webvid 17f); T=1 must train."""
    eng = tiny_engine("latent")
    state = eng.init_state(jax.random.PRNGKey(0))
    batch = {"frames": jax.random.normal(jax.random.PRNGKey(1),
                                         (2, 1, 16, 16, 3))}
    s1, m1 = eng.train_step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m1["loss/total"]))
    s2, m2 = eng.train_step(s1, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(m2["loss/disc"]))


def test_bf16_compute_mode():
    """compute_dtype='bfloat16': params/opt state stay fp32, a G+D pair
    runs finite, and the G loss tracks the fp32 engine loosely (same
    seed/weights; bf16 rounding only)."""
    net = VAESD3Config(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                       latent_channels=4, norm_num_groups=4)

    def build(compute):
        cfg = EngineConfig(
            family="sd3", net=net,
            disc=Disc3DConfig(ndf=8, n_layers=2, norm_groups=4),
            loss=LossConfig(perceptual_weight=0.0, disc_start=0),
            optim=OptimConfig(base_lr=1e-3, num_warmup_steps=0,
                              num_training_steps=100),
            constraint="latent",
            constraint_decoder=VAE2DConfig(
                naming="sd3", latent_channels=4,
                block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                norm_num_groups=4),
            remat=False, compute_dtype=compute)
        return TrainingEngine(cfg, seed=0)

    batch = {"frames": jax.random.normal(
        jax.random.PRNGKey(1), (1, 5, 32, 32, 3)) * 0.5}
    rng = jax.random.PRNGKey(2)

    e32, e16 = build("float32"), build("bfloat16")
    s32 = e32.init_state(jax.random.PRNGKey(0))
    s16 = e16.init_state(jax.random.PRNGKey(0))

    s16_g, m16 = e16.train_step(s16, batch, rng)
    _, m32 = e32.train_step(s32, batch, rng)
    for k, v in m16.items():
        assert np.isfinite(float(v)), k
    # fp32 leaves preserved through the bf16 step
    for leaf in jax.tree_util.tree_leaves(s16_g.params):
        assert leaf.dtype in (jnp.float32,), leaf.dtype
    rel = abs(float(m16["loss/rec"]) - float(m32["loss/rec"])) / (
        abs(float(m32["loss/rec"])) + 1e-9)
    assert rel < 0.1, (float(m16["loss/rec"]), float(m32["loss/rec"]))
    # D step runs too
    s16_d, md = e16.train_step(s16_g, batch, rng)
    assert np.isfinite(float(md["loss/disc"]))


def test_lr_schedule_global_step_basis():
    """The applied LR is the schedule evaluated at the GLOBAL step for
    both optimizers — the reference steps both schedulers every batch
    (lvdm/models/autoencoder.py:376-378), so after N interleaved G/D
    steps each optimizer's LR must match the reference formula at the
    global step, not at its own (half-rate) update count."""
    from cvvae_tpu.training.optim import applied_learning_rate

    eng = tiny_engine("none", disc_start=0)
    # non-trivial warm-up so the LR changes every global step
    import dataclasses
    eng.cfg = dataclasses.replace(
        eng.cfg, optim=OptimConfig(base_lr=1e-3, num_warmup_steps=10,
                                   num_training_steps=100))
    from cvvae_tpu.training.optim import make_optimizer, make_schedule
    eng.opt_g = make_optimizer(eng.cfg.optim)
    eng.opt_d = make_optimizer(eng.cfg.optim)
    eng.lr_schedule_g = make_schedule(eng.cfg.optim,
                                      eng.cfg.optim.lr_g_factor)
    eng.lr_schedule_d = make_schedule(eng.cfg.optim, 1.0)
    eng._jitted_step = jax.jit(eng._train_step)

    state = eng.init_state(jax.random.PRNGKey(0))
    batch = {"frames": jax.random.normal(jax.random.PRNGKey(1),
                                         (1, 5, 16, 16, 3)) * 0.5}
    for i in range(6):
        gstep = int(state.step)
        state, _ = eng.train_step(state, batch, jax.random.PRNGKey(10 + i))
        if gstep % 2 == 0:  # G update at global step `gstep`
            applied = float(applied_learning_rate(state.opt_g))
            expect = float(eng.lr_schedule_g(gstep))
        else:               # D update
            applied = float(applied_learning_rate(state.opt_d))
            expect = float(eng.lr_schedule_d(gstep))
        assert applied == pytest.approx(expect, rel=1e-6), (gstep, applied)
        # reference formula: linear warm-up lr = base * factor * step/warm
        factor = eng.cfg.optim.lr_g_factor if gstep % 2 == 0 else 1.0
        assert applied == pytest.approx(1e-3 * factor * gstep / 10, rel=1e-5)


def test_disc_warmup_forces_g_updates():
    """While global_step < disc_start every batch is a G update and the
    disc params are BIT-frozen (autoencoder.py:362-363 forces
    optimizer_idx=0; zeroing only the D loss would still apply AdamW
    weight decay to the disc every other step)."""
    eng = tiny_engine("none", disc_start=4)
    state = eng.init_state(jax.random.PRNGKey(0))
    disc0 = state.disc_params
    batch = {"frames": jax.random.normal(jax.random.PRNGKey(1),
                                         (1, 5, 16, 16, 3)) * 0.5}
    # steps 0..4 are all G updates (0-3 forced by warm-up, 4 by parity)
    for i in range(5):
        prev = state
        state, m = eng.train_step(state, batch, jax.random.PRNGKey(20 + i))
        assert not leaf_equal(state.params["decoder"],
                              prev.params["decoder"]), i
        assert leaf_equal(state.disc_params, disc0), i
        assert float(m["loss/disc"]) == 0.0
    assert int(state.step) == 5
    # step 5: first D update — disc params finally move
    state, m = eng.train_step(state, batch, jax.random.PRNGKey(30))
    assert not leaf_equal(state.disc_params, disc0)
    assert float(m["loss/disc"]) > 0.0
