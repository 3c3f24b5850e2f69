"""Training entry point.

TPU-native analogue of ``torchrun ... main.py --base <yaml> --train``
(main.py:503-958, configs/run_training.sh:18-26):

    python -m cvvae_tpu.train --base configs/sd3_latent_constraint.yaml \
        --train [--logdir runs/exp] [--resume] [key.path=value ...]

The YAML schema mirrors the reference's (model/data/lightning sections);
objects are dotted-target configs instantiated by
cvvae_tpu.utils.config.instantiate_from_config.
"""

from __future__ import annotations

import argparse
import dataclasses
import datetime
import os
from typing import Dict, Iterator

import jax


def build_engine(model_cfg: Dict):
    from cvvae_tpu.utils.config import instantiate_from_config
    from cvvae_tpu.training.engine import EngineConfig, TrainingEngine

    engine_cfg = instantiate_from_config(model_cfg["engine"])
    assert isinstance(engine_cfg, EngineConfig)
    if "donate_state" not in model_cfg.get("engine", {}).get("params", {}):
        # real runs consume the state linearly — donate by default for
        # the HBM headroom (tests construct EngineConfig directly).
        # This overrides EngineConfig's documented False default, so say
        # so: a donated pre-step TrainState must not be read after
        # train_step (set engine.params.donate_state: false to inspect).
        engine_cfg = dataclasses.replace(engine_cfg, donate_state=True)
        print("[train] donate_state not set in config -> enabling state "
              "donation (pre-step TrainState unreadable after train_step)")
    kwargs = {}
    ckpt = model_cfg.get("ckpt_path")
    frozen = model_cfg.get("frozen_ckpts", {})
    # Pretrained LPIPS must be loaded BEFORE the engine is built: with
    # perceptual_weight > 0 and no weights, the engine refuses to start
    # (random-init LPIPS is a meaningless training target) unless the
    # config explicitly opts in with allow_random_lpips: true.
    if frozen.get("lpips"):
        import torch
        from cvvae_tpu.models.lpips import load_lpips_params
        blob = torch.load(frozen["lpips"], map_location="cpu")
        kwargs["lpips_params"] = load_lpips_params(blob["vgg"], blob["lins"])
    if model_cfg.get("allow_random_lpips"):
        kwargs["allow_random_lpips"] = True
    engine = TrainingEngine(engine_cfg, seed=model_cfg.get("seed", 0), **kwargs)
    for name in ("constraint_decoder", "constraint_encoder"):
        if frozen.get(name):
            from cvvae_tpu.utils.convert import load_torch_checkpoint_file
            tree, _ = load_torch_checkpoint_file(
                frozen[name], prefixes=("decoder", "encoder"))
            engine.frozen[name] = tree.get("decoder") or tree.get("encoder")
    return engine, ckpt


def apply_lr_scaling(cfg: Dict, n_devices: int) -> float:
    """--scale_lr: base_lr *= n_devices * train batch size (the linear
    scaling rule, reference main.py:868-878 — there ngpu * batch_size *
    accumulate_grad_batches; grad accumulation has no analogue here, and
    the reference's own shipped config leaves the dataloader batch_size
    null so the rule is CLI-only there too).  The reference reads ONE
    dataloader batch size; with per-dataset batching the rule is only
    well-defined when the train datasets agree — otherwise set
    model.engine.params.optim.params.base_lr explicitly."""
    sizes = {ds.get("batch_size", 1)
             for ds in cfg["data"]["train"]["datasets"].values()}
    if len(sizes) != 1:
        raise SystemExit(
            f"--scale_lr needs a uniform train batch_size across "
            f"datasets, got {sorted(sizes)}; set "
            f"model.engine.params.optim.params.base_lr directly instead")
    optim = cfg["model"]["engine"]["params"]["optim"]["params"]
    base = float(optim["base_lr"])
    optim["base_lr"] = n_devices * sizes.pop() * base
    print(f"[train] --scale_lr: base_lr {base:.2e} -> "
          f"{optim['base_lr']:.2e} ({n_devices} devices)")
    return optim["base_lr"]


def build_data(data_cfg: Dict, *, shard_id: int = 0,
               num_shards: int = 1) -> Iterator:
    from cvvae_tpu.data import pipeline as pl
    from cvvae_tpu.utils.config import get_obj_from_str

    datasets = {}
    weights = {}
    for name, ds in data_cfg["datasets"].items():
        kind = ds.get("kind", "webdataset")
        decoder = None
        if "decoder" in ds:
            factory = get_obj_from_str(ds["decoder"]["target"])
            decoder = factory(**(ds["decoder"].get("params") or {}))
        common = dict(
            urls_or_dir=ds["urls_or_dir"],
            file_mask=ds.get("file_mask", "*.tar" if kind == "webdataset"
                             else "*.csv"),
            repeat=ds.get("repeat"), decoder=decoder,
            select_keys=ds.get("select_keys", ("frames",)),
            batch_size=ds.get("batch_size", 1),
            num_workers=ds.get("num_workers", 4),
            prefetch=ds.get("prefetch", 2),
            seed=ds.get("seed", 0), shard_id=shard_id, num_shards=num_shards)
        if kind == "webdataset":
            datasets[name] = pl.build_webdataset_pipeline(
                shardshuffle=ds.get("shardshuffle", 0),
                sample_shuffle=ds.get("sample_shuffle", 0), **common)
        else:
            datasets[name] = pl.build_metadata_pipeline(
                sample_shuffle=ds.get("sample_shuffle", 0), **common)
        weights[name] = ds.get("weight", 1.0)
    if len(datasets) == 1:
        return next(iter(datasets.values()))
    return pl.build_multi_dataset(datasets, weights,
                                  seed=data_cfg.get("seed", 58),
                                  shard_id=shard_id)


def main(argv=None):
    from cvvae_tpu.utils.profiling import enable_compilation_cache
    enable_compilation_cache()

    from cvvae_tpu.parallel.mesh import make_mesh, multihost_init
    from cvvae_tpu.training.trainer import Trainer
    from cvvae_tpu.utils.config import load_configs, save_config

    p = argparse.ArgumentParser()
    p.add_argument("--base", nargs="+", required=True)
    p.add_argument("--train", action="store_true")
    p.add_argument("--logdir", default=None)
    p.add_argument("--name", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--scale_lr", action="store_true",
                   help="scale base_lr by n_devices * train batch size "
                        "(the reference's linear LR scaling rule, "
                        "main.py:868-878; off by default there too)")
    args, unknown = p.parse_known_args(argv)

    multihost_init()
    cfg = load_configs(args.base, [u for u in unknown if "=" in u])
    if args.scale_lr:
        apply_lr_scaling(cfg, jax.device_count())

    if args.logdir is None:
        now = datetime.datetime.now().strftime("%Y-%m-%dT%H-%M-%S")
        name = args.name or os.path.splitext(os.path.basename(args.base[0]))[0]
        args.logdir = os.path.join("logs", f"{now}_{name}")
    os.makedirs(args.logdir, exist_ok=True)
    save_config(cfg, os.path.join(args.logdir, "config.yaml"))

    engine, warm_ckpt = build_engine(cfg["model"])
    shard_id = jax.process_index()
    data = build_data(cfg["data"]["train"], shard_id=shard_id,
                      num_shards=jax.process_count())
    val_data = None
    if "val" in cfg.get("data", {}):
        val_data = build_data(cfg["data"]["val"], shard_id=shard_id,
                              num_shards=jax.process_count())

    mesh = make_mesh() if len(jax.devices()) > 1 else None
    tcfg = cfg.get("trainer", {})
    trainer = Trainer(
        engine, args.logdir, mesh=mesh,
        max_steps=args.max_steps or tcfg.get("max_steps", 200_000),
        ckpt_every=tcfg.get("ckpt_every", 2000),
        permanent_every=tcfg.get("permanent_every", 10_000),
        image_every=tcfg.get("image_every", 250),
        val_every=tcfg.get("val_every"))

    state = None
    if warm_ckpt:
        from cvvae_tpu.utils.convert import load_torch_checkpoint_file
        state = engine.init_state(jax.random.PRNGKey(0))
        tree, skipped = load_torch_checkpoint_file(warm_ckpt)
        params = dict(state.params)
        params.update({k: v for k, v in tree.items() if k in params})
        state = state._replace(params=params)
        print(f"[train] warm-started from {warm_ckpt} "
              f"({len(skipped)} keys skipped)")

    if args.train:
        trainer.fit(data, state=state, resume=args.resume, val_data=val_data)


if __name__ == "__main__":
    main()
