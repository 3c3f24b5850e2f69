#!/usr/bin/env python
"""Convert pretrained LPIPS weights into the blob cvvae_tpu trains with.

The reference optimises against a *pretrained* LPIPS metric: torchvision
VGG16 features + learned 1x1 "lin" heads downloaded and md5-checked at
first use (lvdm/modules/autoencoding/lpips/util.py:1-43, loss/lpips.py:
12-46).  This environment has no network, so the two artifacts must be
supplied offline:

  1. torchvision VGG16 ImageNet weights — ``vgg16-397923af.pth`` from
     https://download.pytorch.org/models/vgg16-397923af.pth
     (keys ``features.0.weight`` ...; a bare ``features`` state dict
     with keys ``0.weight`` ... also works)
  2. the LPIPS lin-head checkpoint — ``vgg.pth`` from the reference's
     URL_MAP["vgg_lpips"] (heibox link, lpips/util.py:9), expected md5
     d507d7349b931f0638a25a48a722f98a (keys ``lin{k}.model.1.weight``)

Usage:
    python tools/convert_lpips.py --vgg16 vgg16-397923af.pth \
        --lpips vgg.pth --out lpips_blob.pth

The output is ``torch.save({"vgg": <features state dict>, "lins":
<lin-head state dict>})`` — exactly what ``train.py``'s
``model.frozen_ckpts.lpips`` consumes (cvvae_tpu/train.py:42-46 ->
models/lpips.py:load_lpips_params).  Conversion to JAX arrays happens at
load time; this tool only normalises the torch-side key layout, so the
blob stays portable.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

# Keep the documented `python tools/convert_lpips.py ...` invocation
# working from any cwd (sys.path[0] is tools/, not the repo root).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LIN_KEYS = [f"lin{k}.model.1.weight" for k in range(5)]
LPIPS_CHANNELS = (64, 128, 256, 512, 512)
# torchvision vgg16().features conv layer indices
VGG_CONV_INDICES = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
REFERENCE_LPIPS_MD5 = "d507d7349b931f0638a25a48a722f98a"  # lpips/util.py:13


def extract_vgg_features(state: dict) -> dict:
    """Normalise a torchvision VGG16 checkpoint to the bare ``features``
    layout load_lpips_params expects (keys '0.weight' ...)."""
    if "features.0.weight" in state:
        state = {k[len("features."):]: v for k, v in state.items()
                 if k.startswith("features.")}
    missing = [f"{i}.{p}" for i in VGG_CONV_INDICES
               for p in ("weight", "bias") if f"{i}.{p}" not in state]
    if missing:
        raise SystemExit(f"VGG16 checkpoint is missing conv keys {missing}: "
                         "expected torchvision vgg16 weights")
    out = {}
    for i in VGG_CONV_INDICES:
        w = state[f"{i}.weight"]
        if tuple(w.shape[2:]) != (3, 3):
            raise SystemExit(f"features.{i}.weight has shape {tuple(w.shape)}"
                             " — not a VGG16 3x3 conv")
        out[f"{i}.weight"] = w
        out[f"{i}.bias"] = state[f"{i}.bias"]
    return out


def extract_lin_heads(state: dict) -> dict:
    """Pull the five 1x1 lin-head weights out of the reference's
    ``vgg.pth`` (extra keys like scaling_layer buffers are dropped —
    the shift/scale constants are baked into models/lpips.py)."""
    missing = [k for k in LIN_KEYS if k not in state]
    if missing:
        raise SystemExit(f"lin-head checkpoint is missing {missing}: "
                         "expected the reference's vgg.pth (URL_MAP"
                         "['vgg_lpips'], lpips/util.py:9)")
    out = {}
    for k, c in zip(LIN_KEYS, LPIPS_CHANNELS):
        w = state[k]
        if tuple(w.shape) != (1, c, 1, 1):
            raise SystemExit(f"{k} has shape {tuple(w.shape)}, "
                             f"expected (1, {c}, 1, 1)")
        out[k] = w
    return out


def convert(vgg16_path: str, lpips_path: str, out_path: str,
            check_md5: bool = True) -> dict:
    import torch

    if check_md5:
        with open(lpips_path, "rb") as f:
            md5 = hashlib.md5(f.read()).hexdigest()
        if md5 != REFERENCE_LPIPS_MD5:
            print(f"[convert_lpips] WARNING: {lpips_path} md5 {md5} != "
                  f"reference {REFERENCE_LPIPS_MD5} — converting anyway",
                  file=sys.stderr)
    vgg_raw = torch.load(vgg16_path, map_location="cpu", weights_only=True)
    lin_raw = torch.load(lpips_path, map_location="cpu", weights_only=True)
    blob = {"vgg": extract_vgg_features(dict(vgg_raw)),
            "lins": extract_lin_heads(dict(lin_raw))}
    torch.save(blob, out_path)
    n = sum(v.numel() for d in blob.values() for v in d.values())
    print(f"[convert_lpips] wrote {out_path}: {len(blob['vgg'])//2} VGG "
          f"convs + {len(blob['lins'])} lin heads, {n:,} parameters")
    return blob


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--vgg16", required=True,
                   help="torchvision vgg16-397923af.pth (or features-only "
                        "state dict)")
    p.add_argument("--lpips", required=True,
                   help="reference vgg.pth lin-head checkpoint")
    p.add_argument("--out", required=True, help="output blob path")
    p.add_argument("--no-md5-check", action="store_true")
    args = p.parse_args(argv)
    blob = convert(args.vgg16, args.lpips, args.out,
                   check_md5=not args.no_md5_check)
    # load-path smoke check: the blob must round-trip through the same
    # loader train.py uses
    from cvvae_tpu.models.lpips import load_lpips_params
    params = load_lpips_params(blob["vgg"], blob["lins"])
    assert len(params["vgg"]) == 13 and len(params["lins"]) == 5
    print("[convert_lpips] blob verified against "
          "models.lpips.load_lpips_params")


if __name__ == "__main__":
    main()
