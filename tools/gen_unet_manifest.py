"""Generate tests/data/unet_sd21_keys.json — the SD 2.1 UNet state-dict
key manifest that pins utils/convert.py::convert_unet_state_dict against
genuine diffusers checkpoint names (VERDICT r4 item 7; the CLIP pattern,
tests/data/clip_sd21_keys.json).

diffusers is NOT installed in this environment, so unlike the CLIP
manifest (generated from the real transformers module on a meta device)
this one is constructed from the published ``UNet2DConditionModel``
architecture rules for the stabilityai/stable-diffusion-2-1 ``unet``
config, each rule stated below at its use site:

config (stable-diffusion-2-1/unet/config.json):
  in_channels 4, out_channels 4, block_out_channels [320,640,1280,1280],
  layers_per_block 2, cross_attention_dim 1024,
  down_block_types [CrossAttnDownBlock2D x3, DownBlock2D],
  up_block_types  [UpBlock2D, CrossAttnUpBlock2D x3],
  use_linear_projection true, norm_num_groups 32,
  attention_head_dim [5,10,20,20]  (per-block head COUNTS in SD configs;
  the per-head dim is uniformly 64 — shapes don't depend on it).

Naming rules (diffusers >= 0.6, unchanged through 0.3x; torch
conventions: Linear.weight is (out,in), ConvNd.weight (out,in,*k)):

* top level: conv_in, time_embedding.linear_{1,2}, conv_norm_out,
  conv_out.
* ResnetBlock2D: norm1, conv1, time_emb_proj, norm2, conv2
  [+ conv_shortcut 1x1 iff in_ch != out_ch].
* Transformer2DModel (use_linear_projection): norm (GroupNorm),
  proj_in/proj_out as Linear, transformer_blocks.0 with
  norm1/attn1 (self), norm2/attn2 (cross, kv from context),
  norm3/ff.net.0.proj (GEGLU, 8*dim)/ff.net.2; attn to_q/to_k/to_v are
  bias-free Linears, to_out.0 has bias.
* Down block i: resnets.{0..layers_per_block-1}; CrossAttn variants add
  attentions.{j} after each resnet; all but the last block end with
  downsamplers.0.conv (stride-2 3x3).
* Mid block: resnets.0, attentions.0, resnets.1.
* Up block i: layers_per_block+1 resnets whose input concatenates the
  skip: resnet_in = (prev_output if j==0 else out_ch) + res_skip where
  res_skip = (input_ch if j is the last else out_ch), with
  prev_output/output/input channel walking
  reversed(block_out_channels) exactly as UNet2DConditionModel.__init__
  does; CrossAttn variants add attentions.{j}; all but the last block
  end with upsamplers.0.conv.

The companion test (tests/test_unet.py::test_unet_sd21_key_manifest)
converts the full manifest and asserts the resulting tree is exactly the
params tree apply_unet reads — structure and shapes.
"""

import json
import os

TEMB = 1280                       # time_embed_dim = 4 * block_out[0]
CTX = 1024
CH = [320, 640, 1280, 1280]
LAYERS = 2
CFG = {
    "in_channels": 4, "out_channels": 4,
    "block_out_channels": CH, "layers_per_block": LAYERS,
    "cross_attention_dim": CTX, "attention_head_dim": 64,
    "norm_num_groups": 32,
}


def resnet(prefix, c_in, c_out):
    keys = {
        f"{prefix}.norm1.weight": [c_in], f"{prefix}.norm1.bias": [c_in],
        f"{prefix}.conv1.weight": [c_out, c_in, 3, 3],
        f"{prefix}.conv1.bias": [c_out],
        f"{prefix}.time_emb_proj.weight": [c_out, TEMB],
        f"{prefix}.time_emb_proj.bias": [c_out],
        f"{prefix}.norm2.weight": [c_out], f"{prefix}.norm2.bias": [c_out],
        f"{prefix}.conv2.weight": [c_out, c_out, 3, 3],
        f"{prefix}.conv2.bias": [c_out],
    }
    if c_in != c_out:
        keys[f"{prefix}.conv_shortcut.weight"] = [c_out, c_in, 1, 1]
        keys[f"{prefix}.conv_shortcut.bias"] = [c_out]
    return keys


def transformer(prefix, c):
    b = f"{prefix}.transformer_blocks.0"
    keys = {
        f"{prefix}.norm.weight": [c], f"{prefix}.norm.bias": [c],
        f"{prefix}.proj_in.weight": [c, c], f"{prefix}.proj_in.bias": [c],
        f"{b}.norm1.weight": [c], f"{b}.norm1.bias": [c],
        f"{b}.attn1.to_q.weight": [c, c],
        f"{b}.attn1.to_k.weight": [c, c],
        f"{b}.attn1.to_v.weight": [c, c],
        f"{b}.attn1.to_out.0.weight": [c, c],
        f"{b}.attn1.to_out.0.bias": [c],
        f"{b}.norm2.weight": [c], f"{b}.norm2.bias": [c],
        f"{b}.attn2.to_q.weight": [c, c],
        f"{b}.attn2.to_k.weight": [c, CTX],
        f"{b}.attn2.to_v.weight": [c, CTX],
        f"{b}.attn2.to_out.0.weight": [c, c],
        f"{b}.attn2.to_out.0.bias": [c],
        f"{b}.norm3.weight": [c], f"{b}.norm3.bias": [c],
        f"{b}.ff.net.0.proj.weight": [8 * c, c],
        f"{b}.ff.net.0.proj.bias": [8 * c],
        f"{b}.ff.net.2.weight": [c, 4 * c],
        f"{b}.ff.net.2.bias": [c],
        f"{prefix}.proj_out.weight": [c, c],
        f"{prefix}.proj_out.bias": [c],
    }
    return keys


def build():
    keys = {
        "conv_in.weight": [CH[0], CFG["in_channels"], 3, 3],
        "conv_in.bias": [CH[0]],
        "time_embedding.linear_1.weight": [TEMB, CH[0]],
        "time_embedding.linear_1.bias": [TEMB],
        "time_embedding.linear_2.weight": [TEMB, TEMB],
        "time_embedding.linear_2.bias": [TEMB],
        "conv_norm_out.weight": [CH[0]], "conv_norm_out.bias": [CH[0]],
        "conv_out.weight": [CFG["out_channels"], CH[0], 3, 3],
        "conv_out.bias": [CFG["out_channels"]],
    }
    n = len(CH)
    # down blocks: CrossAttn for all but the last (down_block_types)
    out_ch = CH[0]
    for i in range(n):
        in_ch, out_ch = out_ch, CH[i]
        for j in range(LAYERS):
            keys.update(resnet(f"down_blocks.{i}.resnets.{j}",
                               in_ch if j == 0 else out_ch, out_ch))
            if i < n - 1:
                keys.update(transformer(
                    f"down_blocks.{i}.attentions.{j}", out_ch))
        if i < n - 1:
            keys[f"down_blocks.{i}.downsamplers.0.conv.weight"] = \
                [out_ch, out_ch, 3, 3]
            keys[f"down_blocks.{i}.downsamplers.0.conv.bias"] = [out_ch]
    # mid
    keys.update(resnet("mid_block.resnets.0", CH[-1], CH[-1]))
    keys.update(transformer("mid_block.attentions.0", CH[-1]))
    keys.update(resnet("mid_block.resnets.1", CH[-1], CH[-1]))
    # up blocks: the channel walk of UNet2DConditionModel.__init__
    rev = list(reversed(CH))
    prev_out = rev[0]
    for i in range(n):
        out_ch = rev[i]
        input_ch = rev[min(i + 1, n - 1)]
        for j in range(LAYERS + 1):
            res_skip = input_ch if j == LAYERS else out_ch
            res_in = (prev_out if j == 0 else out_ch) + res_skip
            keys.update(resnet(f"up_blocks.{i}.resnets.{j}",
                               res_in, out_ch))
            if i > 0:           # up_block_types: UpBlock2D first
                keys.update(transformer(
                    f"up_blocks.{i}.attentions.{j}", out_ch))
        if i < n - 1:
            keys[f"up_blocks.{i}.upsamplers.0.conv.weight"] = \
                [out_ch, out_ch, 3, 3]
            keys[f"up_blocks.{i}.upsamplers.0.conv.bias"] = [out_ch]
        prev_out = out_ch
    return keys


def main():
    keys = build()
    n_params = sum(int(__import__("numpy").prod(s)) for s in keys.values())
    out = {
        "comment": "state-dict key manifest of the SD 2.1 UNet "
                   "(diffusers UNet2DConditionModel, "
                   "stabilityai/stable-diffusion-2-1 unet config), "
                   "constructed from the published diffusers naming "
                   "rules (tools/gen_unet_manifest.py — diffusers is "
                   "not installed in this environment) - pins "
                   "convert_unet_state_dict against genuine checkpoint "
                   "names",
        "config": CFG,
        "n_params": n_params,
        "keys": {k: keys[k] for k in sorted(keys)},
    }
    path = os.path.join(os.path.dirname(__file__), os.pardir,
                        "tests", "data", "unet_sd21_keys.json")
    with open(os.path.abspath(path), "w") as f:
        json.dump(out, f, indent=1)
    print(f"{len(keys)} keys, {n_params/1e6:.1f}M params -> {path}")


if __name__ == "__main__":
    main()
