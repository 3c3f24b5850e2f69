"""Minimal torch UNet2DConditionModel matching diffusers' SD 2.x
architecture and state-dict names (use_linear_projection=True).

diffusers is not installed in this image, so golden tests re-implement
the semantics the same way stubs.py does for xformers — module names
match diffusers exactly, so utils/convert.convert_unet_state_dict maps
real SD checkpoints identically.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t, dim):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0)
                      * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class ResnetBlock2D(nn.Module):
    def __init__(self, c_in, c_out, temb, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, c_in, eps=1e-5)
        self.conv1 = nn.Conv2d(c_in, c_out, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb, c_out)
        self.norm2 = nn.GroupNorm(groups, c_out, eps=1e-5)
        self.conv2 = nn.Conv2d(c_out, c_out, 3, padding=1)
        self.conv_shortcut = (nn.Conv2d(c_in, c_out, 1)
                              if c_in != c_out else None)

    def forward(self, x, emb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(emb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class Attention(nn.Module):
    def __init__(self, dim, ctx_dim, head_dim):
        super().__init__()
        self.heads = dim // head_dim
        self.head_dim = head_dim
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(ctx_dim, dim, bias=False)
        self.to_v = nn.Linear(ctx_dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim), nn.Identity()])

    def forward(self, x, ctx):
        b, s, c = x.shape
        q = self.to_q(x).view(b, s, self.heads, self.head_dim).transpose(1, 2)
        k = self.to_k(ctx).view(b, -1, self.heads,
                                self.head_dim).transpose(1, 2)
        v = self.to_v(ctx).view(b, -1, self.heads,
                                self.head_dim).transpose(1, 2)
        attn = torch.softmax(q.float() @ k.float().transpose(-1, -2)
                             / math.sqrt(self.head_dim), dim=-1)
        o = (attn @ v.float()).to(x.dtype)
        o = o.transpose(1, 2).reshape(b, s, c)
        return self.to_out[0](o)


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, ctx_dim, head_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, dim, head_dim)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, ctx_dim, head_dim)
        self.norm3 = nn.LayerNorm(dim)
        # GEGLU feed-forward, diffusers names ff.net.0.proj / ff.net.2
        self.ff = nn.Module()
        self.ff.net = nn.ModuleList([
            nn.Module(), nn.Identity(), nn.Linear(4 * dim, dim)])
        self.ff.net[0].proj = nn.Linear(dim, 8 * dim)

    def forward(self, x, ctx):
        h = self.norm1(x)
        x = x + self.attn1(h, h)
        x = x + self.attn2(self.norm2(x), ctx)
        z = self.ff.net[0].proj(self.norm3(x))
        z, gate = z.chunk(2, dim=-1)
        return x + self.ff.net[2](z * F.gelu(gate))


class Transformer2DModel(nn.Module):
    def __init__(self, dim, ctx_dim, head_dim, groups):
        super().__init__()
        self.norm = nn.GroupNorm(groups, dim, eps=1e-6)
        self.proj_in = nn.Linear(dim, dim)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(dim, ctx_dim, head_dim)])
        self.proj_out = nn.Linear(dim, dim)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        y = self.norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        y = self.proj_in(y)
        for blk in self.transformer_blocks:
            y = blk(y, ctx)
        y = self.proj_out(y)
        return res + y.reshape(b, h, w, c).permute(0, 3, 1, 2)


class UNet2DConditionModel(nn.Module):
    """SD 2.x layout parameterized like cvvae_tpu.models.unet2d."""

    def __init__(self, in_channels=4, out_channels=4,
                 block_out_channels=(32, 64), layers_per_block=1,
                 cross_attention_dim=32, attention_head_dim=8,
                 norm_num_groups=8):
        super().__init__()
        chs = block_out_channels
        temb = chs[0] * 4
        n = len(chs)
        attn_flags = [i < n - 1 for i in range(n)]
        self.attn_flags = attn_flags
        self.conv_in = nn.Conv2d(in_channels, chs[0], 3, padding=1)
        self.time_embedding = nn.Module()
        self.time_embedding.linear_1 = nn.Linear(chs[0], temb)
        self.time_embedding.linear_2 = nn.Linear(temb, temb)

        def attn(dim):
            return Transformer2DModel(dim, cross_attention_dim,
                                      attention_head_dim, norm_num_groups)

        self.down_blocks = nn.ModuleList()
        c_prev = chs[0]
        for i, c in enumerate(chs):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            blk.attentions = nn.ModuleList()
            for j in range(layers_per_block):
                blk.resnets.append(ResnetBlock2D(
                    c_prev if j == 0 else c, c, temb, norm_num_groups))
                if attn_flags[i]:
                    blk.attentions.append(attn(c))
            if i != n - 1:
                blk.downsamplers = nn.ModuleList(
                    [nn.Module()])
                blk.downsamplers[0].conv = nn.Conv2d(c, c, 3, stride=2,
                                                     padding=1)
            c_prev = c
            self.down_blocks.append(blk)

        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList([
            ResnetBlock2D(chs[-1], chs[-1], temb, norm_num_groups),
            ResnetBlock2D(chs[-1], chs[-1], temb, norm_num_groups)])
        self.mid_block.attentions = nn.ModuleList([attn(chs[-1])])

        self.up_blocks = nn.ModuleList()
        rev = list(reversed(chs))
        for i, c in enumerate(rev):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            blk.attentions = nn.ModuleList()
            c_skip_next = rev[min(i + 1, n - 1)]
            for j in range(layers_per_block + 1):
                c_res_skip = c if j < layers_per_block else c_skip_next
                c_in_res = (rev[max(i - 1, 0)] if j == 0 else c) + c_res_skip
                blk.resnets.append(ResnetBlock2D(c_in_res, c, temb,
                                                 norm_num_groups))
                if attn_flags[n - 1 - i]:
                    blk.attentions.append(attn(c))
            if i != n - 1:
                blk.upsamplers = nn.ModuleList([nn.Module()])
                blk.upsamplers[0].conv = nn.Conv2d(c, c, 3, padding=1)
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(norm_num_groups, chs[0], eps=1e-5)
        self.conv_out = nn.Conv2d(chs[0], out_channels, 3, padding=1)

    def forward(self, x, t, context):
        if t.dim() == 0:
            t = t.expand(x.shape[0])
        emb = timestep_embedding(t, self.conv_in.out_channels)
        emb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(emb)))

        h = self.conv_in(x)
        skips = [h]
        n = len(self.down_blocks)
        for i, blk in enumerate(self.down_blocks):
            for j, res in enumerate(blk.resnets):
                h = res(h, emb)
                if self.attn_flags[i]:
                    h = blk.attentions[j](h, context)
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(h)
                skips.append(h)

        h = self.mid_block.resnets[0](h, emb)
        h = self.mid_block.attentions[0](h, context)
        h = self.mid_block.resnets[1](h, emb)

        for i, blk in enumerate(self.up_blocks):
            for j, res in enumerate(blk.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = res(h, emb)
                if self.attn_flags[n - 1 - i]:
                    h = blk.attentions[j](h, context)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = blk.upsamplers[0].conv(h)

        return self.conv_out(F.silu(self.conv_norm_out(h)))
