"""Minimal PyTorch UNet oracle following diffusers' architecture conventions.

An independent reimplementation (in torch, NCHW, diffusers state_dict naming)
of the tiny UNet config, used to cross-validate the Flax model AND the
safetensors->Flax key mapping end to end: random torch weights load through
the production loader and must produce identical outputs.

This is an oracle for *conventions* (normalization semantics, resnet/time
-embedding order, token reshape order, GEGLU split, attention scaling,
skip-connection stacking, upsample placement) — diffusers itself is not
installable offline.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t: torch.Tensor, dim: int) -> torch.Tensor:
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    )
    args = t.float()[:, None] * freqs[None]
    # flip_sin_to_cos=True -> [cos, sin]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim, dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


class ResnetBlock(nn.Module):
    def __init__(self, in_ch, out_ch, temb_dim):
        super().__init__()
        self.norm1 = nn.GroupNorm(32 if in_ch % 32 == 0 and in_ch >= 32 else min(32, in_ch), in_ch, eps=1e-5)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_dim, out_ch)
        self.norm2 = nn.GroupNorm(min(32, out_ch), out_ch, eps=1e-5)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (
            nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None
        )

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class Attn(nn.Module):
    def __init__(self, dim, heads, ctx_dim=None):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(ctx_dim or dim, dim, bias=False)
        self.to_v = nn.Linear(ctx_dim or dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def forward(self, x, ctx=None):
        src = ctx if ctx is not None else x
        q, k, v = self.to_q(x), self.to_k(src), self.to_v(src)
        b, n, c = q.shape
        h = self.heads
        d = c // h

        def split(t):
            return t.reshape(b, -1, h, d).permute(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        s = (q @ k.transpose(-1, -2)) / math.sqrt(d)
        p = s.softmax(-1)
        out = (p @ v).permute(0, 2, 1, 3).reshape(b, n, c)
        return self.to_out[0](out)


class FeedForward(nn.Module):
    def __init__(self, dim):
        super().__init__()
        # diffusers GEGLU: net.0.proj (dim -> 8*dim), net.2 (4*dim -> dim)
        self.net = nn.ModuleList(
            [nn.ModuleDict({"proj": nn.Linear(dim, dim * 8)}), nn.Identity(),
             nn.Linear(dim * 4, dim)]
        )

    def forward(self, x):
        h = self.net[0]["proj"](x)
        h, gate = h.chunk(2, dim=-1)
        return self.net[2](h * F.gelu(gate))


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, ctx_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attn(dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attn(dim, heads, ctx_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        x = x + self.ff(self.norm3(x))
        return x


class Transformer2D(nn.Module):
    def __init__(self, ch, heads, ctx_dim, n_blocks=1):
        super().__init__()
        self.norm = nn.GroupNorm(min(32, ch), ch, eps=1e-6)
        self.proj_in = nn.Conv2d(ch, ch, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(ch, heads, ctx_dim) for _ in range(n_blocks)]
        )
        self.proj_out = nn.Conv2d(ch, ch, 1)

    def forward(self, x, ctx):
        b, c, hh, ww = x.shape
        res = x
        h = self.proj_in(self.norm(x))
        h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        for blk in self.transformer_blocks:
            h = blk(h, ctx)
        h = h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
        return self.proj_out(h) + res


class Downsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class Upsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class _DownBlock(nn.Module):
    def __init__(self, in_ch, out_ch, temb, heads, ctx, attn, last):
        super().__init__()
        self.resnets = nn.ModuleList([ResnetBlock(in_ch, out_ch, temb)])
        if attn:
            self.attentions = nn.ModuleList([Transformer2D(out_ch, heads, ctx)])
        self.downsamplers = None if last else nn.ModuleList([Downsample(out_ch)])


class _UpBlock(nn.Module):
    def __init__(self, in_chs, out_ch, temb, heads, ctx, attn, last):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock(ic, out_ch, temb) for ic in in_chs]
        )
        if attn:
            self.attentions = nn.ModuleList(
                [Transformer2D(out_ch, heads, ctx) for _ in in_chs]
            )
        self.upsamplers = None if last else nn.ModuleList([Upsample(out_ch)])


class _MidBlock(nn.Module):
    def __init__(self, ch, temb, heads, ctx):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock(ch, ch, temb), ResnetBlock(ch, ch, temb)]
        )
        self.attentions = nn.ModuleList([Transformer2D(ch, heads, ctx)])


class TinyTorchUNet(nn.Module):
    """The TINY_UNET config: levels (32, 64), down = [CrossAttn, Down],
    up = [Up, CrossAttnUp], layers_per_block=1, heads=2, ctx 32."""

    def __init__(self):
        super().__init__()
        temb = 128
        self.time_embedding = TimestepEmbedding(32, temb)
        self.conv_in = nn.Conv2d(4, 32, 3, padding=1)
        self.down_blocks = nn.ModuleList(
            [
                _DownBlock(32, 32, temb, 2, 32, attn=True, last=False),
                _DownBlock(32, 64, temb, 2, 32, attn=False, last=True),
            ]
        )
        self.mid_block = _MidBlock(64, temb, 2, 32)
        # up block 0 (no attn): skips come in at 64, 64 -> in_chs for concat
        self.up_blocks = nn.ModuleList(
            [
                _UpBlock([64 + 64, 64 + 32], 64, temb, 2, 32, attn=False, last=False),
                _UpBlock([64 + 32, 32 + 4 * 8], 32, temb, 2, 32, attn=True, last=True),
            ]
        )
        self.conv_norm_out = nn.GroupNorm(32, 32, eps=1e-5)
        self.conv_out = nn.Conv2d(32, 4, 3, padding=1)

    def forward(self, x, t, ctx):
        temb = self.time_embedding(timestep_embedding(t, 32))
        h = self.conv_in(x)
        skips = [h]
        for blk in self.down_blocks:
            for j, res in enumerate(blk.resnets):
                h = res(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
                skips.append(h)
            if blk.downsamplers is not None:
                h = blk.downsamplers[0](h)
                skips.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)
        for blk in self.up_blocks:
            for j, res in enumerate(blk.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = res(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
            if blk.upsamplers is not None:
                h = blk.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


# ---------------------------------------------------------------------------
# VAE oracle (diffusers AutoencoderKL conventions, GN eps 1e-6)


class VAEResnet(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.norm1 = nn.GroupNorm(min(32, in_ch), in_ch, eps=1e-6)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.norm2 = nn.GroupNorm(min(32, out_ch), out_ch, eps=1e-6)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class VAEAttn(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.group_norm = nn.GroupNorm(min(32, ch), ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        b, c, hh, ww = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        p = ((q @ k.transpose(-1, -2)) / math.sqrt(c)).softmax(-1)
        h = self.to_out[0](p @ v)
        return x + h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)


class _VAEDown(nn.Module):
    def __init__(self, in_ch, out_ch, last):
        super().__init__()
        self.resnets = nn.ModuleList([VAEResnet(in_ch, out_ch)])
        if not last:
            ds = nn.ModuleDict({"conv": nn.Conv2d(out_ch, out_ch, 3, stride=2, padding=0)})
            self.downsamplers = nn.ModuleList([ds])
        else:
            self.downsamplers = None


class _VAEUp(nn.Module):
    def __init__(self, in_ch, out_ch, last):
        super().__init__()
        self.resnets = nn.ModuleList(
            [VAEResnet(in_ch, out_ch), VAEResnet(out_ch, out_ch)]
        )
        if not last:
            us = nn.ModuleDict({"conv": nn.Conv2d(out_ch, out_ch, 3, padding=1)})
            self.upsamplers = nn.ModuleList([us])
        else:
            self.upsamplers = None


class TinyTorchVAE(nn.Module):
    """TINY_VAE config: channels (16, 32), layers_per_block=1, latent 4."""

    def __init__(self):
        super().__init__()
        enc = nn.Module()
        enc.conv_in = nn.Conv2d(3, 16, 3, padding=1)
        enc.down_blocks = nn.ModuleList(
            [_VAEDown(16, 16, last=False), _VAEDown(16, 32, last=True)]
        )
        enc.mid_block = nn.Module()
        enc.mid_block.resnets = nn.ModuleList([VAEResnet(32, 32), VAEResnet(32, 32)])
        enc.mid_block.attentions = nn.ModuleList([VAEAttn(32)])
        enc.conv_norm_out = nn.GroupNorm(32, 32, eps=1e-6)
        enc.conv_out = nn.Conv2d(32, 8, 3, padding=1)
        self.encoder = enc

        dec = nn.Module()
        dec.conv_in = nn.Conv2d(4, 32, 3, padding=1)
        dec.mid_block = nn.Module()
        dec.mid_block.resnets = nn.ModuleList([VAEResnet(32, 32), VAEResnet(32, 32)])
        dec.mid_block.attentions = nn.ModuleList([VAEAttn(32)])
        dec.up_blocks = nn.ModuleList(
            [_VAEUp(32, 32, last=False), _VAEUp(32, 16, last=True)]
        )
        dec.conv_norm_out = nn.GroupNorm(16, 16, eps=1e-6)
        dec.conv_out = nn.Conv2d(16, 3, 3, padding=1)
        self.decoder = dec

        self.quant_conv = nn.Conv2d(8, 8, 1)
        self.post_quant_conv = nn.Conv2d(4, 4, 1)

    def encode_mean(self, x):
        e = self.encoder
        h = e.conv_in(x)
        for blk in e.down_blocks:
            for res in blk.resnets:
                h = res(h)
            if blk.downsamplers is not None:
                h = F.pad(h, (0, 1, 0, 1))  # asymmetric (0,1) pad
                h = blk.downsamplers[0]["conv"](h)
        h = e.mid_block.resnets[0](h)
        h = e.mid_block.attentions[0](h)
        h = e.mid_block.resnets[1](h)
        h = e.conv_out(F.silu(e.conv_norm_out(h)))
        moments = self.quant_conv(h)
        return moments.chunk(2, dim=1)[0]

    def decode(self, z):
        d = self.decoder
        h = d.conv_in(self.post_quant_conv(z))
        h = d.mid_block.resnets[0](h)
        h = d.mid_block.attentions[0](h)
        h = d.mid_block.resnets[1](h)
        for blk in d.up_blocks:
            for res in blk.resnets:
                h = res(h)
            if blk.upsamplers is not None:
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = blk.upsamplers[0]["conv"](h)
        return d.conv_out(F.silu(d.conv_norm_out(h)))


class ConfigTorchVAE(nn.Module):
    """Config-driven AutoencoderKL oracle (diffusers conventions + state_dict
    naming) for ANY ``VAEConfig`` — validates the Flax VAE + ``loader.vae_key``
    at the REAL (128, 256, 512, 512) widths, not just tiny shapes."""

    def __init__(self, cfg):
        super().__init__()
        blocks = list(cfg.block_out_channels)
        lpb = cfg.layers_per_block
        lat = cfg.latent_channels

        enc = nn.Module()
        enc.conv_in = nn.Conv2d(cfg.in_channels, blocks[0], 3, padding=1)
        downs = []
        out_ch = blocks[0]
        for i, ch in enumerate(blocks):
            in_ch, out_ch = out_ch, ch
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [VAEResnet(in_ch if j == 0 else out_ch, out_ch)
                 for j in range(lpb)]
            )
            if i != len(blocks) - 1:
                ds = nn.ModuleDict(
                    {"conv": nn.Conv2d(out_ch, out_ch, 3, stride=2, padding=0)}
                )
                blk.downsamplers = nn.ModuleList([ds])
            else:
                blk.downsamplers = None
            downs.append(blk)
        enc.down_blocks = nn.ModuleList(downs)
        enc.mid_block = nn.Module()
        enc.mid_block.resnets = nn.ModuleList(
            [VAEResnet(blocks[-1], blocks[-1]), VAEResnet(blocks[-1], blocks[-1])]
        )
        enc.mid_block.attentions = nn.ModuleList([VAEAttn(blocks[-1])])
        enc.conv_norm_out = nn.GroupNorm(min(32, blocks[-1]), blocks[-1], eps=1e-6)
        enc.conv_out = nn.Conv2d(blocks[-1], 2 * lat, 3, padding=1)
        self.encoder = enc

        dec = nn.Module()
        dec.conv_in = nn.Conv2d(lat, blocks[-1], 3, padding=1)
        dec.mid_block = nn.Module()
        dec.mid_block.resnets = nn.ModuleList(
            [VAEResnet(blocks[-1], blocks[-1]), VAEResnet(blocks[-1], blocks[-1])]
        )
        dec.mid_block.attentions = nn.ModuleList([VAEAttn(blocks[-1])])
        ups = []
        rev = list(reversed(blocks))
        out_ch = rev[0]
        for i, ch in enumerate(rev):
            in_ch, out_ch = out_ch, ch
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [VAEResnet(in_ch if j == 0 else out_ch, out_ch)
                 for j in range(lpb + 1)]
            )
            if i != len(blocks) - 1:
                us = nn.ModuleDict({"conv": nn.Conv2d(out_ch, out_ch, 3, padding=1)})
                blk.upsamplers = nn.ModuleList([us])
            else:
                blk.upsamplers = None
            ups.append(blk)
        dec.up_blocks = nn.ModuleList(ups)
        dec.conv_norm_out = nn.GroupNorm(min(32, blocks[0]), blocks[0], eps=1e-6)
        dec.conv_out = nn.Conv2d(blocks[0], cfg.out_channels, 3, padding=1)
        self.decoder = dec

        self.quant_conv = nn.Conv2d(2 * lat, 2 * lat, 1)
        self.post_quant_conv = nn.Conv2d(lat, lat, 1)

    encode_mean = TinyTorchVAE.encode_mean
    decode = TinyTorchVAE.decode


# ---------------------------------------------------------------------------
# XL-flavored UNet oracle: text_time addition embeddings, linear projection,
# multiple transformer blocks per Transformer2D.


class Transformer2DLinear(nn.Module):
    def __init__(self, ch, heads, ctx_dim, n_blocks):
        super().__init__()
        self.norm = nn.GroupNorm(min(32, ch), ch, eps=1e-6)
        self.proj_in = nn.Linear(ch, ch)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(ch, heads, ctx_dim) for _ in range(n_blocks)]
        )
        self.proj_out = nn.Linear(ch, ch)

    def forward(self, x, ctx):
        b, c, hh, ww = x.shape
        res = x
        h = self.norm(x).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        h = self.proj_in(h)
        for blk in self.transformer_blocks:
            h = blk(h, ctx)
        h = self.proj_out(h)
        return h.reshape(b, hh, ww, c).permute(0, 3, 1, 2) + res


class TinyTorchXLUNet(nn.Module):
    """TINY_XL_UNET: levels (32, 64), down = [Down, CrossAttn(tl=2)],
    up = [CrossAttnUp(tl=2), Up], heads 2, ctx 32, linear projection,
    addition_time_embed_dim 8, pooled 16 (projection input 16 + 8*6 = 64)."""

    def __init__(self):
        super().__init__()
        temb = 128
        self.time_embedding = TimestepEmbedding(32, temb)
        self.add_embedding = TimestepEmbedding(64, temb)
        self.conv_in = nn.Conv2d(4, 32, 3, padding=1)

        d0 = nn.Module()
        d0.resnets = nn.ModuleList([ResnetBlock(32, 32, temb)])
        d0.downsamplers = nn.ModuleList([Downsample(32)])
        d1 = nn.Module()
        d1.resnets = nn.ModuleList([ResnetBlock(32, 64, temb)])
        d1.attentions = nn.ModuleList([Transformer2DLinear(64, 2, 32, 2)])
        d1.downsamplers = None
        self.down_blocks = nn.ModuleList([d0, d1])

        m = nn.Module()
        m.resnets = nn.ModuleList([ResnetBlock(64, 64, temb), ResnetBlock(64, 64, temb)])
        m.attentions = nn.ModuleList([Transformer2DLinear(64, 2, 32, 2)])
        self.mid_block = m

        u0 = nn.Module()
        u0.resnets = nn.ModuleList(
            [ResnetBlock(64 + 64, 64, temb), ResnetBlock(64 + 32, 64, temb)]
        )
        u0.attentions = nn.ModuleList(
            [Transformer2DLinear(64, 2, 32, 2), Transformer2DLinear(64, 2, 32, 2)]
        )
        u0.upsamplers = nn.ModuleList([Upsample(64)])
        u1 = nn.Module()
        u1.resnets = nn.ModuleList(
            [ResnetBlock(64 + 32, 32, temb), ResnetBlock(32 + 32, 32, temb)]
        )
        u1.upsamplers = None
        self.up_blocks = nn.ModuleList([u0, u1])

        self.conv_norm_out = nn.GroupNorm(32, 32, eps=1e-5)
        self.conv_out = nn.Conv2d(32, 4, 3, padding=1)

    def forward(self, x, t, ctx, text_embeds, time_ids):
        temb = self.time_embedding(timestep_embedding(t, 32))
        b = x.shape[0]
        te = timestep_embedding(time_ids.reshape(-1), 8).reshape(b, -1)
        temb = temb + self.add_embedding(torch.cat([text_embeds, te], dim=-1))

        h = self.conv_in(x)
        skips = [h]
        for blk in self.down_blocks:
            for j, res in enumerate(blk.resnets):
                h = res(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
                skips.append(h)
            if blk.downsamplers is not None:
                h = blk.downsamplers[0](h)
                skips.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)
        for blk in self.up_blocks:
            for j, res in enumerate(blk.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = res(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
            if blk.upsamplers is not None:
                h = blk.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class ConfigTorchUNet(nn.Module):
    """Config-driven oracle: builds the diffusers UNet2DConditionModel
    structure (state_dict naming included) for ANY ``UNetConfig`` — used to
    cross-validate the Flax model + production ``loader.unet_key`` mapping at
    the REAL SD1.5/SDXL widths (VERDICT r4 item 2: GroupNorm at 320/640/1280,
    8-head/dim-40 partitioning, XL 10-layer mid stacks), not just tiny shapes.

    Only reads plain attributes off ``cfg`` (the framework's UNetConfig
    dataclass); reproduces the diffusers up-block skip-channel rule
    (diffusers unet_2d_condition.py: resnet_in = prev_out if j==0 else out,
    skip = level_in if j==last else out).
    """

    def __init__(self, cfg):
        super().__init__()
        blocks = list(cfg.block_out_channels)
        temb = 4 * blocks[0]
        n_levels = len(blocks)
        lpb = cfg.layers_per_block
        ctx = cfg.cross_attention_dim
        linear = cfg.use_linear_projection
        self._t_dim = blocks[0]
        self._add_dim = cfg.addition_time_embed_dim

        def make_attn(ch, level):
            tl = cfg.transformer_layers[level]
            heads = cfg.num_heads[level]
            if linear:
                return Transformer2DLinear(ch, heads, ctx, tl)
            return Transformer2D(ch, heads, ctx, tl)

        self.time_embedding = TimestepEmbedding(blocks[0], temb)
        if cfg.addition_time_embed_dim is not None:
            self.add_embedding = TimestepEmbedding(
                cfg.projection_class_embeddings_input_dim, temb
            )
        self.conv_in = nn.Conv2d(cfg.in_channels, blocks[0], 3, padding=1)

        down = []
        out_ch = blocks[0]
        for i, btype in enumerate(cfg.down_block_types):
            in_ch, out_ch = out_ch, blocks[i]
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [ResnetBlock(in_ch if j == 0 else out_ch, out_ch, temb)
                 for j in range(lpb)]
            )
            if btype == "CrossAttnDownBlock2D":
                blk.attentions = nn.ModuleList(
                    [make_attn(out_ch, i) for _ in range(lpb)]
                )
            blk.downsamplers = (
                None if i == n_levels - 1
                else nn.ModuleList([Downsample(out_ch)])
            )
            down.append(blk)
        self.down_blocks = nn.ModuleList(down)

        mid_ch = blocks[-1]
        m = nn.Module()
        m.resnets = nn.ModuleList(
            [ResnetBlock(mid_ch, mid_ch, temb), ResnetBlock(mid_ch, mid_ch, temb)]
        )
        m.attentions = nn.ModuleList([make_attn(mid_ch, n_levels - 1)])
        self.mid_block = m

        up = []
        rev = list(reversed(blocks))
        out_ch = rev[0]
        for i, btype in enumerate(cfg.up_block_types):
            prev_out, out_ch = out_ch, rev[i]
            level_in = rev[min(i + 1, n_levels - 1)]
            level = n_levels - 1 - i
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            for j in range(lpb + 1):
                res_in = prev_out if j == 0 else out_ch
                skip = level_in if j == lpb else out_ch
                blk.resnets.append(ResnetBlock(res_in + skip, out_ch, temb))
            if btype == "CrossAttnUpBlock2D":
                blk.attentions = nn.ModuleList(
                    [make_attn(out_ch, level) for _ in range(lpb + 1)]
                )
            blk.upsamplers = (
                None if i == n_levels - 1
                else nn.ModuleList([Upsample(out_ch)])
            )
            up.append(blk)
        self.up_blocks = nn.ModuleList(up)

        self.conv_norm_out = nn.GroupNorm(32, blocks[0], eps=1e-5)
        self.conv_out = nn.Conv2d(blocks[0], cfg.out_channels, 3, padding=1)

    def forward(self, x, t, ctx, text_embeds=None, time_ids=None):
        temb = self.time_embedding(timestep_embedding(t, self._t_dim))
        if text_embeds is not None:
            b = x.shape[0]
            te = timestep_embedding(
                time_ids.reshape(-1), self._add_dim
            ).reshape(b, -1)
            temb = temb + self.add_embedding(
                torch.cat([text_embeds, te], dim=-1)
            )
        h = self.conv_in(x)
        skips = [h]
        for blk in self.down_blocks:
            for j, res in enumerate(blk.resnets):
                h = res(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
                skips.append(h)
            if blk.downsamplers is not None:
                h = blk.downsamplers[0](h)
                skips.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)
        for blk in self.up_blocks:
            for j, res in enumerate(blk.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = res(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
            if blk.upsamplers is not None:
                h = blk.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TinyTorchRefinerUNet(nn.Module):
    """TINY_REFINER_UNET: levels (32, 64, 64), down = [Down, CrossAttn(tl=2),
    Down], up = [Up, CrossAttnUp(tl=2), Up], heads 2, ctx 32, linear
    projection, 5 addition time ids (orig, crop, aesthetic_score),
    addition_time_embed_dim 8, pooled 16 (projection input 16 + 8*5 = 56) —
    the refiner's distinguishing structure: attention-free outermost and
    innermost blocks (SDXL_REFINER_UNET, configs.py)."""

    def __init__(self):
        super().__init__()
        temb = 128
        self.time_embedding = TimestepEmbedding(32, temb)
        self.add_embedding = TimestepEmbedding(56, temb)
        self.conv_in = nn.Conv2d(4, 32, 3, padding=1)

        d0 = nn.Module()
        d0.resnets = nn.ModuleList([ResnetBlock(32, 32, temb)])
        d0.downsamplers = nn.ModuleList([Downsample(32)])
        d1 = nn.Module()
        d1.resnets = nn.ModuleList([ResnetBlock(32, 64, temb)])
        d1.attentions = nn.ModuleList([Transformer2DLinear(64, 2, 32, 2)])
        d1.downsamplers = nn.ModuleList([Downsample(64)])
        d2 = nn.Module()
        d2.resnets = nn.ModuleList([ResnetBlock(64, 64, temb)])
        d2.downsamplers = None
        self.down_blocks = nn.ModuleList([d0, d1, d2])

        m = nn.Module()
        m.resnets = nn.ModuleList([ResnetBlock(64, 64, temb), ResnetBlock(64, 64, temb)])
        m.attentions = nn.ModuleList([Transformer2DLinear(64, 2, 32, 2)])
        self.mid_block = m

        u0 = nn.Module()
        u0.resnets = nn.ModuleList(
            [ResnetBlock(64 + 64, 64, temb), ResnetBlock(64 + 64, 64, temb)]
        )
        u0.upsamplers = nn.ModuleList([Upsample(64)])
        u1 = nn.Module()
        u1.resnets = nn.ModuleList(
            [ResnetBlock(64 + 64, 64, temb), ResnetBlock(64 + 32, 64, temb)]
        )
        u1.attentions = nn.ModuleList(
            [Transformer2DLinear(64, 2, 32, 2), Transformer2DLinear(64, 2, 32, 2)]
        )
        u1.upsamplers = nn.ModuleList([Upsample(64)])
        u2 = nn.Module()
        u2.resnets = nn.ModuleList(
            [ResnetBlock(64 + 32, 32, temb), ResnetBlock(32 + 32, 32, temb)]
        )
        u2.upsamplers = None
        self.up_blocks = nn.ModuleList([u0, u1, u2])

        self.conv_norm_out = nn.GroupNorm(32, 32, eps=1e-5)
        self.conv_out = nn.Conv2d(32, 4, 3, padding=1)

    forward = TinyTorchXLUNet.forward
