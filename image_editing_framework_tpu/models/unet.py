"""Config-driven Flax UNet2DCondition for the SD family (1.4/1.5, 2.1, SDXL).

The reference obtains this model from diffusers (SURVEY.md §2.2) and edits it
by monkey-patching attention/resnet forwards. Here the editing control is a
first-class argument: every BasicTransformerBlock carries a static forward
-order index (``layer``) matching the reference's ``cur_att_layer // 2``
gating (masactrl/model/attention_control.py:56), self-attention runs through
the fused flash kernel with the control's batch-remap plan, cross-attention
exposes editable float32 probabilities, and ResNet blocks expose the PnP
feature-injection hook keyed like ``up1_res1`` — the reference's
``up_blocks[1].resnets[1]`` site (pnp/model/register.py:179).

Layout is NHWC (TPU-native conv layout). Compute dtype is configurable
(bfloat16 for production, float32 for parity testing); softmax statistics are
always float32.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from image_editing_framework_tpu.models.embeddings import (
    TimestepEmbedding,
    sinusoidal_timestep_embedding,
)
from image_editing_framework_tpu.ops.attention import (
    AttnSite,
    apply_probs,
    cross_attention_probs,
    merge_heads,
    self_attention,
    split_heads,
)
from image_editing_framework_tpu.ops.controls import NoneStep

Records = Dict[str, jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    layers_per_block: int = 2
    # Number of attention heads per level (diffusers calls this
    # ``attention_head_dim`` for historical reasons; for SD it is the head
    # *count*: 8 for SD1.x, [5,10,20,20] for SD2.1, [10,20] effective for XL).
    num_heads: Tuple[int, ...] = (8, 8, 8, 8)
    # BasicTransformerBlocks per Transformer2D, per level (XL: (1, 2, 10)).
    transformer_layers: Tuple[int, ...] = (1, 1, 1, 1)
    cross_attention_dim: int = 768
    use_linear_projection: bool = False
    # SDXL "text_time" addition embeddings.
    addition_time_embed_dim: Optional[int] = None  # 256 for XL
    projection_class_embeddings_input_dim: Optional[int] = None  # 2816 base / 2560 refiner

    @property
    def num_transformer_blocks(self) -> int:
        """Total BasicTransformerBlocks in forward order (MasaCtrl's layer
        count: 16 for SD, 70 for SDXL)."""
        n = 0
        for lvl, t in enumerate(self.down_block_types):
            if t == "CrossAttnDownBlock2D":
                n += self.layers_per_block * self.transformer_layers[lvl]
        n += self.transformer_layers[-1]  # mid
        for i, t in enumerate(self.up_block_types):
            lvl = len(self.block_out_channels) - 1 - i
            if t == "CrossAttnUpBlock2D":
                n += (self.layers_per_block + 1) * self.transformer_layers[lvl]
        return n

    def forward_layout(self):
        """Assign forward-order transformer-block indices.

        Returns (down, mid, up) where down/up are lists per block of lists per
        Transformer2D of block-index lists, and mid is one index list.
        """
        idx = 0
        down = []
        for lvl, t in enumerate(self.down_block_types):
            blk = []
            if t == "CrossAttnDownBlock2D":
                for _ in range(self.layers_per_block):
                    tb = list(range(idx, idx + self.transformer_layers[lvl]))
                    idx += len(tb)
                    blk.append(tb)
            down.append(blk)
        mid = list(range(idx, idx + self.transformer_layers[-1]))
        idx += len(mid)
        up = []
        for i, t in enumerate(self.up_block_types):
            lvl = len(self.block_out_channels) - 1 - i
            blk = []
            if t == "CrossAttnUpBlock2D":
                for _ in range(self.layers_per_block + 1):
                    tb = list(range(idx, idx + self.transformer_layers[lvl]))
                    idx += len(tb)
                    blk.append(tb)
            up.append(blk)
        return down, mid, up


class _Kernel(nn.Module):
    """Bias-free projection weight with the standard ('<name>', 'kernel')
    param path — lets the attention layer fuse q/k/v into one matmul while
    keeping checkpoint-compatible parameter naming."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dim_in: int) -> jnp.ndarray:
        return self.param(
            "kernel", nn.initializers.lecun_normal(), (dim_in, self.features)
        ).astype(self.dtype)


class Attention(nn.Module):
    """One attention layer (attn1 self / attn2 cross) with editing hooks."""

    query_dim: int
    heads: int
    cross_dim: Optional[int]  # None => self-attention
    layer: int
    place: str
    dtype: jnp.dtype = jnp.float32
    cp_mesh: Optional[object] = None  # jax Mesh: context parallelism
    cp_min_seq: int = 4096
    cp_mode: str = "ring"  # 'ring' (ppermute KV) | 'ulysses' (all_to_all)

    @nn.compact
    def __call__(self, x, context, ctrl, use_flash: bool = True, running=None):
        is_cross = self.cross_dim is not None
        site = AttnSite(
            layer=self.layer, place=self.place, seq_len=x.shape[1], is_cross=is_cross
        )
        inner = self.query_dim
        src = context if is_cross else x
        # Fused projections: one matmul for [q|k|v] (self) / [k|v] (cross)
        # instead of three narrow ones — identical math (column blocks of a
        # concatenated kernel), better MXU utilization at small batch.
        wq = _Kernel(inner, dtype=self.dtype, name="to_q")(x.shape[-1])
        wk = _Kernel(inner, dtype=self.dtype, name="to_k")(src.shape[-1])
        wv = _Kernel(inner, dtype=self.dtype, name="to_v")(src.shape[-1])
        if is_cross:
            q = x @ wq
            kv = src @ jnp.concatenate([wk, wv], axis=1)
            k, v = jnp.split(kv, 2, axis=-1)
        else:
            qkv = x @ jnp.concatenate([wq, wk, wv], axis=1)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (split_heads(t, self.heads) for t in (q, k, v))
        records: Records = {}
        if is_cross:
            probs = cross_attention_probs(q, k)
            probs = ctrl.edit_cross(site, probs)
            rkey = ctrl.record_key(site)
            if rkey is not None:
                records[rkey] = ctrl.record(site, probs)
            out = apply_probs(probs, v)
        else:
            # masked variants; ``running`` = records from earlier sites of
            # this same forward (same-pass MaskAuto aggregation). The CP mesh
            # threads into the override too — masked MasaCtrl at long-seq
            # sites runs ring/Ulysses attention like the plan path.
            mesh = self.cp_mesh if x.shape[1] >= self.cp_min_seq else None
            out = ctrl.self_override(
                site, q, k, v, running, use_flash, cp_mesh=mesh,
                cp_mode=self.cp_mode,
            )
            if out is None:
                plan = ctrl.self_plan(site, x.shape[0])
                out = self_attention(
                    q, k, v, plan, use_flash=use_flash, cp_mesh=mesh,
                    cp_mode=self.cp_mode,
                )
        out = merge_heads(out).astype(x.dtype)
        out = nn.Dense(self.query_dim, dtype=self.dtype, name="to_out_0")(out)
        return out, records


class FeedForward(nn.Module):
    """GEGLU feed-forward (dim -> 4*dim gated -> dim)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * 8, dtype=self.dtype, name="geglu_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    cross_dim: int
    layer: int
    place: str
    dtype: jnp.dtype = jnp.float32
    cp_mesh: Optional[object] = None
    cp_min_seq: int = 4096
    cp_mode: str = "ring"

    @nn.compact
    def __call__(self, x, context, ctrl, use_flash: bool = True, running=None):
        records: Records = {}
        h, rec = Attention(
            self.dim, self.heads, None, self.layer, self.place,
            dtype=self.dtype, cp_mesh=self.cp_mesh, cp_min_seq=self.cp_min_seq,
            cp_mode=self.cp_mode, name="attn1",
        )(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x),
            None, ctrl, use_flash, running,
        )
        records.update(rec)
        x = x + h
        h, rec = Attention(
            self.dim, self.heads, self.cross_dim, self.layer, self.place,
            dtype=self.dtype, name="attn2",
        )(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x),
            context, ctrl, use_flash,
        )
        records.update(rec)
        x = x + h
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        )
        return x, records


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> proj_in -> blocks -> proj_out + residual."""

    channels: int
    heads: int
    cross_dim: int
    layers: Tuple[int, ...]  # global block indices
    place: str
    use_linear_projection: bool = False
    dtype: jnp.dtype = jnp.float32
    cp_mesh: Optional[object] = None
    cp_min_seq: int = 4096
    cp_mode: str = "ring"
    remat: bool = False

    @nn.compact
    def __call__(self, x, context, ctrl, use_flash: bool = True, running=None):
        b, hh, ww, c = x.shape
        residual = x
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if self.use_linear_projection:
            h = h.reshape(b, hh * ww, c)
            h = nn.Dense(self.channels, dtype=self.dtype, name="proj_in")(h)
        else:
            h = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_in")(h)
            h = h.reshape(b, hh * ww, self.channels)
        records: Records = {}
        block_cls = (
            nn.remat(BasicTransformerBlock, static_argnums=(4,))
            if self.remat
            else BasicTransformerBlock
        )
        # ``running`` is the UNet-wide records dict, threaded down so later
        # sites see earlier sites' recorded maps within the same forward;
        # updates happen here, OUTSIDE the (possibly remat'ed) block, so they
        # propagate in trace order.
        if running is None:
            running = {}
        for i, layer in enumerate(self.layers):
            h, rec = block_cls(
                self.channels, self.heads, self.cross_dim, layer, self.place,
                dtype=self.dtype, cp_mesh=self.cp_mesh,
                cp_min_seq=self.cp_min_seq, cp_mode=self.cp_mode,
                name=f"block_{i}",
            )(h, context, ctrl, use_flash, dict(running))
            records.update(rec)
            running.update(rec)
        if self.use_linear_projection:
            h = nn.Dense(self.channels, dtype=self.dtype, name="proj_out")(h)
            h = h.reshape(b, hh, ww, self.channels)
        else:
            h = h.reshape(b, hh, ww, self.channels)
            h = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + residual, records


class ResnetBlock(nn.Module):
    out_channels: int
    key: str  # PnP injection site key, e.g. "up1_res1"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, ctrl):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
            nn.silu(temb)
        )
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        # PnP spatial feature injection after conv2 (pnp/model/register.py:163-168).
        h = ctrl.resnet_hook(self.key, h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class Downsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
            name="conv",
        )(x)


class Upsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class UNet2DCondition(nn.Module):
    config: UNetConfig
    dtype: jnp.dtype = jnp.float32
    # Context parallelism: shard self-attention sequences >= cp_min_seq over
    # this mesh's 'data' axis (XL 1024^2 scale-out path). cp_mode: 'ring'
    # (ppermute KV rotation) or 'ulysses' (all_to_all head<->sequence).
    cp_mesh: Optional[object] = None
    cp_min_seq: int = 4096
    cp_mode: str = "ring"
    # Rematerialize transformer blocks during backward (NTI / pix2pix-zero /
    # training gradients at XL scale trade ~30% FLOPs for O(depth) memory).
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, H, W, C) latents
        timestep: jnp.ndarray,  # scalar or (B,)
        context: jnp.ndarray,  # (B, 77, cross_dim)
        ctrl=None,
        added_cond: Optional[Dict[str, jnp.ndarray]] = None,
        use_flash: bool = True,
    ):
        cfg = self.config
        if ctrl is None:
            ctrl = NoneStep()
        b = sample.shape[0]
        t = jnp.broadcast_to(jnp.asarray(timestep), (b,))

        # --- time embedding
        block0 = cfg.block_out_channels[0]
        temb_dim = block0 * 4
        t_emb = sinusoidal_timestep_embedding(t, block0, dtype=self.dtype)
        temb = TimestepEmbedding(temb_dim, dtype=self.dtype, name="time_embedding")(t_emb)

        # --- SDXL text_time addition embeddings
        if cfg.addition_time_embed_dim is not None:
            assert added_cond is not None, "SDXL requires added_cond (text_embeds, time_ids)"
            time_ids = added_cond["time_ids"]  # (B, n_ids)
            flat = time_ids.reshape(-1)
            te = sinusoidal_timestep_embedding(
                flat, cfg.addition_time_embed_dim, dtype=self.dtype
            ).reshape(b, -1)
            add_emb = jnp.concatenate(
                [added_cond["text_embeds"].astype(self.dtype), te], axis=-1
            )
            temb = temb + TimestepEmbedding(
                temb_dim, dtype=self.dtype, name="add_embedding"
            )(add_emb)

        records: Records = {}
        down_layout, mid_layout, up_layout = cfg.forward_layout()

        x = nn.Conv(block0, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(sample)
        skips = [x]

        # --- down path
        for i, btype in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            is_last = i == len(cfg.down_block_types) - 1
            for j in range(cfg.layers_per_block):
                x = ResnetBlock(
                    out_ch, key=f"down{i}_res{j}", dtype=self.dtype,
                    name=f"down_{i}_resnet_{j}",
                )(x, temb, ctrl)
                if btype == "CrossAttnDownBlock2D":
                    x, rec = Transformer2D(
                        out_ch, cfg.num_heads[i], cfg.cross_attention_dim,
                        tuple(down_layout[i][j]), "down",
                        use_linear_projection=cfg.use_linear_projection,
                        dtype=self.dtype, cp_mesh=self.cp_mesh, remat=self.remat,
                        cp_min_seq=self.cp_min_seq, cp_mode=self.cp_mode,
                        name=f"down_{i}_attn_{j}",
                    )(x, context, ctrl, use_flash, records)
                    records.update(rec)
                skips.append(x)
            if not is_last:
                x = Downsample(out_ch, dtype=self.dtype, name=f"down_{i}_downsample")(x)
                skips.append(x)

        # --- mid
        mid_ch = cfg.block_out_channels[-1]
        x = ResnetBlock(mid_ch, key="mid_res0", dtype=self.dtype, name="mid_resnet_0")(
            x, temb, ctrl
        )
        x, rec = Transformer2D(
            mid_ch, cfg.num_heads[-1], cfg.cross_attention_dim,
            tuple(mid_layout), "mid",
            use_linear_projection=cfg.use_linear_projection,
            dtype=self.dtype, cp_mesh=self.cp_mesh, remat=self.remat,
            cp_min_seq=self.cp_min_seq, cp_mode=self.cp_mode, name="mid_attn",
        )(x, context, ctrl, use_flash, records)
        records.update(rec)
        x = ResnetBlock(mid_ch, key="mid_res1", dtype=self.dtype, name="mid_resnet_1")(
            x, temb, ctrl
        )

        # --- up path
        rev_channels = list(reversed(cfg.block_out_channels))
        for i, btype in enumerate(cfg.up_block_types):
            out_ch = rev_channels[i]
            is_last = i == len(cfg.up_block_types) - 1
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResnetBlock(
                    out_ch, key=f"up{i}_res{j}", dtype=self.dtype,
                    name=f"up_{i}_resnet_{j}",
                )(x, temb, ctrl)
                if btype == "CrossAttnUpBlock2D":
                    x, rec = Transformer2D(
                        out_ch, cfg.num_heads[len(rev_channels) - 1 - i],
                        cfg.cross_attention_dim, tuple(up_layout[i][j]), "up",
                        use_linear_projection=cfg.use_linear_projection,
                        dtype=self.dtype, cp_mesh=self.cp_mesh, remat=self.remat,
                        cp_min_seq=self.cp_min_seq, cp_mode=self.cp_mode,
                        name=f"up_{i}_attn_{j}",
                    )(x, context, ctrl, use_flash, records)
                    records.update(rec)
            if not is_last:
                x = Upsample(out_ch, dtype=self.dtype, name=f"up_{i}_upsample")(x)

        # --- out
        x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype, name="norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        return x, records
