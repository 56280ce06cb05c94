"""Editing controllers as pytrees of precomputed schedules.

The reference implements each editing algorithm as a stateful Python object
invoked from monkey-patched attention forwards (p2p/model/register.py:48,
masactrl/model/register.py:46-48, pnp/model/register.py:41-52,
pix2pix-zero/model/attention_control.py:46). Those callbacks cannot exist
inside a jitted XLA program, so here every controller decision — a function of
(step, layer, is_cross, resolution) plus small precomputed tensors — becomes
data:

* a ``*Control`` pytree holds full-run tables (per-step alphas, gates),
* ``at_step(i)`` slices out a ``*Step`` pytree inside the ``lax.scan`` body,
* the UNet's attention sites query the step pytree for
  - a ``SelfAttnPlan`` (batch-index Q/K/V remap fed to the flash kernel),
  - a cross-attention probability edit,
  - whether/what to record (attention stores),
  and ResNet blocks query ``resnet_hook`` (PnP feature injection).

Batch layout everywhere: B = 2P, ``[u_0..u_{P-1}, c_0..c_{P-1}]`` with the
source prompt at index 0 of each CFG half — identical to the reference's
``torch.cat([uncond, cond])`` convention, so "edit only the conditional half"
(p2p/model/attention_base.py:22) means batch indices > P.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from image_editing_framework_tpu.core.config import (
    MasaCtrlConfig,
    P2PConfig,
    PnPConfig,
)
from image_editing_framework_tpu.ops import schedules, seq_aligner
from image_editing_framework_tpu.ops.attention import AttnSite, SelfAttnPlan


# ---------------------------------------------------------------------------
# No-op control


@struct.dataclass
class NoneStep:
    def self_plan(self, site: AttnSite, batch: int) -> Optional[SelfAttnPlan]:
        return None

    def self_override(self, site: AttnSite, q, k, v, running=None,
                      use_flash=None, cp_mesh=None, cp_mode="ring"):
        """Full custom self-attention output (masked MasaCtrl variants);
        None means use the plan/flash path. Static per control type.
        ``use_flash`` selects the kernel vs XLA attention path for the
        override's internal attention calls (None = backend default); the
        UNet threads its own flag so a virtual CPU mesh under an ambient
        TPU backend stays on the XLA path.

        ``running`` is the dict of records accumulated by *earlier sites of
        the same UNet forward* (the UNet threads its records dict down in
        execution order) — MaskAuto derives its masks from it, matching the
        reference's same-pass cross-attention aggregation
        (masactrl/model/attention_control.py:276-296).

        ``cp_mesh``/``cp_mode`` thread the UNet's context parallelism into
        the override's internal attention calls (the per-key fg/bg bias
        shards and rotates with K), so masked variants at long-sequence
        sites scale over the mesh like every plan-path site."""
        return None

    def bind_store(self, store, step_index):
        """Receive the denoise loop's carried record store (accumulated
        across steps — the LocalBlend 'sum' mode)."""
        del store, step_index
        return self

    def edit_cross(self, site: AttnSite, probs: jnp.ndarray) -> jnp.ndarray:
        return probs

    def record_key(self, site: AttnSite) -> Optional[str]:
        return None

    def record(self, site: AttnSite, probs: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def resnet_hook(self, key: str, h: jnp.ndarray) -> jnp.ndarray:
        return h


@struct.dataclass
class NoneControl(NoneStep):
    def at_step(self, i) -> NoneStep:
        del i
        return NoneStep()


# ---------------------------------------------------------------------------
# Prompt-to-Prompt

_RES16_SEQ = 256  # 16x16 latent tokens: the resolution P2P self-replace and
# LocalBlend maps operate at (p2p/model/attention_base.py:132, ptp_utils.py:22).


@struct.dataclass
class P2PStep(NoneStep):
    """One denoising step of P2P editing (replace / refine / reweight unified).

    Cross-attention (p2p/model/attention_base.py:113-125 + attention_control.py):
      inner = (base @ mapper) * tok_alpha + target * (1 - tok_alpha)   # refine
      inner = inner * equalizer                                         # reweight
      new   = inner * alpha_words + target * (1 - alpha_words)          # window
    Self-attention at <=16^2 tokens inside the self-replace window: target
    probabilities are the source's (Q,K from source; own V).
    """

    mapper: jnp.ndarray  # (P-1, 77, 77)
    tok_alpha: jnp.ndarray  # (P-1, 77)
    equalizer: jnp.ndarray  # (P-1, 77)
    alpha_words: jnp.ndarray  # (P-1, 77) — this step
    self_gate: jnp.ndarray  # () bool — this step
    num_prompts: int = struct.field(pytree_node=False, default=2)
    record_blend: bool = struct.field(pytree_node=False, default=False)

    def self_plan(self, site: AttnSite, batch: int) -> Optional[SelfAttnPlan]:
        if site.seq_len > _RES16_SEQ:
            return None
        p = self.num_prompts
        iota = jnp.arange(batch, dtype=jnp.int32)
        idx = jnp.where(self.self_gate & (iota > p), p, iota)
        return SelfAttnPlan(
            q_idx=idx,
            k_idx=idx[:, None],
            v_idx=iota[:, None],
            valid=jnp.ones((batch, 1), bool),
        )

    def edit_cross(self, site: AttnSite, probs: jnp.ndarray) -> jnp.ndarray:
        p = self.num_prompts
        base = probs[p]  # conditional source (H, N, 77)
        mapped = jnp.einsum("hnw,pwv->phnv", base, self.mapper)
        tgt = probs[p + 1 :]
        ta = self.tok_alpha[:, None, None, :]
        inner = (mapped * ta + tgt * (1.0 - ta)) * self.equalizer[:, None, None, :]
        aw = self.alpha_words[:, None, None, :]
        return probs.at[p + 1 :].set(inner * aw + tgt * (1.0 - aw))

    def record_key(self, site: AttnSite) -> Optional[str]:
        if self.record_blend and site.is_cross and site.seq_len == _RES16_SEQ:
            return site.key
        return None

    def record(self, site: AttnSite, probs: jnp.ndarray) -> jnp.ndarray:
        # (2P, H, 256, 77) -> mean over CFG halves and heads -> (P, 256, 77),
        # mirroring LocalBlend's reshape(P, -1, 1, 16, 16, 77).mean(1)
        # (p2p/model/ptp_utils.py:23-25).
        p = self.num_prompts
        h = probs.shape[1]
        return probs.reshape(2, p, h, probs.shape[2], 77).mean(axis=(0, 2))


@struct.dataclass
class P2PControl:
    mapper: jnp.ndarray
    tok_alpha: jnp.ndarray
    equalizer: jnp.ndarray
    cross_alpha: jnp.ndarray  # (num_steps + 1, P-1, 77)
    self_gate: jnp.ndarray  # (num_steps,)
    num_prompts: int = struct.field(pytree_node=False, default=2)
    record_blend: bool = struct.field(pytree_node=False, default=False)

    def at_step(self, i) -> P2PStep:
        return P2PStep(
            mapper=self.mapper,
            tok_alpha=self.tok_alpha,
            equalizer=self.equalizer,
            alpha_words=self.cross_alpha[i],
            self_gate=self.self_gate[i],
            num_prompts=self.num_prompts,
            record_blend=self.record_blend,
        )


def build_p2p_control(
    prompts: Sequence[str],
    tokenizer,
    num_steps: int,
    cfg: P2PConfig,
    record_blend: bool = False,
) -> P2PControl:
    """Assemble the P2P control from prompts (host-side, trace time)."""
    p = len(prompts)
    if cfg.edit_type == "replace":
        mapper = seq_aligner.get_replacement_mapper(prompts, tokenizer)
        tok_alpha = np.ones((p - 1, seq_aligner.MAX_LEN), np.float32)
    elif cfg.edit_type == "refine":
        gather, tok_alpha = seq_aligner.get_refinement_mapper(prompts, tokenizer)
        mapper = np.stack([seq_aligner.refinement_matrix(g) for g in gather])
    else:
        raise ValueError(f"unknown edit_type: {cfg.edit_type}")
    if cfg.eq_words:
        eq = seq_aligner.get_equalizer(
            prompts[-1], cfg.eq_words, cfg.eq_values, tokenizer
        )
        # reference applies one equalizer row per target prompt; broadcast.
        equalizer = np.broadcast_to(eq[:1], (p - 1, seq_aligner.MAX_LEN)).copy()
    else:
        equalizer = np.ones((p - 1, seq_aligner.MAX_LEN), np.float32)
    alpha = schedules.cross_replace_alpha(
        prompts, num_steps, cfg.cross_replace_steps, tokenizer
    )
    gate = schedules.self_replace_gate(cfg.self_replace_steps, num_steps)
    return P2PControl(
        mapper=jnp.asarray(mapper),
        tok_alpha=jnp.asarray(tok_alpha),
        equalizer=jnp.asarray(equalizer),
        cross_alpha=jnp.asarray(alpha),
        self_gate=jnp.asarray(gate),
        num_prompts=p,
        record_blend=record_blend,
    )


# ---------------------------------------------------------------------------
# MasaCtrl


@struct.dataclass
class MasaCtrlStep(NoneStep):
    """Mutual self-attention: at gated (step, layer), every element of each
    CFG half attends to the half's *source* K/V
    (masactrl/model/attention_control.py:59-66); "union" mode instead gives
    target elements concat([source, self]) K/V (:102-103).

    The layer set is *static* (baked per attention site, so ungated layers
    compile with no gather at all); only the step gate is dynamic.
    """

    step_gate: jnp.ndarray  # () bool — this step
    layers: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    num_prompts: int = struct.field(pytree_node=False, default=2)
    union: bool = struct.field(pytree_node=False, default=False)

    def self_plan(self, site: AttnSite, batch: int) -> Optional[SelfAttnPlan]:
        if site.layer not in self.layers:
            return None
        p = self.num_prompts
        gate = self.step_gate
        iota = jnp.arange(batch, dtype=jnp.int32)
        half_src = (iota // p) * p
        if not self.union:
            kv = jnp.where(gate, half_src, iota)
            return SelfAttnPlan(
                q_idx=iota,
                k_idx=kv[:, None],
                v_idx=kv[:, None],
                valid=jnp.ones((batch, 1), bool),
            )
        k_idx = jnp.stack([half_src, iota], axis=1)  # (B, 2)
        is_target = (iota % p) != 0
        valid = jnp.stack(
            [gate & is_target, jnp.ones((batch,), bool)], axis=1
        )
        return SelfAttnPlan(q_idx=iota, k_idx=k_idx, v_idx=k_idx, valid=valid)


@struct.dataclass
class MasaCtrlMaskStep(MasaCtrlStep):
    """Mask-guided MasaCtrl (masactrl/model/attention_control.py:110-190):
    at gated layers, target queries attend the source K/V twice — restricted
    to source-foreground keys and source-background keys — and the two
    outputs blend by the target mask:

        out_t = out_fg * mask_t + out_bg * (1 - mask_t)

    Source branches run normal self-attention. ``mask_s`` / ``mask_t`` are
    full-resolution (h, w) float masks, pooled to each site's token grid.
    """

    mask_s: jnp.ndarray = None  # (h, w) source object mask
    mask_t: jnp.ndarray = None  # (h, w) target object mask

    def _site_mask(self, mask: jnp.ndarray, seq_len: int) -> jnp.ndarray:
        side = int(seq_len**0.5)
        m = jax.image.resize(mask, (side, side), method="nearest")
        return m.reshape(-1)  # (N,)

    def self_override(self, site: AttnSite, q, k, v, running=None,
                      use_flash=None, cp_mesh=None, cp_mode="ring"):
        if site.layer not in self.layers:
            return None
        import jax as _jax

        from image_editing_framework_tpu.ops import attention as attn_ops
        from image_editing_framework_tpu.ops.flash_attention import NEG_INF

        if use_flash is None:
            use_flash = _jax.default_backend() == "tpu"
        cp = dict(cp_mesh=cp_mesh, cp_mode=cp_mode)
        b, h, n, d = q.shape
        p = self.num_prompts
        iota = jnp.arange(b, dtype=jnp.int32)
        half_src = (iota // p) * p
        ms = self._site_mask(self.mask_s, n)  # (N,) source fg mask
        mt = self._site_mask(self.mask_t, n)  # (N,) target fg mask

        # Normal output (ungated steps / source rows) — same attention path
        # as the masked calls below (hardcoding the XLA path here ran source
        # rows at DEFAULT matmul precision on TPU while every other site
        # used the kernel).
        normal = attn_ops.self_attention(q, k, v, None, use_flash=use_flash, **cp)
        # fg / bg outputs: all queries vs source K/V restricted by mask.
        k_src, v_src = k[half_src], v[half_src]
        bias_fg = jnp.broadcast_to(
            jnp.where(ms > 0.5, 0.0, NEG_INF)[None, :], (b, n)
        )
        bias_bg = jnp.broadcast_to(
            jnp.where(ms > 0.5, NEG_INF, 0.0)[None, :], (b, n)
        )
        out_fg = attn_ops.masked_attention(q, k_src, v_src, bias_fg, use_flash, **cp)
        out_bg = attn_ops.masked_attention(q, k_src, v_src, bias_bg, use_flash, **cp)
        blended = out_fg * mt[None, None, :, None] + out_bg * (
            1.0 - mt[None, None, :, None]
        )
        is_target = ((iota % p) != 0)[:, None, None, None]
        gated = jnp.where(is_target & self.step_gate, blended, normal)
        return gated


@struct.dataclass
class MasaCtrlAutoStep(MasaCtrlStep):
    """Auto-masked MasaCtrl (masactrl/model/attention_control.py:192-330):
    fg/bg masks are *derived* from res-16 cross-attention maps of selected
    tokens rather than supplied.

    Same-pass aggregation, faithful to the reference: the masks at a gated
    self-attention site come from the mean of the 16x16 cross-attention maps
    recorded by earlier layers of the SAME forward (the UNet threads its
    records dict down in execution order — ``running``), exactly like the
    reference's ``self.cross_attns`` list that ``after_step`` clears
    (attention_control.py:224-226, 273-296). With no maps recorded yet the
    target falls back to plain mutual attention (:293-296).
    """

    thres: float = struct.field(pytree_node=False, default=0.1)
    ref_idx: Tuple[int, ...] = struct.field(pytree_node=False, default=(1,))
    cur_idx: Tuple[int, ...] = struct.field(pytree_node=False, default=(1,))

    def record_key(self, site: AttnSite) -> Optional[str]:
        if site.is_cross and site.seq_len == 256:
            return site.key
        return None

    def record(self, site: AttnSite, probs: jnp.ndarray) -> jnp.ndarray:
        return probs.mean(axis=1)  # (2P, 256, 77), mean over heads

    def _masks_from(self, running) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(mask_s16, mask_t16) from the maps recorded so far this forward
        (reference aggregate_cross_attn_map, attention_control.py:257-269)."""
        maps = [running[key] for key in sorted(running)]
        avg = jnp.mean(jnp.stack(maps), axis=0)  # (2P, 256, 77)

        def token_map(idx):
            img = avg[..., jnp.asarray(idx)].sum(-1)  # (2P, 256)
            lo = img.min(axis=1, keepdims=True)
            hi = img.max(axis=1, keepdims=True)
            return (img - lo) / jnp.maximum(hi - lo, 1e-8)

        p = self.num_prompts
        mask_s = token_map(self.ref_idx)[p]  # conditional source (mask[-2])
        mask_t = token_map(self.cur_idx)[2 * p - 1]  # conditional target
        return mask_s, mask_t

    def _resize(self, m16: jnp.ndarray, seq_len: int) -> jnp.ndarray:
        side = int(seq_len**0.5)
        return jax.image.resize(m16.reshape(16, 16), (side, side), "nearest").reshape(-1)

    def self_plan(self, site, batch):
        return None  # all logic lives in self_override

    def self_override(self, site: AttnSite, q, k, v, running=None,
                      use_flash=None, cp_mesh=None, cp_mode="ring"):
        if site.layer not in self.layers:
            return None
        import jax as _jax

        from image_editing_framework_tpu.ops import attention as attn_ops
        from image_editing_framework_tpu.ops.flash_attention import NEG_INF

        if use_flash is None:
            use_flash = _jax.default_backend() == "tpu"
        cp = dict(cp_mesh=cp_mesh, cp_mode=cp_mode)
        b, h, n, d = q.shape
        p = self.num_prompts
        iota = jnp.arange(b, dtype=jnp.int32)
        half_src = (iota // p) * p
        k_src, v_src = k[half_src], v[half_src]

        normal = attn_ops.self_attention(q, k, v, None, use_flash=use_flash, **cp)
        mutual = attn_ops.self_attention(
            q, k_src, v_src, None, use_flash=use_flash, **cp
        )

        if not running:
            # no cross maps recorded yet this forward: plain mutual attention
            # for targets (attention_control.py:293-296)
            target_out = jnp.where(self.step_gate, mutual, normal)
            is_target = ((iota % p) != 0)[:, None, None, None]
            return jnp.where(is_target, target_out, normal)

        mask_s16, mask_t16 = self._masks_from(running)
        ms = self._resize(mask_s16, n)
        mt = self._resize(mask_t16, n)
        ms_bin = (ms >= self.thres).astype(jnp.float32)
        mt_bin = (mt >= self.thres).astype(jnp.float32)
        bias_fg = jnp.broadcast_to(jnp.where(ms_bin > 0.5, 0.0, NEG_INF)[None], (b, n))
        bias_bg = jnp.broadcast_to(jnp.where(ms_bin > 0.5, NEG_INF, 0.0)[None], (b, n))
        out_fg = attn_ops.masked_attention(q, k_src, v_src, bias_fg, use_flash, **cp)
        out_bg = attn_ops.masked_attention(q, k_src, v_src, bias_bg, use_flash, **cp)
        masked = out_fg * mt_bin[None, None, :, None] + out_bg * (
            1.0 - mt_bin[None, None, :, None]
        )

        target_out = jnp.where(self.step_gate, masked, normal)
        is_target = ((iota % p) != 0)[:, None, None, None]
        return jnp.where(is_target, target_out, normal)


@struct.dataclass
class MasaCtrlControl:
    step_gate: jnp.ndarray  # (num_steps,)
    layers: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    num_prompts: int = struct.field(pytree_node=False, default=2)
    union: bool = struct.field(pytree_node=False, default=False)
    mask_s: Optional[jnp.ndarray] = None
    mask_t: Optional[jnp.ndarray] = None
    auto_mask: bool = struct.field(pytree_node=False, default=False)
    thres: float = struct.field(pytree_node=False, default=0.1)
    ref_idx: Tuple[int, ...] = struct.field(pytree_node=False, default=(1,))
    cur_idx: Tuple[int, ...] = struct.field(pytree_node=False, default=(1,))

    def at_step(self, i) -> MasaCtrlStep:
        if self.auto_mask:
            return MasaCtrlAutoStep(
                step_gate=self.step_gate[i],
                layers=self.layers,
                num_prompts=self.num_prompts,
                union=self.union,
                thres=self.thres,
                ref_idx=self.ref_idx,
                cur_idx=self.cur_idx,
            )
        if self.mask_s is not None:
            return MasaCtrlMaskStep(
                step_gate=self.step_gate[i],
                layers=self.layers,
                num_prompts=self.num_prompts,
                union=self.union,
                mask_s=self.mask_s,
                mask_t=self.mask_t,
            )
        return MasaCtrlStep(
            step_gate=self.step_gate[i],
            layers=self.layers,
            num_prompts=self.num_prompts,
            union=self.union,
        )


def build_masactrl_control(
    num_steps: int,
    num_layers: int,
    cfg: MasaCtrlConfig,
    num_prompts: int = 2,
    mask_s: Optional[jnp.ndarray] = None,
    mask_t: Optional[jnp.ndarray] = None,
    auto_mask: bool = False,
    thres: float = 0.1,
    ref_token_idx: Tuple[int, ...] = (1,),
    cur_token_idx: Tuple[int, ...] = (1,),
) -> MasaCtrlControl:
    from image_editing_framework_tpu.ops.schedules import masactrl_gate

    gate = masactrl_gate(
        num_steps, num_layers, cfg.start_step, cfg.start_layer,
        cfg.step_idx, cfg.layer_idx,
    )
    steps = gate.any(axis=1)
    layers = tuple(int(i) for i in np.nonzero(gate.any(axis=0))[0])
    return MasaCtrlControl(
        step_gate=jnp.asarray(steps),
        layers=layers,
        num_prompts=num_prompts,
        union=(cfg.mode == "union"),
        mask_s=None if mask_s is None else jnp.asarray(mask_s, jnp.float32),
        mask_t=None if mask_t is None else jnp.asarray(mask_t, jnp.float32),
        auto_mask=auto_mask,
        thres=thres,
        ref_idx=tuple(ref_token_idx),
        cur_idx=tuple(cur_token_idx),
    )


# ---------------------------------------------------------------------------
# Plug-and-Play

# Injection gathers the *conditional source* (index 2 of [u_s, u_t, c_s, c_t])
# into both target branches (pnp/model/register.py:46-52, :163-168).
_PNP_INJECT_IDX = (0, 2, 2, 2)


@struct.dataclass
class PnPStep(NoneStep):
    qk_gate: jnp.ndarray  # () bool
    conv_gate: jnp.ndarray  # () bool
    attn_layers: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    conv_keys: Tuple[str, ...] = struct.field(pytree_node=False, default=())

    def self_plan(self, site: AttnSite, batch: int) -> Optional[SelfAttnPlan]:
        if site.layer not in self.attn_layers:
            return None
        assert batch == 4, "PnP operates on [u_src, u_tgt, c_src, c_tgt]"
        iota = jnp.arange(batch, dtype=jnp.int32)
        inject = jnp.asarray(_PNP_INJECT_IDX, jnp.int32)
        idx = jnp.where(self.qk_gate, inject, iota)
        return SelfAttnPlan(
            q_idx=idx,
            k_idx=idx[:, None],
            v_idx=iota[:, None],
            valid=jnp.ones((batch, 1), bool),
        )

    def resnet_hook(self, key: str, h: jnp.ndarray) -> jnp.ndarray:
        if key not in self.conv_keys:
            return h
        inject = jnp.asarray(_PNP_INJECT_IDX, jnp.int32)
        return jnp.where(self.conv_gate, h[inject], h)


@struct.dataclass
class PnPControl:
    qk_gate: jnp.ndarray  # (num_steps,)
    conv_gate: jnp.ndarray  # (num_steps,)
    attn_layers: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    conv_keys: Tuple[str, ...] = struct.field(pytree_node=False, default=())

    def at_step(self, i) -> PnPStep:
        return PnPStep(
            qk_gate=self.qk_gate[i],
            conv_gate=self.conv_gate[i],
            attn_layers=self.attn_layers,
            conv_keys=self.conv_keys,
        )


def build_pnp_control(
    num_steps: int,
    cfg: PnPConfig,
    attn_layers: Tuple[int, ...],
    conv_keys: Tuple[str, ...],
) -> PnPControl:
    qk, conv = schedules.pnp_gates(num_steps, cfg.pnp_attn_t, cfg.pnp_f_t)
    return PnPControl(
        qk_gate=jnp.asarray(qk),
        conv_gate=jnp.asarray(conv),
        attn_layers=attn_layers,
        conv_keys=conv_keys,
    )


# ---------------------------------------------------------------------------
# Attention store (visualization / analysis)


@struct.dataclass
class AttentionStoreStep(NoneStep):
    """Records attention maps for visualization — the reference's
    AttentionStore (p2p/model/attention_base.py:57-92: stores maps <= 32^2
    tokens, per-step, then averages across steps). Use with
    ``denoise(..., collect_records=True)`` and average the stacked ys with
    ``average_attention``. Maps are mean-over-heads to bound memory."""

    max_seq: int = struct.field(pytree_node=False, default=1024)
    include_self: bool = struct.field(pytree_node=False, default=True)

    def record_key(self, site: AttnSite) -> Optional[str]:
        if site.seq_len > self.max_seq:
            return None
        if not site.is_cross and not self.include_self:
            return None
        return site.key

    def record(self, site: AttnSite, probs: jnp.ndarray) -> jnp.ndarray:
        return probs.mean(axis=1)  # (B, N, K), mean over heads


@struct.dataclass
class AttentionStoreControl(AttentionStoreStep):
    def at_step(self, i) -> AttentionStoreStep:
        del i
        return AttentionStoreStep(
            max_seq=self.max_seq, include_self=self.include_self
        )


def average_attention(ys: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Per-site step-averaged maps (reference get_average_attention,
    p2p/model/attention_base.py:84-86). ys: {site: (S, B, N, K)}."""
    return {k: v.mean(axis=0) for k, v in ys.items()}


# ---------------------------------------------------------------------------
# pix2pix-zero


@struct.dataclass
class P2ZStep(NoneStep):
    """Records every cross-attention probability map (both passes of
    pix2pix-zero need them: pass 1 stores references, pass 2 differentiates
    the L2 distance to them — pix2pix-zero/model/sd_utils.py:104-110,166-172)."""

    store_dtype: jnp.dtype = struct.field(pytree_node=False, default=jnp.bfloat16)

    def record_key(self, site: AttnSite) -> Optional[str]:
        return site.key if site.is_cross else None

    def record(self, site: AttnSite, probs: jnp.ndarray) -> jnp.ndarray:
        return probs.astype(self.store_dtype)


@struct.dataclass
class P2ZControl(P2ZStep):
    def at_step(self, i) -> P2ZStep:
        del i
        return P2ZStep(store_dtype=self.store_dtype)
