"""Checkpoint loading: safetensors (PyTorch layout) -> Flax param trees.

The reference loads weights through diffusers ``from_pretrained`` /
``from_single_file`` (p2p/edit_real.py:71-98). Here the same safetensors
files are mapped directly into the Flax modules:

* Linear:    torch (out, in)        -> kernel (in, out)       [transpose]
* Conv:      torch (O, I, kh, kw)   -> kernel (kh, kw, I, O)
* Norms:     weight/bias            -> scale/bias
* Embedding: (V, D) unchanged

Loading is structure-driven: the Flax param skeleton (via ``jax.eval_shape``)
is walked leaf-by-leaf, each path translated to its PyTorch key, fetched,
converted, and shape-checked — any missing or mismatched tensor fails loudly
with the offending key.
"""

from __future__ import annotations

import os
import re
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# safetensors IO


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Prefer the native zero-copy mmap reader; fall back to the safetensors
    package when the C++ toolchain is unavailable."""
    try:
        from image_editing_framework_tpu import native

        if native.available():
            return native.MmapSafetensors(path)  # mapping-compatible
    except Exception:
        pass
    from safetensors import numpy as st_numpy

    return st_numpy.load_file(path)


def load_sharded_safetensors(directory: str, base: str) -> Dict[str, np.ndarray]:
    """Load ``base.safetensors`` or its ``*.index.json`` shards from a dir."""
    import json

    single = os.path.join(directory, base + ".safetensors")
    if os.path.exists(single):
        return load_safetensors(single)
    index = os.path.join(directory, base + ".safetensors.index.json")
    with open(index) as f:
        shards = set(json.load(f)["weight_map"].values())
    out: Dict[str, np.ndarray] = {}
    for shard in sorted(shards):
        out.update(load_safetensors(os.path.join(directory, shard)))
    return out


# --------------------------------------------------------------------------
# tensor conversion


def to_flax_tensor(x: np.ndarray, flax_leaf_name: str) -> np.ndarray:
    if "embedding" in flax_leaf_name or x.ndim == 1:
        return x
    if x.ndim == 2:
        return x.T  # linear
    if x.ndim == 4:
        return x.transpose(2, 3, 1, 0)  # conv OIHW -> HWIO
    return x


def to_torch_tensor(x: np.ndarray, flax_leaf_name: str) -> np.ndarray:
    """Inverse of to_flax_tensor (used by round-trip tests / exporters)."""
    if "embedding" in flax_leaf_name or x.ndim == 1:
        return x
    if x.ndim == 2:
        return x.T
    if x.ndim == 4:
        return x.transpose(3, 2, 0, 1)
    return x


_LEAF = {"kernel": "weight", "scale": "weight", "bias": "bias", "embedding": "weight"}


# --------------------------------------------------------------------------
# key translation: flax path -> diffusers/transformers PyTorch key


def _unet_module_key(name: str) -> str:
    """Map one top-level Flax module name to its diffusers prefix."""
    m = re.fullmatch(r"down_(\d+)_resnet_(\d+)", name)
    if m:
        return f"down_blocks.{m[1]}.resnets.{m[2]}"
    m = re.fullmatch(r"down_(\d+)_attn_(\d+)", name)
    if m:
        return f"down_blocks.{m[1]}.attentions.{m[2]}"
    m = re.fullmatch(r"down_(\d+)_downsample", name)
    if m:
        return f"down_blocks.{m[1]}.downsamplers.0"
    m = re.fullmatch(r"up_(\d+)_resnet_(\d+)", name)
    if m:
        return f"up_blocks.{m[1]}.resnets.{m[2]}"
    m = re.fullmatch(r"up_(\d+)_attn_(\d+)", name)
    if m:
        return f"up_blocks.{m[1]}.attentions.{m[2]}"
    m = re.fullmatch(r"up_(\d+)_upsample", name)
    if m:
        return f"up_blocks.{m[1]}.upsamplers.0"
    m = re.fullmatch(r"mid_resnet_(\d+)", name)
    if m:
        return f"mid_block.resnets.{m[1]}"
    if name == "mid_attn":
        return "mid_block.attentions.0"
    if name == "norm_out":
        return "conv_norm_out"
    return name  # conv_in, conv_out, time_embedding, add_embedding


def _unet_sub_key(parts: Tuple[str, ...]) -> str:
    """Map the within-module Flax path to diffusers naming."""
    out = []
    for p in parts:
        m = re.fullmatch(r"block_(\d+)", p)
        if m:
            out.append(f"transformer_blocks.{m[1]}")
        elif p == "to_out_0":
            out.append("to_out.0")
        elif p == "geglu_proj":
            out.append("net.0.proj")
        elif p == "out_proj" and out and out[-1] == "ff":
            out.append("net.2")
        else:
            out.append(p)
    return ".".join(out)


def unet_key(path: Tuple[str, ...]) -> str:
    mod, rest, leaf = path[0], path[1:-1], path[-1]
    pieces = [_unet_module_key(mod)]
    if rest:
        pieces.append(_unet_sub_key(rest))
    pieces.append(_LEAF[leaf])
    return ".".join(pieces)


def vae_key(path: Tuple[str, ...]) -> str:
    # path like ('encoder', 'down_0_resnet_1', 'norm1', 'scale')
    if path[0] in ("quant_conv", "post_quant_conv"):
        return f"{path[0]}.{_LEAF[path[-1]]}"
    tower, mod, rest, leaf = path[0], path[1], path[2:-1], path[-1]
    m = re.fullmatch(r"down_(\d+)_resnet_(\d+)", mod)
    if m:
        key = f"down_blocks.{m[1]}.resnets.{m[2]}"
    elif re.fullmatch(r"down_(\d+)_downsample", mod):
        i = mod.split("_")[1]
        key = f"down_blocks.{i}.downsamplers.0.conv"
    elif re.fullmatch(r"up_(\d+)_resnet_(\d+)", mod):
        m = re.fullmatch(r"up_(\d+)_resnet_(\d+)", mod)
        key = f"up_blocks.{m[1]}.resnets.{m[2]}"
    elif re.fullmatch(r"up_(\d+)_upsample", mod):
        i = mod.split("_")[1]
        key = f"up_blocks.{i}.upsamplers.0.conv"
    elif re.fullmatch(r"mid_resnet_(\d+)", mod):
        i = mod.split("_")[2]
        key = f"mid_block.resnets.{i}"
    elif mod == "mid_attn":
        key = "mid_block.attentions.0"
    else:
        key = mod  # conv_in, conv_out, norm_out
        key = {"norm_out": "conv_norm_out"}.get(key, key)
    sub = ".".join(p if p != "to_out_0" else "to_out.0" for p in rest)
    pieces = [tower, key] + ([sub] if sub else []) + [_LEAF[path[-1]]]
    return ".".join(pieces)


def clip_key(path: Tuple[str, ...]) -> str:
    # transformers CLIPTextModel: text_model.{embeddings, encoder.layers.i, final_layer_norm}
    mod = path[0]
    if mod == "token_embedding":
        return "text_model.embeddings.token_embedding.weight"
    if mod == "position_embedding":
        return "text_model.embeddings.position_embedding.weight"
    leaf = _LEAF[path[-1]]
    if mod == "final_layer_norm":
        return f"text_model.final_layer_norm.{leaf}"
    if mod == "text_projection":
        return "text_projection.weight"
    m = re.fullmatch(r"layer_(\d+)", mod)
    if m:
        rest = list(path[1:-1])
        if rest and rest[0] in ("fc1", "fc2"):
            rest = ["mlp"] + rest
        return f"text_model.encoder.layers.{m[1]}." + ".".join(rest + [leaf])
    raise KeyError(f"unmapped CLIP path: {path}")


def clip_vision_key(path: Tuple[str, ...]) -> str:
    """transformers CLIPVisionModelWithProjection key layout (note the
    upstream 'pre_layrnorm' spelling is real)."""
    mod = path[0]
    if mod == "patch_embedding":
        return "vision_model.embeddings.patch_embedding.weight"
    if mod == "class_embedding":
        return "vision_model.embeddings.class_embedding"
    if mod == "position_embedding":
        return "vision_model.embeddings.position_embedding.weight"
    leaf = _LEAF[path[-1]]
    if mod in ("pre_layrnorm", "post_layernorm"):
        return f"vision_model.{mod}.{leaf}"
    if mod == "visual_projection":
        return "visual_projection.weight"
    m = re.fullmatch(r"layer_(\d+)", mod)
    if m:
        rest = list(path[1:-1])
        if rest and rest[0] in ("fc1", "fc2"):
            rest = ["mlp"] + rest
        return f"vision_model.encoder.layers.{m[1]}." + ".".join(rest + [leaf])
    raise KeyError(f"unmapped CLIP vision path: {path}")


# --------------------------------------------------------------------------
# structure-driven loading


def _flatten(tree: Any, prefix=()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for path, v in flat.items():
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return out


def load_params(
    skeleton: Any,
    ckpt: Dict[str, np.ndarray],
    key_fn: Callable[[Tuple[str, ...]], str],
    dtype=jnp.float32,
) -> Any:
    """Fill a Flax param skeleton (from jax.eval_shape of module.init) from a
    PyTorch-layout checkpoint dict. Raises KeyError/ValueError with the
    offending key on any mismatch."""
    flat = _flatten(skeleton["params"] if "params" in skeleton else skeleton)
    out: Dict[Tuple[str, ...], jnp.ndarray] = {}
    for path, leaf in flat.items():
        tkey = key_fn(path)
        if tkey not in ckpt:
            raise KeyError(f"checkpoint missing {tkey} (for flax path {path})")
        arr = to_flax_tensor(np.asarray(ckpt[tkey]), path[-1])
        if tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(
                f"shape mismatch for {tkey}: ckpt {arr.shape} vs model {leaf.shape}"
            )
        out[path] = jnp.asarray(arr, dtype)
    return {"params": _unflatten(out)}


def export_params(
    params: Any, key_fn: Callable[[Tuple[str, ...]], str]
) -> Dict[str, np.ndarray]:
    """Inverse of load_params (round-trip testing / checkpoint export)."""
    flat = _flatten(params["params"] if "params" in params else params)
    return {
        key_fn(path): to_torch_tensor(np.asarray(leaf), path[-1])
        for path, leaf in flat.items()
    }
