"""Weight-mapping tests.

1. Round-trip: Flax params -> PyTorch-layout dict -> Flax params is identity
   for UNet / VAE / CLIP (validates the key mapping is a bijection over the
   full parameter structure, including SDXL addition embeddings).
2. Real parity: a transformers (PyTorch) CLIPTextModel with random weights is
   converted through the loader and must produce identical hidden states —
   an actual cross-framework oracle, since diffusers is unavailable offline.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_editing_framework_tpu.models import configs, loader
from image_editing_framework_tpu.models.clip import TINY_CLIP, CLIPTextModel
from image_editing_framework_tpu.models.unet import UNet2DCondition
from image_editing_framework_tpu.models.vae import TINY_VAE, AutoencoderKL


def roundtrip(module, params, key_fn, *args, **kwargs):
    ckpt = loader.export_params(params, key_fn)
    skeleton = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), *args, **kwargs))
    loaded = loader.load_params(skeleton, ckpt, key_fn)
    flat_a = loader._flatten(params["params"])
    flat_b = loader._flatten(loaded["params"])
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_allclose(
            np.asarray(flat_a[k]), np.asarray(flat_b[k]), err_msg=str(k)
        )
    return ckpt


def test_unet_roundtrip_and_key_names():
    m = UNet2DCondition(configs.TINY_UNET)
    x = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 77, 32))
    params = m.init(jax.random.PRNGKey(0), x, 0, ctx)
    ckpt = roundtrip(m, params, loader.unet_key, x, 0, ctx)
    keys = set(ckpt)
    # spot-check diffusers naming
    assert "conv_in.weight" in keys
    assert "time_embedding.linear_1.weight" in keys
    assert "down_blocks.0.resnets.0.norm1.weight" in keys
    assert "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight" in keys
    assert "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight" in keys
    assert "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.weight" in keys
    assert "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_out.0.bias" in keys
    assert "down_blocks.0.downsamplers.0.conv.weight" in keys
    assert "mid_block.attentions.0.proj_in.weight" in keys
    assert "up_blocks.1.attentions.0.norm.weight" in keys
    assert "up_blocks.0.upsamplers.0.conv.weight" in keys
    assert "conv_norm_out.weight" in keys
    # conv kernels arrive in OIHW
    assert ckpt["conv_in.weight"].shape == (32, 4, 3, 3)
    # linear in (out, in)
    assert ckpt["time_embedding.linear_1.weight"].shape == (128, 32)


def test_unet_xl_roundtrip():
    m = UNet2DCondition(configs.TINY_XL_UNET)
    x = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 77, 32))
    added = {"text_embeds": jnp.zeros((1, 16)), "time_ids": jnp.zeros((1, 6))}
    params = m.init(jax.random.PRNGKey(0), x, 0, ctx, None, added)
    ckpt = roundtrip(m, params, loader.unet_key, x, 0, ctx, None, added)
    assert "add_embedding.linear_1.weight" in ckpt


def test_vae_roundtrip():
    m = AutoencoderKL(TINY_VAE)
    x = jnp.zeros((1, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    ckpt = roundtrip(m, params, loader.vae_key, x)
    keys = set(ckpt)
    assert "encoder.conv_in.weight" in keys
    assert "encoder.down_blocks.0.resnets.0.norm1.weight" in keys
    assert "encoder.down_blocks.0.downsamplers.0.conv.weight" in keys
    assert "encoder.mid_block.attentions.0.to_q.weight" in keys
    assert "decoder.up_blocks.0.upsamplers.0.conv.weight" in keys
    assert "quant_conv.weight" in keys and "post_quant_conv.weight" in keys


def test_clip_roundtrip():
    m = CLIPTextModel(TINY_CLIP)
    ids = jnp.zeros((1, 77), jnp.int32)
    params = m.init(jax.random.PRNGKey(0), ids)
    ckpt = roundtrip(m, params, loader.clip_key, ids)
    keys = set(ckpt)
    assert "text_model.embeddings.token_embedding.weight" in keys
    assert "text_model.encoder.layers.0.self_attn.q_proj.weight" in keys
    assert "text_model.encoder.layers.0.mlp.fc1.weight" in keys
    assert "text_projection.weight" in keys


def test_clip_parity_vs_transformers():
    """Load a random-weight PyTorch CLIPTextModel through the mapper and
    compare hidden states — a true cross-framework numerical oracle."""
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModelWithProjection

    hf_cfg = HFConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        max_position_embeddings=77,
        hidden_act="quick_gelu",
        projection_dim=32,
        eos_token_id=63,
        bos_token_id=0,
    )
    torch.manual_seed(0)
    hf = CLIPTextModelWithProjection(hf_cfg).eval()
    ckpt = {k: v.numpy() for k, v in hf.state_dict().items()}

    m = CLIPTextModel(TINY_CLIP)
    ids_np = np.array([[0, 5, 9, 30, 63, 63, 63, 63]], np.int32)
    skeleton = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    )
    params = loader.load_params(skeleton, ckpt, loader.clip_key)
    out = m.apply(params, jnp.asarray(ids_np))

    with torch.no_grad():
        hf_out = hf(
            input_ids=torch.tensor(ids_np.astype(np.int64)), output_hidden_states=True
        )
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]),
        hf_out.last_hidden_state.numpy(),
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["penultimate"]),
        hf_out.hidden_states[-2].numpy(),
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["pooled"]), hf_out.text_embeds.numpy(), atol=2e-5
    )


def test_orbax_pipeline_cache_roundtrip(tmp_path):
    from image_editing_framework_tpu.models.registry import (
        restore_pipeline_cache,
        save_pipeline_cache,
    )
    from image_editing_framework_tpu.pipelines import tiny_pipeline

    pipe = tiny_pipeline(num_steps=4)
    orig = jax.tree_util.tree_leaves(pipe.unet_params)[0].copy()
    save_pipeline_cache(pipe, str(tmp_path / "cache"))

    # clobber, then restore
    pipe.unet_params = jax.tree_util.tree_map(jnp.zeros_like, pipe.unet_params)
    restore_pipeline_cache(pipe, str(tmp_path / "cache"))
    back = jax.tree_util.tree_leaves(pipe.unet_params)[0]
    np.testing.assert_array_equal(np.asarray(back), np.asarray(orig))
