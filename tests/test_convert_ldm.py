"""LDM single-file conversion round-trip on tiny configs.

Builds random Flax params, exports them to diffusers-style keys, renames to
the LDM layout with the same structural tables (forward direction defined
here), runs the converter back, and checks the loaded params are identical —
validating the structural walk end-to-end. (Absolute parity vs a real
community checkpoint needs weights, unavailable offline.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from image_editing_framework_tpu.models import configs, convert_ldm, loader
from image_editing_framework_tpu.models.unet import UNet2DCondition
from image_editing_framework_tpu.models.vae import TINY_VAE, AutoencoderKL


def to_ldm_unet(d, cfg):
    table = convert_ldm.unet_rename_table(cfg)
    out = {}
    for k, v in d.items():
        for dk in sorted(table, key=len, reverse=True):
            if k.startswith(dk + "."):
                rest = k[len(dk) + 1 :]
                if "resnets" in dk:
                    for a, b in convert_ldm._RES_SUB.items():
                        if rest.startswith(b):
                            rest = a + rest[len(b) :]
                            break
                if dk.endswith("downsamplers.0") and rest.startswith("conv."):
                    rest = rest[len("conv.") :]
                out[f"model.diffusion_model.{table[dk]}.{rest}"] = v
                break
        else:
            raise KeyError(k)
    return out


def to_ldm_vae(d, cfg):
    n = len(cfg.block_out_channels)
    out = {}
    for k, v in d.items():
        parts = k.split(".")
        if parts[0] in ("quant_conv", "post_quant_conv"):
            out[f"first_stage_model.{k}"] = v
            continue
        tower, rest = parts[0], parts[1:]
        if rest[0] in ("conv_in", "conv_out"):
            out[f"first_stage_model.{tower}.{'.'.join(rest)}"] = v
        elif rest[0] == "conv_norm_out":
            out[f"first_stage_model.{tower}.norm_out.{rest[1]}"] = v
        elif rest[0] == "down_blocks":
            lvl, kind = rest[1], rest[2]
            if kind == "resnets":
                sub = ".".join(rest[4:]).replace("conv_shortcut", "nin_shortcut")
                out[f"first_stage_model.{tower}.down.{lvl}.block.{rest[3]}.{sub}"] = v
            else:  # downsamplers
                out[f"first_stage_model.{tower}.down.{lvl}.downsample.{'.'.join(rest[4:])}"] = v
        elif rest[0] == "up_blocks":
            lvl = n - 1 - int(rest[1])
            kind = rest[2]
            if kind == "resnets":
                sub = ".".join(rest[4:]).replace("conv_shortcut", "nin_shortcut")
                out[f"first_stage_model.{tower}.up.{lvl}.block.{rest[3]}.{sub}"] = v
            else:  # upsamplers
                out[f"first_stage_model.{tower}.up.{lvl}.upsample.{'.'.join(rest[4:])}"] = v
        elif rest[0] == "mid_block":
            kind = rest[1]
            if kind == "resnets":
                blk = "block_1" if rest[2] == "0" else "block_2"
                out[f"first_stage_model.{tower}.mid.{blk}.{'.'.join(rest[3:])}"] = v
            else:  # attentions.0
                name = {
                    "group_norm": "norm", "to_q": "q", "to_k": "k", "to_v": "v",
                }.get(rest[3], "proj_out")
                val = v
                if val.ndim == 2 and name != "norm":
                    val = val[:, :, None, None]
                out[f"first_stage_model.{tower}.mid.attn_1.{name}.{rest[-1]}"] = val
        else:
            raise KeyError(k)
    return out


def test_unet_ldm_roundtrip():
    cfg = configs.TINY_UNET
    m = UNet2DCondition(cfg)
    x = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 77, 32))
    params = m.init(jax.random.PRNGKey(0), x, 0, ctx)
    diff = loader.export_params(params, loader.unet_key)
    ldm = to_ldm_unet(diff, cfg)
    back = convert_ldm.convert_ldm_unet(ldm, cfg)
    assert set(back) == set(diff)
    skeleton = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x, 0, ctx))
    loaded = loader.load_params(skeleton, back, loader.unet_key)
    for (pa, a), (pb, b) in zip(
        sorted(loader._flatten(params["params"]).items()),
        sorted(loader._flatten(loaded["params"]).items()),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))


def test_vae_ldm_roundtrip():
    cfg = TINY_VAE
    m = AutoencoderKL(cfg)
    x = jnp.zeros((1, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    diff = loader.export_params(params, loader.vae_key)
    ldm = to_ldm_vae(diff, cfg)
    back = convert_ldm.convert_ldm_vae(ldm, cfg)
    assert set(back) == set(diff)
    skeleton = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), x))
    loaded = loader.load_params(skeleton, back, loader.vae_key)
    for (pa, a), (pb, b) in zip(
        sorted(loader._flatten(params["params"]).items()),
        sorted(loader._flatten(loaded["params"]).items()),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))


def test_text_prefix_strip():
    state = {
        "cond_stage_model.transformer.text_model.final_layer_norm.weight": np.ones(4),
        "model.diffusion_model.out.0.weight": np.ones(4),
    }
    out = convert_ldm.convert_ldm_text(state)
    assert list(out) == ["text_model.final_layer_norm.weight"]


def test_open_clip_text_conversion_parity():
    """transformers ckpt -> open_clip naming -> converter -> identical."""
    rng = np.random.RandomState(0)
    D, V, I = 32, 64, 64
    tf = {}
    oc = {}
    oc["token_embedding.weight"] = tf[
        "text_model.embeddings.token_embedding.weight"
    ] = rng.randn(V, D).astype(np.float32)
    oc["positional_embedding"] = tf[
        "text_model.embeddings.position_embedding.weight"
    ] = rng.randn(77, D).astype(np.float32)
    for a, b in (("ln_final", "text_model.final_layer_norm"),):
        oc[f"{a}.weight"] = tf[f"{b}.weight"] = rng.randn(D).astype(np.float32)
        oc[f"{a}.bias"] = tf[f"{b}.bias"] = rng.randn(D).astype(np.float32)
    proj = rng.randn(D, 16).astype(np.float32)
    oc["text_projection"] = proj
    tf["text_projection.weight"] = proj.T
    for i in range(2):
        src = f"transformer.resblocks.{i}"
        dst = f"text_model.encoder.layers.{i}"
        for a, b in (("ln_1", "layer_norm1"), ("ln_2", "layer_norm2")):
            oc[f"{src}.{a}.weight"] = tf[f"{dst}.{b}.weight"] = rng.randn(D).astype(np.float32)
            oc[f"{src}.{a}.bias"] = tf[f"{dst}.{b}.bias"] = rng.randn(D).astype(np.float32)
        qkv_w = rng.randn(3 * D, D).astype(np.float32)
        qkv_b = rng.randn(3 * D).astype(np.float32)
        oc[f"{src}.attn.in_proj_weight"] = qkv_w
        oc[f"{src}.attn.in_proj_bias"] = qkv_b
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            tf[f"{dst}.self_attn.{name}.weight"] = qkv_w[j * D : (j + 1) * D]
            tf[f"{dst}.self_attn.{name}.bias"] = qkv_b[j * D : (j + 1) * D]
        oc[f"{src}.attn.out_proj.weight"] = tf[f"{dst}.self_attn.out_proj.weight"] = rng.randn(D, D).astype(np.float32)
        oc[f"{src}.attn.out_proj.bias"] = tf[f"{dst}.self_attn.out_proj.bias"] = rng.randn(D).astype(np.float32)
        oc[f"{src}.mlp.c_fc.weight"] = tf[f"{dst}.mlp.fc1.weight"] = rng.randn(I, D).astype(np.float32)
        oc[f"{src}.mlp.c_fc.bias"] = tf[f"{dst}.mlp.fc1.bias"] = rng.randn(I).astype(np.float32)
        oc[f"{src}.mlp.c_proj.weight"] = tf[f"{dst}.mlp.fc2.weight"] = rng.randn(D, I).astype(np.float32)
        oc[f"{src}.mlp.c_proj.bias"] = tf[f"{dst}.mlp.fc2.bias"] = rng.randn(D).astype(np.float32)

    state = {f"cond_stage_model.model.{k}": v for k, v in oc.items()}
    got = convert_ldm.convert_ldm_text(state)
    assert set(got) == set(tf)
    for k in tf:
        np.testing.assert_array_equal(got[k], tf[k], err_msg=k)
