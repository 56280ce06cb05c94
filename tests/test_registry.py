"""Registry e2e: load_pipeline through real checkpoint-directory layouts.

Builds fake HF-snapshot checkpoint directories (tiny random weights written
as safetensors in diffusers' torch key layout) and loads them through the
production ``load_pipeline`` path — including the 'xl-refiner' branch, which
must attach a refiner img2img pipeline sharing text_encoder_2/vae with the
XL-base editing pipe (reference: p2p/edit_real.py:77-89).
"""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_editing_framework_tpu.models import configs, loader
from image_editing_framework_tpu.models.clip import TINY_CLIP, CLIPTextModel
from image_editing_framework_tpu.models.registry import VersionSpec, load_pipeline
from image_editing_framework_tpu.models.unet import UNet2DCondition
from image_editing_framework_tpu.models.vae import TINY_VAE, AutoencoderKL


def _write_safetensors(directory, ckpt, base):
    from safetensors.numpy import save_file

    directory.mkdir(parents=True, exist_ok=True)
    save_file(
        {k: np.ascontiguousarray(np.asarray(v, np.float32)) for k, v in ckpt.items()},
        str(directory / (base + ".safetensors")),
    )


def _write_tokenizer(directory):
    """Minimal CLIP-BPE files: byte-level chars, no merges."""
    directory.mkdir(parents=True, exist_ok=True)
    chars = [chr(c) for c in range(33, 127)]
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for ch in chars:
        vocab[ch] = len(vocab)
        vocab[ch + "</w>"] = len(vocab)
    (directory / "vocab.json").write_text(json.dumps(vocab))
    (directory / "merges.txt").write_text("#version: 0.2\n")
    return len(vocab)


# tiny text-tower configs sized so that: base ctx = hid1 + hid2 = 32
# (TINY_XL_UNET.cross_attention_dim), refiner ctx = hid2 = 16, pooled = 16.
def _text_cfgs(vocab_size):
    t1 = dataclasses.replace(
        TINY_CLIP, hidden_size=16, projection_dim=None, vocab_size=vocab_size
    )
    t2 = dataclasses.replace(
        TINY_CLIP, hidden_size=16, projection_dim=16, vocab_size=vocab_size
    )
    return t1, t2


@pytest.fixture(scope="module")
def fake_ckpts(tmp_path_factory):
    """base-layout dir (XL) + refiner dir (unet only — shared towers/vae)."""
    tmp = tmp_path_factory.mktemp("ckpts")
    base_dir = tmp / "xl-base"
    ref_dir = tmp / "xl-refiner"
    vocab_size = _write_tokenizer(base_dir / "tokenizer")
    _write_tokenizer(base_dir / "tokenizer_2")
    t1_cfg, t2_cfg = _text_cfgs(vocab_size)

    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 5)

    unet = UNet2DCondition(configs.TINY_XL_UNET)
    added = {"text_embeds": jnp.zeros((1, 16)), "time_ids": jnp.zeros((1, 6))}
    up = unet.init(
        ks[0], jnp.zeros((1, 16, 16, 4)), 0, jnp.zeros((1, 77, 32)), None, added, False
    )
    _write_safetensors(
        base_dir / "unet", loader.export_params(up, loader.unet_key),
        "diffusion_pytorch_model",
    )

    vae = AutoencoderKL(TINY_VAE)
    vp = vae.init(ks[1], jnp.zeros((1, 32, 32, 3)))
    _write_safetensors(
        base_dir / "vae", loader.export_params(vp, loader.vae_key),
        "diffusion_pytorch_model",
    )

    ids = jnp.zeros((1, 77), jnp.int32)
    for sub, cfg, k in (
        ("text_encoder", t1_cfg, ks[2]),
        ("text_encoder_2", t2_cfg, ks[3]),
    ):
        tm = CLIPTextModel(cfg)
        tp = tm.init(k, ids)
        _write_safetensors(
            base_dir / sub, loader.export_params(tp, loader.clip_key), "model"
        )

    # refiner checkpoint: unet only (towers/vae shared from the base pipe)
    ref_unet_cfg = dataclasses.replace(
        configs.TINY_REFINER_UNET, cross_attention_dim=16
    )
    runet = UNet2DCondition(ref_unet_cfg)
    radded = {"text_embeds": jnp.zeros((1, 16)), "time_ids": jnp.zeros((1, 5))}
    rup = runet.init(
        ks[4], jnp.zeros((1, 16, 16, 4)), 0, jnp.zeros((1, 77, 16)), None, radded, False
    )
    _write_safetensors(
        ref_dir / "unet", loader.export_params(rup, loader.unet_key),
        "diffusion_pytorch_model",
    )

    base_spec = VersionSpec(
        "xl", configs.TINY_XL_UNET, t1_cfg, t2_cfg,
        vae_scaling=TINY_VAE.scaling_factor, sample_size=128, vae=TINY_VAE,
    )
    ref_spec = VersionSpec(
        "xl", ref_unet_cfg, t2_cfg,
        vae_scaling=TINY_VAE.scaling_factor, sample_size=128, vae=TINY_VAE,
    )
    return base_dir, ref_dir, base_spec, ref_spec


@pytest.mark.slow
def test_load_pipeline_xl_refiner(fake_ckpts):
    base_dir, ref_dir, base_spec, ref_spec = fake_ckpts
    pipe = load_pipeline(
        "xl-refiner", num_inference_steps=4,
        path=str(base_dir), spec=base_spec,
        refiner_path=str(ref_dir), refiner_spec=ref_spec,
    )
    # the editing pipe is XL-base flavored
    assert pipe.model_type == "xl" and not pipe.is_refiner
    ctx, added = pipe.encode_prompts(["a cat"])
    assert ctx.shape == (2, 77, 32)  # two-tower concat
    np.testing.assert_array_equal(np.asarray(ctx[0]), 0)  # force-zeros uncond

    # the attached refiner: bigG tower only, shared params, 5 time ids
    ref = pipe.refiner
    assert ref is not None and ref.is_refiner
    assert ref.text_params_2 is pipe.text_params_2  # shared, not reloaded
    assert ref.vae_params is pipe.vae_params
    assert ref.scheduler is pipe.scheduler
    rctx, radded = ref.encode_prompts(["a cat"])
    assert rctx.shape == (2, 77, 16)  # single-tower width
    assert radded["text_embeds"].shape == (2, 16)
    assert float(np.abs(np.asarray(rctx[0])).max()) > 0  # real uncond encode
    assert ref.add_time_ids(128, 128, 1).shape == (1, 5)

    # e2e img2img through the loaded refiner
    from image_editing_framework_tpu.methods.img2img import img2img

    img = np.random.RandomState(0).randint(0, 255, (32, 32, 3), np.uint8)
    out = img2img(ref, img, "a cat", strength=0.5, use_flash=False)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(out.astype(np.float32)).all()


def test_single_file_without_tokenizer_fails_early_and_clearly(tmp_path, monkeypatch):
    """A lone community .safetensors with no adjacent tokenizer/ and a base
    registry entry that points nowhere must fail IMMEDIATELY with both tried
    paths and the sd_mapping.py remedy — not later with a confusing
    tokenizer-file error (reference README.md:30's 'edit sd_mapping.py'
    contract)."""
    from image_editing_framework_tpu import sd_mapping

    lone = tmp_path / "communityModel.safetensors"
    lone.write_bytes(b"")  # never read: the check fails before conversion
    monkeypatch.setitem(
        sd_mapping.sd_maps, "1.5", str(tmp_path / "missing-base")
    )
    with pytest.raises(FileNotFoundError) as e:
        load_pipeline("1.5", path=str(lone))
    msg = str(e.value)
    assert str(tmp_path / "tokenizer") in msg          # path next to the file
    assert str(tmp_path / "missing-base") in msg       # base entry tried
    assert "sd_mapping.py" in msg                      # the remedy
    # with a tokenizer/ directory NEXT TO the file the check passes and the
    # load proceeds into conversion (which then reads the checkpoint itself)
    _write_tokenizer(tmp_path / "tokenizer")
    with pytest.raises(Exception) as e2:
        load_pipeline("1.5", path=str(lone))
    assert not isinstance(e2.value, FileNotFoundError)


def test_tokenizer2_dir_swaps_only_trailing_component(tmp_path):
    """XL single-file tokenizer_2 resolution must swap only the TRAILING
    directory name: str.replace("tokenizer", "tokenizer_2") would also
    rewrite a 'tokenizer' substring elsewhere in the checkpoint path (e.g.
    /ckpts/tokenizer-lab/...), producing a nonexistent path."""
    from image_editing_framework_tpu.models.registry import _tokenizer2_dir

    root = tmp_path / "tokenizer-lab"   # adversarial substring in the path
    (root / "tokenizer").mkdir(parents=True)
    (root / "tokenizer_2").mkdir()
    tok_dir = str(root / "tokenizer")
    assert _tokenizer2_dir(tok_dir, str(root), True) == str(root / "tokenizer_2")
    # no tokenizer_2/ next to the single file -> fall back to tower 1's files
    import shutil

    shutil.rmtree(root / "tokenizer_2")
    assert _tokenizer2_dir(tok_dir, str(root), True) == tok_dir
    # diffusers-layout checkpoints resolve tokenizer_2 under the root
    assert _tokenizer2_dir(tok_dir, str(root), False) == str(root / "tokenizer_2")


def test_load_refiner_pipeline_standalone(fake_ckpts):
    """Standalone refiner load (no base): towers/vae read from the refiner
    dir itself — requires text_encoder_2/vae/tokenizer_2 alongside unet."""
    base_dir, ref_dir, base_spec, ref_spec = fake_ckpts
    from image_editing_framework_tpu.models.registry import load_refiner_pipeline

    # populate the refiner dir's own shared components for this test
    import shutil

    for sub in ("vae", "text_encoder_2"):
        if not (ref_dir / sub).exists():
            shutil.copytree(base_dir / sub, ref_dir / sub)
    if not (ref_dir / "tokenizer_2").exists():
        shutil.copytree(base_dir / "tokenizer_2", ref_dir / "tokenizer_2")

    ref = load_refiner_pipeline(
        path=str(ref_dir), num_inference_steps=4, spec=ref_spec
    )
    assert ref.is_refiner
    rctx, radded = ref.encode_prompts(["a cat"])
    assert rctx.shape == (2, 77, 16)
    assert radded["text_embeds"].shape == (2, 16)
