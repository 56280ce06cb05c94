"""Full-composition UNet parity vs the independent PyTorch oracle.

Random torch weights flow through the production safetensors->Flax mapping
and the Flax UNet must reproduce the torch oracle's outputs — validating
normalization semantics, resnet/time-embedding order, token reshape order,
GEGLU split, attention scaling, skip stacking and upsample placement, plus
the key mapping itself, end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_editing_framework_tpu.models import configs, loader
from image_editing_framework_tpu.models.unet import UNet2DCondition


def test_unet_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    from tests.torch_oracle import TinyTorchUNet

    torch.manual_seed(0)
    oracle = TinyTorchUNet().eval()
    ckpt = {k: v.numpy() for k, v in oracle.state_dict().items()}

    m = UNet2DCondition(configs.TINY_UNET)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 16, 4).astype(np.float32)
    ctx = rng.randn(2, 77, 32).astype(np.float32)
    t = np.array([42, 42], np.int64)

    skeleton = jax.eval_shape(
        lambda: m.init(
            jax.random.PRNGKey(0), jnp.asarray(x), 0, jnp.asarray(ctx)
        )
    )
    params = loader.load_params(skeleton, ckpt, loader.unet_key)
    out, _ = m.apply(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx))

    with torch.no_grad():
        ref = oracle(
            torch.tensor(x.transpose(0, 3, 1, 2)),
            torch.tensor(t),
            torch.tensor(ctx),
        ).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_sd15_unet_full_production_shape_matches_torch_oracle():
    """FULL SD1.5 width (859.5M params): random torch state_dict through the
    production ``loader.unet_key`` mapping must reproduce the torch oracle at
    the real 512^2 shape — the strongest weight-free guard on trained-weight
    load parity (GroupNorm at 320/640/1280 widths, 8-head/dim-40 attention
    partitioning, every down/mid/up block of the production config). Matches
    the reference's ``model.unet(...)`` (p2p/model/sd_utils.py:73)."""
    torch = pytest.importorskip("torch")
    from tests.torch_oracle import ConfigTorchUNet

    cfg = configs.SD15_UNET
    torch.manual_seed(0)
    oracle = ConfigTorchUNet(cfg).eval()
    assert sum(p.numel() for p in oracle.parameters()) == 859_520_964
    ckpt = {k: v.numpy() for k, v in oracle.state_dict().items()}

    m = UNet2DCondition(cfg)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 64, 64, 4).astype(np.float32)
    ctx = rng.randn(1, 77, 768).astype(np.float32)
    t = np.array([421], np.int64)

    skeleton = jax.eval_shape(
        lambda: m.init(
            jax.random.PRNGKey(0), jnp.asarray(x), 0, jnp.asarray(ctx)
        )
    )
    params = loader.load_params(skeleton, ckpt, loader.unet_key)
    out, _ = m.apply(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx))
    with torch.no_grad():
        ref = oracle(
            torch.tensor(x.transpose(0, 3, 1, 2)),
            torch.tensor(t),
            torch.tensor(ctx),
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=2e-3)


@pytest.mark.slow
def test_sdxl_unet_full_production_shape_matches_torch_oracle():
    """FULL SDXL-base width (2567.5M params): the 10-layer transformer stacks,
    2048-dim context, text_time addition embeddings (2816 = 1280 pooled +
    6*256 time ids) and linear projections at real widths, through the
    production loader (reference P2P_Zero_XL etc., sd_utils.py:212)."""
    torch = pytest.importorskip("torch")
    from tests.torch_oracle import ConfigTorchUNet

    cfg = configs.SDXL_UNET
    torch.manual_seed(1)
    oracle = ConfigTorchUNet(cfg).eval()
    assert sum(p.numel() for p in oracle.parameters()) == 2_567_463_684
    ckpt = {k: v.numpy() for k, v in oracle.state_dict().items()}

    m = UNet2DCondition(cfg)
    rng = np.random.RandomState(1)
    x = rng.randn(1, 32, 32, 4).astype(np.float32)
    ctx = rng.randn(1, 77, 2048).astype(np.float32)
    pooled = rng.randn(1, 1280).astype(np.float32)
    tids = np.array([[1024, 1024, 0, 0, 1024, 1024]], np.float32)
    t = np.array([421], np.int64)
    added = {"text_embeds": jnp.asarray(pooled), "time_ids": jnp.asarray(tids)}

    skeleton = jax.eval_shape(
        lambda: m.init(
            jax.random.PRNGKey(0), jnp.asarray(x), 0, jnp.asarray(ctx), None, added
        )
    )
    params = loader.load_params(skeleton, ckpt, loader.unet_key)
    out, _ = m.apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), None, added
    )
    with torch.no_grad():
        ref = oracle(
            torch.tensor(x.transpose(0, 3, 1, 2)),
            torch.tensor(t),
            torch.tensor(ctx),
            torch.tensor(pooled),
            torch.tensor(tids),
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-3, rtol=3e-3)


@pytest.mark.slow
def test_sdxl_refiner_unet_full_production_shape_matches_torch_oracle():
    """FULL SDXL-refiner width (2259.5M params): the refiner's distinguishing
    structure at real scale — 4 levels (384/768/1536/1536) with attention-free
    outermost AND innermost down blocks, 4-layer transformer stacks at
    768/1536, bigG-only 1280-dim context, and the 2560 projection input
    (1280 pooled + 5*256 aesthetic-score time ids) — through the production
    ``loader.unet_key`` mapping. The reference loads this model
    (p2p/edit_real.py:77-89) but never invokes it; here it both loads AND
    drives (see test_img2img_production_refiner / methods/img2img.py)."""
    torch = pytest.importorskip("torch")
    from tests.torch_oracle import ConfigTorchUNet

    cfg = configs.SDXL_REFINER_UNET
    torch.manual_seed(4)
    oracle = ConfigTorchUNet(cfg).eval()
    assert sum(p.numel() for p in oracle.parameters()) == 2_259_526_660
    ckpt = {k: v.numpy() for k, v in oracle.state_dict().items()}

    m = UNet2DCondition(cfg)
    rng = np.random.RandomState(4)
    x = rng.randn(1, 32, 32, 4).astype(np.float32)
    ctx = rng.randn(1, 77, 1280).astype(np.float32)
    pooled = rng.randn(1, 1280).astype(np.float32)
    tids = np.array([[1024, 1024, 0, 0, 6.0]], np.float32)
    t = np.array([421], np.int64)
    added = {"text_embeds": jnp.asarray(pooled), "time_ids": jnp.asarray(tids)}

    skeleton = jax.eval_shape(
        lambda: m.init(
            jax.random.PRNGKey(0), jnp.asarray(x), 0, jnp.asarray(ctx), None, added
        )
    )
    params = loader.load_params(skeleton, ckpt, loader.unet_key)
    out, _ = m.apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), None, added
    )
    with torch.no_grad():
        ref = oracle(
            torch.tensor(x.transpose(0, 3, 1, 2)),
            torch.tensor(t),
            torch.tensor(ctx),
            torch.tensor(pooled),
            torch.tensor(tids),
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-3, rtol=3e-3)


@pytest.mark.slow
def test_sd_vae_full_production_shape_matches_torch_oracle():
    """FULL SD VAE width (83.65M params, channels 128/256/512/512): encode
    mean + decode at a production-shaped input through ``loader.vae_key``."""
    torch = pytest.importorskip("torch")
    from tests.torch_oracle import ConfigTorchVAE
    from image_editing_framework_tpu.models.vae import AutoencoderKL, VAEConfig

    cfg = VAEConfig()
    torch.manual_seed(2)
    oracle = ConfigTorchVAE(cfg).eval()
    assert sum(p.numel() for p in oracle.parameters()) == 83_653_863
    ckpt = {k: v.numpy() for k, v in oracle.state_dict().items()}

    vae = AutoencoderKL(cfg)
    rng = np.random.RandomState(2)
    img = rng.randn(1, 256, 256, 3).astype(np.float32)
    skeleton = jax.eval_shape(
        lambda: vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    )
    params = loader.load_params(skeleton, ckpt, loader.vae_key)

    mean, _ = vae.apply(
        params, jnp.asarray(img), method=AutoencoderKL.encode_moments
    )
    with torch.no_grad():
        ref_mean = oracle.encode_mean(
            torch.tensor(img.transpose(0, 3, 1, 2))
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(mean), ref_mean, atol=2e-3, rtol=2e-3)

    z = rng.randn(1, 32, 32, 4).astype(np.float32)
    dec = vae.apply(params, jnp.asarray(z), method=AutoencoderKL.decode)
    with torch.no_grad():
        ref_dec = oracle.decode(
            torch.tensor(z.transpose(0, 3, 1, 2)) / cfg.scaling_factor
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(dec), ref_dec, atol=2e-3, rtol=2e-3)


def test_vae_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    from tests.torch_oracle import TinyTorchVAE
    from image_editing_framework_tpu.models.vae import TINY_VAE, AutoencoderKL

    torch.manual_seed(1)
    oracle = TinyTorchVAE().eval()
    ckpt = {k: v.numpy() for k, v in oracle.state_dict().items()}

    vae = AutoencoderKL(TINY_VAE)
    rng = np.random.RandomState(1)
    img = rng.randn(1, 32, 32, 3).astype(np.float32)
    skeleton = jax.eval_shape(
        lambda: vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    )
    params = loader.load_params(skeleton, ckpt, loader.vae_key)

    mean, _ = vae.apply(
        params, jnp.asarray(img), method=AutoencoderKL.encode_moments
    )
    with torch.no_grad():
        ref_mean = oracle.encode_mean(
            torch.tensor(img.transpose(0, 3, 1, 2))
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(mean), ref_mean, atol=2e-4, rtol=2e-4)

    z = rng.randn(1, 16, 16, 4).astype(np.float32)
    dec = vae.apply(params, jnp.asarray(z), method=AutoencoderKL.decode)
    with torch.no_grad():
        ref_dec = oracle.decode(
            torch.tensor(z.transpose(0, 3, 1, 2)) / TINY_VAE.scaling_factor
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(dec), ref_dec, atol=2e-4, rtol=2e-4)


def test_refiner_unet_matches_torch_oracle():
    """Refiner-flavor composition: attention-free outer+inner blocks, 5
    addition time ids (orig, crop, aesthetic_score) — SDXL_REFINER_UNET's
    structure at tiny scale, through the production loader."""
    torch = pytest.importorskip("torch")
    from tests.torch_oracle import TinyTorchRefinerUNet

    torch.manual_seed(3)
    oracle = TinyTorchRefinerUNet().eval()
    ckpt = {k: v.numpy() for k, v in oracle.state_dict().items()}

    m = UNet2DCondition(configs.TINY_REFINER_UNET)
    rng = np.random.RandomState(3)
    x = rng.randn(2, 16, 16, 4).astype(np.float32)
    ctx = rng.randn(2, 77, 32).astype(np.float32)
    pooled = rng.randn(2, 16).astype(np.float32)
    tids = np.array([[1024, 1024, 0, 0, 6.0]] * 2, np.float32)
    t = np.array([42, 42], np.int64)
    added = {"text_embeds": jnp.asarray(pooled), "time_ids": jnp.asarray(tids)}

    skeleton = jax.eval_shape(
        lambda: m.init(
            jax.random.PRNGKey(0), jnp.asarray(x), 0, jnp.asarray(ctx), None, added
        )
    )
    params = loader.load_params(skeleton, ckpt, loader.unet_key)
    out, _ = m.apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), None, added
    )
    with torch.no_grad():
        ref = oracle(
            torch.tensor(x.transpose(0, 3, 1, 2)),
            torch.tensor(t),
            torch.tensor(ctx),
            torch.tensor(pooled),
            torch.tensor(tids),
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4, rtol=3e-4)


def test_xl_unet_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    from tests.torch_oracle import TinyTorchXLUNet

    torch.manual_seed(2)
    oracle = TinyTorchXLUNet().eval()
    ckpt = {k: v.numpy() for k, v in oracle.state_dict().items()}

    m = UNet2DCondition(configs.TINY_XL_UNET)
    rng = np.random.RandomState(2)
    x = rng.randn(2, 16, 16, 4).astype(np.float32)
    ctx = rng.randn(2, 77, 32).astype(np.float32)
    pooled = rng.randn(2, 16).astype(np.float32)
    tids = np.array([[128, 128, 0, 0, 128, 128]] * 2, np.float32)
    t = np.array([42, 42], np.int64)
    added = {"text_embeds": jnp.asarray(pooled), "time_ids": jnp.asarray(tids)}

    skeleton = jax.eval_shape(
        lambda: m.init(
            jax.random.PRNGKey(0), jnp.asarray(x), 0, jnp.asarray(ctx), None, added
        )
    )
    params = loader.load_params(skeleton, ckpt, loader.unet_key)
    out, _ = m.apply(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx), None, added
    )
    with torch.no_grad():
        ref = oracle(
            torch.tensor(x.transpose(0, 3, 1, 2)),
            torch.tensor(t),
            torch.tensor(ctx),
            torch.tensor(pooled),
            torch.tensor(tids),
        ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-4, rtol=3e-4)
