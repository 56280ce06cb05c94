"""CLI driver end-to-end on the tiny pipeline (load_pipe monkeypatched)."""

import os

import numpy as np
import pytest
from PIL import Image

import image_editing_framework_tpu.cli as cli
from image_editing_framework_tpu.pipelines import tiny_pipeline


@pytest.fixture()
def tiny_env(monkeypatch, tmp_path):
    pipe = tiny_pipeline(num_steps=4)
    monkeypatch.setattr(cli, "load_pipe", lambda v, dtype=None: pipe)
    monkeypatch.setattr(cli, "resolution_for", lambda p: 32)
    monkeypatch.chdir(tmp_path)
    return pipe, tmp_path


def test_edit_syn_cli(tiny_env):
    cli.edit_syn_main(
        "p2p",
        argv=["--seed", "7", "--source_prompt", "a cat sat",
              "--target_prompt", "a dog sat"],
    )
    assert os.path.exists("exp/source.png")
    assert os.path.exists("exp/edit.png")


def test_edit_real_cli_ddim(tiny_env):
    pipe, tmp = tiny_env
    img = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (32, 32, 3), np.uint8)
    )
    img.save("test.jpg")
    cli.edit_real_main(
        "masactrl",
        argv=["--source_image", "./test.jpg", "--inversion_type", "ddim",
              "--source_prompt", "a cat", "--target_prompt", "a standing cat"],
    )
    for f in ("source.png", "inversion.png", "edit.png"):
        assert os.path.exists(os.path.join("exp", f))


@pytest.mark.slow
def test_edit_real_cli_direct_inversion(tiny_env):
    img = Image.fromarray(
        np.random.RandomState(1).randint(0, 255, (32, 32, 3), np.uint8)
    )
    img.save("test.jpg")
    cli.edit_real_main(
        "pnp",
        argv=["--source_image", "./test.jpg", "--inversion_type", "direct",
              "--source_prompt", "a cat", "--target_prompt", "a dog"],
    )
    assert os.path.exists("exp/edit.png")


def test_edit_syn_cli_masactrl_flags(tiny_env):
    """neg_prompt + explicit step_idx/layer_idx lists reach the editor from
    the CLI (reference: masactrl/model/attention_control.py:16,
    masactrl/model/sd_utils.py:73-77)."""
    cli.edit_syn_main(
        "masactrl",
        argv=["--source_prompt", "a cat", "--target_prompt", "a standing cat",
              "--neg_prompt", "ugly, blurry",
              "--step_idx", "1,3", "--layer_idx", "0,1"],
    )
    assert os.path.exists("exp/edit.png")


def test_neg_prompt_changes_uncond_only(tiny_env):
    pipe, _ = tiny_env
    ctx_plain, _ = pipe.encode_prompts(["a cat"])
    ctx_neg, _ = pipe.encode_prompts(["a cat"], "ugly")
    assert float(np.abs(np.asarray(ctx_plain[0] - ctx_neg[0])).max()) > 0
    np.testing.assert_allclose(np.asarray(ctx_plain[1]), np.asarray(ctx_neg[1]))


@pytest.mark.slow
def test_run_method_p2z(tiny_env):
    pipe, _ = tiny_env
    import jax

    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4))
    from image_editing_framework_tpu.core.config import SamplerConfig

    inv, edit = cli.run_method(
        "p2z", pipe, ["a cat", "a dog"], lat, SamplerConfig(height=32, width=32)
    )
    assert inv.shape == (32, 32, 3) and edit.shape == (32, 32, 3)


@pytest.mark.slow
def test_img2img_sd(tiny_env):
    pipe, _ = tiny_env
    from image_editing_framework_tpu.methods.img2img import img2img

    img = np.random.RandomState(0).randint(0, 255, (32, 32, 3), np.uint8)
    out = img2img(pipe, img, "a cat", strength=0.5)
    assert out.shape == (1, 32, 32, 3)
