"""Fake-checkpoint dry run of the real-weight validation runway."""

import json
import os

import numpy as np
import pytest

from image_editing_framework_tpu.eval.validate import validate_pipeline
from image_editing_framework_tpu.pipelines import tiny_pipeline


@pytest.mark.slow
def test_validate_runway_dry_run(tmp_path):
    pipe = tiny_pipeline(num_steps=4)
    img = np.random.RandomState(0).randint(0, 255, (32, 32, 3), np.uint8)
    out = str(tmp_path / "validation")
    report = validate_pipeline(
        pipe, out,
        methods=("p2p", "masactrl", "pnp", "p2z"),
        source_image=img, resolution=32, seed=7, use_flash=False,
    )
    assert set(report["methods"]) == {"p2p", "masactrl", "pnp", "p2z"}
    for m, e in report["methods"].items():
        assert len(e["syn_edit_sha256"]) == 64
        assert len(e["real_edit_sha256"]) == 64
        assert np.isfinite(e["recon_mse"])
        for f in ("syn_source.png", "syn_edit.png",
                  "real_inversion.png", "real_edit.png"):
            assert os.path.exists(os.path.join(out, m, f)), (m, f)
    # report artifacts exist and parse
    with open(os.path.join(out, "report.json")) as f:
        saved = json.load(f)
    assert saved["seed"] == 7
    # goldens pin the flash operand layout: the transposed inference primal
    # changes accumulation order/hashes, and golden_check replays each
    # report under the layout it recorded
    assert saved["flash_layout"] in ("transposed", "classic")
    # the backward layout is a TRI-state: "forced" (IEF_FLASH_BWD_T=1) must
    # be recorded distinctly from "auto", because golden_check replays auto
    # with the var unset — a forced report replayed as auto would run classic
    # backward kernels at sub-4096-token sites and spuriously fail hashes
    assert saved["flash_bwd_layout"] in ("auto", "forced", "classic")
    import image_editing_framework_tpu.eval.validate as _v
    env = dict(os.environ)
    try:
        os.environ.pop("IEF_FLASH_T", None)
        os.environ["IEF_FLASH_BWD_T"] = "1"
        assert _v._flash_layout_fields()["flash_bwd_layout"] == "forced"
        os.environ["IEF_FLASH_BWD_T"] = "0"
        assert _v._flash_layout_fields()["flash_bwd_layout"] == "classic"
        # the kernel predicate forces the T backward for ANY set value != "0"
        # (_use_bwd_t_layout: env != "0"); the recorder must match or a
        # report generated under e.g. "true" replays as auto and spuriously
        # fails golden hashes (ADVICE-r4)
        for v in ("true", "2", ""):
            os.environ["IEF_FLASH_BWD_T"] = v
            assert _v._flash_layout_fields()["flash_bwd_layout"] == "forced", v
        os.environ.pop("IEF_FLASH_BWD_T", None)
        assert _v._flash_layout_fields()["flash_bwd_layout"] == "auto"
        os.environ["IEF_FLASH_T"] = "0"
        assert _v._flash_layout_fields() == {
            "flash_layout": "classic", "flash_bwd_layout": "classic"}
    finally:
        os.environ.clear()
        os.environ.update(env)
    assert os.path.exists(os.path.join(out, "report.md"))

    # determinism: same seed + weights => same hashes
    report2 = validate_pipeline(
        pipe, str(tmp_path / "v2"), methods=("p2p",),
        source_image=img, resolution=32, seed=7, use_flash=False,
    )
    assert (
        report2["methods"]["p2p"]["syn_edit_sha256"]
        == report["methods"]["p2p"]["syn_edit_sha256"]
    )


def test_synth_source_image_deterministic():
    from image_editing_framework_tpu.eval.validate import synth_source_image

    a = synth_source_image(42, 64)
    b = synth_source_image(42, 64)
    assert a.shape == (64, 64, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
    assert np.any(synth_source_image(43, 64) != a)


def test_realistic_random_params_center_norm_scales():
    """realistic=True centers norm `scale` leaves at 1 (a live network —
    golden hashes must be sensitive to kernel changes)."""
    import jax
    import jax.numpy as jnp

    from image_editing_framework_tpu.models import configs
    from image_editing_framework_tpu.models.init_utils import fast_random_params
    from image_editing_framework_tpu.models.unet import UNet2DCondition

    unet = UNet2DCondition(configs.TINY_UNET)
    x = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 77, 32))
    params = fast_random_params(unet, x, 0, ctx, None, None, False,
                                realistic=True)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    scales = [l for p, l in flat if getattr(p[-1], "key", None) == "scale"]
    others = [l for p, l in flat if getattr(p[-1], "key", None) == "kernel"]
    assert scales and others
    assert all(abs(float(s.mean()) - 1.0) < 0.02 for s in scales)
    assert all(abs(float(k.mean())) < 0.02 for k in others)
    # deterministic across calls
    params2 = fast_random_params(unet, x, 0, ctx, None, None, False,
                                 realistic=True)
    chk = jax.tree_util.tree_all(
        jax.tree.map(lambda a, b: bool((a == b).all()), params, params2)
    )
    assert chk
    # the resulting network is live: output magnitude not collapsed
    out, _ = unet.apply(params, x + 1.0, 10, ctx, None, None, False)
    assert float(jnp.abs(out).max()) > 1e-3


def test_validate_refiner_flow(tmp_path):
    """The refiner img2img golden flow (eval.validate.validate_refiner):
    hashes + structural metrics for a deterministic partial-denoise
    refinement — the on-chip anchor for the model the reference loads but
    never invokes (p2p/edit_real.py:77-89)."""
    from image_editing_framework_tpu.eval.validate import validate_refiner

    pipe = tiny_pipeline(num_steps=4, model_type="xl-refiner")
    img = np.random.RandomState(1).randint(0, 255, (32, 32, 3), np.uint8)
    out = str(tmp_path / "xl-refiner")
    report = validate_refiner(
        pipe, out, source_image=img, strength=0.5, seed=7,
        resolution=32, use_flash=False,
    )
    assert len(report["refined_sha256"]) == 64
    assert np.isfinite(report["refine_mse"])
    assert report["flow"] == "img2img-refine"
    assert os.path.exists(os.path.join(out, "refined.png"))
    with open(os.path.join(out, "report.json")) as f:
        saved = json.load(f)
    assert saved["refined_sha256"] == report["refined_sha256"]
    # determinism: same pipe + seed reproduces the hash
    report2 = validate_refiner(
        pipe, str(tmp_path / "again"), source_image=img, strength=0.5,
        seed=7, resolution=32, use_flash=False,
    )
    assert report2["refined_sha256"] == report["refined_sha256"]
