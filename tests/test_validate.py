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
        assert json.load(f)["seed"] == 7
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
