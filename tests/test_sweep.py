"""Sweep driver test on a synthetic mini PIE-Bench."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from image_editing_framework_tpu.data.pie import PIE, save_inversion, PIEPrecomputedInversion
from image_editing_framework_tpu.eval.sweep import run_sweep, _auto_p2p_config
from image_editing_framework_tpu.pipelines import tiny_pipeline


@pytest.fixture()
def mini_pie(tmp_path):
    root = tmp_path / "PIE"
    imgdir = root / "annotation_images" / "0_random"
    imgdir.mkdir(parents=True)
    mapping = {}
    rng = np.random.RandomState(0)
    for i in range(3):
        rel = f"0_random/img_{i}.jpg"
        Image.fromarray(
            rng.randint(0, 255, (64, 64, 3), np.uint8)
        ).save(root / "annotation_images" / f"img_{i}.jpg".replace("img", "x"))
        (root / "annotation_images" / "0_random").mkdir(exist_ok=True)
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(
            root / "annotation_images" / rel
        )
        mapping[str(i)] = {
            "image_path": rel,
            "original_prompt": f"a [cat] number {i}",
            "editing_prompt": f"a [dog] number {i}",
        }
    # one item in another category (should be excluded when filtering 0)
    rel = "6_other/img.jpg"
    (root / "annotation_images" / "6_other").mkdir(parents=True)
    Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(
        root / "annotation_images" / rel
    )
    mapping["9"] = {
        "image_path": rel,
        "original_prompt": "a [cat]",
        "editing_prompt": "a [dog]",
    }
    with open(root / "mapping_file.json", "w") as f:
        json.dump(mapping, f)
    return str(root)


def test_pie_dataset(mini_pie):
    data = PIE(mini_pie, category=0)
    assert len(data) == 3
    item = data[0]
    assert "[" not in item.source_prompt and "]" not in item.source_prompt
    assert os.path.exists(item.image_path)
    assert len(PIE(mini_pie)) == 4


def test_auto_p2p_config():
    assert _auto_p2p_config("a cat sat", "a dog sat").edit_type == "replace"
    assert _auto_p2p_config("a cat", "a big cat").edit_type == "refine"


def test_sweep_p2p_and_resume(mini_pie, tmp_path):
    pipe = tiny_pipeline(num_steps=4)
    exp = str(tmp_path / "exp")
    stats = run_sweep(
        pipe, "p2p", mini_pie, exp, inversion_type="ddim", categories=(0,),
        max_items=2, resolution=32,
    )
    assert stats["images_done"] == 2
    done_dirs = sorted(os.listdir(os.path.join(exp, "0_random")))
    assert len(done_dirs) == 2
    for f in ("source.png", "inversion.png", "edit.png"):
        assert os.path.exists(os.path.join(exp, "0_random", done_dirs[0], f))
    # resume: already-done images are skipped
    stats2 = run_sweep(
        pipe, "p2p", mini_pie, exp, inversion_type="ddim", categories=(0,),
        max_items=2, resolution=32,
    )
    assert stats2["images_done"] == 0 and stats2["images_skipped"] == 2


def test_precomputed_inversion_cache(mini_pie, tmp_path):
    inv = str(tmp_path / "inv")
    data = PIE(mini_pie, category=0)
    for item in data.items:
        save_inversion(inv, item.key, np.zeros((1, 8, 8, 4)), np.zeros((4, 77, 32)))
    ds = PIEPrecomputedInversion(mini_pie, inv, category=0)
    latent, uncond = ds.load_inversion(ds[0])
    assert latent.shape == (1, 8, 8, 4) and uncond.shape == (4, 77, 32)
    # category and required_items are mutually exclusive: required_items IS
    # the work list and is NOT re-filtered, so passing both would silently
    # ignore the category — reject the combination instead
    with pytest.raises(ValueError, match="not both"):
        PIEPrecomputedInversion(
            mini_pie, inv, category=0, required_items=data.items
        )


def test_precomputed_inversion_cache_bf16_producer(mini_pie, tmp_path):
    """A bf16 pipeline's latents must round-trip through the npz cache:
    np.savez writes ml_dtypes.bfloat16 arrays as raw void ('V2') bytes that
    np.load cannot cast ('No cast function available' — found by the 100-image
    on-chip NTI rehearsal). The producer now stores float32; the loader also
    rescues caches written before the fix by viewing V2 back as bfloat16."""
    import jax.numpy as jnp
    import ml_dtypes

    inv = str(tmp_path / "inv")
    data = PIE(mini_pie, category=0)
    lat = jnp.full((1, 8, 8, 4), 1.5, jnp.bfloat16)
    for item in data.items:
        save_inversion(inv, item.key, lat, jnp.zeros((4, 77, 32), jnp.bfloat16))
    ds = PIEPrecomputedInversion(mini_pie, inv, category=0)
    latent, uncond = ds.load_inversion(ds[0])
    assert latent.dtype == np.float32 and uncond.dtype == np.float32
    np.testing.assert_allclose(latent, 1.5)
    out = jnp.asarray(latent, jnp.bfloat16)  # the consumer's exact cast
    assert out.dtype == jnp.bfloat16

    # pre-fix artifact (raw bf16 written straight through savez) still loads
    item = data.items[0]
    np.savez(
        os.path.join(inv, item.key, "inversion.npz"),
        latent=np.full((1, 8, 8, 4), 2.5, ml_dtypes.bfloat16),
    )
    latent, uncond = ds.load_inversion(ds[0])
    assert latent.dtype == np.float32 and uncond is None
    np.testing.assert_allclose(latent, 2.5)


def test_precomputed_inversion_reference_pt_layout(mini_pie, tmp_path):
    """Reference-produced .pt artifact directories load directly
    (p2p/dataset/pie.py:47-48: NCHW inversion_latent.pt + a per-step list in
    uncond_embeddings_list.pt), converted to the framework's NHWC / stacked
    layout on read."""
    import torch

    inv = str(tmp_path / "inv_pt")
    data = PIE(mini_pie, category=0)
    rng = np.random.RandomState(7)
    lat_nchw = rng.randn(1, 4, 8, 8).astype(np.float32)
    ulist = [torch.from_numpy(rng.randn(1, 77, 32).astype(np.float32))
             for _ in range(4)]
    for item in data.items:
        d = os.path.join(inv, item.key)
        os.makedirs(d, exist_ok=True)
        torch.save(torch.from_numpy(lat_nchw), os.path.join(d, "inversion_latent.pt"))
        torch.save(ulist, os.path.join(d, "uncond_embeddings_list.pt"))
    # completeness check accepts the reference layout for non-category items
    for item in PIE(mini_pie).items:
        d = os.path.join(inv, item.key)
        if not os.path.exists(d):
            save_inversion(inv, item.key, np.zeros((1, 8, 8, 4), np.float32))
    ds = PIEPrecomputedInversion(mini_pie, inv, category=0)
    latent, uncond = ds.load_inversion(ds[0])
    assert latent.shape == (1, 8, 8, 4)
    np.testing.assert_allclose(latent, np.transpose(lat_nchw, (0, 2, 3, 1)))
    assert uncond.shape == (4, 77, 32)
    np.testing.assert_allclose(uncond[2], ulist[2].numpy()[0])
    # mixed layouts in one cache dir: a sweep consumes the .pt artifacts
    pipe = tiny_pipeline(num_steps=4)
    stats = run_sweep(
        pipe, "p2p", mini_pie, str(tmp_path / "exp_pt"), inversion_type="ddim",
        categories=(0,), max_items=1, resolution=32, inversion_path=inv,
    )
    assert stats["images_done"] == 1


def test_sweep_batched_direct_inversion(mini_pie, tmp_path):
    """batch_size>1 composes with direct inversion: each image's source
    branch replays its own recorded trajectory."""
    pipe = tiny_pipeline(num_steps=4)
    exp = str(tmp_path / "exp_bdirect")
    stats = run_sweep(
        pipe, "p2p", mini_pie, exp, inversion_type="direct", categories=(0,),
        max_items=2, resolution=32, batch_size=2,
    )
    assert stats["images_done"] == 2
    done_dirs = sorted(os.listdir(os.path.join(exp, "0_random")))
    for d in done_dirs:
        assert os.path.exists(os.path.join(exp, "0_random", d, "edit.png"))


def test_sweep_batched_consumes_precomputed_inversions(mini_pie, tmp_path):
    """batch_size>1 composes with inversion_path: the invert/NTI phases are
    skipped, the group's latents+uncond_seqs come off disk."""
    pipe = tiny_pipeline(num_steps=4)
    inv = str(tmp_path / "inv_b")
    for item in PIE(mini_pie).items:
        save_inversion(
            inv, item.key,
            np.random.RandomState(1).randn(1, 4, 4, 4).astype(np.float32) * 0.1,
            np.zeros((4, 77, 32), np.float32),
        )
    stats = run_sweep(
        pipe, "p2p", mini_pie, str(tmp_path / "exp_bcache"),
        inversion_type="null-text", categories=(0,), max_items=2,
        resolution=32, batch_size=2, inversion_path=inv,
    )
    assert stats["images_done"] == 2


def test_cache_completeness_narrowed_to_worklist(mini_pie, tmp_path):
    """A cache produced by save_inversions covers exactly the items a
    default/sharded sweep touches; the consumer must accept it even though
    other mapping_file entries (other categories/shards) have no artifact
    (ADVICE r3 medium). Completeness is checked against the sweep's actual
    work list, and a truly-missing artifact still raises with the item key."""
    pipe = tiny_pipeline(num_steps=4)
    inv = str(tmp_path / "inv_narrow")
    # artifacts for category-0 items ONLY — item "9" (6_other) gets none
    for item in PIE(mini_pie, category=0).items:
        save_inversion(inv, item.key, np.zeros((1, 4, 4, 4), np.float32),
                       np.zeros((4, 77, 32), np.float32))
    # serial consumer restricted to category 0: must not demand item 9
    stats = run_sweep(
        pipe, "p2p", mini_pie, str(tmp_path / "exp_n1"), inversion_type="ddim",
        categories=(0,), max_items=1, resolution=32, inversion_path=inv,
    )
    assert stats["images_done"] == 1
    # batched consumer too
    stats = run_sweep(
        pipe, "p2p", mini_pie, str(tmp_path / "exp_n2"), inversion_type="ddim",
        categories=(0,), max_items=2, resolution=32, batch_size=2,
        inversion_path=inv,
    )
    assert stats["images_done"] == 2
    # an item the sweep DOES need but the cache lacks still raises, naming it
    with pytest.raises(ValueError, match="not complete"):
        run_sweep(
            pipe, "p2p", mini_pie, str(tmp_path / "exp_n3"),
            inversion_type="ddim", categories=(6,), max_items=1,
            resolution=32, inversion_path=inv,
        )


def test_load_inversion_missing_artifact_clear_error(mini_pie, tmp_path):
    """An artifact vanishing after construction raises FileNotFoundError
    naming the item and the accepted filenames — not an AttributeError on
    None (ADVICE r3 low)."""
    import shutil

    inv = str(tmp_path / "inv_gone")
    for item in PIE(mini_pie).items:
        save_inversion(inv, item.key, np.zeros((1, 4, 4, 4), np.float32))
    ds = PIEPrecomputedInversion(mini_pie, inv, category=0)
    victim = ds[0]
    shutil.rmtree(os.path.join(inv, victim.key))
    with pytest.raises(FileNotFoundError, match=victim.key):
        ds.load_inversion(victim)


def test_direct_inversion_with_cache_is_audited(mini_pie, tmp_path):
    """inversion_type='direct' + inversion_path degrades to ddim (the cache
    holds no trajectory); the degradation must be audible: a warning and
    stats['inversion_type_effective'] (ADVICE r3 low)."""
    pipe = tiny_pipeline(num_steps=4)
    inv = str(tmp_path / "inv_d")
    for item in PIE(mini_pie, category=0).items:
        save_inversion(inv, item.key, np.zeros((1, 4, 4, 4), np.float32))
    with pytest.warns(UserWarning, match="replay is NOT applied"):
        stats = run_sweep(
            pipe, "p2p", mini_pie, str(tmp_path / "exp_d"),
            inversion_type="direct", categories=(0,), max_items=1,
            resolution=32, inversion_path=inv,
        )
    assert stats["inversion_type"] == "direct"
    assert stats["inversion_type_effective"].startswith("ddim")
    # without a cache the mode is genuinely direct
    stats = run_sweep(
        pipe, "p2p", mini_pie, str(tmp_path / "exp_d2"),
        inversion_type="direct", categories=(0,), max_items=1, resolution=32,
    )
    assert stats["inversion_type_effective"] == "direct"


def test_sweep_records_quality_metrics(mini_pie, tmp_path):
    """The sweep emits per-image source<->reconstruction MSE/PSNR/SSIM into
    the event log and aggregate *_mean columns into the stats (VERDICT r3
    item 3: the quantitative table BASELINE.md promises, not latency only)."""
    pipe = tiny_pipeline(num_steps=4)
    exp = str(tmp_path / "exp_metrics")
    stats = run_sweep(
        pipe, "p2p", mini_pie, exp, inversion_type="ddim", categories=(0,),
        max_items=2, resolution=32,
    )
    for col in ("recon_mse_mean", "recon_psnr_mean", "recon_ssim_mean"):
        assert col in stats and np.isfinite(stats[col])
    assert -1.0 <= stats["recon_ssim_mean"] <= 1.0
    def _reject_const(s):  # Infinity/NaN are not RFC-8259 JSON
        raise AssertionError(f"non-strict JSON token {s!r} in event log")

    rows = [json.loads(l, parse_constant=_reject_const) for l in open(
        os.path.join(exp, "events_p2p_0.jsonl"))]
    assert len(rows) == 2
    for r in rows:
        assert {"recon_mse", "recon_psnr", "recon_ssim"} <= set(r)
    # a perfect reconstruction (psnr=inf) must serialize as null, never as
    # the bare `Infinity` token strict parsers reject
    from image_editing_framework_tpu.eval.sweep import _json_safe_metrics
    safe = _json_safe_metrics({"recon_psnr": float("inf"), "recon_mse": 0.0})
    assert safe == {"recon_psnr": None, "recon_mse": 0.0}
    json.loads(json.dumps(safe), parse_constant=_reject_const)
    # opt-out for maximum-throughput runs
    stats = run_sweep(
        pipe, "p2p", mini_pie, str(tmp_path / "exp_nometrics"),
        inversion_type="ddim", categories=(0,), max_items=1, resolution=32,
        record_metrics=False,
    )
    assert "recon_mse_mean" not in stats


def test_sweep_metric_failure_keeps_stats(mini_pie, tmp_path, monkeypatch):
    """A metric-task failure must not discard the timing stats of a sweep
    whose edits all succeeded (ADVICE-r4): the error is recorded in stats,
    the stats file is still written, and a warning (not an exception)
    surfaces it."""
    from image_editing_framework_tpu.eval import metrics as qmetrics

    def boom(*a, **kw):
        raise RuntimeError("synthetic metric failure")

    monkeypatch.setattr(qmetrics, "mse", boom)
    pipe = tiny_pipeline(num_steps=4)
    exp = str(tmp_path / "exp_metricfail")
    with pytest.warns(UserWarning, match="metric/event-log"):
        stats = run_sweep(
            pipe, "p2p", mini_pie, exp, inversion_type="ddim",
            categories=(0,), max_items=2, resolution=32,
        )
    assert stats["images_done"] == 2
    assert stats["metric_errors"] == 2
    assert "synthetic metric failure" in stats["metric_error_first"]
    assert stats["mean_s_per_image"] is not None
    # the stats file reached disk despite the failures
    with open(os.path.join(exp, "sweep_stats_p2p_0.json")) as f:
        on_disk = json.load(f)
    assert on_disk["metric_errors"] == 2
    # edits themselves are intact
    done_dirs = sorted(os.listdir(os.path.join(exp, "0_random")))
    for d in done_dirs:
        assert os.path.exists(os.path.join(exp, "0_random", d, "edit.png"))


@pytest.mark.slow
def test_sweep_batched_mode(mini_pie, tmp_path):
    pipe = tiny_pipeline(num_steps=4)
    exp = str(tmp_path / "exp_batched")
    inv = str(tmp_path / "inv_cache")
    stats = run_sweep(
        pipe, "p2p", mini_pie, exp, inversion_type="ddim", categories=(0,),
        resolution=32, batch_size=2, save_inversions=inv,
    )
    assert stats["images_done"] == 3  # 2 + remainder group of 1
    import numpy as np
    done_dirs = sorted(os.listdir(os.path.join(exp, "0_random")))
    assert len(done_dirs) == 3
    for d in done_dirs:
        for f in ("source.png", "inversion.png", "edit.png"):
            assert os.path.exists(os.path.join(exp, "0_random", d, f))
    # inversion artifacts saved
    arts = sorted(os.listdir(os.path.join(inv, "0_random")))
    assert len(arts) == 3
    data = np.load(os.path.join(inv, "0_random", arts[0], "inversion.npz"))
    assert data["latent"].shape == (1, 16, 16, 4)  # 32px / tiny-VAE /2


def test_sweep_consumes_precomputed_inversions(mini_pie, tmp_path):
    pipe = tiny_pipeline(num_steps=4)
    inv = str(tmp_path / "inv2")
    exp1 = str(tmp_path / "exp_produce")
    run_sweep(
        pipe, "p2p", mini_pie, exp1, inversion_type="ddim", categories=(0,),
        max_items=1, resolution=32, save_inversions=inv,
    )
    # remaining items need artifacts too for the completeness check
    from image_editing_framework_tpu.data.pie import PIE
    for item in PIE(mini_pie).items:
        d = os.path.join(inv, item.key)
        if not os.path.exists(os.path.join(d, "inversion.npz")):
            save_inversion(inv, item.key, np.zeros((1, 4, 4, 4), np.float32))
    exp2 = str(tmp_path / "exp_consume")
    stats = run_sweep(
        pipe, "p2p", mini_pie, exp2, inversion_type="ddim", categories=(0,),
        max_items=1, resolution=32, inversion_path=inv,
    )
    assert stats["images_done"] == 1


@pytest.mark.slow
@pytest.mark.parametrize("method", ["masactrl", "pnp", "p2z"])
def test_sweep_batched_other_methods(mini_pie, tmp_path, method):
    """--batch_size works for all four methods (masactrl/pnp/p2z join p2p)."""
    from image_editing_framework_tpu.core.config import MasaCtrlConfig

    pipe = tiny_pipeline(num_steps=4)
    exp = str(tmp_path / f"exp_batched_{method}")
    mk = (
        {"config": MasaCtrlConfig(start_step=1, start_layer=0)}
        if method == "masactrl"
        else None
    )
    stats = run_sweep(
        pipe, method, mini_pie, exp, inversion_type="ddim", categories=(0,),
        max_items=2, resolution=32, batch_size=2, method_kwargs=mk,
    )
    assert stats["images_done"] == 2
    done_dirs = sorted(os.listdir(os.path.join(exp, "0_random")))
    for d in done_dirs:
        for f in ("source.png", "inversion.png", "edit.png"):
            assert os.path.exists(os.path.join(exp, "0_random", d, f))


@pytest.mark.slow
def test_sweep_batched_null_text(mini_pie, tmp_path):
    pipe = tiny_pipeline(num_steps=4)
    exp = str(tmp_path / "exp_bnti")
    stats = run_sweep(
        pipe, "p2p", mini_pie, exp, inversion_type="null-text", categories=(0,),
        max_items=2, resolution=32, batch_size=2,
    )
    assert stats["images_done"] == 2


@pytest.mark.slow
def test_sweep_xl_serial_and_batched(mini_pie, tmp_path):
    """SDXL sweeps: serial with null-text inversion (regression — the CLI
    inversion path used to drop the XL added conds) and batched ddim mode
    (regression — batched paths used to be SD-only)."""
    xl = tiny_pipeline(num_steps=2, model_type="xl")
    stats = run_sweep(
        xl, "p2p", mini_pie, str(tmp_path / "exp_xl"),
        inversion_type="null-text", categories=(0,), resolution=32,
        max_items=1,
    )
    assert stats["images_done"] == 1
    stats = run_sweep(
        xl, "p2p", mini_pie, str(tmp_path / "exp_xl_b"),
        inversion_type="ddim", categories=(0,), resolution=32, batch_size=2,
    )
    assert stats["images_done"] == 3
    done = sorted(os.listdir(os.path.join(str(tmp_path / "exp_xl_b"), "0_random")))
    assert len(done) == 3
