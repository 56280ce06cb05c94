"""Editing service spool worker on the tiny pipeline."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from image_editing_framework_tpu.pipelines import tiny_pipeline
from image_editing_framework_tpu.serve import EditService


def test_service_handles_requests(tmp_path):
    pipe = tiny_pipeline(num_steps=4)
    svc = EditService(pipe, str(tmp_path), resolution=32)

    img_path = str(tmp_path / "input.jpg")
    Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (32, 32, 3), np.uint8)
    ).save(img_path)

    # real-image edit request
    with open(os.path.join(svc.requests_dir, "job1.json"), "w") as f:
        json.dump(
            {
                "method": "masactrl",
                "source_prompt": "a cat",
                "target_prompt": "a standing cat",
                "image_path": img_path,
                "inversion_type": "ddim",
            },
            f,
        )
    # synthesis request (no image)
    with open(os.path.join(svc.requests_dir, "job2.json"), "w") as f:
        json.dump(
            {
                "method": "p2p",
                "source_prompt": "a cat sat",
                "target_prompt": "a dog sat",
                "image_path": None,
                "seed": 7,
            },
            f,
        )
    # malformed request: must produce an error response, not crash
    with open(os.path.join(svc.requests_dir, "job3.json"), "w") as f:
        json.dump({"method": "nope", "source_prompt": "x", "target_prompt": "y"}, f)

    assert svc.poll_once() == 3
    assert svc.poll_once() == 0  # spool drained

    r1 = json.load(open(os.path.join(svc.results_dir, "job1", "response.json")))
    assert r1["status"] == "ok" and r1["latency_s"] > 0
    for f_ in ("source.png", "inversion.png", "edit.png"):
        assert os.path.exists(os.path.join(svc.results_dir, "job1", f_))

    r2 = json.load(open(os.path.join(svc.results_dir, "job2", "response.json")))
    assert r2["status"] == "ok"
    assert os.path.exists(os.path.join(svc.results_dir, "job2", "edit.png"))

    r3 = json.load(open(os.path.join(svc.results_dir, "job3", "response.json")))
    assert r3["status"] == "error" and "nope" in r3["error"]


def test_service_spool_intake_is_atomic(tmp_path):
    """A slowly-written (torn) request must be retried, then processed once
    complete — never answered with an error or deleted unparsed. A file that
    stays unparseable is rejected after PARSE_RETRIES polls with its bytes
    preserved under rejected/."""
    pipe = tiny_pipeline(num_steps=4)
    svc = EditService(pipe, str(tmp_path), resolution=32)

    # temp-suffix files (the documented atomic protocol) are never picked up
    tmp_file = os.path.join(svc.requests_dir, "slow.json.tmp")
    with open(tmp_file, "w") as f:
        f.write('{"method": "p2p", "source_prompt": "a cat sat",')
    assert svc.poll_once() == 0

    # a torn .json (non-renaming writer, mid-write) is left for later polls
    torn = os.path.join(svc.requests_dir, "slow.json")
    with open(torn, "w") as f:
        f.write('{"method": "p2p", "source_prompt": "a cat sat",')
    assert svc.poll_once() == 0
    assert os.path.exists(torn)  # NOT deleted
    assert not os.path.exists(
        os.path.join(svc.results_dir, "slow", "response.json")
    )  # NOT errored

    # the writer finishes: the request is processed normally
    with open(torn, "w") as f:
        json.dump(
            {
                "method": "p2p",
                "source_prompt": "a cat sat",
                "target_prompt": "a dog sat",
                "image_path": None,
                "seed": 1,
            },
            f,
        )
    assert svc.poll_once() == 1
    r = json.load(open(os.path.join(svc.results_dir, "slow", "response.json")))
    assert r["status"] == "ok"

    # permanently-bad bytes: rejected after PARSE_RETRIES further polls,
    # original bytes preserved
    bad = os.path.join(svc.requests_dir, "bad.json")
    with open(bad, "w") as f:
        f.write("{never json")
    for _ in range(svc.PARSE_RETRIES):
        assert svc.poll_once() == 0
        assert os.path.exists(bad)
    assert svc.poll_once() == 0  # retry budget exhausted -> rejected
    assert not os.path.exists(bad)
    assert os.path.exists(os.path.join(svc.rejected_dir, "bad.json"))
    assert (
        open(os.path.join(svc.rejected_dir, "bad.json")).read() == "{never json"
    )
    r = json.load(open(os.path.join(svc.results_dir, "bad", "response.json")))
    assert r["status"] == "error"

    # a SECOND bad request under the same filename later in the service
    # lifetime must not overwrite the first's preserved bytes: the rejected
    # copy is uniquified (bad.1.json)
    with open(bad, "w") as f:
        f.write("{still not json")
    for _ in range(svc.PARSE_RETRIES + 1):
        svc.poll_once()
    assert (
        open(os.path.join(svc.rejected_dir, "bad.json")).read() == "{never json"
    )
    assert (
        open(os.path.join(svc.rejected_dir, "bad.1.json")).read()
        == "{still not json"
    )


@pytest.mark.slow
def test_service_batches_compatible_requests(tmp_path):
    """Compatible queued requests run as ONE vmapped program."""
    pipe = tiny_pipeline(num_steps=4)
    svc = EditService(pipe, str(tmp_path), resolution=32, max_batch=4)

    for i in range(3):
        with open(os.path.join(svc.requests_dir, f"syn{i}.json"), "w") as f:
            json.dump(
                {
                    "method": "p2p",
                    "source_prompt": f"a cat sat {i}",
                    "target_prompt": f"a dog sat {i}",
                    "image_path": None,
                    "seed": i,
                },
                f,
            )
    # different method, single member -> serial path in the same poll
    with open(os.path.join(svc.requests_dir, "solo.json"), "w") as f:
        json.dump(
            {
                "method": "masactrl",
                "source_prompt": "a cat",
                "target_prompt": "a standing cat",
                "image_path": None,
            },
            f,
        )

    assert svc.poll_once() == 4
    assert svc.stats["batched"] == 3
    for i in range(3):
        r = json.load(
            open(os.path.join(svc.results_dir, f"syn{i}", "response.json"))
        )
        assert r["status"] == "ok" and r["batched_with"] == 3
        assert os.path.exists(os.path.join(svc.results_dir, f"syn{i}", "edit.png"))
    solo = json.load(open(os.path.join(svc.results_dir, "solo", "response.json")))
    assert solo["status"] == "ok" and "batched_with" not in solo


@pytest.mark.slow
def test_service_batches_direct_inversion(tmp_path):
    """Direct-inversion requests group into one vmapped program too (each
    image's source branch replays its own trajectory)."""
    pipe = tiny_pipeline(num_steps=4)
    svc = EditService(pipe, str(tmp_path), resolution=32, max_batch=4)
    rng = np.random.RandomState(1)
    for i in range(2):
        img_path = str(tmp_path / f"in{i}.jpg")
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(img_path)
        with open(os.path.join(svc.requests_dir, f"dir{i}.json"), "w") as f:
            json.dump(
                {
                    "method": "p2p",
                    "source_prompt": "a cat sat",
                    "target_prompt": "a dog sat",
                    "image_path": img_path,
                    "inversion_type": "direct",
                },
                f,
            )
    assert svc.poll_once() == 2
    assert svc.stats["batched"] == 2
    for i in range(2):
        r = json.load(
            open(os.path.join(svc.results_dir, f"dir{i}", "response.json"))
        )
        assert r["status"] == "ok" and r["batched_with"] == 2


def test_service_parses_config_dict(tmp_path):
    """A JSON "config" sub-dict maps onto the method's config dataclass."""
    pipe = tiny_pipeline(num_steps=4)
    svc = EditService(pipe, str(tmp_path), resolution=32)
    with open(os.path.join(svc.requests_dir, "cfg.json"), "w") as f:
        json.dump(
            {
                "method": "p2p",
                "source_prompt": "a cat",
                "target_prompt": "a big cat",
                "image_path": None,
                "method_kwargs": {
                    "config": {
                        "edit_type": "refine",
                        "cross_replace_steps": 0.7,
                        "eq_words": ["big"],
                        "eq_values": [2.0],
                    }
                },
            },
            f,
        )
    assert svc.poll_once() == 1
    r = json.load(open(os.path.join(svc.results_dir, "cfg", "response.json")))
    assert r["status"] == "ok", r
    assert os.path.exists(os.path.join(svc.results_dir, "cfg", "edit.png"))


@pytest.mark.slow
def test_service_handles_xl_requests(tmp_path):
    """XL pipelines serve end-to-end, including the batched compatible-
    request path (regression: batched programs were SD-only)."""
    pipe = tiny_pipeline(num_steps=2, model_type="xl")
    svc = EditService(pipe, str(tmp_path), resolution=32)
    img_path = str(tmp_path / "input.jpg")
    Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (32, 32, 3), np.uint8)
    ).save(img_path)
    for j in range(2):
        with open(os.path.join(svc.requests_dir, f"job{j}.json"), "w") as f:
            json.dump(
                {
                    "method": "p2p",
                    "source_prompt": "a cat sat",
                    "target_prompt": "a dog sat",
                    "image_path": img_path,
                    "inversion_type": "ddim",
                },
                f,
            )
    assert svc.poll_once() == 2
    for j in range(2):
        r = json.load(
            open(os.path.join(svc.results_dir, f"job{j}", "response.json"))
        )
        assert r["status"] == "ok", r


@pytest.mark.slow
def test_bench_serve_tool_smoke():
    """tools/bench_serve.py runs end-to-end on the tiny pipeline and reports
    a well-formed throughput report (the serial comparison mode is covered
    on-chip; one mode keeps the test inside the slow-suite budget)."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [
            sys.executable, os.path.join(root, "tools", "bench_serve.py"),
            "--tiny", "--n", "2", "--max_batch", "2", "--num_steps", "2",
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    # last JSON object on stdout
    payload = json.loads(out.stdout[out.stdout.index("{"):])
    assert payload["batched"]["ok_responses"] >= 2
    assert payload["batched"]["s_per_request"] > 0
