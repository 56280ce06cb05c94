#!/usr/bin/env python
"""Serving-throughput benchmark for the warm-program edit service.

Measures the request path a production operator sees (`serve.EditService`):
a burst of N real-image edit requests (synthesized source images, DDIM
inversion + edit + decode per request) dropped into the spool, drained by
the poller. Reports wall-clock and s/request for the BATCHED intake
(compatible requests grouped into one vmapped program per poll,
`serve.py:handle_batch`) and optionally the serial path for comparison.

The reference has no serving story at all — its deployment unit is a
one-shot CLI that pays model load + (on TPU) compilation per invocation
(`p2p/edit_real.py`); this benchmark quantifies what the warm service wins.

    python tools/bench_serve.py --n 16 --max_batch 4 --compare_serial \
        --out validation/serve_bench.json
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from image_editing_framework_tpu.utils.jax_cache import compilation_cache_dir
jax.config.update("jax_compilation_cache_dir", compilation_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def _submit(root: str, name: str, req: dict) -> None:
    """Atomic-write protocol the service documents: temp name + rename."""
    path = os.path.join(root, "requests", name + ".json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(req, f)
    os.replace(tmp, path)


def _drain(svc, expect: int, timeout_s: float = 3600.0) -> float:
    t0 = time.perf_counter()
    handled = 0
    while handled < expect:
        handled += svc.poll_once()
        if time.perf_counter() - t0 > timeout_s:
            raise TimeoutError(f"{handled}/{expect} after {timeout_s}s")
        if handled < expect:
            time.sleep(0.05)
    return time.perf_counter() - t0


def run_mode(pipe, res: int, images, args, max_batch: int) -> dict:
    from image_editing_framework_tpu.serve import EditService

    root = tempfile.mkdtemp(prefix=f"ief_serve_bench_b{max_batch}_")
    svc = EditService(pipe, root, resolution=res, max_batch=max_batch)

    def req(i: int) -> dict:
        return {
            "method": args.method,
            "source_prompt": f"a {['cat','dog','horse'][i % 3]} in the field",
            "target_prompt": f"a {['dog','horse','cat'][i % 3]} in the field",
            "image_path": images[i % len(images)],
            "inversion_type": args.inversion_type,
            "seed": 42 + i,
        }

    # warm-up: one full group — compiles the batched programs at group
    # size max_batch (and the straggler-free steady shape)
    for i in range(max_batch):
        _submit(root, f"warm{i:03d}", req(i))
    compile_s = _drain(svc, max_batch)

    for i in range(args.n):
        _submit(root, f"req{i:04d}", req(i))
    wall = _drain(svc, args.n)

    # count ONLY the burst's responses — warm-up requests share the results
    # dir and would mask burst failures if included
    ok = sum(
        1
        for n in os.listdir(os.path.join(root, "results"))
        if n.startswith("req")
        and os.path.exists(os.path.join(root, "results", n, "response.json"))
        and json.load(open(os.path.join(root, "results", n, "response.json")))[
            "status"
        ]
        == "ok"
    )
    shutil.rmtree(root, ignore_errors=True)
    return {
        "max_batch": max_batch,
        "warmup_s": round(compile_s, 2),
        "burst_n": args.n,
        "burst_wall_s": round(wall, 2),
        "s_per_request": round(wall / args.n, 3),
        "ok_responses": ok,
    }


def main() -> None:
    ap = argparse.ArgumentParser("serve throughput bench")
    ap.add_argument("--sd_version", default="1.5")
    ap.add_argument("--method", default="p2p")
    ap.add_argument("--inversion_type", default="ddim")
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--max_batch", type=int, default=4)
    ap.add_argument("--compare_serial", action="store_true")
    ap.add_argument("--num_steps", type=int, default=50)
    ap.add_argument("--resolution", type=int, default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny CPU-sized pipeline (smoke test)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from image_editing_framework_tpu.eval.validate import synth_source_image
    from image_editing_framework_tpu.utils.images import save_img

    if args.tiny:
        # Smoke-test mode is XLA-compile-dominated (tiny shapes, many unique
        # programs): trade optimized codegen for compile speed, as the test
        # conftest does. IEF_TEST_OPT=1 restores full optimization.
        if not os.environ.get("IEF_TEST_OPT"):
            jax.config.update("jax_disable_most_optimizations", True)
        from image_editing_framework_tpu.pipelines import tiny_pipeline

        pipe = tiny_pipeline(num_steps=args.num_steps)
        res = args.resolution or 32
    else:
        from image_editing_framework_tpu.pipelines import random_pipeline

        pipe = random_pipeline(args.sd_version, args.num_steps, dtype=jnp.bfloat16)
        res = args.resolution or 512

    img_dir = tempfile.mkdtemp(prefix="ief_serve_inputs_")
    images = []
    for i in range(4):
        p = os.path.join(img_dir, f"src{i}.png")
        save_img(np.asarray(synth_source_image(100 + i, res)), p)
        images.append(p)

    result = {
        "sd_version": args.sd_version if not args.tiny else "tiny",
        "method": args.method,
        "inversion_type": args.inversion_type,
        "resolution": res,
        "num_steps": pipe.scheduler.num_steps,
        # default_backend() lies when computation is pinned elsewhere —
        # report the platform of the device the pipeline actually lives on
        "backend": jax.devices()[0].platform,
        "workload": "real-image edit (invert + edit + decode) per request",
        "batched": run_mode(pipe, res, images, args, args.max_batch),
    }
    if args.compare_serial:
        result["serial"] = run_mode(pipe, res, images, args, 1)
        result["batched_speedup"] = round(
            result["serial"]["s_per_request"]
            / result["batched"]["s_per_request"],
            2,
        )
    shutil.rmtree(img_dir, ignore_errors=True)

    print(json.dumps(result, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
