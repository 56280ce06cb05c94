#!/usr/bin/env python
"""Full-scale PIE-sweep dress rehearsal on one chip.

Converts the headline throughput claim from small-N arithmetic into a
measurement at the reference's real scale (`/root/reference/p2p/test.py:114-181`
runs all ~700 PIE images serially):

1. synthesizes a PIE-Bench-shaped dataset of --n 512x512 images,
2. phase A: launches the sweep as a subprocess and SIGKILLs it mid-run
   (default after --kill_after seconds) — the crash-mid-sweep scenario,
3. phase B: relaunches with resume-by-output and lets it finish,
4. reports total wall clock, steady-state s/image over the full run,
   percentiles, device HBM peak + host RSS, and the resume evidence
   (phase-B images_skipped == phase-A images_done).

The sweep runs the production-shape SD1.5 pipeline with deterministic random
weights (identical compute cost to trained checkpoints; no weights exist in
this environment).

    python tools/sweep_rehearsal.py --n 700 --batch_size 4 \
        --out validation/sweep_rehearsal.json
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_pie(root: str, n: int, res: int = 512, categories=(0, 1, 2, 3, 4, 6, 7, 8, 9)) -> str:
    """A PIE-Bench-shaped dataset of n smooth-noise images spread over the
    reference's categories (5 skipped, as in p2p/test.py:114).

    Deliberately numpy/PIL-only (NOT eval.validate.synth_source_image, which
    resizes via jax): this generator runs in the rehearsal's parent process,
    which must never initialize the JAX backend — the kill/resume sweep
    subprocesses need the single TPU chip to themselves."""
    import numpy as np
    from PIL import Image

    ds = os.path.join(root, "ds")
    mapping = {}
    rng = np.random.RandomState(0)
    nouns = ["cat", "dog", "horse", "zebra", "car", "boat"]
    for i in range(n):
        cat = categories[i % len(categories)]
        rel = f"{cat}_synthetic/img_{i:04d}.jpg"
        d = os.path.join(ds, "annotation_images", f"{cat}_synthetic")
        os.makedirs(d, exist_ok=True)
        small = rng.randint(0, 255, (res // 16, res // 16, 3), np.uint8)
        img = np.asarray(
            Image.fromarray(small).resize((res, res), Image.BICUBIC)
        )
        Image.fromarray(img).save(os.path.join(ds, "annotation_images", rel))
        src, tgt = nouns[i % 6], nouns[(i + 1) % 6]
        mapping[str(i)] = {
            "image_path": rel,
            "original_prompt": f"a [{src}] in the field",
            "editing_prompt": f"a [{tgt}] in the field",
        }
    with open(os.path.join(ds, "mapping_file.json"), "w") as f:
        json.dump(mapping, f)
    return ds


def launch(ds: str, exp: str, n: int, batch: int, method: str) -> subprocess.Popen:
    cmd = [
        sys.executable, os.path.join(os.path.dirname(__file__), "launch_distributed_sweep.py"),
        "--method", method, "--dataset_path", ds, "--exp_path", exp,
        "--batch_size", str(batch), "--random_weights", "--max_items", str(n),
        "--resolution", "512",
    ]
    return subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def count_done(exp: str) -> int:
    total = 0
    for cat in os.listdir(exp):
        d = os.path.join(exp, cat)
        if not os.path.isdir(d):
            continue
        for key in os.listdir(d):
            if os.path.exists(os.path.join(d, key, "edit.png")):
                total += 1
    return total


def main() -> None:
    ap = argparse.ArgumentParser("sweep dress rehearsal")
    ap.add_argument("--n", type=int, default=700)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--method", type=str, default="p2p")
    ap.add_argument("--kill_after", type=float, default=300.0,
                    help="seconds into phase A before SIGKILL (0 = skip phase A)")
    ap.add_argument("--root", type=str, default="/tmp/ief_rehearsal")
    ap.add_argument("--out", type=str, default="validation/sweep_rehearsal.json")
    args = ap.parse_args()

    os.makedirs(args.root, exist_ok=True)
    ds = os.path.join(args.root, "ds")
    if not os.path.exists(os.path.join(ds, "mapping_file.json")):
        print(f"synthesizing {args.n}-image PIE clone under {ds} ...")
        synth_pie(args.root, args.n)
    exp = os.path.join(args.root, "exp")

    t0 = time.time()
    result = {"n": args.n, "batch_size": args.batch_size, "method": args.method}

    if args.kill_after > 0:
        print(f"phase A: sweep subprocess, SIGKILL after {args.kill_after}s ...")
        proc = launch(ds, exp, args.n, args.batch_size, args.method)
        try:
            proc.wait(timeout=args.kill_after)
            print("phase A finished before the kill window — shrink --kill_after")
        except subprocess.TimeoutExpired:
            proc.send_signal(signal.SIGKILL)
            proc.wait()
        result["phase_a_wall_s"] = round(time.time() - t0, 1)
        result["phase_a_images_done"] = count_done(exp)
        print(f"phase A killed: {result['phase_a_images_done']} images on disk")

    print("phase B: resume to completion ...")
    t1 = time.time()
    proc = launch(ds, exp, args.n, args.batch_size, args.method)
    out, _ = proc.communicate()
    sys.stdout.write(out[-2000:])
    if proc.returncode != 0:
        print(f"phase B FAILED rc={proc.returncode}")
        sys.exit(1)
    result["phase_b_wall_s"] = round(time.time() - t1, 1)
    result["total_wall_s"] = round(time.time() - t0, 1)
    result["final_images_done"] = count_done(exp)

    stats_path = os.path.join(exp, f"sweep_stats_{args.method}_0.json")
    with open(stats_path) as f:
        stats = json.load(f)
    result["phase_b_stats"] = stats
    resumed = stats.get("images_skipped", 0)
    result["resume_verified"] = (
        args.kill_after > 0
        and resumed >= result.get("phase_a_images_done", 0) - args.batch_size
        and result["final_images_done"] == args.n
    )
    # end-to-end throughput over the whole rehearsal (incl. both compiles
    # and the kill): the honest number a production operator would see
    result["effective_s_per_image"] = round(result["total_wall_s"] / args.n, 3)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
