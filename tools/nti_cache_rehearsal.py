#!/usr/bin/env python
"""Null-text-inversion cache producer→consumer rehearsal at scale, on-chip.

The reference consumes a precomputed-inversion cache it cannot produce
(`p2p/dataset/pie.py:25-51` reads inversion_latent.pt + uncond list; nothing
in the reference writes them). This framework produces AND consumes the
cache; this rehearsal demonstrates the full loop at production shape
(VERDICT r4 item 7):

  phase P (produce): --n-image PIE-shaped sweep, null-text inversion,
      batch_size --batch_size, --save_inversions → per-image npz artifacts
      (latent + per-step optimized uncond_seq);
  phase C (consume): a FRESH sweep over the same dataset with
      --inversion_path pointing at the phase-P cache — the invert+NTI
      phases are skipped entirely; per-image latency collapses to the
      edit+decode cost.

Emits one JSON: both phases' stats, artifact count/bytes, and the
producer→consumer speedup.

    python tools/nti_cache_rehearsal.py --n 100 --batch_size 4 \
        --out validation/nti_cache_rehearsal.json
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.sweep_rehearsal import count_done, synth_pie  # noqa: E402


def launch(ds, exp, n, batch, extra):
    cmd = [
        sys.executable,
        os.path.join(os.path.dirname(__file__), "launch_distributed_sweep.py"),
        "--method", "p2p", "--dataset_path", ds, "--exp_path", exp,
        "--batch_size", str(batch), "--random_weights",
        "--max_items", str(n), "--resolution", "512",
    ] + extra
    return subprocess.run(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True
    )


def cache_footprint(inv):
    files = 0
    total = 0
    for dirpath, _, fnames in os.walk(inv):
        for f in fnames:
            files += 1
            total += os.path.getsize(os.path.join(dirpath, f))
    return files, total


def main() -> None:
    ap = argparse.ArgumentParser("NTI inversion-cache rehearsal")
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--root", type=str, default="/tmp/ief_nti_rehearsal")
    ap.add_argument("--out", type=str,
                    default="validation/nti_cache_rehearsal.json")
    args = ap.parse_args()

    os.makedirs(args.root, exist_ok=True)
    ds = os.path.join(args.root, "ds")
    if not os.path.exists(os.path.join(ds, "mapping_file.json")):
        print(f"synthesizing {args.n}-image PIE clone under {ds} ...")
        synth_pie(args.root, args.n)
    inv = os.path.join(args.root, "inv_cache")
    result = {"n": args.n, "batch_size": args.batch_size,
              "inversion_type": "null-text"}

    produce_stats_path = os.path.join(args.root, "exp_produce",
                                      "sweep_stats_p2p_0.json")
    if os.path.exists(produce_stats_path):
        # resume: a completed phase P (and its cache) is expensive (~40 min
        # at n=100) — reuse it and only re-drive the consumer
        print("phase P already complete; reusing its cache ...")
        with open(produce_stats_path) as f:
            result["produce_wall_s"] = json.load(f).get("wall_s")
    else:
        print("phase P: null-text sweep producing the inversion cache ...")
        t0 = time.time()
        proc = launch(ds, os.path.join(args.root, "exp_produce"), args.n,
                      args.batch_size,
                      ["--inversion_type", "null-text",
                       "--save_inversions", inv])
        sys.stdout.write(proc.stdout[-1500:])
        if proc.returncode != 0:
            print(f"phase P FAILED rc={proc.returncode}")
            sys.exit(1)
        result["produce_wall_s"] = round(time.time() - t0, 1)
    with open(os.path.join(args.root, "exp_produce",
                           "sweep_stats_p2p_0.json")) as f:
        result["produce_stats"] = json.load(f)
    files, total = cache_footprint(inv)
    result["cache_files"] = files
    result["cache_bytes"] = total

    print("phase C: fresh sweep consuming the cache (no invert/NTI) ...")
    t1 = time.time()
    proc = launch(ds, os.path.join(args.root, "exp_consume"), args.n,
                  args.batch_size,
                  ["--inversion_type", "null-text", "--inversion_path", inv])
    sys.stdout.write(proc.stdout[-1500:])
    if proc.returncode != 0:
        print(f"phase C FAILED rc={proc.returncode}")
        sys.exit(1)
    result["consume_wall_s"] = round(time.time() - t1, 1)
    with open(os.path.join(args.root, "exp_consume",
                           "sweep_stats_p2p_0.json")) as f:
        result["consume_stats"] = json.load(f)
    result["consume_images_done"] = count_done(
        os.path.join(args.root, "exp_consume")
    )
    ps = result["produce_stats"].get("steady_s_per_image")
    cs = result["consume_stats"].get("steady_s_per_image")
    if ps and cs:
        result["producer_consumer_speedup"] = round(ps / cs, 2)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
