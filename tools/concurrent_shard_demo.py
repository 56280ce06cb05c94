#!/usr/bin/env python
"""Concurrent multi-process shard demo: N independent sweep processes over
one shared --exp_path.

The reference's PIE sweep is a single serial process
(`/root/reference/p2p/test.py:114-181`); this framework's deployment story
is one process per host, each taking a strided shard
(`tools/launch_distributed_sweep.py`). The in-process dryrun
(`__graft_entry__._dryrun_shard_sweep`) proves the partition arithmetic;
this demo proves the *concurrent* story: N OS processes run AT THE SAME
TIME against the same output tree, and resume-by-output + per-shard stats
files keep them from stepping on each other.

Runs on CPU with the tiny pipeline (one machine stands in for N hosts; the
shard plumbing is identical). Writes validation/concurrent_shards.json.

    python tools/concurrent_shard_demo.py --n 24 --shards 8
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sweep_rehearsal import count_done, synth_pie  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser("concurrent shard demo")
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--num_steps", type=int, default=8)
    ap.add_argument("--method", type=str, default="p2p")
    ap.add_argument("--root", type=str, default="/tmp/ief_conc_shards")
    ap.add_argument("--out", type=str, default="validation/concurrent_shards.json")
    args = ap.parse_args()

    import shutil

    shutil.rmtree(args.root, ignore_errors=True)
    os.makedirs(args.root)
    synth_pie(args.root, args.n, res=32)
    ds, exp = os.path.join(args.root, "ds"), os.path.join(args.root, "exp")

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    launcher = os.path.join(os.path.dirname(__file__), "launch_distributed_sweep.py")
    t0 = time.time()
    procs = []
    for si in range(args.shards):
        procs.append(subprocess.Popen(
            [sys.executable, launcher, "--method", args.method,
             "--dataset_path", ds, "--exp_path", exp, "--tiny",
             "--num_steps", str(args.num_steps), "--resolution", "32",
             "--max_items", str(args.n),
             "--shard_index", str(si), "--shard_count", str(args.shards)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        ))
    outs = [p.communicate()[0] for p in procs]
    wall = time.time() - t0

    failures = [i for i, p in enumerate(procs) if p.returncode != 0]
    for i in failures:
        print(f"--- shard {i} FAILED ---\n{outs[i][-1500:]}")
    assert not failures, f"shards failed: {failures}"

    shard_stats, total_done = {}, 0
    for si in range(args.shards):
        with open(os.path.join(exp, f"sweep_stats_{args.method}_{si}.json")) as f:
            s = json.load(f)
        assert s["images_skipped"] == 0, f"shard {si} overlapped another shard"
        shard_stats[si] = {k: s[k] for k in ("images_done", "wall_s") if k in s}
        total_done += s["images_done"]
    on_disk = count_done(exp)
    assert total_done == args.n == on_disk, (total_done, args.n, on_disk)

    result = {
        "n": args.n, "shards": args.shards, "method": args.method,
        "num_steps": args.num_steps, "wall_s": round(wall, 1),
        "images_done_total": total_done, "images_on_disk": on_disk,
        "per_shard": shard_stats,
        "note": "tiny pipeline on CPU; 8 concurrent OS processes, shared "
                "exp tree, zero overlap — the per-host deployment layout of "
                "launch_distributed_sweep.py",
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    shutil.rmtree(args.root, ignore_errors=True)


if __name__ == "__main__":
    main()
