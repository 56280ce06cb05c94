#!/usr/bin/env python
"""Multi-host PIE-Bench sweep launcher.

Run the same command on every host of a TPU slice (or independent hosts);
each process initializes the JAX distributed runtime, takes its shard of the
700-image list (strided, balancing categories), and sweeps it. Outputs land
in a shared --exp_path; resume-by-output makes relaunches idempotent.

Single host, 4 shards on one machine (process-level parallelism is NOT
useful on one chip — use --batch_size instead); the real use is one process
per host:

    # on every host of the slice:
    python tools/launch_distributed_sweep.py --method p2p \
        --dataset_path /data/PIE --exp_path /shared/test_exp \
        --coordinator host0:8476 --num_processes 4 --process_id $HOST_ID
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser("distributed PIE-Bench sweep")
    p.add_argument("--method", type=str, default="p2p")
    p.add_argument("--sd_version", type=str, default="1.5")
    p.add_argument("--dataset_path", type=str, required=True)
    p.add_argument("--exp_path", type=str, required=True)
    p.add_argument("--inversion_type", type=str, default="ddim")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num_steps", type=int, default=50)
    p.add_argument("--max_items", type=int, default=None)
    p.add_argument("--resolution", type=int, default=None)
    p.add_argument("--random_weights", action="store_true",
                   help="production-shape pipeline with deterministic random "
                        "weights (identical compute cost; used for the sweep "
                        "dress rehearsal when no checkpoints exist)")
    # multi-host bootstrap (omit all three for single-process)
    p.add_argument("--coordinator", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    # explicit shard override: concurrent processes WITHOUT the jax
    # distributed runtime (independent hosts sharing only --exp_path, or
    # the concurrent-shard demo on one machine) — each process names its
    # own slice of the item list instead of deriving it from
    # jax.process_index()
    p.add_argument("--shard_index", type=int, default=None)
    p.add_argument("--shard_count", type=int, default=None)
    p.add_argument("--save_inversions", type=str, default=None,
                   help="directory to write per-image inversion artifacts "
                        "(latent + NTI uncond_seq) — the cache producer the "
                        "reference lacks (p2p/dataset/pie.py:25-51 only "
                        "consumes)")
    p.add_argument("--inversion_path", type=str, default=None,
                   help="consume precomputed inversions from this cache "
                        "instead of inverting (npz or reference .pt layouts)")
    p.add_argument("--no-metrics", dest="no_metrics", action="store_true",
                   help="skip per-image quality metrics (pure-throughput runs)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny_pipeline instead of production shapes (CPU-"
                        "sized; used by tools/concurrent_shard_demo.py)")
    args = p.parse_args()

    import jax

    # Persistent compilation cache: a killed-and-resumed sweep (or any
    # relaunch) skips the minutes-long SD/XL program compiles.
    from image_editing_framework_tpu.utils.jax_cache import compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", compilation_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from image_editing_framework_tpu.parallel.mesh import initialize_distributed

    proc = initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    count = args.num_processes or 1

    import jax.numpy as jnp

    from image_editing_framework_tpu.eval.sweep import run_sweep

    if args.tiny:
        from image_editing_framework_tpu.pipelines import tiny_pipeline

        pipe = tiny_pipeline(num_steps=args.num_steps)
    elif args.random_weights:
        from image_editing_framework_tpu.pipelines import random_pipeline

        pipe = random_pipeline(args.sd_version, args.num_steps, dtype=jnp.bfloat16)
    else:
        from image_editing_framework_tpu.models.registry import load_pipeline

        pipe = load_pipeline(args.sd_version, args.num_steps, dtype=jnp.bfloat16)
    if args.shard_index is not None:
        # shard_index without an explicit shard_count would default to
        # count=1 — every shard processing items[i::1], i.e. overlapping
        # near-full sweeps instead of a partition. Refuse.
        if not args.shard_count or args.shard_count <= args.shard_index:
            raise SystemExit(
                "--shard_index requires --shard_count > shard_index "
                f"(got index={args.shard_index} count={args.shard_count})"
            )
        proc, count = args.shard_index, args.shard_count
    use_flash = None if not args.tiny else False
    stats = run_sweep(
        pipe, args.method, args.dataset_path, args.exp_path,
        inversion_type=args.inversion_type, seed=args.seed,
        shard_index=proc, shard_count=count, batch_size=args.batch_size,
        max_items=args.max_items, resolution=args.resolution,
        save_inversions=args.save_inversions,
        inversion_path=args.inversion_path,
        record_metrics=not args.no_metrics,
        **({"use_flash": use_flash} if use_flash is not None else {}),
    )
    print(f"[process {proc}/{count}] {stats}")


if __name__ == "__main__":
    main()
