#!/usr/bin/env python
"""Golden-output regression check.

Re-runs ONE method (default p2p) of a committed validation report on the
current code + hardware and diffs the sha256 golden hashes. A kernel, model,
or numerics change that alters production outputs fails loudly here —
the fast cross-round guard over the anchor that `tools/validate_real_weights.py
--random_weights` committed (validation/<version>/report.json). The
reference's equivalent anchor is its committed example images
(p2p/edit_real.py:173-174 writes p2p/exp/{source,inversion,edit}.png).

    python tools/golden_check.py [--report validation/1.5/report.json]
        [--method p2p] [--out /tmp/golden_check]

Exit 0 = hashes match; exit 1 = regression (prints the differing keys).
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("golden-output regression check")
    ap.add_argument("--report", default="validation/1.5/report.json")
    ap.add_argument("--method", default="p2p")
    ap.add_argument("--out", default=None, help="rerun output dir (tmp default)")
    args = ap.parse_args(argv)

    with open(args.report) as f:
        report = json.load(f)
    if args.method not in report["methods"]:
        print(f"method {args.method} not in report; have "
              f"{sorted(report['methods'])}")
        return 2

    # Replay the report under the flash-kernel operand layout it pinned:
    # reports written before the transposed inference primal existed (no
    # flash_layout field) captured the classic layout, and the layouts'
    # different accumulation orders legitimately change hashes. Must be set
    # before any tracing — the flag is read at trace time.
    layout = report.get("flash_layout", "classic")
    os.environ["IEF_FLASH_T"] = "0" if layout == "classic" else "1"
    # The transposed BACKWARD kernels (round 4, _bwd_impl_t) change gradient
    # numerics for methods that differentiate through flash (p2z's latent
    # SGD, NTI's Adam loop). Reports written before the field existed pinned
    # the classic backward (IEF_FLASH_T=0 replay disables both anyway).
    # "auto" replays with the var UNSET — the production nq-gated rule —
    # because forcing "1" would also flip sub-4096-token sites to T;
    # "forced" (report generated under IEF_FLASH_BWD_T=1) replays forced.
    bwd_layout = report.get("flash_bwd_layout", "classic")
    if bwd_layout == "classic":
        os.environ["IEF_FLASH_BWD_T"] = "0"
    elif bwd_layout == "forced":
        os.environ["IEF_FLASH_BWD_T"] = "1"
    else:
        os.environ.pop("IEF_FLASH_BWD_T", None)
    print(f"replaying with flash_layout={layout}, flash_bwd_layout={bwd_layout}")

    import jax
    import jax.numpy as jnp

    # recompiles of the SD/XL-scale programs are disk-cache hits
    from image_editing_framework_tpu.utils.jax_cache import compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", compilation_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from image_editing_framework_tpu.eval.validate import validate_pipeline

    if "random_weights" in report.get("provenance", ""):
        from image_editing_framework_tpu.pipelines import random_pipeline

        version = report.get("sd_version") or os.path.basename(
            os.path.dirname(os.path.abspath(args.report))
        )
        pipe = random_pipeline(
            version, report["num_steps"], dtype=jnp.bfloat16,
            seed=report["seed"],
        )
    else:
        print("report was produced from loaded checkpoints; rerun "
              "tools/validate_real_weights.py with the same --path instead")
        return 2

    if report.get("decode_tile_latent") is not None:
        pipe.decode_tile_latent = report["decode_tile_latent"]
    elif pipe.model_type == "xl" and report["resolution"] >= 1024:
        pipe.decode_tile_latent = 64  # pre-round-3 reports didn't record it

    source_image = None
    if "real_edit_sha256" in report["methods"][args.method]:
        from image_editing_framework_tpu.eval.validate import synth_source_image

        source_image = synth_source_image(report["seed"], report["resolution"])

    out = args.out or tempfile.mkdtemp(prefix="ief_golden_check_")
    fresh = validate_pipeline(
        pipe, out, methods=(args.method,), seed=report["seed"],
        resolution=report["resolution"], source_image=source_image,
        inversion_type=report["inversion_type"],
    )

    old = report["methods"][args.method]
    new = fresh["methods"][args.method]
    hash_keys = [k for k in old if k.endswith("_sha256") and k in new]
    diffs = [k for k in hash_keys if old[k] != new[k]]
    for k in hash_keys:
        mark = "MATCH" if old[k] == new[k] else "DIFF "
        print(f"{mark} {args.method}.{k}: {old[k][:16]} vs {new[k][:16]}")
    if diffs:
        print(f"GOLDEN REGRESSION: {len(diffs)}/{len(hash_keys)} hashes "
              f"changed ({', '.join(diffs)})")
        return 1
    print(f"golden check OK: {len(hash_keys)} hashes match "
          f"({report['provenance']}, backend={fresh.get('backend')})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
