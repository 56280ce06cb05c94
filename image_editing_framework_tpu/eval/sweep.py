"""PIE-Bench sweep driver.

Reference shape (p2p/test.py:114-181): loop categories [0-4, 6-9] (5 is
skipped), per image invert -> build controller -> edit -> save
``test_exp/<image>/{source,inversion,edit}.png``; P2P picks replace vs refine
by word-count equality (p2p/test.py:120-123).

Differences by design:
* One compiled program serves every image — shapes (512^2, 77-token padded
  prompts, mapper matrices) are static, so jit caches across the sweep
  instead of re-tracing (the reference re-registers hooks per image).
* Sweep-level resumability: images whose output directory already holds
  edit.png are skipped (SURVEY.md §5 failure-recovery note).
* Multi-host sharding: ``shard_index/shard_count`` split the item list so
  the 700-image sweep runs data-parallel across chips/hosts.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import numpy as np

from image_editing_framework_tpu.core.config import P2PConfig, SamplerConfig
from image_editing_framework_tpu.data.pie import DEFAULT_CATEGORIES, PIE
from image_editing_framework_tpu.utils.images import load_image, save_img


def _auto_p2p_config(source_prompt: str, target_prompt: str) -> P2PConfig:
    """replace if equal word counts else refine (p2p/test.py:120-123)."""
    if len(source_prompt.split(" ")) == len(target_prompt.split(" ")):
        return P2PConfig(edit_type="replace")
    return P2PConfig(edit_type="refine")


def _json_safe_metrics(row: dict) -> dict:
    """Round metric values for the event log, mapping non-finite values to
    null: a perfect reconstruction yields psnr=inf, which json.dumps would
    emit as the bare `Infinity` token — valid for Python's lenient loads but
    rejected by every strict RFC-8259 consumer (jq, JSON.parse)."""
    return {
        k: round(v, 5) if np.isfinite(v) else None for k, v in row.items()
    }


def run_sweep(
    pipe,
    method: str,
    dataset_path: str,
    exp_path: str,
    inversion_type: str = "ddim",
    seed: int = 42,
    categories=DEFAULT_CATEGORIES,
    method_kwargs: Optional[dict] = None,
    resume: bool = True,
    shard_index: int = 0,
    shard_count: int = 1,
    max_items: Optional[int] = None,
    resolution: Optional[int] = None,
    batch_size: int = 1,
    save_inversions: Optional[str] = None,
    inversion_path: Optional[str] = None,
    use_flash: Optional[bool] = None,
    record_metrics: bool = True,
    clip_checkpoint: Optional[str] = None,
    lpips_weights=None,
) -> dict:
    """``batch_size`` > 1 edits image groups as one vmapped program (all four
    methods; ddim, null-text, or direct inversion; composes with
    ``inversion_path``/``save_inversions``) — the throughput mode the
    reference's hook design precludes, and the recovery for batch-1
    inversion's MXU underutilization (BASELINE.md phase table).
    ``save_inversions`` writes the per-image inversion artifacts the
    reference's PIE_NTI_Inversion dataset consumes (the producer it lacks,
    p2p/dataset/pie.py:44-51); ``inversion_path`` consumes them, skipping the
    inversion phase entirely (the reference's PIE_NTI_Inversion path,
    p2p/dataset/pie.py:25-51). Host-side PNG decode/encode runs on a worker
    pool (the reference's DataLoader num_workers=8, p2p/test.py:116)."""
    if batch_size > 1 and inversion_type not in ("ddim", "null-text", "direct"):
        raise ValueError("batched sweep supports ddim/null-text/direct inversion")

    from image_editing_framework_tpu.cli import invert, run_method

    if use_flash is None:
        # the kernel only compiles on TPU; a sweep driven onto CPU devices
        # (virtual-mesh dryruns) must say use_flash=False explicitly — the
        # ambient default backend may still be a TPU platform
        use_flash = jax.default_backend() == "tpu"
    res = resolution or (1024 if pipe.model_type == "xl" else 512)
    prev_tile = pipe.decode_tile_latent
    if pipe.model_type == "xl" and res >= 1024 and pipe.decode_tile_latent is None:
        # Memory-safety default: the full-frame 1024² decode's activations
        # don't fit next to the resident XL UNet + both text towers on one
        # 16 GB chip. Set pipe.decode_tile_latent yourself to override.
        # Restored after the sweep — the pipe object outlives this call.
        pipe.decode_tile_latent = 64
    sampler = SamplerConfig(height=res, width=res, seed=seed)
    times = []
    done = skipped = 0
    t_start = time.perf_counter()
    pending = []
    all_items = []
    for category in categories:
        all_items.extend(PIE(dataset_path, category).items)
    # Stride the GLOBAL item list, not per-category: shards stay balanced
    # even when a category holds fewer items than shard_count (per-category
    # striding left shards >= min-category-size empty).
    for item in all_items[shard_index::shard_count]:
        if max_items is not None and len(pending) + skipped >= max_items:
            break
        out_dir = os.path.join(exp_path, item.key)
        if resume and os.path.exists(os.path.join(out_dir, "edit.png")):
            skipped += 1
            continue
        pending.append(item)

    os.makedirs(exp_path, exist_ok=True)
    event_log = os.path.join(exp_path, f"events_{method}_{shard_index}.jsonl")

    # The precomputed-inversion cache stores only (latent, uncond_seq) — no
    # trajectory — so 'direct' inversion degrades to plain ddim replay-less
    # editing on the cache path. Make the degradation auditable instead of
    # silent: warn the operator and record the effective mode in the stats.
    inversion_type_effective = inversion_type
    if inversion_path is not None and inversion_type == "direct":
        inversion_type_effective = "ddim (cache has no trajectory)"
        import warnings

        warnings.warn(
            "inversion_type='direct' with inversion_path: cached artifacts "
            "hold no latent trajectory, so source-branch replay is NOT "
            "applied — the sweep runs plain ddim editing "
            "(stats['inversion_type_effective'] records this)",
            stacklevel=2,
        )

    # Host-parallel image IO: PNG decode (prefetch) and encode (fire-and-
    # forget saves) run off the hot loop — the reference's DataLoader
    # num_workers=8 equivalent (p2p/test.py:116).
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=8)
    # Metric tasks (CLIP forward, full-res SSIM convs, LPIPS VGG) run on
    # their own small executor: on the shared pool, 8 queued metric tasks
    # could starve the hot loop's PNG prefetch (load_future.result() would
    # queue behind them, re-serializing the loop) and contend with the
    # resident UNet for HBM (ADVICE-r4). Two workers bound the in-flight
    # device-bound metric dispatches while still overlapping with editing.
    metric_pool = ThreadPoolExecutor(max_workers=2)
    save_futures = []
    metric_futures = []

    def save_async(img, path):
        save_futures.append(pool.submit(save_img, img, path))

    # Quality metrics per image (BASELINE.md targets table): source <->
    # reconstruction MSE/PSNR/SSIM always; CLIP-score of the edit vs the
    # target prompt and LPIPS(source, edit) when towers are configured.
    # Same code path the validation runway uses (eval/validate.py).
    clip_scorer = lpips_fn = None
    metric_rows: list = []
    if record_metrics:
        from image_editing_framework_tpu.eval import metrics as qmetrics

        if clip_checkpoint:
            clip_scorer = qmetrics.CLIPScore(clip_checkpoint)
        if lpips_weights is not None:
            from image_editing_framework_tpu.eval.lpips import LPIPS

            lpips_fn = LPIPS(lpips_weights)

    def _metrics_and_log(item, src_img, inv_img, edit_img, rec):
        # Runs on the worker pool: metric device-compute must not serialize
        # the edit hot loop (the saves already ride the pool for the same
        # reason); jax dispatch is thread-safe and list.append is atomic.
        if record_metrics:
            from image_editing_framework_tpu.eval import metrics as qmetrics

            row = {}
            # a precomputed-inversion cache may hold latents at a different
            # resolution than this sweep decodes at; recon metrics are only
            # meaningful like-for-like
            if np.shape(src_img)[-3:] == np.shape(inv_img)[-3:]:
                row.update({
                    "recon_mse": qmetrics.mse(src_img, inv_img),
                    "recon_psnr": qmetrics.psnr(src_img, inv_img),
                    "recon_ssim": qmetrics.ssim(src_img, inv_img),
                })
            if clip_scorer is not None:
                row["clip_score_edit"] = clip_scorer(
                    np.asarray(edit_img)[None], [item.target_prompt]
                )
            if lpips_fn is not None:
                row["lpips_src_edit"] = lpips_fn(
                    np.asarray(src_img)[None], np.asarray(edit_img)[None]
                )
            metric_rows.append(row)
            rec.update(_json_safe_metrics(row))
        # per-image observability trail (SURVEY.md §5: the reference has
        # none). One whole line per open-append-close: lines stay intact
        # under the pool's interleaving (order may differ from completion).
        with open(event_log, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def finish(item, src_img, inv_img, edit_img, elapsed):
        out_dir = os.path.join(exp_path, item.key)
        save_async(inv_img, os.path.join(out_dir, "inversion.png"))
        save_async(edit_img, os.path.join(out_dir, "edit.png"))
        times.append(elapsed)
        rec = {
            "key": item.key, "elapsed_s": round(elapsed, 3),
            "source_prompt": item.source_prompt,
            "target_prompt": item.target_prompt,
        }
        metric_futures.append(
            metric_pool.submit(
                _metrics_and_log, item, src_img, inv_img, edit_img, rec
            )
        )

    try:
        if batch_size > 1:
            import jax.numpy as jnp

            from image_editing_framework_tpu.data.pie import save_inversion
            from image_editing_framework_tpu.eval import batched

            cache = None
            if inversion_path is not None:
                from image_editing_framework_tpu.data.pie import (
                    PIEPrecomputedInversion,
                )

                # completeness is validated against THIS sweep's work list
                # (pending), not the whole mapping file — a cache produced by
                # save_inversions under the default categories / a shard is
                # complete for every item this sweep touches
                cache = PIEPrecomputedInversion(
                    dataset_path, inversion_path, required_items=pending
                )
                cache_by_key = {it.key: it for it in cache.items}

            groups = [
                pending[g0 : g0 + batch_size]
                for g0 in range(0, len(pending), batch_size)
            ]

            def load_group(group):
                return [load_image(it.image_path, res, res) for it in group]

            # prefetch the next group's PNG decodes while the device computes
            load_future = pool.submit(load_group, groups[0]) if groups else None
            for gi_, group in enumerate(groups):
                t0 = time.perf_counter()
                images = load_future.result()
                load_future = (
                    pool.submit(load_group, groups[gi_ + 1])
                    if gi_ + 1 < len(groups)
                    else None
                )
                lats = []
                for item, image in zip(group, images):
                    os.makedirs(os.path.join(exp_path, item.key), exist_ok=True)
                    save_async(image, os.path.join(exp_path, item.key, "source.png"))
                    if cache is None:
                        lats.append(pipe.image2latent(image))
                src_prompts = [it.source_prompt for it in group]
                source_replays = uncond_seqs = None
                if cache is not None:
                    # precomputed-inversion consumer: skip the invert (and
                    # NTI) phase entirely — the group's latents/uncond_seqs
                    # come off disk (reference PIE_NTI_Inversion flow,
                    # p2p/dataset/pie.py:25-51). No trajectory is cached, so
                    # direct inversion degrades to ddim here exactly like the
                    # serial cache path.
                    loaded = [
                        cache.load_inversion(cache_by_key[it.key])
                        for it in group
                    ]
                    inverted = jnp.stack(
                        [jnp.asarray(lat, pipe.dtype) for lat, _ in loaded]
                    )
                    if inversion_type == "null-text":
                        if any(u is None for u in (u for _, u in loaded)):
                            raise ValueError(
                                "null-text batched sweep from inversion_path "
                                "needs a cached uncond_seq for every image"
                            )
                        uncond_seqs = jnp.stack(
                            [jnp.asarray(u) for _, u in loaded]
                        )
                else:
                    lats = jnp.stack(lats)  # (G, 1, h, w, 4)
                    inverted, trajs = batched.ddim_invert_batch(
                        pipe, lats, src_prompts, return_trajectory=True,
                        use_flash=use_flash,
                    )
                    if inversion_type == "null-text":
                        from image_editing_framework_tpu.cli import (
                            GUIDANCE_SCALE,
                            nti_config_for,
                        )

                        # serial per image, NOT nti_batch: the vmapped inner
                        # while_loop runs to the group's slowest convergence
                        # and loses the per-image early stop (measured 16.83
                        # vs 11.46 s/image — see batched.nti_group_serial)
                        uncond_seqs = batched.nti_group_serial(
                            pipe, trajs, src_prompts, nti_config_for(method, pipe),
                            guidance_scale=GUIDANCE_SCALE, use_flash=use_flash,
                        )
                    elif inversion_type == "direct":
                        # per-image trajectory replay: traj (G, S+1, 1, ...)
                        # is already the vmappable source_replay stack
                        source_replays = trajs
                if save_inversions:
                    for gi, (item, latv) in enumerate(zip(group, inverted)):
                        save_inversion(
                            save_inversions, item.key, latv,
                            None if uncond_seqs is None else uncond_seqs[gi],
                        )
                pairs = [[it.source_prompt, it.target_prompt] for it in group]
                mk_cfg = (method_kwargs or {}).get("config")
                if method == "p2p":
                    mk_cfg = [
                        mk_cfg
                        or _auto_p2p_config(it.source_prompt, it.target_prompt)
                        for it in group
                    ]
                imgs = batched.edit_batch(
                    method, pipe, pairs, inverted, mk_cfg,
                    sampler.guidance_scale, uncond_seqs=uncond_seqs,
                    source_replays=source_replays, use_flash=use_flash,
                )
                tg = (time.perf_counter() - t0) / len(group)
                for item, src_img, pair_imgs in zip(group, images, imgs):
                    finish(item, src_img, pair_imgs[0], pair_imgs[1], tg)
                done += len(group)
        else:
            cache = None
            if inversion_path is not None:
                from image_editing_framework_tpu.data.pie import PIEPrecomputedInversion

                cache = PIEPrecomputedInversion(
                    dataset_path, inversion_path, required_items=pending
                )
                by_key = {it.key: it for it in cache.items}
            load_future = (
                pool.submit(load_image, pending[0].image_path, res, res)
                if pending
                else None
            )
            for idx_, item in enumerate(pending):
                out_dir = os.path.join(exp_path, item.key)
                os.makedirs(out_dir, exist_ok=True)
                t0 = time.perf_counter()
                image = load_future.result()
                load_future = (
                    pool.submit(load_image, pending[idx_ + 1].image_path, res, res)
                    if idx_ + 1 < len(pending)
                    else None
                )
                save_async(image, os.path.join(out_dir, "source.png"))
                if cache is not None:
                    import jax.numpy as jnp

                    lat_np, uncond_np = cache.load_inversion(by_key[item.key])
                    latent = jnp.asarray(lat_np, pipe.dtype)
                    uncond_seq = None if uncond_np is None else jnp.asarray(uncond_np)
                    traj = None
                else:
                    latent, traj, uncond_seq = invert(
                        pipe, image, item.source_prompt, inversion_type, method,
                        use_flash=use_flash,
                    )
                if save_inversions:
                    from image_editing_framework_tpu.data.pie import save_inversion

                    save_inversion(save_inversions, item.key, latent, uncond_seq)
                kw = dict(method_kwargs or {})
                kw.setdefault("use_flash", use_flash)
                if method == "p2p" and "config" not in kw:
                    kw["config"] = _auto_p2p_config(item.source_prompt, item.target_prompt)
                replay = traj if inversion_type == "direct" else None
                inv_img, edit_img = run_method(
                    method, pipe, [item.source_prompt, item.target_prompt], latent,
                    sampler, uncond_seq, kw, source_replay=replay,
                )
                finish(item, image, inv_img, edit_img, time.perf_counter() - t0)
                done += 1
    finally:
        pool.shutdown(wait=True)  # drain workers even on per-image failures
        metric_pool.shutdown(wait=True)
        pipe.decode_tile_latent = prev_tile
    # Per-task exception capture (ADVICE-r4): a metric failure on the first
    # image must not discard the timing stats of a sweep whose edits all
    # succeeded. Errors are recorded in stats, the stats file is still
    # written, and THEN save errors re-raise (missing output artifacts =
    # failed sweep) while metric/log errors only warn.
    save_errors: list = []
    metric_errors: list = []
    for fut in save_futures:
        try:
            fut.result()
        except Exception as e:  # noqa: BLE001 — recorded, re-raised below
            save_errors.append(e)
    for fut in metric_futures:
        try:
            fut.result()
        except Exception as e:  # noqa: BLE001 — recorded, warned below
            metric_errors.append(e)
    wall = time.perf_counter() - t_start
    # the first image (serial) / whole first group (batched) includes
    # compile; steady-state stats exclude it
    tail = times[max(1, batch_size):]
    stats = {
        "method": method,
        "inversion_type": inversion_type,
        "inversion_type_effective": inversion_type_effective,
        "images_done": done,
        "images_skipped": skipped,
        "wall_s": round(wall, 2),
        "mean_s_per_image": round(float(np.mean(times)), 3) if times else None,
        "steady_s_per_image": round(float(np.mean(tail)), 3) if tail else None,
    }
    if metric_rows:
        for k in sorted({k for r in metric_rows for k in r}):
            vals = [r[k] for r in metric_rows if k in r and np.isfinite(r[k])]
            if vals:
                stats[f"{k}_mean"] = round(float(np.mean(vals)), 5)
    if metric_errors:
        stats["metric_errors"] = len(metric_errors)
        stats["metric_error_first"] = repr(metric_errors[0])
    if save_errors:
        stats["save_errors"] = len(save_errors)
        stats["save_error_first"] = repr(save_errors[0])
    # memory observability for long-run stability evidence (SURVEY.md §5):
    # device HBM peak (TPU runtimes expose memory_stats) + host peak RSS
    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        peak = ms.get("peak_bytes_in_use")
        if peak:
            stats["device_peak_bytes"] = int(peak)
    except Exception:
        pass
    try:
        import resource

        stats["host_peak_rss_mb"] = (
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        )
    except Exception:
        pass
    if tail:
        stats["p50_s_per_image"] = round(float(np.percentile(tail, 50)), 3)
        stats["p95_s_per_image"] = round(float(np.percentile(tail, 95)), 3)
        stats["max_s_per_image"] = round(float(np.max(tail)), 3)
    os.makedirs(exp_path, exist_ok=True)
    with open(os.path.join(exp_path, f"sweep_stats_{method}_{shard_index}.json"), "w") as f:
        json.dump(stats, f, indent=2)
    if metric_errors:
        import warnings

        warnings.warn(
            f"{len(metric_errors)} metric/event-log task(s) failed "
            f"(first: {metric_errors[0]!r}); edits and timing stats are "
            "intact — see sweep_stats metric_errors fields",
            stacklevel=2,
        )
    if save_errors:
        raise RuntimeError(
            f"{len(save_errors)} output save(s) failed — sweep artifacts are "
            f"incomplete (stats file was still written): {save_errors[0]!r}"
        ) from save_errors[0]
    return stats
