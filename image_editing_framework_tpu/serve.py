"""Editing service: a long-lived worker that keeps the compiled programs warm.

The reference's deployment story is one-shot CLI scripts that pay model load
and (on TPU) compilation per invocation. For production serving this worker
loads the pipeline once, compiles on the first request of each (method,
inversion) shape, and then serves requests at steady-state latency.

Transport is a filesystem spool (works everywhere, no extra deps): drop
``<name>.json`` request files into ``<root>/requests/``; results appear under
``<root>/results/<name>/`` with a ``response.json`` and the output PNGs.

Request schema:
  {"method": "p2p" | "masactrl" | "pnp" | "p2z",
   "source_prompt": str, "target_prompt": str,
   "image_path": str | null,        # null => synthesize from seed
   "inversion_type": "ddim" | "null-text" | "direct",   # default ddim
   "seed": int,                      # default 42
   "method_kwargs": {...}}           # optional method overrides
"""

from __future__ import annotations

import json
import os
import time
import traceback
from typing import Optional

import jax
import jax.numpy as jnp

from image_editing_framework_tpu.core.config import SamplerConfig
from image_editing_framework_tpu.utils.images import load_image, save_img


class EditService:
    def __init__(self, pipe, root: str, resolution: Optional[int] = None):
        self.pipe = pipe
        self.root = root
        self.res = resolution or (1024 if pipe.model_type == "xl" else 512)
        self.requests_dir = os.path.join(root, "requests")
        self.results_dir = os.path.join(root, "results")
        os.makedirs(self.requests_dir, exist_ok=True)
        os.makedirs(self.results_dir, exist_ok=True)

    def handle(self, name: str, req: dict) -> dict:
        from image_editing_framework_tpu.cli import invert, run_method

        t0 = time.perf_counter()
        method = req["method"]
        prompts = [req["source_prompt"], req["target_prompt"]]
        seed = int(req.get("seed", 42))
        inversion_type = req.get("inversion_type", "ddim")
        sampler = SamplerConfig(height=self.res, width=self.res, seed=seed)
        out_dir = os.path.join(self.results_dir, name)
        os.makedirs(out_dir, exist_ok=True)

        replay = uncond_seq = None
        if req.get("image_path"):
            image = load_image(req["image_path"], self.res, self.res)
            save_img(image, os.path.join(out_dir, "source.png"))
            latent, traj, uncond_seq = invert(
                self.pipe, image, prompts[0], inversion_type, method
            )
            if inversion_type == "direct":
                replay = traj
        else:
            latent = jax.random.normal(
                jax.random.PRNGKey(seed),
                (1, self.res // 8, self.res // 8, 4),
                self.pipe.dtype,
            )
        inv_img, edit_img = run_method(
            method, self.pipe, prompts, latent, sampler, uncond_seq,
            req.get("method_kwargs"), source_replay=replay,
        )
        save_img(inv_img, os.path.join(out_dir, "inversion.png"))
        save_img(edit_img, os.path.join(out_dir, "edit.png"))
        return {
            "status": "ok",
            "outputs": out_dir,
            "latency_s": round(time.perf_counter() - t0, 3),
        }

    def poll_once(self) -> int:
        """Process all pending requests; returns how many were handled."""
        handled = 0
        for fname in sorted(os.listdir(self.requests_dir)):
            if not fname.endswith(".json"):
                continue
            path = os.path.join(self.requests_dir, fname)
            name = os.path.splitext(fname)[0]
            try:
                with open(path) as f:
                    req = json.load(f)
                resp = self.handle(name, req)
            except Exception as e:  # report, never crash the worker
                resp = {
                    "status": "error",
                    "error": f"{type(e).__name__}: {e}",
                    "traceback": traceback.format_exc(),
                }
            out_dir = os.path.join(self.results_dir, name)
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, "response.json"), "w") as f:
                json.dump(resp, f, indent=2)
            os.remove(path)
            handled += 1
        return handled

    def run_forever(self, poll_interval: float = 0.5) -> None:  # pragma: no cover
        while True:
            if self.poll_once() == 0:
                time.sleep(poll_interval)


def main() -> None:  # pragma: no cover
    import argparse

    from image_editing_framework_tpu.models.registry import load_pipeline

    ap = argparse.ArgumentParser("editing service")
    ap.add_argument("--sd_version", default="1.5")
    ap.add_argument("--root", default="./service")
    args = ap.parse_args()
    pipe = load_pipeline(args.sd_version, dtype=jnp.bfloat16)
    EditService(pipe, args.root).run_forever()


if __name__ == "__main__":  # pragma: no cover
    main()
