"""PIE-Bench dataset plumbing.

Reference: */dataset/pie.py — reads ``mapping_file.json`` (dict of records
keyed by image id), filters categories by image_path prefix, strips the
``[`` / ``]`` edit markers from prompts. The torch ``Dataset``/``DataLoader``
machinery is replaced by a plain list + shard iterator: editors are pure
functions, so sweep parallelism happens by sharding items across hosts/chips
rather than via loader workers.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Optional

import numpy as np

# The reference sweep skips category 5 (p2p/test.py:114).
DEFAULT_CATEGORIES = (0, 1, 2, 3, 4, 6, 7, 8, 9)


@dataclasses.dataclass(frozen=True)
class PIEItem:
    key: str  # image id / relative path without extension
    image_path: str
    source_prompt: str
    target_prompt: str
    blended_words: str = ""
    mask: Optional[np.ndarray] = None


class PIE:
    """PIE-Bench items, optionally filtered to one category."""

    def __init__(self, dataset_path: str, category: Optional[int] = None):
        self.data_path = os.path.join(dataset_path, "annotation_images")
        with open(os.path.join(dataset_path, "mapping_file.json")) as f:
            mapping = json.load(f)
        self.items: List[PIEItem] = []
        for key, rec in mapping.items():
            rel = rec["image_path"]
            if category is not None and not rel.startswith(str(category)):
                continue
            self.items.append(
                PIEItem(
                    key=os.path.splitext(rel)[0],
                    image_path=os.path.join(self.data_path, rel),
                    source_prompt=rec["original_prompt"].replace("[", "").replace("]", ""),
                    target_prompt=rec["editing_prompt"].replace("[", "").replace("]", ""),
                    blended_words=rec.get("blended_words", ""),
                )
            )

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, i: int) -> PIEItem:
        return self.items[i]

    def shard(self, index: int, count: int) -> List[PIEItem]:
        """Strided shard (every count-th item) for multi-host sweeps —
        striding balances per-category cost across shards."""
        return self.items[index::count]


class PIEPrecomputedInversion(PIE):
    """PIE items with precomputed inversion artifacts
    (reference PIE_NTI_Inversion, p2p/dataset/pie.py:25-51).

    Native layout: <inversion_path>/<image_key>/inversion.npz with arrays
    ``latent`` (1,h,w,4) and ``uncond_seq`` (S,77,D).

    Reference-layout interop: a directory holding the reference's
    ``inversion_latent.pt`` (an NCHW torch tensor) +
    ``uncond_embeddings_list.pt`` (a list of (1,77,D) tensors)
    (p2p/dataset/pie.py:47-48) loads directly — tensors are converted to
    NHWC / stacked (S,77,D) NumPy on read, so caches produced by the
    reference's NTI runs drop in unchanged.
    """

    def __init__(self, dataset_path: str, inversion_path: str,
                 category: Optional[int] = None,
                 required_items: Optional[List[PIEItem]] = None):
        """``required_items`` narrows the completeness check to the work list
        the caller will actually consume (the sweep's pending/sharded items
        for its requested categories). Without it the check demands an
        artifact for EVERY mapping_file entry — which wrongly rejects caches
        produced by ``save_inversions`` under the default categories (the
        reference skips category 5, p2p/test.py:114) or by a sharded sweep."""
        if required_items is not None:
            if category is not None:
                raise ValueError(
                    "pass either category or required_items, not both — "
                    "required_items IS the work list (it is not re-filtered "
                    "by category)"
                )
            self.data_path = os.path.join(dataset_path, "annotation_images")
            self.items = list(required_items)
        else:
            super().__init__(dataset_path, category)
        self.inversion_path = inversion_path
        missing = [
            it.key for it in self.items if self._artifact(it) is None
        ]
        if missing:
            more = "..." if len(missing) > 5 else ""
            raise ValueError(
                f"The inversion files are not complete (missing "
                f"{missing[:5]}{more}; looked for <inversion_path>/<key>/"
                f"inversion.npz or inversion_latent.pt under "
                f"{self.inversion_path})"
            )

    def _artifact(self, item: PIEItem) -> Optional[str]:
        """Path of the artifact that exists for this item (native .npz
        preferred, reference .pt fallback), or None."""
        d = os.path.join(self.inversion_path, item.key)
        npz = os.path.join(d, "inversion.npz")
        if os.path.exists(npz):
            return npz
        pt = os.path.join(d, "inversion_latent.pt")
        return pt if os.path.exists(pt) else None

    def load_inversion(self, item: PIEItem):
        path = self._artifact(item)
        if path is None:
            d = os.path.join(self.inversion_path, item.key)
            raise FileNotFoundError(
                f"no inversion artifact for item {item.key!r}: expected "
                f"{os.path.join(d, 'inversion.npz')} or "
                f"{os.path.join(d, 'inversion_latent.pt')}"
            )
        if path.endswith(".npz"):
            data = np.load(path)
            uncond = data["uncond_seq"] if "uncond_seq" in data.files else None
            return _denpz(data["latent"]), (
                None if uncond is None else _denpz(uncond)
            )
        return _load_reference_inversion(os.path.dirname(path))


def _load_reference_inversion(d: str):
    """Read a reference-produced inversion cache directory
    (p2p/dataset/pie.py:47-48): ``inversion_latent.pt`` is an NCHW latent,
    ``uncond_embeddings_list.pt`` a per-step list of (1,77,D) embeddings.
    Returns (latent NHWC (1,h,w,4), uncond_seq (S,77,D) or None)."""
    import torch  # CPU torch is in the environment; only needed on this path

    lat = torch.load(
        os.path.join(d, "inversion_latent.pt"), map_location="cpu",
        weights_only=True,
    )
    latent = np.transpose(lat.float().numpy(), (0, 2, 3, 1))  # NCHW -> NHWC
    uncond = None
    upath = os.path.join(d, "uncond_embeddings_list.pt")
    if os.path.exists(upath):
        ulist = torch.load(upath, map_location="cpu", weights_only=True)
        uncond = np.stack([u.float().numpy()[0] for u in ulist])  # (S,77,D)
    return latent, uncond


def _denpz(arr: np.ndarray) -> np.ndarray:
    """Undo numpy's lossy round-trip of ml_dtypes arrays: np.savez writes a
    bfloat16 array but np.load hands back raw void ('V2') bytes, which later
    jnp.asarray(..., dtype) rejects with 'No cast function available'. New
    caches are written as float32 (see save_inversion); this keeps caches
    produced by bf16 pipelines before that fix loadable."""
    if arr.dtype == np.dtype("V2"):
        import ml_dtypes

        return arr.view(ml_dtypes.bfloat16).astype(np.float32)
    return arr


def save_inversion(inversion_path: str, key: str, latent, uncond_seq=None) -> None:
    """Producer side of the precomputed-inversion cache (the reference ships
    only the consumer; p2p/test.py sets inversion_path=None).

    Arrays are stored float32: np.savez silently degrades ml_dtypes arrays
    (a bf16 pipeline's latents) to raw void bytes that np.load cannot cast
    back, and float32 artifacts match the reference's .pt layout anyway."""
    d = os.path.join(inversion_path, key)
    os.makedirs(d, exist_ok=True)
    arrays = {"latent": np.asarray(latent, np.float32)}
    if uncond_seq is not None:
        arrays["uncond_seq"] = np.asarray(uncond_seq, np.float32)
    np.savez(os.path.join(d, "inversion.npz"), **arrays)
