"""Map-style chip dataset: torch DataLoader interop without torch.

The reference ships a TorchGeo adapter
(``src/rasteret/integrations/torchgeo.py``) that wraps collection chips as
a dataset for training loops.  PyTorch's map-style dataset contract is
duck-typed — ``DataLoader`` only needs ``__len__`` + ``__getitem__`` on a
non-IterableDataset object — so this adapter works with a REAL torch
``DataLoader`` (shuffle, batching, workers) while the engine and this
container never import torch.

Random access over a distributed result needs materialization: the
dataset stages assembled chips once into a local cache directory (one
``.npz`` + one ``.json`` sidecar per chip, streamed through
``assemble.chip_batches`` so the driver never holds more than a batch),
then serves O(1) reads.  That staging step is the standard
Spark-to-training handoff; ``from_cache`` reopens a staged directory
across processes (exactly what DataLoader worker processes do).
"""

from __future__ import annotations

import json
import os

import numpy as np

from rasteret_spark.operators import assemble

_MANIFEST = "chips_manifest.json"


def _jsonable(v):
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if isinstance(v, np.generic):
        return v.item()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


class ChipDataset:
    """``__getitem__`` returns ``{"image": float32 [T, C, H, W], "chip_id":
    str}`` — numpy arrays, which torch's default collate upgrades to
    tensors.  Full georeferencing/provenance for a sample is on
    ``.attrs(i)`` (kept out of the sample dict so default_collate never
    chokes on None/str lists)."""

    def __init__(self, cache_dir: str, chip_ids: list[str]):
        self.cache_dir = cache_dir
        self.chip_ids = list(chip_ids)

    # --- staging -------------------------------------------------------------
    @classmethod
    def stage(cls, stack_df, cache_dir: str, batch_size: int = 8) -> "ChipDataset":
        """Materialize a CHIP_STACK_SCHEMA DataFrame into ``cache_dir``.
        Deterministic order (chip_batches sorts by chip_id); idempotent
        overwrite of any previous staging in the directory."""
        os.makedirs(cache_dir, exist_ok=True)
        chip_ids: list[str] = []
        for batch in assemble.chip_batches(stack_df, batch_size=batch_size):
            for tensor, attrs in batch:
                i = len(chip_ids)
                np.savez(os.path.join(cache_dir, f"chip_{i:06d}.npz"),
                         tensor=tensor.astype(np.float32))
                with open(os.path.join(cache_dir, f"chip_{i:06d}.json"), "w") as f:
                    json.dump({k: _jsonable(v) for k, v in attrs.items()}, f)
                chip_ids.append(str(attrs.get("chip_id")))
        with open(os.path.join(cache_dir, _MANIFEST), "w") as f:
            json.dump({"chip_ids": chip_ids}, f)
        return cls(cache_dir, chip_ids)

    @classmethod
    def from_cache(cls, cache_dir: str) -> "ChipDataset":
        with open(os.path.join(cache_dir, _MANIFEST)) as f:
            return cls(cache_dir, json.load(f)["chip_ids"])

    # --- torch map-style dataset protocol --------------------------------------
    def __len__(self) -> int:
        return len(self.chip_ids)

    def __getitem__(self, i: int) -> dict:
        if not 0 <= i < len(self.chip_ids):
            raise IndexError(i)
        with np.load(os.path.join(self.cache_dir, f"chip_{i:06d}.npz")) as z:
            tensor = z["tensor"]
        return {"image": tensor, "chip_id": self.chip_ids[i]}

    def attrs(self, i: int) -> dict:
        with open(os.path.join(self.cache_dir, f"chip_{i:06d}.json")) as f:
            return json.load(f)
