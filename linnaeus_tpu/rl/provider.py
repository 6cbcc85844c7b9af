"""RL problem provider wrapping a data loader.

Reference parity: rl_env/problem_provider.py:9-290 — iterates an
H5DataLoader, serving one sample at a time and converting supervised null
labels (class index 0) into ``None`` abstention targets.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np


def normalize_host_images(arr: np.ndarray) -> np.ndarray:
    """uint8 host pipeline -> [0,1] float32 — the jitted train step's
    convention (train/step.py:186-188) for HOST-side consumers (RL
    rollouts/evals have no jitted preprocess). One shared helper so the
    RL paths can't drift from each other if the convention changes."""
    arr = np.asarray(arr)
    if np.issubdtype(arr.dtype, np.integer):
        return arr.astype(np.float32) / 255.0
    return arr


class LinnaeusRLProblemProvider:
    def __init__(self, dataloader, taxonomy_tree, null_index: int = 0):
        self.dataloader = dataloader
        self.taxonomy_tree = taxonomy_tree
        self.task_keys = list(taxonomy_tree.task_keys)
        self.null_index = null_index
        self._batch_iter: Iterator | None = None
        self._batch: dict | None = None
        self._pos = 0

    def _next_sample(self) -> dict[str, Any]:
        while True:
            if self._batch is None or self._pos >= len(self._batch["images"]):
                if self._batch_iter is None:
                    self._batch_iter = iter(self.dataloader)
                try:
                    self._batch = next(self._batch_iter)
                except StopIteration:
                    self._batch_iter = iter(self.dataloader)
                    self._batch = next(self._batch_iter)
                self._pos = 0
            i = self._pos
            self._pos += 1
            # normalize here — a warm-started backbone otherwise sees
            # 255x-scaled inputs and its features are garbage
            img = normalize_host_images(self._batch["images"][i])
            return {
                "image": img,
                "aux": np.asarray(self._batch["aux"][i])
                if self._batch.get("aux") is not None
                else None,
                "targets": {
                    t: int(np.asarray(v[i]).argmax())
                    if np.ndim(v[i]) > 0
                    else int(v[i])
                    for t, v in self._batch["targets"].items()
                },
            }

    def reset(self) -> tuple[dict[str, Any], dict[str, int | None]]:
        """Returns (observation, ground_truth) for a fresh sample.

        Null supervised labels (index 0) become None abstention targets.
        """
        sample = self._next_sample()
        gt = {
            t: (None if idx == self.null_index else idx)
            for t, idx in sample["targets"].items()
        }
        obs = {"image": sample["image"], "aux": sample["aux"]}
        return obs, gt
