"""Grouped batch sampling + per-host sharding.

Reference parity: h5data/grouped_batch_sampler.py:13-655. The sampler is
both the in-batch-mixing enabler AND the data-parallel sharding mechanism:

  * ``mixed-pairs``: build global same-group pairs, shuffle, round-robin
    pairs across hosts, emit fixed-size batches of whole pairs
    (grouped_batch_sampler.py:289);
  * ``strict-group``: assign whole groups to hosts by ``hash(gid) % world``
    and batch within a host (grouped_batch_sampler.py:409-425);
  * ``standard``: plain shuffle + shard.

TPU adaptation: "rank" becomes the JAX process index; every host emits
batches of identical static size (XLA requires fixed shapes), dropping the
ragged tail. The active group level is switchable per epoch
(set_current_group_level, grouped_batch_sampler.py:187).
"""

from __future__ import annotations

import numpy as np

from linnaeus_tpu.utils.logging import get_h5data_logger

logger = get_h5data_logger()


class GroupedBatchSampler:
    def __init__(
        self,
        group_ids_by_level: dict[str, np.ndarray],
        indices: np.ndarray,
        batch_size: int,
        mode: str = "mixed-pairs",
        process_index: int = 0,
        process_count: int = 1,
        seed: int = 42,
        initial_level: str | None = None,
    ):
        """``group_ids_by_level``: rank level -> int32 [N_total] (global ids);
        ``indices``: the subset of global sample indices this dataset uses."""
        if mode not in ("mixed-pairs", "strict-group", "standard"):
            raise ValueError(f"Unknown grouped mode '{mode}'")
        self.group_ids_by_level = group_ids_by_level
        self.indices = np.asarray(indices, dtype=np.int64)
        self.batch_size = int(batch_size)
        self.mode = mode
        self.process_index = process_index
        self.process_count = process_count
        self.seed = seed
        self.epoch = 0
        levels = list(group_ids_by_level.keys())
        self.current_level = initial_level or (levels[0] if levels else None)

    # ------------------------------------------------------------- control
    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    def set_current_group_level(self, level: str) -> None:
        if level not in self.group_ids_by_level:
            raise KeyError(f"Unknown group level '{level}'")
        self.current_level = level

    def _groups(self) -> np.ndarray:
        return self.group_ids_by_level[self.current_level][self.indices]

    def _rng(self) -> np.random.Generator:
        return np.random.default_rng((self.seed, self.epoch))

    # ------------------------------------------------------------ batching
    def batches(self) -> list[np.ndarray]:
        """List of [batch_size] global-index arrays for THIS host, this epoch."""
        if self.mode == "standard":
            return self._standard_batches()
        if self.mode == "mixed-pairs":
            return self._mixed_pairs_batches()
        return self._strict_group_batches()

    def __iter__(self):
        return iter(self.batches())

    def __len__(self) -> int:
        return len(self.batches())

    def _standard_batches(self) -> list[np.ndarray]:
        rng = self._rng()
        perm = self.indices[rng.permutation(len(self.indices))]
        shard = perm[self.process_index::self.process_count]
        nb = len(shard) // self.batch_size
        return [
            shard[i * self.batch_size:(i + 1) * self.batch_size]
            for i in range(nb)
        ]

    def _mixed_pairs_batches(self) -> list[np.ndarray]:
        """Vectorized same-group pairing (reference loops per sample,
        grouped_batch_sampler.py:289 — tens of seconds/epoch at millions of
        rows). Sort positions by (group, uniform noise) and pair adjacent
        elements within each equal-group run: distributionally identical to
        pairing samples in shuffled-encounter order, O(n log n), <1s at 1M."""
        assert self.batch_size % 2 == 0, "mixed-pairs requires even batch size"
        rng = self._rng()
        groups = self._groups().astype(np.int64)
        n = len(self.indices)
        # one int64 sort key: (group << 31) | random — one introsort instead
        # of a lexsort (2-3x faster at 1M rows on this class of host)
        key = (groups << 31) | rng.integers(0, 1 << 31, n, dtype=np.int64)
        pos = np.nonzero(groups >= 0)[0]  # ignore ungrouped (-1)
        if len(pos) < 2:
            return []
        order = pos[np.argsort(key[pos])]
        sg = groups[order]
        m = len(order)
        ar = np.arange(m, dtype=np.int32)
        is_start = np.empty(m, bool)
        is_start[0] = True
        np.not_equal(sg[1:], sg[:-1], out=is_start[1:])
        run_start = np.maximum.accumulate(np.where(is_start, ar, 0))
        next_same = np.empty(m, bool)
        next_same[-1] = False
        np.equal(sg[1:], sg[:-1], out=next_same[:-1])
        # non-overlapping adjacent pairs inside each run; odd leftovers drop
        first = (((ar - run_start) & 1) == 0) & next_same
        fi = np.nonzero(first)[0]
        perm = rng.permutation(len(fi))
        pairs = np.empty((len(fi), 2), np.int64)
        pairs[:, 0] = self.indices[order[fi]][perm]
        pairs[:, 1] = self.indices[order[fi + 1]][perm]
        # round-robin pairs across hosts
        flat = pairs[self.process_index::self.process_count].reshape(-1)
        per_batch = self.batch_size
        nb = len(flat) // per_batch
        return [flat[i * per_batch:(i + 1) * per_batch] for i in range(nb)]

    def _strict_group_batches(self) -> list[np.ndarray]:
        rng = self._rng()
        groups = self._groups()
        # deterministic host assignment by group id
        mine = np.zeros(len(self.indices), dtype=bool)
        gid_arr = groups.astype(np.int64)
        assigned = (gid_arr % max(self.process_count, 1)) == self.process_index
        mine = assigned & (gid_arr >= 0)
        # ungrouped samples round-robin by position
        ungrouped = gid_arr < 0
        mine |= ungrouped & (
            (np.arange(len(self.indices)) % self.process_count)
            == self.process_index
        )
        shard = self.indices[mine]
        # group-coherent order with shuffled group blocks AND shuffled
        # within-group order, in ONE sort (the per-group boolean-scan loop
        # was O(G*N) — the reference's own weakness at 1e5+ groups,
        # grouped_batch_sampler.py:409-425): key = (random group rank << 31)
        # | per-sample noise, then argsort. Distributionally identical to
        # permuting group blocks then permuting within each block.
        gids = gid_arr[mine]
        if len(gids) == 0:
            flat = np.array([], dtype=np.int64)
        else:
            uniq, inv = np.unique(gids, return_inverse=True)
            group_rank = rng.permutation(len(uniq)).astype(np.int64)
            key = (group_rank[inv] << 31) | rng.integers(
                0, 1 << 31, len(gids), dtype=np.int64
            )
            flat = shard[np.argsort(key)]
        nb = len(flat) // self.batch_size
        return [
            flat[i * self.batch_size:(i + 1) * self.batch_size]
            for i in range(nb)
        ]


def build_sampler(
    config,
    group_ids_by_level: dict[str, np.ndarray],
    indices: np.ndarray,
    batch_size: int,
    is_train: bool,
    process_index: int = 0,
    process_count: int = 1,
) -> GroupedBatchSampler:
    stype = str(config.DATA.SAMPLER.TYPE)
    mode = (
        str(config.DATA.SAMPLER.GROUPED_MODE)
        if (stype == "grouped" and is_train)
        else "standard"
    )
    initial_level = None
    levels = list(config.SCHEDULE.MIX.GROUP_LEVELS or [])
    if levels and levels[0] in group_ids_by_level:
        initial_level = levels[0]
    return GroupedBatchSampler(
        group_ids_by_level,
        indices,
        batch_size,
        mode=mode,
        process_index=process_index,
        process_count=process_count,
        seed=int(config.MISC.SEED),
        initial_level=initial_level,
    )
