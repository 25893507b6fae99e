"""Dataset composition utilities (host-side, framework-agnostic indexables).

TPU-native equivalents of the reference's torch Dataset helpers:
  * MultipleDatasets (/root/reference/data/multiple_datasets.py:6-40) --
    uniform-db sampling with same-length virtualisation;
  * FeatureDataset windows (/root/reference/data/demo_dataset.py:77-107) --
    seq_len-sized index windows with edge replication for temporal models;
  * split_into_chunks (/root/reference/lib/utils/_img_utils.py:337-376) --
    per-video sliding windows (the reference version crashes on an undefined
    import; rebuilt working here).

These return plain indices / numpy data, consumable by any loader that feeds
the device (jax runs best off a simple double-buffered host iterator).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


class MultipleDatasets:
    """Mix several indexable datasets; same-length mode samples the db
    uniformly per item (reference semantics, with an explicit rng for
    reproducibility instead of the global random module)."""

    def __init__(self, dbs: Sequence, make_same_len: bool = True, seed: int = 0):
        if not dbs:
            raise ValueError("need at least one dataset")
        self.dbs = list(dbs)
        self.db_num = len(self.dbs)
        self.max_db_data_num = max(len(db) for db in self.dbs)
        self.db_len_cumsum = np.cumsum([len(db) for db in self.dbs])
        self.make_same_len = make_same_len
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        if self.make_same_len:
            return self.max_db_data_num * self.db_num
        return int(self.db_len_cumsum[-1])

    def __getitem__(self, index: int):
        if self.make_same_len:
            db_idx = int(self._rng.randint(0, self.db_num))
            db = self.dbs[db_idx]
            data_idx = index % self.max_db_data_num
            whole_repeats = len(db) * (self.max_db_data_num // len(db))
            if data_idx >= whole_repeats:
                data_idx = int(self._rng.randint(0, len(db)))
            else:
                data_idx = data_idx % len(db)
            return db[data_idx]
        db_idx = int(np.searchsorted(self.db_len_cumsum, index, side="right"))
        offset = 0 if db_idx == 0 else int(self.db_len_cumsum[db_idx - 1])
        return self.dbs[db_idx][index - offset]


def sequence_windows(num_items: int, seq_len: int = 16) -> List[Tuple[int, int]]:
    """FeatureDataset's window list: inclusive [start, end] index pairs with
    half-window edge replication (demo_dataset.py:89-93)."""
    windows = [[i, i + seq_len - 1] for i in range(num_items - seq_len + 1)]
    for i in range(1, seq_len // 2 + 1):
        windows.insert(0, [seq_len // 2 - i, seq_len // 2 - i])
    for i in range(1, seq_len // 2):
        windows.append([-(seq_len // 2) + i, -(seq_len // 2) + i])
    return [tuple(w) for w in windows]


def gather_window(features: np.ndarray, window: Tuple[int, int], seq_len: int) -> np.ndarray:
    """Materialise one window: a range slice, or a single frame replicated
    seq_len times for the edge windows (demo_dataset.py:98-102)."""
    start, end = window
    if start != end:
        return features[start : end + 1]
    return np.repeat(features[start][None], seq_len, axis=0)


def split_into_chunks(
    vid_names: np.ndarray, seqlen: int, stride: int
) -> List[Tuple[int, int]]:
    """Per-video sliding [start, end] windows over a flat frame list tagged
    by video name (working rebuild of _img_utils.py:337-376)."""
    out: List[Tuple[int, int]] = []
    names, first_idx = np.unique(vid_names, return_index=True)
    order = np.argsort(first_idx)
    groups = np.split(np.arange(vid_names.shape[0]), np.sort(first_idx)[1:])
    del order
    for indexes in groups:
        if indexes.shape[0] < seqlen:
            continue
        for start in range(0, indexes.shape[0] - seqlen + 1, stride):
            window = indexes[start : start + seqlen]
            out.append((int(window[0]), int(window[-1])))
    return out


class BatchIterator:
    """Minimal double-buffer-friendly batch iterator: yields stacked numpy
    batches from an indexable dataset (replaces torch DataLoader on the
    inference path; workers are unnecessary since the heavy work is on
    device)."""

    def __init__(self, dataset, batch_size: int, drop_last: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = len(self.dataset)
        for start in range(0, n, self.batch_size):
            stop = min(start + self.batch_size, n)
            if self.drop_last and stop - start < self.batch_size:
                return
            yield np.stack([np.asarray(self.dataset[i]) for i in range(start, stop)])
