"""Window dataset: split/shuffle semantics + device-batch iteration.

Reproduces the reference ``PosePC`` split exactly (``Dataset_sample.py:36-70``):
a Fisher-Yates shuffle seeded with ``dataset_random_seed`` (the reference
seeds nine parallel ``RandomState(1)`` shuffles -- one per array, same seed,
hence one shared permutation, which is what we compute), then a plain 80/20
prefix/suffix split.  ``vis`` mode keeps the unshuffled walk order and the
world-frame rotations, matching the 835-window demo set.

``action_vis`` reproduces ``Dataset_action.py``'s cumulative per-action cap
(at most ``batch_per_action`` windows per action, enforced as
``kept < (act+1)*cap`` during the in-order walk) as a post-hoc selection over
the packed arrays -- no second ingest pass.

Unlike the reference's per-window ``DataLoader`` + host->device copies, the
whole split lives in device memory; iteration just slices device arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional

import numpy as np

from mmego_tpu.config import Config
from mmego_tpu.data import ingest as ingest_mod


@dataclasses.dataclass
class WindowData:
    """A split of packed windows (all numpy; push to device at the edge)."""
    cloud: np.ndarray          # (W, L, 128, 6)
    key: np.ndarray            # (W, L, 21, 3) ground-truth joints
    imu: np.ndarray            # (W, L, 20, 15)
    bones: np.ndarray          # (W, 20, 3)
    ground: np.ndarray         # (W, L, 4)
    foot_contact: np.ndarray   # (W, L, 2, 2)
    r_r0r: np.ndarray          # (W, L, 3, 3)
    t_r0r: np.ndarray          # (W, L, 3)
    action: np.ndarray         # (W,)
    r_rtw: Optional[np.ndarray] = None  # (W, L, 3, 3), vis modes only

    def __len__(self) -> int:
        return len(self.cloud)

    def take(self, idx) -> "WindowData":
        return WindowData(**{
            f.name: (getattr(self, f.name)[idx]
                     if getattr(self, f.name) is not None else None)
            for f in dataclasses.fields(self)})


def _reference_permutation(n: int, seed: int) -> np.ndarray:
    """The permutation the reference's seeded ``shuffle`` applies."""
    return np.random.RandomState(seed).permutation(n)


def make_split(packed: Dict[str, np.ndarray], split: str,
               seed: int = 1, batch_per_action: int = 3) -> WindowData:
    """Build a split from packed ingest arrays.

    split: 'train' | 'test' (seeded shuffle + 80/20) or
           'vis' (all windows, walk order) | 'action_vis' (per-action cap).
    """
    w = len(packed["cloud"])
    base = dict(
        cloud=packed["cloud"], key=packed["key"], imu=packed["imu"],
        bones=packed["bones"], ground=packed["ground"],
        foot_contact=packed["foot_contact"], r_r0r=packed["r_r0r"],
        t_r0r=packed["t_r0r"], action=packed["action"])

    if split in ("train", "test"):
        perm = _reference_permutation(w, seed)
        cut = int(w * 0.8)
        idx = perm[:cut] if split == "train" else perm[cut:]
        return WindowData(**{k: v[idx] for k, v in base.items()})
    if split == "vis":
        return WindowData(r_rtw=packed["r_rtw"], **base)
    if split == "action_vis":
        kept = []
        for i, act in enumerate(packed["action"]):
            if len(kept) < (int(act) + 1) * batch_per_action:
                kept.append(i)
        idx = np.asarray(kept, dtype=np.int64)
        return WindowData(r_rtw=packed["r_rtw"][idx],
                          **{k: v[idx] for k, v in base.items()})
    raise ValueError(f"unknown split {split!r}")


def load_split(cfg: Config, split: str) -> WindowData:
    packed = ingest_mod.load_or_ingest(
        cfg.data_root, cfg.cache_dir, cfg.frame_no, cfg.pc_no, cfg.padding_seed)
    return make_split(packed, split, cfg.dataset_random_seed, cfg.batch_per_action)


def iter_batches(data: WindowData, batch_size: int, shuffle: bool = False,
                 rng: Optional[np.random.RandomState] = None
                 ) -> Iterator[WindowData]:
    """Batch iterator; keeps the last partial batch (reference
    ``drop_last=False``)."""
    n = len(data)
    order = np.arange(n)
    if shuffle:
        (rng or np.random).shuffle(order)
    for start in range(0, n, batch_size):
        yield data.take(order[start:start + batch_size])
