"""Train-time data augmentation (no reference counterpart).

The loader chops each snippet into NON-overlapping tail-first 20-frame
windows (reference ``Dataset_sample.py:235-262``), discarding phase
diversity: the model only ever sees windows whose boundaries sit at fixed
20-frame strides from the snippet tail.  ``OverlapAugmenter`` synthesises
phase-shifted windows from pairs of time-adjacent TRAIN windows of the same
snippet: windows at ``win_pos`` p (later frames) and p+1 (earlier frames)
are contiguous in time, so ``concat(earlier, later)[k : k+L]`` for
k in 1..L-1 is a genuine capture window at a new phase.

Leakage-safety: a synthesised window uses frames ONLY from train-split
windows; pairs with either member in the held-out split are excluded, so
the eval/held-out protocol never sees augmented leakage.

The synthesis itself is a device gather: per epoch the host draws one phase
``k`` per pair and uploads two small (n_pairs, L) int32 index maps; every
per-frame field materialises as ``field[win_map, frame_map]`` on device.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax.numpy as jnp


class OverlapAugmenter:
    """Per-epoch phase-shifted window synthesis over a train split.

    Args:
      snippet/win_pos: per-window metadata from ingest (global index space).
      train_idx: the split's global window indices IN SPLIT ORDER (row i of
        the split arrays is global window ``train_idx[i]``).
      frame_no: window length L.
    """

    def __init__(self, snippet: np.ndarray, win_pos: np.ndarray,
                 train_idx: np.ndarray, frame_no: int):
        self.frame_no = int(frame_no)
        pos_in_split = {int(g): i for i, g in enumerate(train_idx)}
        by_key = {(int(s), int(p)): int(g)
                  for g, (s, p) in enumerate(zip(snippet, win_pos))}
        earlier, later = [], []
        for (s, p), g_later in by_key.items():
            g_earlier = by_key.get((s, p + 1))
            if g_earlier is None:
                continue
            if g_later in pos_in_split and g_earlier in pos_in_split:
                earlier.append(pos_in_split[g_earlier])
                later.append(pos_in_split[g_later])
        # Split-array row indices of each usable (earlier, later) pair.
        self.earlier = np.asarray(earlier, dtype=np.int32)
        self.later = np.asarray(later, dtype=np.int32)

    @property
    def n_pairs(self) -> int:
        return len(self.earlier)

    def index_maps(self, rng: np.random.RandomState
                   ) -> Tuple[np.ndarray, np.ndarray]:
        """Draw one phase per pair; return (win_map, frame_map), each
        (n_pairs, L) int32 into the split arrays' (window, frame) axes."""
        l = self.frame_no
        k = rng.randint(1, l, size=self.n_pairs)
        kk = k[:, None] + np.arange(l)[None, :]          # (n_pairs, L)
        use_later = kk >= l
        win = np.where(use_later, self.later[:, None], self.earlier[:, None])
        return win.astype(np.int32), (kk % l).astype(np.int32)

    def augmented_arrays(self, arrays: List, fields: Tuple[str, ...],
                         rng: np.random.RandomState) -> List:
        """Concatenate synthesised windows onto each split field array.

        ``arrays`` follow ``fields`` order; fields with a per-frame axis
        (everything except ``bones``) gather via the epoch's index maps,
        ``bones`` copies the pair's (identical within a snippet) table.
        """
        if self.n_pairs == 0:
            return arrays
        win_np, frm_np = self.index_maps(rng)
        win = jnp.asarray(win_np)
        frm = jnp.asarray(frm_np)
        out = []
        for name, a in zip(fields, arrays):
            aj = jnp.asarray(a)
            aug = (aj[self.earlier] if name == "bones"
                   else aj[win, frm])                    # (n_pairs, L, ...)
            out.append(jnp.concatenate([aj, aug], axis=0))
        return out


def jitter_cloud(cloud: jnp.ndarray, sigma: float, rng) -> jnp.ndarray:
    """Gaussian xyz jitter on the REAL (non-zero) points; range recomputed.

    Zero rows are the loader's padding mask (Upper_Net.py:30-31) and must
    stay exactly zero; velocity/intensity features are untouched.
    """
    import jax

    real = jnp.any(cloud != 0.0, axis=-1, keepdims=True)      # (..., P, 1)
    xyz = cloud[..., 0:3] + sigma * jax.random.normal(
        rng, cloud[..., 0:3].shape, cloud.dtype) * real
    rng_feat = jnp.sqrt(jnp.sum(xyz * xyz, axis=-1, keepdims=True))
    return jnp.where(real, jnp.concatenate(
        [xyz, rng_feat, cloud[..., 4:6]], axis=-1), 0.0)
