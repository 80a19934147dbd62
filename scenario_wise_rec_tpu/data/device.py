"""Device-resident epochs: batch assembly ON the TPU, not the host.

The host-side pipeline (dataset.py BatchIterable -> prefetch thread ->
[S, B] stacking) binds end-to-end throughput on small hosts: per-batch
Python dict slicing of ~32 numpy columns costs more than the device step it
feeds (measured 338k vs 1.43M examples/s on a 2-core host, README). The
TPU-native fix: upload the epoch's columns ONCE as two packed matrices
(ints ``[N, Ci]``, floats ``[N, Cf]``), then each scanned train dispatch
gathers its batches on device from a tiny uploaded permutation — the host's
per-epoch work drops to one RNG permutation + one [S·B]-int copy per
dispatch.

Batch semantics are IDENTICAL to BatchIterable with the same seed: same
per-epoch permutation stream, same repeat-row-0 padding of the final
partial batch with a zero weight mask (pinned by
tests/test_device_resident.py — same trained parameters either way).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from .dataset import ColumnarDataset


class DeviceResidentLoader:
    """Epoch source for :meth:`CTRTrainer.train_one_epoch_resident`.

    Mirrors ``BatchIterable(dataset, batch_size, shuffle=True, seed)``: one
    call to :meth:`epoch_perm` per epoch advances the same shuffle stream.
    Integer columns (ids, domain indicator, sequence features flattened)
    pack into ``int_mat``; float columns into ``float_mat`` with the label
    as the LAST float column — so a batch is TWO on-device row gathers.
    """

    def __init__(self, dataset: ColumnarDataset, batch_size: int,
                 seed: int = 0, shuffle: bool = True,
                 device_shuffle: bool = False):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        # device_shuffle=True: the trainer generates each epoch's
        # permutation ON DEVICE (jax.random.permutation seeded from this
        # loader's stream) — zero host RNG work and zero permutation
        # upload per epoch. The shuffle stream then differs from
        # BatchIterable's numpy stream (equally uniform, documented in
        # README's benchmark notes); keep the default for bit-parity with
        # the host pipeline.
        self.device_shuffle = bool(device_shuffle)
        self._rng = np.random.default_rng(seed)
        self.n = len(dataset)
        self._next_perm = None
        self._perm_pool = None

        int_cols: List[np.ndarray] = []
        float_cols: List[np.ndarray] = []
        # layout: name -> (kind, start, n_cols, tail_shape)
        self.layout: Dict[str, Tuple[str, int, int, tuple]] = {}
        for name, col in dataset.x.items():
            tail = col.shape[1:]
            width = int(np.prod(tail)) if tail else 1
            flat = col.reshape(self.n, width)
            if np.issubdtype(col.dtype, np.integer):
                self.layout[name] = ("int", len(int_cols), width, tail)
                int_cols.extend(flat.astype(np.int32).T)
            else:
                self.layout[name] = ("float", len(float_cols), width, tail)
                float_cols.extend(flat.astype(np.float32).T)
        assert dataset.y is not None, "resident training needs labels"
        float_cols.append(np.asarray(dataset.y, np.float32))

        self.int_mat = jnp.asarray(np.stack(int_cols, axis=1)) if int_cols \
            else jnp.zeros((self.n, 0), jnp.int32)
        self.float_mat = jnp.asarray(np.stack(float_cols, axis=1))

    def __len__(self) -> int:
        """Batches per epoch (BatchIterable semantics, no drop_last)."""
        return (self.n + self.batch_size - 1) // self.batch_size

    def _compute_perm(self) -> Tuple[np.ndarray, np.ndarray]:
        bs = self.batch_size
        idx = (self._rng.permutation(self.n) if self.shuffle
               else np.arange(self.n))
        rem = self.n % bs
        w = np.ones(len(self) * bs, np.float32)
        if rem:
            pad = bs - rem
            idx = np.concatenate(
                [idx, np.repeat(idx[self.n - rem: self.n - rem + 1], pad)])
            w[-pad:] = 0.0
        return idx.astype(np.int32), w

    def epoch_perm(self) -> Tuple[np.ndarray, np.ndarray]:
        """Next epoch's ``(row_ids [Nb*B], weights [Nb*B])``.

        Same permutation stream as BatchIterable(shuffle=True) with this
        seed; the final partial batch repeats its own first row with weight
        0, exactly like BatchIterable._make. The FOLLOWING epoch's
        permutation starts computing on a background thread immediately
        (an O(N) host RNG pass — ~50 ms at 4M rows on a small host — that
        would otherwise sit on the epoch boundary; the single worker
        thread keeps the RNG call order, so the stream is unchanged).
        """
        from concurrent.futures import ThreadPoolExecutor

        if self._perm_pool is None:
            self._perm_pool = ThreadPoolExecutor(max_workers=1)
        out = (self._next_perm.result() if self._next_perm is not None
               else self._compute_perm())
        self._next_perm = self._perm_pool.submit(self._compute_perm)
        return out

    def epoch_seed(self) -> int:
        """Per-epoch seed for the DEVICE-side shuffle (``device_shuffle``):
        one draw from the same generator, so epochs get independent
        permutations and runs are reproducible given the loader seed."""
        return int(self._rng.integers(0, 2**31 - 1))

    def close(self) -> None:
        """Release the background permutation worker and its pinned
        (ids, weights) buffers (the speculative next-epoch permutation is
        otherwise held until interpreter exit)."""
        if self._perm_pool is not None:
            self._perm_pool.shutdown(wait=False, cancel_futures=True)
            self._perm_pool = None
        self._next_perm = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def gather_batch(self, xi, xf, ids=None):
        """Reassemble the model's ``(x_dict, y)`` from gathered rows.

        ``xi = int_mat[ids]``, ``xf = float_mat[ids]`` — traced inside the
        jitted scan body; slices below are free views for XLA. ``ids`` is
        unused (kept for call-site compatibility)."""
        del ids
        b = xi.shape[0]
        x = {}
        for name, (kind, start, width, tail) in self.layout.items():
            src = xi if kind == "int" else xf
            block = src[:, start:start + width]
            x[name] = block.reshape((b,) + tail) if tail else block[:, 0]
        y = xf[:, -1]
        return x, y
