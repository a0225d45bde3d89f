"""Class-confidence feature accumulator for tracks.

Reimplements the reference ``radar::track::Features`` (src/track/features.h:
30-209): a column-matrix of class-confidence vectors with capacity doubling.
``label()`` is the argmax of the per-class row sums and ``feature()`` is the
row sums normalized by the grand total.

This is host-side state (numpy): the track store lives on the host in this
framework, like the reference's CPU tracker. The batched on-device pipeline
only ever needs the *running sums*, which :class:`FeatureSums` provides as a
fixed-shape array for vmap/jit use.
"""

from __future__ import annotations

import numpy as np


class Features:
    """Growable collection of class-confidence feature vectors."""

    def __init__(self, feature: np.ndarray | None = None, class_num: int | None = None):
        if feature is not None:
            feature = np.asarray(feature, dtype=np.float32).reshape(-1)
            self._rows = feature.shape[0]
            self._data = np.zeros((self._rows, 1), dtype=np.float32)
            self._data[:, 0] = feature
            self._size = 1
        else:
            if class_num is None:
                raise ValueError("need an initial feature or class_num")
            self._rows = int(class_num)
            self._data = np.zeros((self._rows, 1), dtype=np.float32)
            self._size = 0

    def push_back(self, feature: np.ndarray) -> None:
        feature = np.asarray(feature, dtype=np.float32).reshape(-1)
        if feature.shape[0] != self._rows:
            raise ValueError("feature size mismatch")
        if self._size >= self.capacity:
            grown = np.zeros((self._rows, self.capacity * 2), dtype=np.float32)
            grown[:, : self.capacity] = self._data
            self._data = grown
        self._data[:, self._size] = feature
        self._size += 1

    def get(self, index: int | None = None) -> np.ndarray:
        if index is None:
            return self._data
        if index < 0 or index >= self._size:
            raise IndexError("index out of range")
        return self._data[:, index].copy()

    @property
    def size(self) -> int:
        return self._size

    @property
    def capacity(self) -> int:
        return self._data.shape[1]

    @property
    def rows(self) -> int:
        return self._rows

    @property
    def cols(self) -> int:
        return self._size

    def clear(self) -> None:
        self._size = 0
        self._data[:] = 0.0

    def label(self) -> int:
        """argmax of per-class sums (reference features.h:176-181)."""
        return int(np.argmax(self._data.sum(axis=1)))

    def feature(self) -> np.ndarray:
        """Row sums / grand total; zeros when empty (features.h:188-197)."""
        total = float(self._data.sum())
        if total == 0.0:
            return np.zeros(self._rows, dtype=np.float32)
        return (self._data.sum(axis=1) / total).astype(np.float32)

    def __repr__(self) -> str:
        """Debug dump mirroring the reference's
        ``operator<<(std::ostream&, const Features&)`` (src/track/
        features.h:199-203): size/capacity and the summed feature."""
        vec = ", ".join(f"{v:.3f}" for v in self.feature())
        return (
            f"Features(size={self._size}, capacity={self.capacity}, "
            f"feature=[{vec}])"
        )
