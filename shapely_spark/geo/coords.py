"""Coordinate sequence view — parity with the reference's
shapely/coords.py:6 ``CoordinateSequence``: an indexable/sliceable/
iterable view over a geometry's (n, ndim) coordinate array yielding
coordinate TUPLES, with ``.xy`` returning array('d') pairs and
``__array__`` handing NumPy the underlying array.

Engine note: the raw dataclass field ``Geometry.coords`` stays a plain
ndarray (every kernel reads it attribute-style; a class property would
shadow the instance dict — see geometry.py's coord_tuples note). The OO
veneer exposes this view as ``coord_tuples`` / via ``.xy``; user code
holding a reference-style sequence (``for x, y in seq``, ``seq[0]``,
``seq[1:3]``, ``np.asarray(seq)``) behaves identically.
"""

from __future__ import annotations

from array import array

import numpy as np


class CoordinateSequence:
    """Access to coordinate tuples from a parent geometry's coordinate
    array (reference shapely/coords.py:6)."""

    def __init__(self, coords):
        self._coords = np.asarray(coords, dtype=np.float64)
        if self._coords.ndim == 1:
            self._coords = self._coords.reshape(0, 2)

    def __len__(self):
        return self._coords.shape[0]

    def __iter__(self):
        for i in range(len(self)):
            yield tuple(self._coords[i].tolist())

    def __getitem__(self, key):
        m = len(self)
        if isinstance(key, (int, np.integer)):
            if key + m < 0 or key >= m:
                raise IndexError("index out of range")
            return tuple(self._coords[m + key if key < 0 else key].tolist())
        if isinstance(key, slice):
            return [tuple(self._coords[i].tolist())
                    for i in range(*key.indices(m))]
        raise TypeError("key must be an index or slice")

    def __array__(self, dtype=None, copy=None):
        if copy is False:
            raise ValueError(
                "`copy=False` isn't supported. A copy is always created.")
        arr = self._coords.copy() if copy else self._coords
        return arr.astype(dtype) if dtype is not None else arr

    def __eq__(self, other):
        if isinstance(other, CoordinateSequence):
            other = list(other)
        return list(self) == other

    def __repr__(self):  # pragma: no cover - debug aid
        return f"CoordinateSequence({list(self)!r})"

    @property
    def xy(self):
        """X and Y arrays (reference shapely/coords.py:109)."""
        x = array("d")
        y = array("d")
        for row in self._coords:
            x.append(float(row[0]))
            y.append(float(row[1]))
        return x, y
