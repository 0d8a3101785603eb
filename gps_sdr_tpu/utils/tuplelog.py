"""Append-only tuple log backed by column-array chunks.

The evaluator's `sat_results` is the reference's per-fix result list
(satNo, tow, cycNo, rangeEst, measDelay — gpseval.py result surface):
tens of entries per epoch, hundreds of epochs per second at serving
scale.  Materializing a Python tuple per row was a measurable slice of
the host evaluate stage (_fix_finish_batch); this log keeps the bulk
appends as column arrays and duck-types just enough of the list
protocol for the existing surfaces — equality in tests, JSON export
(utils/io.py), the bootstrap `del log[n0:]` truncation, pickling for
checkpoints."""

from __future__ import annotations

import numpy as np

__all__ = ["TupleLog"]


class TupleLog:
    """List-of-tuples compatible log; chunks are either a plain list of
    tuples (scalar appends) or a tuple of equal-length column arrays
    (bulk appends via extend_cols)."""

    __slots__ = ("_chunks", "_n")

    def __init__(self, chunks=None):
        self._chunks = list(chunks) if chunks else []
        self._n = sum(self._chunk_len(c) for c in self._chunks)

    @staticmethod
    def _chunk_len(c) -> int:
        return len(c[0]) if isinstance(c, tuple) else len(c)

    def extend_cols(self, *cols) -> None:
        """Bulk append: equal-length column sequences (numpy arrays or
        lists); rows are zip(*cols)."""
        n = len(cols[0])
        if n:
            self._chunks.append(tuple(cols))
            self._n += n

    def __iadd__(self, rows) -> "TupleLog":
        rows = list(rows)
        if rows:
            self._chunks.append(rows)
            self._n += len(rows)
        return self

    def extend(self, rows) -> None:
        self.__iadd__(rows)

    def append(self, row) -> None:
        self.__iadd__([row])

    def __len__(self) -> int:
        return self._n

    def __bool__(self) -> bool:
        return self._n > 0

    def __iter__(self):
        for c in self._chunks:
            if isinstance(c, tuple):
                cols = [col.tolist() if isinstance(col, np.ndarray)
                        else list(col) for col in c]
                yield from zip(*cols)
            else:
                yield from c

    def _as_list(self) -> list:
        return list(self)

    def __getitem__(self, i):
        if isinstance(i, slice):
            return self._as_list()[i]
        return self._as_list()[i]

    def __delitem__(self, i) -> None:
        # the one mutation the evaluator needs: truncate a bootstrap
        # solve's appended rows (`del log[n0:]`)
        if not (isinstance(i, slice) and i.stop is None
                and i.step is None):
            raise TypeError("TupleLog only supports `del log[n0:]`")
        n0 = i.start or 0
        if n0 < 0:
            n0 += self._n
        while self._n > n0 and self._chunks:
            last = self._chunks[-1]
            ln = self._chunk_len(last)
            if self._n - ln >= n0:
                self._chunks.pop()
                self._n -= ln
            else:
                keep = ln - (self._n - n0)
                if isinstance(last, tuple):
                    self._chunks[-1] = tuple(col[:keep] for col in last)
                else:
                    self._chunks[-1] = last[:keep]
                self._n = n0

    def __eq__(self, other):
        if isinstance(other, TupleLog):
            return self._as_list() == other._as_list()
        if isinstance(other, list):
            return self._as_list() == other
        return NotImplemented

    __hash__ = None

    def __repr__(self) -> str:
        return f"TupleLog(n={self._n})"

    def __reduce__(self):
        # pickle the raw column chunks: materializing a tuple per row
        # made the serving soak's mid-run checkpoint minutes of wall
        # (9M rows) and several times the size
        return (TupleLog, (self._chunks,))
