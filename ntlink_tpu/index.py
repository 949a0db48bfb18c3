"""Contig minimizer index.

Globally deduplicated minimizer table (reference ntlink_pair.py:189-211):
a minimizer hash occurring at more than one (contig, position) anywhere in the
assembly is removed entirely. Stored both as a dict (host chaining) and as a
sorted uint64 array (vectorized / device binary-search lookup).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterable, Tuple

import numpy as np

from .ops.nthash_np import Minimizers


@dataclass(frozen=True)
class IndexedMinimizer:
    contig: str
    position: int
    strand: str


class ContigIndex:
    """Deduplicated hash -> (contig, position, strand) table."""

    def __init__(self):
        self._table: Dict[int, IndexedMinimizer] = {}
        self._dups: set = set()
        self._sorted_hashes: np.ndarray | None = None

    def add_sketch(self, contig: str, mins: Minimizers) -> None:
        table, dups = self._table, self._dups
        for h, p, f in zip(
            mins.hashes.tolist(), mins.positions.tolist(), mins.forward.tolist()
        ):
            if h in table:
                dups.add(h)
            else:
                table[h] = IndexedMinimizer(contig, p, "+" if f else "-")
        self._sorted_hashes = None

    def add_tsv_entries(
        self, contig: str, entries: Iterable[Tuple[int, int, str]]
    ) -> None:
        table, dups = self._table, self._dups
        for h, p, s in entries:
            if h in table:
                dups.add(h)
            else:
                table[h] = IndexedMinimizer(contig, p, s)
        self._sorted_hashes = None

    def finalize(self) -> None:
        """Drop duplicate hashes (global dedup) and build the lookup array."""
        if self._dups:
            for h in self._dups:
                self._table.pop(h, None)
            self._dups = set()
        self._sorted_hashes = np.sort(
            np.fromiter(self._table.keys(), dtype=np.uint64, count=len(self._table))
        )

    def __len__(self) -> int:
        return len(self._table)

    def __contains__(self, h: int) -> bool:
        return h in self._table and h not in self._dups

    def get(self, h: int) -> IndexedMinimizer:
        return self._table[h]

    def member_mask(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership for a uint64 hash array."""
        if self._sorted_hashes is None:
            self.finalize()
        pos = np.searchsorted(self._sorted_hashes, hashes)
        pos = np.minimum(pos, len(self._sorted_hashes) - 1) if len(self._sorted_hashes) else pos
        if len(self._sorted_hashes) == 0:
            return np.zeros(hashes.shape, dtype=bool)
        return self._sorted_hashes[pos] == hashes

    @classmethod
    def from_tsv(cls, path: str) -> "ContigIndex":
        """Build from an indexlr-style contig TSV (hash:pos:strand)."""
        idx = cls()
        with open(path) as fh:
            for line in fh:
                parts = line.rstrip("\n").split("\t")
                if len(parts) < 2 or not parts[1]:
                    continue
                entries = []
                for token in parts[1].split(" "):
                    h, p, s = token.split(":")
                    entries.append((int(h), int(p), s))
                idx.add_tsv_entries(parts[0], entries)
        idx.finalize()
        return idx

    @classmethod
    def from_sketches(cls, named_sketches: Iterable[Tuple[str, Minimizers]]) -> "ContigIndex":
        idx = cls()
        for contig, mins in named_sketches:
            idx.add_sketch(contig, mins)
        idx.finalize()
        return idx
