"""Streaming FASTA/FASTQ IO.

Record-splitting semantics follow lh3 readfq (the reference vendors the same
parser as bin/read_fasta.py:6-46): header token is the first whitespace-split
word, multi-line sequences are joined, FASTQ quality runs until it reaches the
sequence length. Transparent gzip handling.
"""
from __future__ import annotations

import gzip
import io
from dataclasses import dataclass
from typing import Iterator, Iterable, Optional


@dataclass
class FastxRecord:
    name: str
    seq: str
    comment: Optional[str] = None
    qual: Optional[str] = None

    def __len__(self) -> int:
        return len(self.seq)


def open_text_maybe_gzip(path: str) -> io.TextIOBase:
    """Open a text file, transparently decompressing gzip (by magic bytes)."""
    raw = open(path, "rb")
    magic = raw.read(2)
    raw.seek(0)
    if magic == b"\x1f\x8b":
        return io.TextIOWrapper(gzip.GzipFile(fileobj=raw), encoding="ascii")
    return io.TextIOWrapper(raw, encoding="ascii")


def stream_fastx(source) -> Iterator[FastxRecord]:
    """Yield records from a path or an open text stream (FASTA or FASTQ)."""
    close = False
    if isinstance(source, str):
        fh = open_text_maybe_gzip(source)
        close = True
    else:
        fh = source
    try:
        yield from _parse(fh)
    finally:
        if close:
            fh.close()


def _parse(fh) -> Iterator[FastxRecord]:
    pending = None  # header line carried over between records
    while True:
        if pending is None:
            for line in fh:
                if line and line[0] in ">@":
                    pending = line.rstrip("\n")
                    break
            else:
                return
        header = pending[1:]
        fields = header.split(None, 1)
        name = fields[0] if fields else ""
        comment = fields[1] if len(fields) > 1 else None
        pending = None

        seq_parts = []
        for line in fh:
            if line and line[0] in ">@+":
                pending = line.rstrip("\n")
                break
            seq_parts.append(line.rstrip("\n"))
        seq = "".join(seq_parts)

        if pending is None or not pending.startswith("+"):
            yield FastxRecord(name, seq, comment, None)
            if pending is None:
                return
            continue

        # FASTQ: read quality until it covers the sequence
        pending = None
        qual_parts, qlen = [], 0
        for line in fh:
            stripped = line.rstrip("\n")
            qual_parts.append(stripped)
            qlen += len(stripped)
            if qlen >= len(seq):
                yield FastxRecord(name, seq, comment, "".join(qual_parts))
                break
        else:
            # EOF before enough quality: degrade to FASTA (readfq behaviour)
            yield FastxRecord(name, seq, comment, None)
            return


def read_fasta_lengths(path: str) -> dict:
    """Map sequence name -> length (reference ntlink_utils.py:65-73)."""
    return {rec.name: len(rec.seq) for rec in stream_fastx(path)}


_RC = str.maketrans(
    "ACGTUNMRWSYKVHDBacgtunmrwsykvhdb",
    "TGCAANKYWSRMBDHVtgcaankywsrmbdhv",
)


def reverse_complement(seq: str) -> str:
    """IUPAC-aware reverse complement (reference ntlink_patch_gaps.py:47-53)."""
    return seq[::-1].translate(_RC)


def write_fasta(fh, records: Iterable, wrap: Optional[int] = None) -> None:
    """Write (header, seq) pairs; header is emitted verbatim after '>'."""
    for header, seq in records:
        fh.write(f">{header}\n")
        if wrap:
            for i in range(0, len(seq), wrap):
                fh.write(seq[i : i + wrap] + "\n")
        else:
            fh.write(seq + "\n")
