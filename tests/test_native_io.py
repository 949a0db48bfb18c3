"""Native C reader parity vs the pure-Python readfq parser."""
import glob
import os

import numpy as np
import pytest

from ntlink_tpu.ops import nthash_np
from ntlink_tpu.seqio import stream_fastx
from ntlink_tpu.seqio.fastx import stream_codes, _parse, open_text_maybe_gzip

from conftest import REF_TESTS_DIR

FILES = [
    "scaffolds_1.fa",
    "scaffolds_4.fa",
    "long_reads_1.fa",
    "long_reads_2.fq.gz",
    "long_reads_3.fa.gz",
]


def python_records(path):
    fh = open_text_maybe_gzip(path)
    try:
        return [(r.name, r.seq, r.comment, r.qual) for r in _parse(fh)]
    finally:
        fh.close()


@pytest.mark.parametrize("fname", FILES)
def test_native_reader_matches_python(fname):
    path = os.path.join(REF_TESTS_DIR, fname)
    native = [(r.name, r.seq, r.comment, r.qual) for r in stream_fastx(path)]
    ref = python_records(path)
    assert len(native) == len(ref)
    for a, b in zip(native, ref):
        assert a == b


@pytest.mark.parametrize("fname", ["long_reads_1.fa", "long_reads_2.fq.gz"])
def test_stream_codes_matches_encode(fname):
    path = os.path.join(REF_TESTS_DIR, fname)
    ref = [(r.name, nthash_np.encode(r.seq)) for r in stream_fastx(path)]
    got = list(stream_codes(path))
    assert len(got) == len(ref)
    for (gn, gc), (rn, rc) in zip(got, ref):
        assert gn == rn
        assert np.array_equal(gc, rc)


def test_weird_records(tmp_path):
    # multi-line fasta, empty seq, fastq with multi-line quality
    p = tmp_path / "x.fq"
    p.write_text(
        ">a comment here\nACGT\nACGT\n"
        ">empty\n"
        "@q1\nACGTNacgt\n+\nIIIII\nIIII\n"
        "@q2 trailing\nACGT\n+ignored\nIIII\n"
    )
    native = [(r.name, r.seq, r.comment, r.qual) for r in stream_fastx(str(p))]
    ref = python_records(str(p))
    assert native == ref
