"""Overlap trim stage parity (scaffolds_4 has real negative-gap joins)."""
import filecmp
import os
import shutil

import pytest

from ntlink_tpu.config import ScaffoldConfig
from ntlink_tpu.pipeline import scaffold_stage

from conftest import GOLDEN_DIR, REF_TESTS_DIR


def run_case(tmp_path, monkeypatch, target, reads, k, w, merge_gap):
    shutil.copy(os.path.join(REF_TESTS_DIR, target), tmp_path / target)
    shutil.copy(os.path.join(REF_TESTS_DIR, reads), tmp_path / reads)
    monkeypatch.chdir(tmp_path)
    cfg = ScaffoldConfig(
        target=target, reads=[reads], k=k, w=w, z=1000, overlap=True,
        merge_gap=merge_gap, backend="numpy",
    )
    return cfg, scaffold_stage(cfg)


def assert_artifacts(prefix, golden_prefix, final):
    for ext in ("path", "tsv", "agp", "fa"):
        assert filecmp.cmp(
            f"{prefix}.trimmed_scafs.{ext}",
            f"{golden_prefix}.trimmed_scafs.{ext}",
            shallow=False,
        ), f"trimmed_scafs.{ext} mismatch"
    assert filecmp.cmp(
        os.path.realpath(final), f"{golden_prefix}.ntLink.scaffolds.fa",
        shallow=False,
    ), "final scaffolds mismatch"


def test_overlap_trim_scaffolds_4_goldens(tmp_path, monkeypatch):
    # goldens were produced with the default merge_gap=0
    cfg, final = run_case(
        tmp_path, monkeypatch, "scaffolds_4.fa", "long_reads_4.fa.gz", 40, 100, 0
    )
    prefix = cfg.resolved_prefix()
    assert_artifacts(prefix, os.path.join(GOLDEN_DIR, prefix), final)


def test_overlap_trim_scaffolds_4_merge_gap(tmp_path, monkeypatch):
    # reference test_4 scenario: merge_gap=20
    cfg, final = run_case(
        tmp_path, monkeypatch, "scaffolds_4.fa", "long_reads_4.fa.gz", 40, 100, 20
    )
    prefix = cfg.resolved_prefix()
    with open(f"{prefix}.trimmed_scafs.path") as fh:
        got = [line.rstrip("\n").split("\t")[1] for line in fh]
    assert got == ["scaf3- 21N scaf4+", "scaf1+ 21N scaf2+"]
    # trim coordinates are independent of merge_gap: fa still byte-identical
    assert filecmp.cmp(
        f"{prefix}.trimmed_scafs.fa",
        os.path.join(GOLDEN_DIR, f"{prefix}.trimmed_scafs.fa"),
        shallow=False,
    )


@pytest.mark.parametrize(
    "target,reads,k,w",
    [
        ("scaffolds_1.fa", "long_reads_1.fa", 32, 250),
        ("scaffolds_2.fa", "long_reads_2.fq.gz", 32, 100),
        ("scaffolds_3.fa", "long_reads_3.fa.gz", 24, 250),
    ],
)
def test_overlap_noop_goldens(tmp_path, monkeypatch, target, reads, k, w):
    cfg, final = run_case(tmp_path, monkeypatch, target, reads, k, w, 0)
    prefix = cfg.resolved_prefix()
    assert_artifacts(prefix, os.path.join(GOLDEN_DIR, prefix), final)
