"""Device mapping path parity: full pair stage via the JAX backend (sharded
over the virtual 8-device CPU mesh) must match the NumPy path bit-for-bit."""
import filecmp
import os
import shutil

import jax
import pytest

from ntlink_tpu.config import ScaffoldConfig
from ntlink_tpu.pipeline import pair_stage

from conftest import REF_TESTS_DIR


def test_pair_stage_jax_backend_matches_numpy(tmp_path, monkeypatch):
    assert len(jax.devices()) == 8  # virtual CPU mesh from conftest
    for f in ("scaffolds_1.fa", "long_reads_1.fa"):
        shutil.copy(os.path.join(REF_TESTS_DIR, f), tmp_path / f)
    monkeypatch.chdir(tmp_path)

    outputs = {}
    for backend in ("numpy", "jax"):
        os.makedirs(backend)
        shutil.copy("scaffolds_1.fa", f"{backend}/scaffolds_1.fa")
        shutil.copy("long_reads_1.fa", f"{backend}/long_reads_1.fa")
        monkeypatch.chdir(tmp_path / backend)
        cfg = ScaffoldConfig(
            target="scaffolds_1.fa", reads=["long_reads_1.fa"], k=32, w=250,
            z=1000, pairs_tsv=True, backend=backend, batch_bases=2_000_000,
        )
        pair_stage(cfg)
        outputs[backend] = tmp_path / backend
        monkeypatch.chdir(tmp_path)

    prefix = "scaffolds_1.fa.k32.w250.z1000"
    for artifact in (
        f"{prefix}.verbose_mapping.tsv",
        f"{prefix}.pairs.tsv",
        f"{prefix}.n1.scaffold.dot",
    ):
        assert filecmp.cmp(
            outputs["numpy"] / artifact, outputs["jax"] / artifact, shallow=False
        ), artifact


def test_dryrun_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
