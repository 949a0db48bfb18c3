"""Make-style incrementality: a second run reuses every fresh artifact."""
import os
import shutil

from ntlink_tpu.config import ScaffoldConfig
from ntlink_tpu.pipeline import scaffold_stage

from conftest import REF_TESTS_DIR


def test_second_run_reuses_artifacts(tmp_path, monkeypatch):
    for f in ("scaffolds_1.fa", "long_reads_1.fa"):
        shutil.copy(os.path.join(REF_TESTS_DIR, f), tmp_path / f)
    monkeypatch.chdir(tmp_path)
    cfg = ScaffoldConfig(
        target="scaffolds_1.fa", reads=["long_reads_1.fa"], k=32, w=250,
        z=1000, backend="numpy",
    )
    final = scaffold_stage(cfg)
    prefix = cfg.resolved_prefix()
    artifacts = [
        f"{prefix}.n1.scaffold.dot",
        f"{prefix}.stitch.path",
        f"{prefix}.trimmed_scafs.fa",
        "scaffolds_1.fa.k32.w250.z1000.stitch.abyss-scaffold.fa",
    ]
    mtimes = {a: os.path.getmtime(a) for a in artifacts}

    scaffold_stage(cfg)  # second run: everything fresh
    for a in artifacts:
        assert os.path.getmtime(a) == mtimes[a], f"{a} was rebuilt"

    # touching the reads invalidates mapping and everything downstream
    os.utime("long_reads_1.fa")
    scaffold_stage(cfg)
    assert os.path.getmtime(artifacts[0]) > mtimes[artifacts[0]]
