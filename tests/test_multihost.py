"""Two-process multi-host run == single-process run, byte for byte.

Spawns two real ranks (shared-directory transport, CPU backend) over a
two-file read set, runs `scaffold gap_fill` end to end on both, and
byte-compares every artifact against an unsharded run — proving the
per-file verbose/paf part merge and the file-ordered tally gather
(reference contract: one verbose file, ntlink_pair.py:382-388) keep
gap_fill / rounds / checkpoints working at n_processes > 1."""
import filecmp
import os
import shutil
import subprocess
import sys

from conftest import REF_TESTS_DIR

DRIVER = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from ntlink_tpu.cli import main
sys.exit(main())
"""

ARGS = [
    "scaffold", "gap_fill",
    "target=scaffolds_1.fa",
    "reads=long_reads_1-1.fa long_reads_1-2.fa",
    "k=32", "w=250", "z=1000", "verbose=True", "batch_bases=2000000",
]

ARTIFACTS = [
    "scaffolds_1.fa.k32.w250.z1000.verbose_mapping.tsv",
    "scaffolds_1.fa.k32.w250.z1000.n1.scaffold.dot",
    "scaffolds_1.fa.k32.w250.z1000.stitch.path",
    "scaffolds_1.fa.k32.w250.z1000.trimmed_scafs.fa",
    "scaffolds_1.fa.k32.w250.z1000.ntLink.scaffolds.gap_fill.fa",
]


def _setup(d):
    os.makedirs(d)
    for f in ("scaffolds_1.fa", "long_reads_1-1.fa", "long_reads_1-2.fa"):
        shutil.copy(os.path.join(REF_TESTS_DIR, f), d)


def _run(cwd, env_extra=None):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("NTLINK_NUM_PROCESSES", None)
    env.update(env_extra or {})
    return subprocess.Popen(
        [sys.executable, "-c", DRIVER.format(repo=repo), *ARGS],
        cwd=cwd, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def test_two_process_run_matches_single(tmp_path):
    single = tmp_path / "single"
    _setup(single)
    proc = _run(single)
    out, _ = proc.communicate(timeout=600)
    assert proc.returncode == 0, out[-3000:]

    group = tmp_path / "group"
    ranks = []
    for pid in range(2):
        d = tmp_path / f"rank{pid}"
        _setup(d)
        ranks.append(
            _run(
                d,
                {
                    "NTLINK_GROUP_DIR": str(group),
                    "NTLINK_NUM_PROCESSES": "2",
                    "NTLINK_PROCESS_ID": str(pid),
                },
            )
        )
    outs = [p.communicate(timeout=600)[0] for p in ranks]
    for p, out in zip(ranks, outs):
        assert p.returncode == 0, out[-3000:]

    for artifact in ARTIFACTS:
        for pid in range(2):
            a = single / artifact
            b = tmp_path / f"rank{pid}" / artifact
            assert filecmp.cmp(a, b, shallow=False), (artifact, pid)
        # no stray unmerged parts
    for pid in range(2):
        leftovers = [
            f for f in os.listdir(tmp_path / f"rank{pid}") if ".part" in f
        ]
        assert leftovers == []


def _free_port():
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_jax_transport_matches_single(tmp_path):
    """Same byte-parity scenario over the jax.distributed coordinator
    transport (the TPU-pod path, distributed.py JaxTransport) instead of
    the shared-directory transport."""
    single = tmp_path / "single"
    _setup(single)
    proc = _run(single)
    out, _ = proc.communicate(timeout=600)
    assert proc.returncode == 0, out[-3000:]

    # _free_port has an unavoidable TOCTOU window (the port is released
    # before the coordinator rebinds it); under a loaded machine it can be
    # stolen, so retry the whole 2-rank launch once on a fresh port
    for attempt in range(2):
        coord = f"127.0.0.1:{_free_port()}"
        ranks = []
        for pid in range(2):
            d = tmp_path / f"jrank{pid}"
            if d.exists():
                shutil.rmtree(d)
            _setup(d)
            ranks.append(
                _run(
                    d,
                    {
                        "NTLINK_COORDINATOR": coord,
                        "NTLINK_NUM_PROCESSES": "2",
                        "NTLINK_PROCESS_ID": str(pid),
                    },
                )
            )
        outs = [p.communicate(timeout=600)[0] for p in ranks]
        if all(p.returncode == 0 for p in ranks):
            break
        assert attempt == 0, [o[-3000:] for o in outs]

    for artifact in ARTIFACTS:
        for pid in range(2):
            a = single / artifact
            b = tmp_path / f"jrank{pid}" / artifact
            assert filecmp.cmp(a, b, shallow=False), (artifact, pid)
