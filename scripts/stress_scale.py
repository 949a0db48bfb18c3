"""Scale stress: full scaffold+gap_fill pipeline on a ~100 Mbase synthetic
assembly with joins, run with per-stage tracing. Usage:
    python scripts/stress_scale.py [workdir] [n_contigs] [contig_len] [n_reads]
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ntlink_stress"
N_CONTIGS = int(sys.argv[2]) if len(sys.argv) > 2 else 250
CONTIG_LEN = int(sys.argv[3]) if len(sys.argv) > 3 else 400_000
N_READS = int(sys.argv[4]) if len(sys.argv) > 4 else 10_000
READ_LEN = 12_000
GAP = 500

os.makedirs(workdir, exist_ok=True)
os.chdir(workdir)

BASES = np.array(list("ACGT"))
rng = np.random.default_rng(5)

GAPPED = bool(os.environ.get("NTLINK_STRESS_GAPPED"))

# dataset identity includes the gapped flag: a cached target.fa from the
# other mode would silently misrepresent what ran
_marker = "target.fa.gapped" if GAPPED else "target.fa.gapless"
if os.path.exists("target.fa") and not os.path.exists(_marker):
    for f in os.listdir("."):
        if os.path.isdir(f):
            shutil.rmtree(f)
        else:
            os.remove(f)

t0 = time.time()
if not os.path.exists("target.fa"):
    pieces = []
    with open("target.fa", "w") as fh:
        for i in range(N_CONTIGS):
            seq = "".join(BASES[rng.integers(0, 4, CONTIG_LEN)])
            pieces.append(seq)
            if GAPPED:
                # emulate a rounds-2 input: draft scaffolds carry interior
                # N gap runs (exercises the device-side compacted-window
                # sketch path at scale); reads still come from the gapless
                # truth, so flank mappings behave like a real round 2
                arr = np.frombuffer(seq.encode(), np.uint8).copy()
                for _ in range(3):
                    g0 = int(rng.integers(CONTIG_LEN // 10, CONTIG_LEN - 1000))
                    arr[g0 : g0 + int(rng.integers(100, 800))] = ord("N")
                seq = arr.tobytes().decode()
            fh.write(f">c{i}\n{seq}\n")
            if i + 1 < N_CONTIGS:
                pieces.append("".join(BASES[rng.integers(0, 4, GAP)]))
    genome = "".join(pieces)
    comp = str.maketrans("ACGT", "TGCA")
    with open("reads.fa", "w") as fh:
        for r in range(N_READS):
            start = int(rng.integers(0, len(genome) - READ_LEN))
            arr = np.frombuffer(genome[start:start+READ_LEN].encode(), np.uint8).copy()
            n_err = int(READ_LEN * 0.04)
            pos = rng.integers(0, READ_LEN, n_err)
            arr[pos] = BASES[rng.integers(0, 4, n_err)].astype("S1").view(np.uint8)
            seq = arr.tobytes().decode()
            if rng.random() < 0.5:
                seq = seq.translate(comp)[::-1]
            fh.write(f">r{r}\n{seq}\n")
    open(_marker, "w").close()
    print(f"dataset generated in {time.time()-t0:.1f}s "
          f"({N_CONTIGS*CONTIG_LEN/1e6:.0f} Mb target, {N_READS*READ_LEN/1e6:.0f} Mb reads)", flush=True)

from ntlink_tpu import tracing
from ntlink_tpu.config import ScaffoldConfig
from ntlink_tpu.pipeline import run_scaffold

tracing.enable()
cfg = ScaffoldConfig(target="target.fa", reads=["reads.fa"], k=32, w=100, z=1000)
t0 = time.time()
final = run_scaffold(cfg, gap_fill=True)
print(f"TOTAL scaffold+gap_fill: {time.time()-t0:.1f}s", flush=True)

# verify: how many of the expected joins happened?
from ntlink_tpu.pathio import read_path_file
paths = list(read_path_file(cfg.resolved_prefix() + ".trimmed_scafs.path"))
joined = sum(len([t for t in toks if not t.endswith("N")]) - 1 for _, toks in paths)
print(f"paths: {len(paths)}; joins made: {joined}/{N_CONTIGS-1}", flush=True)
