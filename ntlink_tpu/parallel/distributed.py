"""Multi-host orchestration.

Scaling model (see DESIGN.md and the scaling recipe in README):

- every host runs the same pipeline binary; `maybe_init_distributed()`
  connects them into one JAX process group when the standard env vars are
  present (JAX_COORDINATOR / NTLINK_COORDINATOR, NTLINK_NUM_PROCESSES,
  NTLINK_PROCESS_ID — or a TPU pod's automatic configuration),
- the contig index is built once (process 0 semantics are identical on all
  hosts — the build is deterministic, so every host builds the same
  replicated table from the same target FASTA),
- read files are partitioned across hosts round-robin (`shard_read_files`);
  within a host, batches shard across its local devices on the `data` mesh
  axis,
- each host's pair tally is serialized and all-gathered at the end of
  mapping (`merge_tallies`): the tally is a per-pair list of gap estimates +
  anchor counts, which merges associatively; medians are taken after the
  merge, exactly as the reference computes them over the global dict.

The result is bit-identical to a single-host run whenever the read-file
partition preserves per-file record order (it does: files are whole units),
because the reference's outputs only depend on per-read results and
set-like aggregations — with one caveat mirrored from the reference: the
pairs.tsv/DOT insertion order follows the global merge order, which
`merge_tallies` fixes to file order.
"""
from __future__ import annotations

import os
import pickle
from typing import List, Tuple

from ..pairs import PairEvidence, PairKey, PairTally


def maybe_init_distributed() -> Tuple[int, int]:
    """Initialize jax.distributed from env; returns (process_id, n_processes).

    No-op single-process when unconfigured.
    """
    coord = os.environ.get("NTLINK_COORDINATOR") or os.environ.get(
        "JAX_COORDINATOR"
    )
    n = int(os.environ.get("NTLINK_NUM_PROCESSES", "0") or 0)
    pid = int(os.environ.get("NTLINK_PROCESS_ID", "0") or 0)
    if coord and n > 1:
        import jax

        jax.distributed.initialize(
            coordinator_address=coord, num_processes=n, process_id=pid
        )
        return pid, n
    return 0, 1


def shard_read_files(files: List[str], process_id: int, n_processes: int) -> List[str]:
    """Round-robin partition of read files across hosts."""
    return [f for i, f in enumerate(files) if i % n_processes == process_id]


def serialize_tally(tally: PairTally) -> bytes:
    payload = [
        (
            (p.source, p.source_ori, p.target, p.target_ori),
            ev.gap_estimates,
            ev.anchor,
        )
        for p, ev in tally.pairs.items()
    ]
    return pickle.dumps(payload)


def merge_tallies(
    base: PairTally, serialized_parts: List[bytes]
) -> PairTally:
    """Merge per-host tallies into `base` (order: parts in the given order).

    Gap-estimate lists concatenate; anchors add. The merged per-pair
    insertion order is the first sighting across parts in order, which keeps
    pairs.tsv deterministic for a fixed file partition.
    """
    for blob in serialized_parts:
        for (s, so, t, to), gaps, anchor in pickle.loads(blob):
            key = PairKey(s, so, t, to)
            ev = base.pairs.get(key)
            if ev is None:
                ev = base.pairs[key] = PairEvidence()
            ev.gap_estimates.extend(gaps)
            ev.anchor += anchor
    return base


def all_gather_tallies(tally: PairTally) -> PairTally:
    """All-gather the per-host tallies over the process group.

    Uses jax's multihost byte-string gather when distributed; identity when
    single-process.
    """
    import jax

    if jax.process_count() == 1:
        return tally
    from jax.experimental import multihost_utils

    import numpy as np

    blob = serialize_tally(tally)
    # length-prefix + pad to the global max so gather shapes agree
    lengths = multihost_utils.process_allgather(
        np.array([len(blob)], dtype=np.int64)
    )
    max_len = int(lengths.max())
    padded = np.frombuffer(blob.ljust(max_len, b"\0"), dtype=np.uint8)
    gathered = multihost_utils.process_allgather(padded)
    parts = [
        gathered[i, : int(lengths[i][0] if lengths.ndim > 1 else lengths[i])]
        .tobytes()
        for i in range(gathered.shape[0])
    ]
    merged = PairTally(tally.contig_lengths, tally.k, tally.f_cap)
    return merge_tallies(merged, parts)
