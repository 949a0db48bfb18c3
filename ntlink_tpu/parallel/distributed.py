"""Multi-host orchestration.

Scaling model (see DESIGN.md and the scaling recipe in README):

- every host runs the same pipeline binary; `maybe_init_distributed()`
  connects them into one process group when the standard env vars are
  present (JAX_COORDINATOR / NTLINK_COORDINATOR, NTLINK_NUM_PROCESSES,
  NTLINK_PROCESS_ID — or a TPU pod's automatic configuration). Setting
  NTLINK_GROUP_DIR instead selects a shared-directory transport (NFS-style
  deployments / tests) that needs no coordinator service,
- the contig index is built once per host (the build is deterministic, so
  every host builds the same replicated table from the same target FASTA),
- read files are partitioned across hosts round-robin (`shard_read_files`);
  within a host, batches shard across its local devices on the `data` mesh
  axis,
- each host's pair tally is all-gathered and merged after mapping
  (`all_gather_tallies`): the tally is a per-pair list of gap estimates +
  anchor counts, which merges associatively; medians are taken after the
  merge, exactly as the reference computes them over the global dict,
- per-host verbose/PAF artifact parts (one per read file) are exchanged and
  concatenated in global read-file order (`merge_file_parts`), so every
  host ends up with the reference's canonical single files
  (ntlink_pair.py:382-388) and gap_fill / rounds / checkpoints work
  unchanged at n_processes > 1.

The result is bit-identical to a single-host run: per-file artifact parts
re-interleave into exactly the single-host byte order, and the tally merge
follows the same global order.
"""
from __future__ import annotations

import os
import pickle
import time
from typing import Dict, List, Optional, Tuple

from ..pairs import PairEvidence, PairKey, PairTally


class Transport:
    """Collective byte exchange over the process group."""

    process_id = 0
    n_processes = 1

    def allgather(self, blob: bytes) -> List[bytes]:
        raise NotImplementedError


class LocalTransport(Transport):
    def allgather(self, blob: bytes) -> List[bytes]:
        return [blob]


class JaxTransport(Transport):
    """Rides jax.distributed's coordination service (TPU pods)."""

    def __init__(self, process_id: int, n_processes: int):
        self.process_id = process_id
        self.n_processes = n_processes

    def allgather(self, blob: bytes) -> List[bytes]:
        import numpy as np
        from jax.experimental import multihost_utils

        lengths = multihost_utils.process_allgather(
            np.array([len(blob)], dtype=np.int64)
        )
        lengths = lengths.reshape(-1)
        max_len = max(int(lengths.max()), 1)
        padded = np.frombuffer(blob.ljust(max_len, b"\0"), dtype=np.uint8)
        gathered = multihost_utils.process_allgather(padded)
        return [
            gathered[i, : int(lengths[i])].tobytes()
            for i in range(gathered.shape[0])
        ]


class DirTransport(Transport):
    """Shared-directory collective (NFS deployments, multi-process tests).

    Each call writes `<run-dir>/<seq>.<rank>` atomically (tmp + rename) and
    waits for all ranks' files; a per-instance sequence number keeps
    successive collectives from colliding (all ranks issue collectives in
    the same program order).

    Collectives live in a per-run namespace under the group directory, so a
    rerun (or a crash-restarted rank) can never silently consume a previous
    run's blobs: with NTLINK_RUN_ID set (recommended for production
    launchers) every rank uses `run-<id>`; otherwise rank 0 mints a fresh
    `run-<nonce>` and publishes it via an atomically-replaced CURRENT
    pointer, which other ranks accept only if it was published after they
    started (10 s clock-skew slack) — a stale pointer from an earlier run is
    hours old and is ignored until the live rank 0 overwrites it, and a
    desynced restarted rank times out loudly instead of pairing its
    collective 0 with peers' collective N. Consumed blobs are garbage-
    collected one collective later (when this rank completes collective
    `seq`, every rank has completed `seq-1` — see allgather)."""

    def __init__(self, path: str, process_id: int, n_processes: int,
                 timeout: float = 300.0):
        self.process_id = process_id
        self.n_processes = n_processes
        self.timeout = timeout
        self._seq = 0
        os.makedirs(path, exist_ok=True)
        run_id = os.environ.get("NTLINK_RUN_ID")
        current = os.path.join(path, "CURRENT")
        if run_id:
            self.dir = os.path.join(path, f"run-{run_id}")
            os.makedirs(self.dir, exist_ok=True)
        elif process_id == 0:
            import uuid

            nonce = uuid.uuid4().hex[:12]
            self.dir = os.path.join(path, f"run-{nonce}")
            os.makedirs(self.dir)
            tmp = current + f".tmp.{os.getpid()}"
            with open(tmp, "w") as fh:
                fh.write(nonce)
            os.replace(tmp, current)
        else:
            start = time.time()
            while True:
                try:
                    st = os.stat(current)
                    if st.st_mtime >= start - 10.0:
                        with open(current) as fh:
                            nonce = fh.read().strip()
                        d = os.path.join(path, f"run-{nonce}")
                        if os.path.isdir(d):
                            self.dir = d
                            break
                except FileNotFoundError:
                    pass
                if time.time() > start + self.timeout:
                    raise TimeoutError(
                        f"rank {process_id}: no fresh CURRENT run pointer in "
                        f"{path} (is rank 0 up? for reruns over a shared dir "
                        f"set NTLINK_RUN_ID on every rank)"
                    )
                time.sleep(0.02)

    def allgather(self, blob: bytes) -> List[bytes]:
        seq = self._seq
        self._seq += 1
        mine = os.path.join(self.dir, f"{seq}.{self.process_id}")
        tmp = mine + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, mine)
        parts = []
        deadline = time.time() + self.timeout
        for rank in range(self.n_processes):
            path = os.path.join(self.dir, f"{seq}.{rank}")
            while not os.path.exists(path):
                if time.time() > deadline:
                    raise TimeoutError(
                        f"rank {rank} never produced {path}"
                    )
                time.sleep(0.02)
            with open(path, "rb") as fh:
                parts.append(fh.read())
        # GC: completing collective `seq` proves every rank finished
        # `seq-1` (each read all ranks' seq files, which are written only
        # after their writers finished seq-1), so this rank's seq-1 blob can
        # no longer be read by anyone.
        if seq > 0:
            try:
                os.unlink(os.path.join(self.dir, f"{seq - 1}.{self.process_id}"))
            except FileNotFoundError:
                pass
        return parts


_TRANSPORT: Optional[Transport] = None


def get_transport() -> Transport:
    global _TRANSPORT
    if _TRANSPORT is None:
        maybe_init_distributed()
    return _TRANSPORT


def maybe_init_distributed() -> Tuple[int, int]:
    """Initialize the process group from env; returns (pid, n_processes).

    No-op single-process when unconfigured. NTLINK_GROUP_DIR selects the
    shared-directory transport; otherwise a coordinator address selects
    jax.distributed.
    """
    global _TRANSPORT
    if _TRANSPORT is not None:
        return _TRANSPORT.process_id, _TRANSPORT.n_processes
    n = int(os.environ.get("NTLINK_NUM_PROCESSES", "0") or 0)
    pid = int(os.environ.get("NTLINK_PROCESS_ID", "0") or 0)
    group_dir = os.environ.get("NTLINK_GROUP_DIR")
    coord = os.environ.get("NTLINK_COORDINATOR") or os.environ.get(
        "JAX_COORDINATOR"
    )
    if group_dir and n > 1:
        _TRANSPORT = DirTransport(group_dir, pid, n)
        return pid, n
    if coord and n > 1:
        import jax

        jax.distributed.initialize(
            coordinator_address=coord, num_processes=n, process_id=pid
        )
        _TRANSPORT = JaxTransport(pid, n)
        return pid, n
    _TRANSPORT = LocalTransport()
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
    """All-gather the per-host tallies over the process group."""
    transport = get_transport()
    if transport.n_processes == 1:
        return tally
    parts = transport.allgather(serialize_tally(tally))
    merged = PairTally(tally.contig_lengths, tally.k, tally.f_cap)
    return merge_tallies(merged, parts)


def all_gather_file_tallies(
    per_file: Dict[int, PairTally], template: PairTally
) -> PairTally:
    """All-gather per-read-file tallies and merge them in global file order.

    Merging file-by-file (not host-by-host) reproduces the single-host
    insertion and gap-list order exactly, so pairs.tsv / DOT / medians are
    byte-identical to an unsharded run.
    """
    transport = get_transport()
    payload = {fi: serialize_tally(t) for fi, t in per_file.items()}
    if transport.n_processes > 1:
        merged_blobs: Dict[int, bytes] = {}
        for blob in transport.allgather(pickle.dumps(payload)):
            merged_blobs.update(pickle.loads(blob))
    else:
        merged_blobs = payload
    merged = PairTally(template.contig_lengths, template.k, template.f_cap)
    return merge_tallies(
        merged, [merged_blobs[fi] for fi in sorted(merged_blobs)]
    )


def merge_file_parts(final_path: str, my_parts: Dict[int, str]) -> None:
    """Exchange per-read-file artifact parts and write the canonical file.

    `my_parts` maps global read-file index -> local part path for the files
    this host mapped. All hosts receive every part and concatenate them in
    file-index order, reproducing the single-host byte order exactly
    (reference contract: one verbose file, ntlink_pair.py:382-388). Each
    host writes the result atomically to its local filesystem (identical
    content everywhere, so shared-FS double writes are benign); local part
    files are removed.

    Production note: parts travel over the group transport — for huge
    verbose checkpoints on TPU pods prefer a shared filesystem
    (NTLINK_GROUP_DIR), where the exchange is just renames.
    """
    transport = get_transport()
    payload = {}
    for idx, path in my_parts.items():
        with open(path, "rb") as fh:
            payload[idx] = fh.read()
    if transport.n_processes > 1:
        gathered = transport.allgather(pickle.dumps(payload))
        merged: Dict[int, bytes] = {}
        for blob in gathered:
            merged.update(pickle.loads(blob))
    else:
        merged = payload
    tmp = final_path + ".tmp"
    with open(tmp, "wb") as fh:
        for idx in sorted(merged):
            fh.write(merged[idx])
    os.replace(tmp, final_path)
    for path in my_parts.values():
        if os.path.exists(path):
            os.unlink(path)
