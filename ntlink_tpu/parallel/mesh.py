"""Device mesh + sharded mapping step.

The engine's scaling axis is data parallelism over reads: read batches are
sharded on a 1-D ``data`` mesh axis, the contig minimizer index is replicated
on every device, and per-shard anchor evidence is merged with XLA collectives
(`psum`) riding ICI. This mirrors the problem's structure (index small and
read-only, reads embarrassingly parallel) rather than the reference's
process-level parallelism (reference SURVEY §2c).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.sketch_jax import sketch_batch_kernel


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("data",))


class DeviceIndex:
    """Replicated sorted contig-minimizer table for on-device hash joins."""

    def __init__(self, hashes: np.ndarray, contig_ids: np.ndarray,
                 positions: np.ndarray, strands: np.ndarray):
        order = np.argsort(hashes, kind="stable")
        h = hashes[order]
        self.hi = jnp.asarray((h >> np.uint64(32)).astype(np.uint32))
        self.lo = jnp.asarray((h & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        self.contig_ids = jnp.asarray(contig_ids[order].astype(np.int32))
        self.positions = jnp.asarray(positions[order].astype(np.int32))
        self.strands = jnp.asarray(strands[order])
        self.size = int(h.shape[0])

    @classmethod
    def from_contig_index(cls, index, contig_order) -> "DeviceIndex":
        """Build from index.ContigIndex; contig_order maps name -> int id."""
        n = len(index)
        hashes = np.empty(n, dtype=np.uint64)
        cids = np.empty(n, dtype=np.int32)
        poss = np.empty(n, dtype=np.int32)
        strs = np.empty(n, dtype=bool)
        for i, (h, entry) in enumerate(index._table.items()):
            hashes[i] = h
            cids[i] = contig_order[entry.contig]
            poss[i] = entry.position
            strs[i] = entry.strand == "+"
        return cls(hashes, cids, poss, strs)


def lex_binary_search(idx_hi, idx_lo, q_hi, q_lo, n: int):
    """Vectorized lower-bound search of (hi, lo) query pairs in the sorted
    (hi, lo) table. Returns positions (clamped) and a found mask."""
    steps = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)
    lo_b = jnp.zeros(q_hi.shape, jnp.int32)
    hi_b = jnp.full(q_hi.shape, n, jnp.int32)

    def body(_, carry):
        lo_b, hi_b = carry
        mid = (lo_b + hi_b) >> 1
        m_hi = idx_hi[mid]
        m_lo = idx_lo[mid]
        less = (m_hi < q_hi) | ((m_hi == q_hi) & (m_lo < q_lo))
        return jnp.where(less, mid + 1, lo_b), jnp.where(less, hi_b, mid)

    lo_b, hi_b = jax.lax.fori_loop(0, steps, body, (lo_b, hi_b))
    pos = jnp.minimum(lo_b, n - 1)
    found = (idx_hi[pos] == q_hi) & (idx_lo[pos] == q_lo)
    return pos, found


def mapping_step(codes, lengths, idx_hi, idx_lo, idx_cid, idx_pos, idx_strand,
                 k: int, w: int):
    """Single-device mapping step: sketch + hash-join against the index.

    Returns dense per-window outputs; the host compacts ragged results.
      winner (B, NW) minimizer positions, emit mask, anchor payloads
      (contig id / ctg position / ctg strand, -1 or False where unmatched).
    """
    out_hi, out_lo, fwd, winner, emit = sketch_batch_kernel(codes, lengths, k, w)
    B = codes.shape[0]
    # gather each winner's reported hash, join against the index
    w_hi = jnp.take_along_axis(out_hi, winner, axis=1)
    w_lo = jnp.take_along_axis(out_lo, winner, axis=1)
    pos, found = lex_binary_search(idx_hi, idx_lo, w_hi, w_lo, idx_hi.shape[0])
    found = found & emit
    anchor_cid = jnp.where(found, idx_cid[pos], -1)
    anchor_pos = jnp.where(found, idx_pos[pos], -1)
    anchor_strand = jnp.where(found, idx_strand[pos], False)
    read_fwd = jnp.take_along_axis(fwd, winner, axis=1)
    n_anchors = found.sum()
    return {
        "winner": winner,
        "emit": emit,
        "found": found,
        "anchor_cid": anchor_cid,
        "anchor_pos": anchor_pos,
        "anchor_strand": anchor_strand,
        "read_strand": read_fwd,
        "mx_hi": w_hi,
        "mx_lo": w_lo,
        "n_anchors": n_anchors,
    }


def make_sharded_mapping_step(mesh: Mesh, k: int, w: int):
    """jit the mapping step with batch rows sharded over the data axis and
    the index replicated; XLA inserts the collectives."""
    data_sharding = NamedSharding(mesh, P("data", None))
    repl = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        static_argnums=(7, 8),
        in_shardings=(
            data_sharding, NamedSharding(mesh, P("data")),
            repl, repl, repl, repl, repl,
        ),
    )
    def step(codes, lengths, idx_hi, idx_lo, idx_cid, idx_pos, idx_strand,
             k_, w_):
        return mapping_step(
            codes, lengths, idx_hi, idx_lo, idx_cid, idx_pos, idx_strand, k_, w_
        )

    return lambda codes, lengths, didx: step(
        codes, lengths, didx.hi, didx.lo, didx.contig_ids, didx.positions,
        didx.strands, k, w,
    )


def dryrun(n_devices: int, k: int = 32, w: int = 100) -> None:
    """Compile + execute one sharded mapping step on an n-device mesh with a
    tiny synthetic batch; validates the multi-chip path end to end."""
    mesh = make_mesh(n_devices)
    rng = np.random.default_rng(0)
    B, L = n_devices * 2, 2048
    codes = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
    lengths = np.full(B, L, dtype=np.int32)

    # synthetic replicated index drawn from the batch itself
    from ..ops import nthash_np

    mins = nthash_np.sketch_codes(codes[0], k, w)
    didx = DeviceIndex(
        mins.hashes,
        np.zeros(len(mins), dtype=np.int32),
        mins.positions.astype(np.int32),
        mins.forward,
    )
    step = make_sharded_mapping_step(mesh, k, w)
    out = step(jnp.asarray(codes), jnp.asarray(lengths), didx)
    jax.block_until_ready(out)
    n_anchors = int(out["n_anchors"])
    assert n_anchors >= len(mins), "sharded join lost anchors"
