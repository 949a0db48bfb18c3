"""Device mesh + sharded mapping step.

The engine's scaling axis is data parallelism over reads: read batches are
sharded on a 1-D ``data`` mesh axis, the contig minimizer index is replicated
on every device, and per-shard anchor evidence is merged with XLA collectives
(`psum`) riding ICI. This mirrors the problem's structure (index small and
read-only, reads embarrassingly parallel) rather than the reference's
process-level parallelism (reference SURVEY §2c).

Join design: TPUs pay heavily for gathers from large tables, so the anchor
join is (1) deferred until after on-device minimizer compaction (only ~2L/w
selected k-mers per read are looked up, not every window) and (2) done with
an open-addressing hash table probed a small constant number of times,
instead of a log2(n)-step binary search.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.sketch_jax import finish_hash, sketch_batch_kernel

_FIB = 0x9E3779B1  # 32-bit Fibonacci hashing constant


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    # local (addressable) devices only: under multi-process runs each host
    # maps its own read-file shard on its own chips (host parallelism is
    # by file sharding, distributed.py), so the mapping mesh never spans
    # non-addressable devices.
    devices = jax.local_devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("data",))


class DeviceIndex:
    """Replicated contig-minimizer hash table for on-device joins.

    Open addressing, linear probing, load factor <= 0.5, slot-aligned
    payloads (contig id / position / strand). `max_probes` is the longest
    probe chain observed at build time (static loop bound on device).
    """

    def __init__(self, hashes: np.ndarray, contig_ids: np.ndarray,
                 positions: np.ndarray, strands: np.ndarray):
        n = int(hashes.shape[0])
        size = 1
        while size < max(2 * n, 16):
            size <<= 1
        mask = size - 1
        hi = (hashes >> np.uint64(32)).astype(np.uint32)
        lo = (hashes & np.uint64(0xFFFFFFFF)).astype(np.uint32)

        t_hi = np.zeros(size, np.uint32)
        t_lo = np.zeros(size, np.uint32)
        t_cid = np.full(size, -1, np.int32)
        t_pos = np.zeros(size, np.int32)
        t_strand = np.zeros(size, bool)

        # vectorized linear-probing insertion: per round, every pending
        # entry tries its slot; one claimant per slot wins, losers advance
        # one slot and retry. Rounds ~ longest cluster (load <= 0.5).
        slots = (
            ((lo ^ hi) * np.uint32(_FIB)).astype(np.uint32) & np.uint32(mask)
        ).astype(np.int64)
        pending = np.arange(n)
        claim = np.full(size, -1, np.int64)
        max_probes = 1
        rounds = 0
        while pending.size:
            rounds += 1
            want = slots[pending]
            free = t_cid[want] == -1
            contenders, want_free = pending[free], want[free]
            claim[want_free] = contenders  # last writer wins; rest retry
            won = claim[want] == pending
            winners = pending[won]
            w_slots = slots[winners]
            t_hi[w_slots] = hi[winners]
            t_lo[w_slots] = lo[winners]
            t_cid[w_slots] = contig_ids[winners]
            t_pos[w_slots] = positions[winners]
            t_strand[w_slots] = strands[winners]
            pending = pending[~won]
            slots[pending] = (slots[pending] + 1) & mask
            max_probes = rounds
        max_probes = max(max_probes, 1)

        self.size = size
        self.mask = mask
        # pad the static probe bound to a multiple of 4 for jit-cache stability
        self.max_probes = (max_probes + 3) & ~3
        self.t_hi = jnp.asarray(t_hi)
        self.t_lo = jnp.asarray(t_lo)
        self.t_cid = jnp.asarray(t_cid)
        self.t_pos = jnp.asarray(t_pos)
        self.t_strand = jnp.asarray(t_strand)

    @classmethod
    def from_contig_index(cls, index) -> "DeviceIndex":
        """Build from an array-backed index.ContigIndex."""
        index.finalize()
        return cls(
            index.hashes, index.contig_ids, index.positions, index.strands
        )


def hash_table_join(t_hi, t_lo, t_cid, t_pos, t_strand, q_hi, q_lo,
                    mask: int, max_probes: int):
    """Probe the open-addressing table for each query (hi, lo) pair."""
    slot = ((q_lo ^ q_hi) * jnp.uint32(_FIB)) & jnp.uint32(mask)
    slot = slot.astype(jnp.int32)
    found = jnp.zeros(q_hi.shape, jnp.bool_)
    payload = jnp.zeros(q_hi.shape, jnp.int32)
    alive = jnp.ones(q_hi.shape, jnp.bool_)

    def body(_, carry):
        slot, found, payload, alive = carry
        cid = t_cid[slot]
        hit = alive & (cid != -1) & (t_hi[slot] == q_hi) & (t_lo[slot] == q_lo)
        payload = jnp.where(hit, slot, payload)
        found = found | hit
        alive = alive & ~hit & (cid != -1)
        slot = (slot + 1) & mask
        return slot, found, payload, alive

    slot, found, payload, alive = jax.lax.fori_loop(
        0, max_probes, body, (slot, found, payload, alive)
    )
    return found, t_cid[payload], t_pos[payload], t_strand[payload]


def unpack_codes(packed: jnp.ndarray, L: int) -> jnp.ndarray:
    """(B, L//4) 2-bit-packed uint8 -> (B, L) base codes 0..3.

    The optimization_barrier is a fusion fence: letting XLA fuse the
    bit-expand with the minor-dim reshape sends TPU compile time from
    <1 s to minutes at contig-scale L (measured 38 s at L~1M, growing
    with L), while the fenced form compiles in ~0.6 s with no measurable
    runtime cost."""
    B = packed.shape[0]
    shifts = jnp.arange(4, dtype=jnp.uint8) * 2
    expanded = (packed[:, :, None] >> shifts[None, None, :]) & 3
    expanded = jax.lax.optimization_barrier(expanded)
    return expanded.reshape(B, L)


def unpack_bits(packed: jnp.ndarray, L: int) -> jnp.ndarray:
    """(B, L//8) bit-packed uint8 (little bit order, np.packbits
    bitorder='little') -> (B, L) bool. Same fusion fence as unpack_codes."""
    B = packed.shape[0]
    shifts = jnp.arange(8, dtype=jnp.uint8)
    expanded = (packed[:, :, None] >> shifts[None, None, :]) & 1
    expanded = jax.lax.optimization_barrier(expanded)
    return expanded.reshape(B, L).astype(jnp.bool_)


def mapping_step_packed(packed, lengths, t_hi, t_lo, t_cid, t_pos, t_strand,
                        k: int, w: int, L: int, mask: int, max_probes: int,
                        max_anchors: int, use_pallas: bool = False,
                        with_hashes: bool = True, nmask=None):
    """Fused mapping step: unpack -> sketch -> compact minimizers ->
    hash-join -> global anchor compaction. Outputs are O(anchors), not
    O(bases): `meta` = per-read [counts | n_minimizers] (2B,) and `flat` =
    (planes, B*S) with all matched anchors packed front in read order —
    plane 0 read positions (strand bits in bits 29/30), plane 1 contig ids,
    plane 2 contig positions, planes 3/4 hash halves only when
    `with_hashes` (repeat filter). `use_pallas` selects the fused Pallas
    sketch core (TPU only). `nmask` ((B, L//8) bit-packed uint8) batches
    N-containing reads through the compacted-window kernel (reference N
    semantics) instead of the per-read host fallback; requires
    `use_pallas=False`.
    """
    codes = unpack_codes(packed, L)
    if nmask is not None:
        assert not use_pallas, "N batches take the XLA compacted kernel"
        codes = jnp.where(unpack_bits(nmask, L), jnp.uint8(4), codes)
        can_hi, can_lo, fwd, winner, emit = sketch_batch_kernel(
            codes, lengths, k, w, compact_invalid=True
        )
        # fusion fence (same pathology as sketch_step_packed): keep the
        # unrolled hash graph + argsort/gather consumers out of one fusion
        # search — pads reach 2^21 for ultra-long reads
        can_hi, can_lo, fwd, winner, emit = jax.lax.optimization_barrier(
            (can_hi, can_lo, fwd, winner, emit)
        )
    elif use_pallas == "chunked":
        from ..ops.sketch_pallas import sketch_batch_pallas_chunked

        can_hi, can_lo, fwd, winner, emit = sketch_batch_pallas_chunked(
            codes, lengths, k, w
        )
    elif use_pallas:
        from ..ops.sketch_pallas import sketch_batch_pallas

        can_hi, can_lo, fwd, winner, emit = sketch_batch_pallas(
            codes, lengths, k, w, False
        )
    else:
        can_hi, can_lo, fwd, winner, emit = sketch_batch_kernel(
            codes, lengths, k, w
        )

    # compact selected minimizers (order-preserving): ~2L/w of L-k+1 windows
    B, NW = emit.shape
    sel = jnp.argsort(~emit, axis=1, stable=True)[:, :max_anchors]
    sel_ok = jnp.take_along_axis(emit, sel, axis=1)
    m_pos = jnp.take_along_axis(winner, sel, axis=1)
    q_hi = jnp.take_along_axis(can_hi, jnp.maximum(m_pos, 0), axis=1)
    q_lo = jnp.take_along_axis(can_lo, jnp.maximum(m_pos, 0), axis=1)
    # reported hash on the compacted set only (the kernels return canonical)
    q_hi, q_lo = finish_hash(q_hi, q_lo, k)
    m_fwd = jnp.take_along_axis(fwd, jnp.maximum(m_pos, 0), axis=1)

    found, cid, cpos, cstrand = hash_table_join(
        t_hi, t_lo, t_cid, t_pos, t_strand, q_hi, q_lo, mask, max_probes
    )
    found = found & sel_ok
    n_minimizers = emit.sum(axis=1).astype(jnp.int32)
    count = found.sum(axis=1).astype(jnp.int32)

    # Global (whole-batch) anchor compaction: every matched anchor, in
    # row-major read order, packed to the front of ONE flat tensor. The
    # host slices it to the exact total anchor count, so the D2H transfer
    # is O(total anchors) bytes — the link (not the chip) is the scarce
    # resource here. Stable argsort over the flattened mask preserves
    # both read order and within-read anchor order.
    order_flat = jnp.argsort(~found.reshape(-1), stable=True)
    takef = lambda a: a.reshape(-1)[order_flat]
    # strand bits ride in the read-position word (positions < 2^21)
    rpos_packed = (
        m_pos
        | (cstrand.astype(jnp.int32) << 29)
        | (m_fwd.astype(jnp.int32) << 30)
    )
    planes = [takef(rpos_packed), takef(cid), takef(cpos)]
    if with_hashes:
        planes += [takef(q_hi).astype(jnp.int32), takef(q_lo).astype(jnp.int32)]
    flat = jnp.stack(planes, axis=0)  # (3|5, B*S) int32
    return {
        # tiny per-row metadata in one tensor: async-prefetched at dispatch
        "meta": jnp.concatenate([count, n_minimizers]),
        "flat": flat,
        "n_anchors": found.sum(),
    }


def sketch_step_packed(packed, lengths, k: int, w: int, L: int, max_mins: int,
                       use_pallas: bool = False, nmask=None):
    """Sketch-only fused step: unpack -> hash -> window-min -> global
    compaction (same output contract as the mapping step: `meta` =
    [counts | n_minimizers] and `flat` = (3, B*S) int32 planes
    [position+strand, hash_hi, hash_lo] packed front in row order).
    Transfers are O(minimizers); powers the indexlr-equivalent contig TSV
    sketching at scale. `use_pallas` selects the fused Pallas sketch core
    (TPU only, same gating as the mapping step).

    `nmask` (optional, (B, L//8) bit-packed uint8) marks non-ACGT bases for
    batches of N-containing rows (draft scaffolds are full of N gaps — the
    primary input of rounds >= 2). Those batches take the compacted-window
    kernel (reference N semantics: windows of w consecutive *valid* k-mers
    spanning gaps) on the XLA lowering; `use_pallas` must be False.
    """
    codes = unpack_codes(packed, L)
    if nmask is not None:
        assert not use_pallas, "N batches take the XLA compacted kernel"
        # sentinel 4 re-materializes the non-ACGT positions the 2-bit
        # packing cannot carry; the kernel invalidates k-mers covering them
        codes = jnp.where(unpack_bits(nmask, L), jnp.uint8(4), codes)
        can_hi, can_lo, fwd, winner, emit = sketch_batch_kernel(
            codes, lengths, k, w, compact_invalid=True
        )
        can_hi, can_lo, fwd, winner, emit = jax.lax.optimization_barrier(
            (can_hi, can_lo, fwd, winner, emit)
        )
    elif use_pallas == "chunked":
        from ..ops.sketch_pallas import sketch_batch_pallas_chunked

        can_hi, can_lo, fwd, winner, emit = sketch_batch_pallas_chunked(
            codes, lengths, k, w
        )
    elif use_pallas:
        from ..ops.sketch_pallas import sketch_batch_pallas

        can_hi, can_lo, fwd, winner, emit = sketch_batch_pallas(
            codes, lengths, k, w, False
        )
    else:
        can_hi, can_lo, fwd, winner, emit = sketch_batch_kernel(
            codes, lengths, k, w
        )
        # fusion fence: without it XLA's fusion search across the unrolled
        # hash graph x the gather/sort consumers takes minutes of compile
        # time at contig-scale L (352 s measured at L=2^20 vs 1.6 s for
        # the kernel alone)
        can_hi, can_lo, fwd, winner, emit = jax.lax.optimization_barrier(
            (can_hi, can_lo, fwd, winner, emit)
        )
    sel = jnp.argsort(~emit, axis=1, stable=True)[:, :max_mins]
    sel_ok = jnp.take_along_axis(emit, sel, axis=1)
    m_pos = jnp.take_along_axis(winner, sel, axis=1)
    gather = lambda a: jnp.take_along_axis(a, jnp.maximum(m_pos, 0), axis=1)
    out_hi, out_lo = finish_hash(gather(can_hi), gather(can_lo), k)
    # strand rides in bit 30 of the position word (positions < 2^21)
    pos_strand = m_pos | (gather(fwd).astype(jnp.int32) << 30)
    count = jnp.minimum(emit.sum(axis=1), max_mins).astype(jnp.int32)
    order_flat = jnp.argsort(~sel_ok.reshape(-1), stable=True)
    takef = lambda a: a.reshape(-1)[order_flat]
    flat = jnp.stack(
        [
            takef(pos_strand),
            takef(out_hi.astype(jnp.int32)),
            takef(out_lo.astype(jnp.int32)),
        ],
        axis=0,
    )
    return {
        "meta": jnp.concatenate(
            [count, emit.sum(axis=1).astype(jnp.int32)]
        ),
        "flat": flat,
    }


def mapping_step(codes, lengths, idx_hi, idx_lo, idx_cid, idx_pos, idx_strand,
                 k: int, w: int):
    """Compatibility wrapper over unpacked codes with a sorted-array index.

    Used by the graft entry; production path is mapping_step_packed.
    """
    can_hi, can_lo, fwd, winner, emit = sketch_batch_kernel(codes, lengths, k, w)
    w_hi = jnp.take_along_axis(can_hi, winner, axis=1)
    w_lo = jnp.take_along_axis(can_lo, winner, axis=1)
    w_hi, w_lo = finish_hash(w_hi, w_lo, k)
    pos, found = lex_binary_search(idx_hi, idx_lo, w_hi, w_lo, idx_hi.shape[0])
    found = found & emit
    return {
        "found": found,
        "anchor_cid": jnp.where(found, idx_cid[pos], -1),
        "anchor_pos": jnp.where(found, idx_pos[pos], -1),
        "anchor_strand": jnp.where(found, idx_strand[pos], False),
        "winner": winner,
        "n_anchors": found.sum(),
    }


def lex_binary_search(idx_hi, idx_lo, q_hi, q_lo, n: int):
    """Vectorized lower-bound search of (hi, lo) query pairs in a sorted
    (hi, lo) table (kept for the compatibility wrapper + tests)."""
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


class SortedDeviceIndex:
    """Sorted (hi, lo) arrays — used by the compatibility mapping_step."""

    def __init__(self, hashes, contig_ids, positions, strands):
        order = np.argsort(hashes, kind="stable")
        h = hashes[order]
        self.hi = jnp.asarray((h >> np.uint64(32)).astype(np.uint32))
        self.lo = jnp.asarray((h & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        self.contig_ids = jnp.asarray(contig_ids[order].astype(np.int32))
        self.positions = jnp.asarray(positions[order].astype(np.int32))
        self.strands = jnp.asarray(strands[order])


def pack_codes(codes: np.ndarray) -> np.ndarray:
    """(B, L) base codes (0..3; L % 4 == 0) -> (B, L//4) packed uint8."""
    B, L = codes.shape
    c = codes.reshape(B, L // 4, 4)
    out = c[:, :, 3] << 6
    out |= c[:, :, 2] << 4
    out |= c[:, :, 1] << 2
    out |= c[:, :, 0]
    return out


def make_sharded_mapping_step(mesh: Mesh, k: int, w: int, L: int,
                              mask: int, max_probes: int, max_anchors: int,
                              with_hashes: bool = True):
    """jit the packed mapping step with batch rows sharded over the data
    axis and the table replicated; XLA inserts the collectives."""
    data_sharding = NamedSharding(mesh, P("data", None))
    repl = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        static_argnums=(7, 8, 9, 10, 11, 12, 13),
        in_shardings=(
            data_sharding, NamedSharding(mesh, P("data")),
            repl, repl, repl, repl, repl,
        ),
    )
    def step(packed, lengths, t_hi, t_lo, t_cid, t_pos, t_strand,
             k_, w_, L_, mask_, probes_, anchors_, with_hashes_):
        return mapping_step_packed(
            packed, lengths, t_hi, t_lo, t_cid, t_pos, t_strand,
            k_, w_, L_, mask_, probes_, anchors_, with_hashes=with_hashes_,
        )

    @functools.partial(
        jax.jit,
        static_argnums=(8, 9, 10, 11, 12, 13, 14),
        in_shardings=(
            data_sharding, NamedSharding(mesh, P("data")),
            repl, repl, repl, repl, repl, data_sharding,
        ),
    )
    def step_n(packed, lengths, t_hi, t_lo, t_cid, t_pos, t_strand, nmask,
               k_, w_, L_, mask_, probes_, anchors_, with_hashes_):
        # N batch: rows shard like the code rows; compacted-window kernel
        return mapping_step_packed(
            packed, lengths, t_hi, t_lo, t_cid, t_pos, t_strand,
            k_, w_, L_, mask_, probes_, anchors_, with_hashes=with_hashes_,
            nmask=nmask,
        )

    def run(packed, lengths, didx, nmask=None):
        if nmask is None:
            return step(
                packed, lengths, didx.t_hi, didx.t_lo, didx.t_cid,
                didx.t_pos, didx.t_strand, k, w, L, mask, max_probes,
                max_anchors, with_hashes,
            )
        return step_n(
            packed, lengths, didx.t_hi, didx.t_lo, didx.t_cid, didx.t_pos,
            didx.t_strand, nmask, k, w, L, mask, max_probes, max_anchors,
            with_hashes,
        )

    return run


def dryrun(n_devices: int, k: int = 32, w: int = 100) -> None:
    """Compile + execute one sharded mapping step on an n-device mesh with a
    tiny synthetic batch; validates the multi-chip path end to end."""
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
    mesh = make_mesh(n_devices)
    step = make_sharded_mapping_step(
        mesh, k, w, L, didx.mask, didx.max_probes, 256
    )
    out = step(
        jnp.asarray(pack_codes(codes)), jnp.asarray(lengths), didx
    )
    jax.block_until_ready(out)
    n_anchors = int(out["n_anchors"])
    assert n_anchors >= len(mins), "sharded join lost anchors"

    # N-batch variant: plant an N run in every row; the compacted-window
    # kernel must compile + run under the same shardings and still find
    # the anchors outside the gap
    bad = np.zeros((B, L), dtype=bool)
    bad[:, 700:760] = True
    codes_n = np.where(bad, 0, codes).astype(np.uint8)
    nmask = np.packbits(bad, axis=1, bitorder="little")
    out_n = step(
        jnp.asarray(pack_codes(codes_n)), jnp.asarray(lengths), didx,
        jnp.asarray(nmask),
    )
    jax.block_until_ready(out_n)
    assert int(out_n["n_anchors"]) > 0, "sharded N join found no anchors"
