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


#: slots >= entries / TABLE_LOAD (pow2-rounded). 0.25 keeps linear-probe
#: clusters short: the static probe bound (hence the join's gather volume,
#: its dominant cost) roughly halves vs load 0.5, for 2x the table bytes —
#: ~4.3 GB at human scale (59 M minimizers), well inside one v5e's HBM.
TABLE_LOAD = 0.25


class DeviceIndex:
    """Replicated contig-minimizer hash table for on-device joins.

    Open addressing, linear probing, load factor <= TABLE_LOAD. The device
    copy is ONE row-packed (size, 4) uint32 tensor [hash_hi, hash_lo,
    cid_strand, pos] so each probe gathers one contiguous 16 B row instead
    of 3 scattered 4 B words — random 4 B gathers waste most of an HBM
    transaction, and the join's gather volume is the mapping step's
    dominant cost (measured: 253 ms -> ~60 ms per 1024-read batch).
    `cid_strand` = (cid + 1) << 1 | strand; 0 marks an empty slot.
    `max_probes` is the longest probe chain observed at build time (static
    gather width on device).
    """

    def __init__(self, hashes: np.ndarray, contig_ids: np.ndarray,
                 positions: np.ndarray, strands: np.ndarray,
                 load: float = TABLE_LOAD):
        n = int(hashes.shape[0])
        self._build_gpos(contig_ids, positions, n)
        size = 1
        while size < max(int(n / load), 16):
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
        # one slot and retry. Rounds ~ longest cluster.
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
        self.t_rows = jnp.asarray(pack_table_rows(
            t_hi, t_lo, t_cid, t_pos, t_strand
        ))

    def _build_gpos(self, contig_ids, positions, n) -> None:
        self.host_offsets, self.pack_gpos, self.t_off = build_gpos_offsets(
            contig_ids, positions, n
        )

    def decode_gpos(self, gplane: np.ndarray):
        """Invert the on-device packing: int32 plane -> (cid, cpos)."""
        gpos = gplane.view(np.uint32).astype(np.int64)
        idx = np.searchsorted(self.host_offsets, gpos, side="right") - 1
        return (
            idx.astype(np.int32),
            (gpos - self.host_offsets[idx]).astype(np.int32),
        )

    @classmethod
    def from_contig_index(cls, index) -> "DeviceIndex":
        """Build from an array-backed index.ContigIndex."""
        index.finalize()
        return cls(
            index.hashes, index.contig_ids, index.positions, index.strands
        )


def pack_table_rows(t_hi, t_lo, t_cid, t_pos, t_strand) -> np.ndarray:
    """Stack the five build-time table planes into (size, 4) uint32 rows
    [hash_hi, hash_lo, (cid+1)<<1 | strand, pos]; empty slots get row[2]=0."""
    cs = np.where(
        t_cid >= 0,
        ((t_cid.astype(np.int64) + 1) << 1).astype(np.uint32)
        | t_strand.astype(np.uint32),
        np.uint32(0),
    ).astype(np.uint32)
    return np.stack(
        [t_hi, t_lo, cs, t_pos.astype(np.uint32)], axis=1
    )


def build_gpos_offsets(contig_ids: np.ndarray, positions: np.ndarray, n: int):
    """Global-position packing metadata (D2H payload compression).

    Anchors leave the chip as ONE uint32 plane `gpos = off[cid] + cpos`
    instead of two int32 planes (cid, cpos) — a 33% cut of the dominant
    D2H payload. `off` assigns each contig a span covering every indexed
    position (max pos + 1 suffices: anchors only ever carry positions that
    exist in the table). The host inverts with one vectorized searchsorted
    (DeviceIndex.decode_gpos). Packing is disabled (pack=False, 3-plane
    layout) when the total span exceeds uint32 — beyond ~4.3 Gbase of
    indexed contig span.

    Returns (host_offsets int64 (n_contigs+1,), pack: bool, t_off: device
    uint32 (n_contigs,) or None).
    """
    n_ctg = int(contig_ids.max()) + 1 if n else 1
    spans = np.zeros(n_ctg, np.int64)
    if n:
        np.maximum.at(spans, contig_ids, positions.astype(np.int64) + 1)
    offsets = np.zeros(n_ctg + 1, np.int64)
    np.cumsum(spans, out=offsets[1:])
    pack = bool(offsets[-1] <= 0xFFFFFFFF)
    t_off = jnp.asarray(offsets[:-1].astype(np.uint32)) if pack else None
    return offsets, pack, t_off


def hash_table_join(t_rows, q_hi, q_lo, mask: int, max_probes: int):
    """Probe the row-packed open-addressing table for each (hi, lo) query.

    All `max_probes` candidate slots are gathered AT ONCE (one gather of
    contiguous 16 B rows) and reduced, instead of a fori_loop of probe
    rounds: the sequential loop makes every round's gathers data-depend on
    the previous one, and 3 scattered 4 B gathers per probe waste most of
    each HBM transaction — together measured as the dominant cost of the
    whole mapping step (~250 of 266 ms per 1024-read batch in the loop
    form).

    Linear-probe semantics are preserved exactly: a hit at probe p counts
    iff slots 0..p are all occupied (probing stops at the first empty
    slot), and the first such hit wins.
    """
    q_shape = q_hi.shape
    slot0 = (((q_lo ^ q_hi) * jnp.uint32(_FIB)) & jnp.uint32(mask)).astype(
        jnp.int32
    )
    probes = jnp.arange(max_probes, dtype=jnp.int32)
    slots = (slot0[..., None] + probes) & mask  # (..., P)
    rows = t_rows[slots]                        # (..., P, 4) one row gather
    occupied = rows[..., 2] != 0
    match = (
        occupied
        & (rows[..., 0] == q_hi[..., None])
        & (rows[..., 1] == q_lo[..., None])
    )
    # valid iff no empty slot at or before this probe (occupied cancels the
    # inclusive cumsum term, so a hit's own slot never disqualifies it)
    before_empty = jnp.cumsum((~occupied).astype(jnp.int32), axis=-1) == 0
    hit = match & before_empty
    found = hit.any(axis=-1)
    first = jnp.argmax(hit, axis=-1)[..., None]
    cs = jnp.take_along_axis(rows[..., 2], first, axis=-1).reshape(q_shape)
    pos = jnp.take_along_axis(rows[..., 3], first, axis=-1).reshape(q_shape)
    cid = (cs >> 1).astype(jnp.int32) - 1  # -1 when not found (cs == 0)
    return found, cid, pos.astype(jnp.int32), (cs & 1).astype(jnp.bool_)


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


def mapping_step_packed(packed, lengths, t_rows,
                        k: int, w: int, L: int, mask: int, max_probes: int,
                        max_anchors: int, use_pallas: bool = False,
                        with_hashes: bool = True, nmask=None, t_off=None):
    """Fused mapping step: unpack -> sketch -> compact minimizers ->
    hash-join -> global anchor compaction. Outputs are O(anchors), not
    O(bases): `meta` = per-read [counts | n_minimizers] (2B,) and `flat` =
    (planes, B*S) with all matched anchors packed front in read order —
    plane 0 read positions (strand bits in bits 29/30), then EITHER one
    packed global-position plane `off[cid] + cpos` (when `t_off`, the
    per-contig uint32 offset table, is given — DeviceIndex.pack_gpos) OR
    two planes (contig ids, contig positions); hash-half planes follow only
    when `with_hashes` (repeat filter). `use_pallas` selects the fused
    Pallas sketch core (TPU only). `nmask` ((B, L//8) bit-packed uint8)
    batches N-containing reads through the compacted-window kernel
    (reference N semantics) instead of the per-read host fallback; requires
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
        t_rows, q_hi, q_lo, mask, max_probes
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
    if t_off is not None:
        gpos = t_off[jnp.maximum(cid, 0)] + cpos.astype(jnp.uint32)
        gplane = jax.lax.bitcast_convert_type(gpos, jnp.int32)
        planes = [takef(rpos_packed), takef(gplane)]
    else:
        planes = [takef(rpos_packed), takef(cid), takef(cpos)]
    if with_hashes:
        planes += [takef(q_hi).astype(jnp.int32), takef(q_lo).astype(jnp.int32)]
    flat = jnp.stack(planes, axis=0)  # (2..5, B*S) int32
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
        static_argnums=(4, 5, 6, 7, 8, 9, 10, 11),
        in_shardings=(
            data_sharding, NamedSharding(mesh, P("data")), repl, repl,
        ),
    )
    def step(packed, lengths, t_rows, t_off,
             k_, w_, L_, mask_, probes_, anchors_, with_hashes_, pack_gpos_):
        return mapping_step_packed(
            packed, lengths, t_rows,
            k_, w_, L_, mask_, probes_, anchors_, with_hashes=with_hashes_,
            t_off=t_off if pack_gpos_ else None,
        )

    @functools.partial(
        jax.jit,
        static_argnums=(5, 6, 7, 8, 9, 10, 11, 12),
        in_shardings=(
            data_sharding, NamedSharding(mesh, P("data")), repl, repl,
            data_sharding,
        ),
    )
    def step_n(packed, lengths, t_rows, t_off, nmask,
               k_, w_, L_, mask_, probes_, anchors_, with_hashes_,
               pack_gpos_):
        # N batch: rows shard like the code rows; compacted-window kernel
        return mapping_step_packed(
            packed, lengths, t_rows,
            k_, w_, L_, mask_, probes_, anchors_, with_hashes=with_hashes_,
            nmask=nmask, t_off=t_off if pack_gpos_ else None,
        )

    def run(packed, lengths, didx, nmask=None):
        t_off = getattr(didx, "t_off", None)
        pack = t_off is not None
        if not pack:  # dummy replicated operand; unused under pack_gpos_=False
            t_off = jnp.zeros(1, jnp.uint32)
        if nmask is None:
            return step(
                packed, lengths, didx.t_rows, t_off, k, w, L, mask,
                max_probes, max_anchors, with_hashes, pack,
            )
        return step_n(
            packed, lengths, didx.t_rows, t_off, nmask, k, w, L, mask,
            max_probes, max_anchors, with_hashes, pack,
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
