"""JAX device backend for minimizer sketching.

TPUs have no native 64-bit integer datapath, so every 64-bit hash lives as a
uint32 (hi, lo) pair; the ntHash2 srol powers are precomputed host-side into
(k, 5) uint32 tables (see ops.nthash_np), making the device kernel pure
gather + XOR + carry arithmetic on the VPU:

    fh/rh:    k table-gathers + XORs per k-mer position (unrolled, static k)
    canon:    64-bit add with carry
    out:      64-bit multiply by a constant via 16-bit limbs, xorshift
    win-min:  O(log w) log-doubling sliding minimum over the lexicographic
              key (valid, hi, lo, position), leftmost tie-break
    dedup:    consecutive-winner mask

Batches are (B, L) uint8 code tensors padded with 4 (= invalid base); padding
and k-mers containing N are masked invalid. Sequences containing interior N
need btllib's windows-over-valid-kmers semantics, which is a compaction — the
host routes those (rare) reads to the NumPy backend instead.

The same jitted function drives single-chip and, via `shard_map` over a data
axis (parallel.mesh), multi-chip execution.
"""
from __future__ import annotations

import functools
from typing import Dict, Iterable, Iterator, List, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from . import nthash_np
from .nthash_np import Minimizers

MULTISHIFT = 27


@functools.lru_cache(maxsize=None)
def _tables_u32(k: int):
    """srol tables as uint32 (hi, lo) pairs, shape (k, 5) each."""
    fwd, rev = nthash_np.srol_tables(k)
    split = lambda t: (
        (t >> np.uint64(32)).astype(np.uint32),
        (t & np.uint64(0xFFFFFFFF)).astype(np.uint32),
    )
    f_hi, f_lo = split(fwd)
    r_hi, r_lo = split(rev)
    return f_hi, f_lo, r_hi, r_lo


@functools.lru_cache(maxsize=None)
def _mult_limbs(k: int) -> np.ndarray:
    """Out-hash multiplier decomposed into 4 uint32-held 16-bit limbs."""
    m = int(nthash_np.out_hash_multiplier(k))
    return np.array(
        [(m >> (16 * i)) & 0xFFFF for i in range(4)], dtype=np.uint32
    )


def mul64_const(hi: jnp.ndarray, lo: jnp.ndarray, limbs: np.ndarray):
    """(hi, lo) * constant (mod 2^64), exact, uint32 lanes only.

    Strategy: 16-bit limbs give products < 2^32. Accumulate per 16-bit
    column in uint32, propagating carries column to column; a column gets at
    most 4 products plus an incoming carry, so the uint32 accumulator would
    overflow — instead fold each product's high half into the next column
    immediately, keeping every accumulator < 2^32.
    """
    a = [lo & 0xFFFF, lo >> 16, hi & 0xFFFF, hi >> 16]
    b = [int(x) for x in limbs]
    cols = [jnp.zeros_like(lo) for _ in range(5)]
    for i in range(4):
        for j in range(4 - i):
            p = a[i] * jnp.uint32(b[j])  # < 2^32, exact
            c = i + j
            cols[c] = cols[c] + (p & 0xFFFF)
            if c + 1 < 5:
                cols[c + 1] = cols[c + 1] + (p >> 16)
    # carry-propagate (each col now < 4*2^16 + carries, fits easily)
    out = []
    carry = jnp.zeros_like(lo)
    for c in range(4):
        v = cols[c] + carry
        out.append(v & 0xFFFF)
        carry = v >> 16
    new_lo = out[0] | (out[1] << 16)
    new_hi = out[2] | (out[3] << 16)
    return new_hi, new_lo


def _lex_lt(a_hi, a_lo, a_idx, b_hi, b_lo, b_idx):
    """(hi, lo, idx) lexicographic strictly-less (uint32 lanes)."""
    return (
        (a_hi < b_hi)
        | ((a_hi == b_hi) & (a_lo < b_lo))
        | ((a_hi == b_hi) & (a_lo == b_lo) & (a_idx < b_idx))
    )


def _shift_left(arr, o, fill):
    """arr[..., i] -> arr[..., i+o], tail filled."""
    return jnp.concatenate(
        [arr[..., o:], jnp.full(arr.shape[:-1] + (o,), fill, arr.dtype)], axis=-1
    )


@functools.partial(jax.jit, static_argnums=(2, 3))
def sketch_batch_kernel(codes: jnp.ndarray, lengths: jnp.ndarray, k: int, w: int):
    """Sketch a (B, L) uint8 code batch. Returns per-position hash data and
    per-window winners:

      out_hi/out_lo: (B, M) reported hash halves
      fwd:           (B, M) strand flags (fh <= rh)
      winner:        (B, NW) leftmost argmin position of each window
      emit:          (B, NW) mask: winner differs from previous window's
    """
    B, L = codes.shape
    M = L - k + 1
    f_hi_t, f_lo_t, r_hi_t, r_lo_t = _tables_u32(k)
    f_hi_t, f_lo_t = jnp.asarray(f_hi_t), jnp.asarray(f_lo_t)
    r_hi_t, r_lo_t = jnp.asarray(r_hi_t), jnp.asarray(r_lo_t)

    codes_i = codes.astype(jnp.int32)

    def hash_body(j, acc):
        fh_hi, fh_lo, rh_hi, rh_lo, invalid = acc
        win = jax.lax.dynamic_slice_in_dim(codes_i, j, M, axis=1)
        return (
            fh_hi ^ f_hi_t[j][win],
            fh_lo ^ f_lo_t[j][win],
            rh_hi ^ r_hi_t[j][win],
            rh_lo ^ r_lo_t[j][win],
            invalid | (win > 3),
        )

    zeros = jnp.zeros((B, M), jnp.uint32)
    fh_hi, fh_lo, rh_hi, rh_lo, invalid = jax.lax.fori_loop(
        0, k, hash_body,
        (zeros, zeros, zeros, zeros, jnp.zeros((B, M), jnp.bool_)),
    )

    # canonical = fh + rh (mod 2^64)
    can_lo = fh_lo + rh_lo
    carry = (can_lo < fh_lo).astype(jnp.uint32)
    can_hi = fh_hi + rh_hi + carry

    # reported hash: second multi-hash
    t_hi, t_lo = mul64_const(can_hi, can_lo, _mult_limbs(k))
    sh = MULTISHIFT
    out_hi = t_hi ^ (t_hi >> sh)
    out_lo = t_lo ^ ((t_lo >> sh) | (t_hi << (32 - sh)))

    fwd = (fh_hi < rh_hi) | ((fh_hi == rh_hi) & (fh_lo <= rh_lo))

    # mask out k-mers beyond each sequence's end
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, M), 1)
    invalid = invalid | (pos > (lengths - k)[:, None])

    FULL = jnp.uint32(0xFFFFFFFF)
    key_hi = jnp.where(invalid, FULL, can_hi)
    key_lo = jnp.where(invalid, FULL, can_lo)

    # sliding leftmost-argmin via log-doubling over (key, idx)
    m_hi, m_lo, m_idx = key_hi, key_lo, pos
    span = 1
    while span * 2 <= w:
        o = span
        s_hi = _shift_left(m_hi, o, 0xFFFFFFFF)
        s_lo = _shift_left(m_lo, o, 0xFFFFFFFF)
        s_idx = _shift_left(m_idx, o, jnp.iinfo(jnp.int32).max)
        take = _lex_lt(s_hi, s_lo, s_idx.astype(jnp.uint32),
                       m_hi, m_lo, m_idx.astype(jnp.uint32))
        m_hi = jnp.where(take, s_hi, m_hi)
        m_lo = jnp.where(take, s_lo, m_lo)
        m_idx = jnp.where(take, s_idx, m_idx)
        span *= 2
    o = w - span
    NW = M - w + 1
    a_hi, a_lo, a_idx = m_hi[:, :NW], m_lo[:, :NW], m_idx[:, :NW]
    b_hi, b_lo, b_idx = (
        m_hi[:, o : o + NW],
        m_lo[:, o : o + NW],
        m_idx[:, o : o + NW],
    )
    take = _lex_lt(b_hi, b_lo, b_idx.astype(jnp.uint32),
                   a_hi, a_lo, a_idx.astype(jnp.uint32))
    winner = jnp.where(take, b_idx, a_idx)
    win_valid = jnp.where(take, b_hi, a_hi) != FULL

    prev = jnp.concatenate(
        [jnp.full((B, 1), -1, winner.dtype), winner[:, :-1]], axis=1
    )
    # a window is fully valid only if it fits inside the sequence
    n_win = jnp.maximum(lengths - k + 1 - w + 1, 0)
    wpos = jax.lax.broadcasted_iota(jnp.int32, (B, NW), 1)
    emit = (winner != prev) & (wpos < n_win[:, None]) & win_valid
    return out_hi, out_lo, fwd, winner, emit


def _trim_width(mc: int) -> int:
    """Column width for trimmed transfers: next power of two. Every
    distinct width is a fresh device-slice compile (~0.4 s over the
    tunnel), so a handful of reusable shapes beats byte-tight trims."""
    mc = max(1, mc)
    p = 1
    while p < mc:
        p <<= 1
    return p


@functools.lru_cache(maxsize=1)
def _sketch_step():
    """Module-level jitted compacted sketch step (shared compile cache)."""
    from ..jax_setup import configure

    configure()
    from ..parallel.mesh import sketch_step_packed

    @functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
    def step(packed, lengths, k, w, L, max_mins):
        return sketch_step_packed(packed, lengths, k, w, L, max_mins)

    return step


class JaxSketcher:
    """Batched device sketcher with NumPy fallback for N-containing reads.

    Uses the compacted sketch step: device->host transfers are
    O(minimizers), not O(bases) — essential over slow links and at
    assembly scale.
    """

    #: padded length buckets (powers of two keep the jit cache tiny)
    MIN_PAD = 1 << 10
    MAX_PAD = 1 << 21
    MAX_SLOTS = 1 << 17

    def __init__(self, batch_bases: int = 16_000_000):
        self.batch_bases = batch_bases

    def _pad_len(self, n: int) -> int:
        p = self.MIN_PAD
        while p < n and p < self.MAX_PAD:
            p <<= 1
        return p

    def _slots_for(self, L: int, w: int) -> int:
        want = int(2.5 * L / (w + 1)) + 64
        s = 128
        while s < want and s < self.MAX_SLOTS:
            s <<= 1
        return s

    def sketch_stream(
        self,
        named_seqs: Iterable[Tuple[str, str]],
        k: int,
        w: int,
    ) -> Iterator[Tuple[str, int, Minimizers]]:
        """Yield (name, length, Minimizers) in input order, batching
        same-bucket sequences onto the device (pipelined flushes)."""
        from ..native import fastx_module
        from ..parallel.mesh import pack_codes

        native = fastx_module()
        step = _sketch_step()

        pending: List[Tuple[str, int]] = []   # (name, length)
        results: Dict[int, Minimizers] = {}
        encoded: Dict[int, np.ndarray] = {}
        buckets: Dict[int, List[int]] = {}
        in_flight: List[tuple] = []

        def bucket_rows(pad: int) -> int:
            b = 1
            while b < max(1, self.batch_bases // pad):
                b <<= 1
            return b

        def flush_bucket(pad: int, idxs: List[int]) -> None:
            B = bucket_rows(pad)
            assert len(idxs) <= B
            row_codes = [encoded.pop(i) for i in idxs]
            lengths = np.zeros(B, dtype=np.int32)
            lengths[: len(idxs)] = [len(c) for c in row_codes]
            if native is not None:
                buf = native.pack_batch(row_codes, pad)
                packed = np.frombuffer(buf, dtype=np.uint8).reshape(-1, pad // 4)
                if packed.shape[0] < B:
                    packed = np.vstack(
                        [packed, np.zeros((B - packed.shape[0], pad // 4), np.uint8)]
                    )
            else:
                codes = np.zeros((B, pad), dtype=np.uint8)
                for row, c in enumerate(row_codes):
                    codes[row, : len(c)] = c
                packed = pack_codes(codes)
            out = step(
                jnp.asarray(packed), jnp.asarray(lengths), k, w, pad,
                self._slots_for(pad, w),
            )
            in_flight.append((out, dict(enumerate(idxs)), row_codes))
            if len(in_flight) > 1:
                drain(*in_flight.pop(0))

        def drain(out, rows, row_codes) -> None:
            count = np.asarray(out["count"])
            n_mins = np.asarray(out["n_minimizers"])
            slots = int(out["mins"].shape[2])
            mc = min(slots, _trim_width(int(count.max())))
            mins = np.asarray(out["mins"][:, :, :mc])
            for row, i in rows.items():
                n = int(count[row])
                if n_mins[row] > slots:
                    results[i] = nthash_np.sketch_codes(row_codes[row], k, w)
                    continue
                m = mins[row]
                hashes = (
                    (m[1, :n].view(np.uint32).astype(np.uint64) << np.uint64(32))
                    | m[2, :n].view(np.uint32).astype(np.uint64)
                )
                pos_strand = m[0, :n]
                results[i] = Minimizers(
                    hashes,
                    (pos_strand & 0x3FFFFFFF).astype(np.int64),
                    (pos_strand >> 30).astype(bool),
                )

        def flush_all():
            for pad, idxs in list(buckets.items()):
                if idxs:
                    flush_bucket(pad, idxs)
            buckets.clear()
            while in_flight:
                drain(*in_flight.pop(0))
            for i, (name, length) in enumerate(pending):
                yield name, length, results[i]
            pending.clear()
            results.clear()

        budget = 0
        for name, seq in named_seqs:
            i = len(pending)
            pending.append((name, len(seq)))
            codes = (
                seq if isinstance(seq, np.ndarray) else nthash_np.encode(seq)
            )
            if len(codes) < k or len(codes) > self.MAX_PAD or (codes > 3).any():
                # numpy path: short, N-containing, or oversized sequences
                results[i] = nthash_np.sketch_codes(codes, k, w)
                continue
            encoded[i] = codes
            pad = self._pad_len(len(codes))
            bucket = buckets.setdefault(pad, [])
            bucket.append(i)
            if len(bucket) >= bucket_rows(pad):
                flush_bucket(pad, bucket)
                buckets[pad] = []
            budget += pad
            if budget >= 4 * self.batch_bases:
                yield from flush_all()
                budget = 0
        yield from flush_all()
