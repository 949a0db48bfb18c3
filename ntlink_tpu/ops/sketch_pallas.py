"""Pallas TPU kernel: fused ntHash2 sketch + sliding window minimum.

One kernel fuses the whole sketch step — per-position forward/reverse hashes
(uint32 pairs), canonical sum, and the log-doubling sliding minimum with
leftmost tie-break — per grid step an (ROWS, L) row tile lives entirely in
VMEM, so HBM sees exactly one read of the codes and one write per output.

Key TPU mappings (shared math lives in ops.sketch_jax):
- hashes via **log-doubling sliding XOR** (sketch_jax.sliding_hashes):
  F_2s(i) = srol^s(F_s(i)) ^ F_s(i+s), so a width-k hash costs O(log k)
  whole-row ops instead of an O(k) seed-select loop; srol powers are
  constant split-rotations on unpacked (hi31, bit32, lo32) planes,
- the kernel returns **canonical** hash planes; the reported hash
  (constant 64-bit multiply + xorshift, a bijection) is applied by
  consumers after minimizer compaction on O(minimizers) elements
  (sketch_jax.finish_hash),
- lane shifts are raw circular pltpu.roll calls with **no fill masking**:
  wrapped values only ever pollute positions > L-k (hash) and >= L-w+1
  (window minimum), both strictly beyond the consumed/valid output regions,
- the sliding argmin needs no index tie-break comparisons: every combine
  merges a left range with a right range, so keep-left-on-ties IS the
  leftmost rule,
- everything is uint32/int32; no 64-bit integers exist on the datapath.

Scope: N-free rows (the production packed path guarantees this; N-containing
reads batch on-device through the XLA compacted-window kernel,
sketch_jax.sketch_batch_kernel(compact_invalid=True)), L a multiple of 128,
k-mer validity purely positional. Bit-exact against the NumPy reference
backend (tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sketch_jax import _lex_lt2, sliding_hashes

ROWS = 8  # row tile (sublane dimension)


def _sketch_core(codes, lengths, k: int, w: int, L: int):
    """Shared kernel math on VALUES: per-position canonical hashes +
    log-doubling sliding leftmost-argmin. Returns (can_hi, can_lo, fwd,
    winner, win_hi) as (ROWS, L) planes."""
    FULL = jnp.uint32(0xFFFFFFFF)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, L), 1)

    roll_l = lambda p, o: pltpu.roll(p, L - o, 1) if o else p
    fh_hi, fh_lo, rh_hi, rh_lo = sliding_hashes(codes, k, roll_l)

    can_lo = fh_lo + rh_lo
    carry = (can_lo < fh_lo).astype(jnp.uint32)
    can_hi = fh_hi + rh_hi + carry

    fwd = (fh_hi < rh_hi) | ((fh_hi == rh_hi) & (fh_lo <= rh_lo))

    invalid = lane > (lengths - k)
    key_hi = jnp.where(invalid, FULL, can_hi)
    key_lo = jnp.where(invalid, FULL, can_lo)

    # log-doubling sliding leftmost-argmin; raw circular rolls —
    # wrapped values only reach positions >= L-w+1, past the last
    # consumed window NW-1 = L-k-w+1
    m_hi, m_lo = key_hi, key_lo
    m_idx = lane
    span = 1
    while span * 2 <= w:
        o = span
        s_hi = pltpu.roll(m_hi, L - o, 1)
        s_lo = pltpu.roll(m_lo, L - o, 1)
        s_idx = pltpu.roll(m_idx, L - o, 1)
        take = _lex_lt2(s_hi, s_lo, m_hi, m_lo)
        m_hi = jnp.where(take, s_hi, m_hi)
        m_lo = jnp.where(take, s_lo, m_lo)
        m_idx = jnp.where(take, s_idx, m_idx)
        span *= 2
    o = w - span
    if o:
        b_hi = pltpu.roll(m_hi, L - o, 1)
        b_lo = pltpu.roll(m_lo, L - o, 1)
        b_idx = pltpu.roll(m_idx, L - o, 1)
    else:
        b_hi, b_lo, b_idx = m_hi, m_lo, m_idx
    take = _lex_lt2(b_hi, b_lo, m_hi, m_lo)
    winner = jnp.where(take, b_idx, m_idx)
    win_hi = jnp.where(take, b_hi, m_hi)
    return can_hi, can_lo, fwd, winner, win_hi


def _make_kernel(k: int, w: int, L: int, emit_mode: bool = True):
    """emit_mode=True: final output plane is the emit mask (consecutive-
    winner dedup against the in-row previous window). emit_mode=False
    (chunked path): the final plane is the window's winning key_hi instead
    — the wrapper computes prev/emit globally across chunk boundaries."""

    def kernel(codes_ref, len_ref, can_hi_ref, can_lo_ref, fwd_ref,
               winner_ref, emit_ref):
        FULL = jnp.uint32(0xFFFFFFFF)
        codes = codes_ref[:, :]                      # (ROWS, L) int32
        lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, L), 1)
        lengths = len_ref[:, 0:1]                    # (ROWS, 1) int32

        can_hi, can_lo, fwd, winner, win_hi = _sketch_core(
            codes, lengths, k, w, L
        )

        can_hi_ref[:, :] = can_hi
        can_lo_ref[:, :] = can_lo
        fwd_ref[:, :] = fwd.astype(jnp.int32)
        winner_ref[:, :] = winner
        if emit_mode:
            # previous window's winner = winner shifted RIGHT by one lane
            rolled = pltpu.roll(winner, 1, 1)
            prev = jnp.where(lane == 0, jnp.full_like(winner, -1), rolled)
            n_win = jnp.maximum(lengths - k + 1 - w + 1, 0)
            emit = (
                (winner != prev)
                & (lane < n_win)
                & (win_hi != FULL)
            )
            emit_ref[:, :] = emit.astype(jnp.int32)
        else:
            emit_ref[:, :] = win_hi.astype(jnp.int32)

    return kernel


def _ceil_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


#: single-tile VMEM limit on v5e (L=32768 OOMs once the grid pipeline
#: double-buffers blocks); longer rows go through the chunked path
MAX_SINGLE_L = 16384


def pallas_mode(L: int):
    """Pallas selection for row length L on the current backend: True
    (single-tile kernel), "chunked" (column-chunked kernel), or False
    (XLA lowering). Callers must additionally require rows % 8 == 0."""
    import jax

    if jax.default_backend() in ("cpu",) or L % 128:
        return False
    if L <= MAX_SINGLE_L:
        return True
    if L % MAX_SINGLE_L == 0:
        return "chunked"
    return False


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def sketch_batch_pallas_chunked(codes, lengths, k: int, w: int,
                                chunk: int = 16384,
                                interpret: bool = False):
    """Column-chunked Pallas sketch for rows longer than one VMEM tile.

    Splits the row into `chunk`-wide column windows (chunk | L), running the
    fused kernel on `chunk + pad(k + w - 2)` columns per step so every
    window minimum within the chunk sees its full key range; hash planes
    and (offset-corrected) winners concatenate exactly, and the
    consecutive-winner emit mask is computed globally so chunk boundaries
    dedup correctly. Same output contract as sketch_batch_pallas; VMEM use
    is that of an L=chunk+overlap kernel regardless of L.
    """
    B, L = codes.shape
    assert B % ROWS == 0 and L % chunk == 0 and chunk % 128 == 0
    # halo width: next power of two >= the window reach, so the ov-wide
    # halo BlockSpec always lands on a block boundary of the pow2 chunk
    ov = 128
    while ov < k + w - 2:
        ov <<= 1
    assert chunk % ov == 0, (chunk, ov)
    L_in = chunk + ov
    nch = L // chunk

    # ONE pallas_call with a (row-tiles, chunks) grid. The per-chunk input
    # is expressed as two views of the same padded tensor — a chunk-wide
    # main block plus an ov-wide halo block starting where the main block
    # ends — concatenated inside the kernel, so no data is duplicated in
    # HBM and the kernel compiles ONCE regardless of L. (The previous
    # unrolled-python-loop form emitted L/chunk structurally identical
    # pallas_calls; at L=2^21 that was 128 separate kernel compiles —
    # ~9 minutes of first-execution XLA time per process.)
    def kernel(main_ref, halo_ref, len_ref, can_hi_ref, can_lo_ref,
               fwd_ref, winner_ref, key_ref):
        codes_c = jnp.concatenate([main_ref[:, :], halo_ref[:, :]], axis=1)
        lengths_c = len_ref[:, 0:1]
        can_hi, can_lo, fwd, winner, win_hi = _sketch_core(
            codes_c, lengths_c, k, w, L_in
        )
        off = pl.program_id(1) * chunk
        can_hi_ref[:, :] = can_hi
        can_lo_ref[:, :] = can_lo
        fwd_ref[:, :] = fwd.astype(jnp.int32)
        winner_ref[:, :] = winner + off  # global window index
        key_ref[:, :] = win_hi.astype(jnp.int32)

    codes_pad = jnp.concatenate(
        [codes.astype(jnp.int32), jnp.zeros((B, ov), jnp.int32)], axis=1
    )
    offs = jnp.arange(nch, dtype=jnp.int32) * chunk
    len_c = jnp.clip(lengths.astype(jnp.int32)[:, None] - offs[None, :], 0, L_in)
    len_tiled = jnp.broadcast_to(
        len_c[:, :, None], (B, nch, 128)
    ).reshape(B, nch * 128)

    grid = (B // ROWS, nch)
    main_spec = pl.BlockSpec((ROWS, chunk), lambda r, c: (r, c))
    halo_spec = pl.BlockSpec(
        (ROWS, ov), lambda r, c: (r, (c + 1) * (chunk // ov))
    )
    len_spec = pl.BlockSpec((ROWS, 128), lambda r, c: (r, c))
    out_spec = pl.BlockSpec((ROWS, L_in), lambda r, c: (r, c))
    out_shape = [
        jax.ShapeDtypeStruct((B, nch * L_in), jnp.uint32),
        jax.ShapeDtypeStruct((B, nch * L_in), jnp.uint32),
        jax.ShapeDtypeStruct((B, nch * L_in), jnp.int32),
        jax.ShapeDtypeStruct((B, nch * L_in), jnp.int32),
        jax.ShapeDtypeStruct((B, nch * L_in), jnp.int32),
    ]
    o_hi, o_lo, o_fwd, o_win, o_key = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[main_spec, halo_spec, len_spec],
        out_specs=[out_spec] * 5,
        out_shape=out_shape,
        interpret=interpret,
    )(codes_pad, codes_pad, len_tiled)

    # drop each chunk's ov tail columns: (B, nch*L_in) -> (B, L)
    keep = lambda a: a.reshape(B, nch, L_in)[:, :, :chunk].reshape(B, L)
    can_hi, can_lo, fwd = keep(o_hi), keep(o_lo), keep(o_fwd)
    winner, win_hi = keep(o_win), keep(o_key)

    FULL = jnp.uint32(0xFFFFFFFF)
    M = L - k + 1
    NW = max(M - w + 1, 0)
    winner = winner[:, :NW]
    win_valid = win_hi[:, :NW].view(jnp.uint32) != FULL
    prev = jnp.concatenate(
        [jnp.full((B, 1), -1, winner.dtype), winner[:, :-1]], axis=1
    )
    n_win = jnp.maximum(lengths.astype(jnp.int32) - k + 1 - w + 1, 0)
    wpos = jax.lax.broadcasted_iota(jnp.int32, (B, NW), 1)
    emit = (winner != prev) & (wpos < n_win[:, None]) & win_valid
    return (
        can_hi,
        can_lo,
        fwd.astype(jnp.bool_),
        winner,
        emit,
    )


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def sketch_batch_pallas(codes, lengths, k: int, w: int, interpret: bool = False):
    """Pallas-fused equivalent of sketch_batch_kernel for N-free batches.

    codes: (B, L) int32 base codes (0..3), B % ROWS == 0, L % 128 == 0.
    Returns (can_hi, can_lo, fwd, winner, emit) matching
    sketch_batch_kernel's contract: hash/strand planes keep the full (B, L)
    width (columns >= L-k+1 are garbage; consumers gather at winner
    positions), winner/emit are (B, NW). Apply sketch_jax.finish_hash after
    compaction for the reported hash.
    """
    B, L = codes.shape
    assert B % ROWS == 0 and L % 128 == 0
    kernel = _make_kernel(k, w, L)
    grid = (B // ROWS,)
    row_spec = pl.BlockSpec((ROWS, L), lambda i: (i, 0))
    len_spec = pl.BlockSpec((ROWS, 128), lambda i: (i, 0))
    lengths_tiled = jnp.broadcast_to(
        lengths.astype(jnp.int32)[:, None], (B, 128)
    )
    out_shape = [
        jax.ShapeDtypeStruct((B, L), jnp.uint32),
        jax.ShapeDtypeStruct((B, L), jnp.uint32),
        jax.ShapeDtypeStruct((B, L), jnp.int32),
        jax.ShapeDtypeStruct((B, L), jnp.int32),
        jax.ShapeDtypeStruct((B, L), jnp.int32),
    ]
    can_hi, can_lo, fwd, winner, emit = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec, len_spec],
        out_specs=[row_spec] * 5,
        out_shape=out_shape,
        interpret=interpret,
    )(codes.astype(jnp.int32), lengths_tiled)
    M = L - k + 1
    NW = max(M - w + 1, 0)
    return (
        can_hi,
        can_lo,
        fwd.astype(jnp.bool_),
        winner[:, :NW],
        emit[:, :NW].astype(jnp.bool_),
    )


def kernel_ops_per_base(k: int, w: int) -> int:
    """Analytic VPU op count per (row, lane) element of the fused kernel.

    Counts every elementwise uint32 op and every lane-roll as one VPU op
    (a roll is at least one op; this makes the count — and therefore the
    derived utilization — slightly optimistic about the kernel, i.e.
    conservative about remaining headroom). Mirrors the exact code paths
    of _make_kernel + sketch_jax.sliding_hashes; the derivation is spelled
    out in DESIGN.md ("Sketch kernel roofline")."""

    def srol_cost(d: int) -> int:
        c = 0
        if d % 31:
            c += 4   # hi31 rotate: shl, shr, or, and
        if d % 33:
            c += 7   # 33-bit rotate on (bit32, lo32): 2 + 5 ops
        return c

    ops = 6 * 6  # select4 x 6 planes: 3 compares + 3 selects each
    bits = [1 << b for b in range(32) if (k >> b) & 1]
    s, done = 1, 0
    for bit in bits:
        while s < bit:
            # F: 3 rolls + srol_planes + 3 xor; R identical
            ops += 2 * (3 + srol_cost(s) + 3)
            s *= 2
        sh = k - done - s
        if sh:
            ops += 2 * 3  # termF/termR shifts
        if done:
            ops += srol_cost(done) + 3          # accF: srol + xor
            ops += srol_cost(bit) + 3           # accR: srol + xor
        done += s
    ops += 4          # pack fh_hi / rh_hi: (<<1 | bit32) x 2
    ops += 5          # canonical: lo add, carry cmp+cast, hi 2 adds
    ops += 5          # fwd: lt, eq, le, and, or
    ops += 4          # invalid lane mask + 2 key selects
    span = 1
    while span * 2 <= w:
        ops += 3 + 5 + 3   # rolls + _lex_lt2 + selects
        span *= 2
    ops += (3 if w - span else 0) + 5 + 2  # final combine
    ops += 11          # emit: roll, prev, n_win, mask chain
    return ops
