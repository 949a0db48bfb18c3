"""Pallas TPU kernel: fused ntHash2 sketch + sliding window minimum.

One kernel fuses everything sketch_batch_kernel (ops/sketch_jax.py) expresses
as ~40 XLA ops: per-position forward/reverse hashes (uint32 pairs), canonical
sum, reported multi-hash, and the log-doubling sliding minimum with leftmost
tie-break — per grid step an (ROWS, L) row tile lives entirely in VMEM, so
HBM sees exactly one read of the codes and one write per output.

Key TPU mappings:
- the (k, 4) srol seed tables are embedded as scalar literals in select
  chains (codes have 4 values; gathers are poison on the VPU),
- lane shifts use pltpu.roll + iota masking (circular roll -> shift),
- everything is uint32/int32; no 64-bit integers exist on the datapath.

Scope: N-free rows (the production packed path guarantees this; N-containing
reads take the NumPy fallback), L a multiple of 128, k-mer validity purely
positional. Bit-exact against the NumPy reference backend (tests).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sketch_jax import MULTISHIFT, _mult_limbs, _tables_u32

ROWS = 8  # row tile (sublane dimension)


def _shift_left(x, o, fill, lane_idx, L):
    """x[..., i] <- x[..., i+o], tail filled (via circular roll + mask).

    pltpu.roll only rolls right (non-negative shift): left-by-o == right-by-
    (L-o) on a circular buffer."""
    rolled = pltpu.roll(x, L - o, 1)
    return jnp.where(lane_idx >= L - o, jnp.full_like(x, fill), rolled)


def _lex_lt(a_hi, a_lo, a_idx, b_hi, b_lo, b_idx):
    return (
        (a_hi < b_hi)
        | ((a_hi == b_hi) & (a_lo < b_lo))
        | ((a_hi == b_hi) & (a_lo == b_lo) & (a_idx < b_idx))
    )


def _select_seed(code, row):
    """Map base codes (0..3) to the four scalar seeds of one table row."""
    c0, c1, c2, c3 = (jnp.uint32(int(v)) for v in row[:4])
    return jnp.where(
        code == 0, c0, jnp.where(code == 1, c1, jnp.where(code == 2, c2, c3))
    )


def _make_kernel(k: int, w: int, L: int):
    f_hi_t, f_lo_t, r_hi_t, r_lo_t = _tables_u32(k)
    limbs = [int(x) for x in _mult_limbs(k)]

    def kernel(codes_ref, len_ref, out_hi_ref, out_lo_ref, fwd_ref,
               winner_ref, emit_ref):
        FULL = jnp.uint32(0xFFFFFFFF)
        codes = codes_ref[:, :]                      # (ROWS, L) int32
        lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, L), 1)
        lengths = len_ref[:, 0:1]                    # (ROWS, 1) int32

        zero = jnp.zeros((ROWS, L), jnp.uint32)
        fh_hi, fh_lo, rh_hi, rh_lo = zero, zero, zero, zero
        shifted = codes
        for j in range(k):
            if j:
                shifted = _shift_left(codes, j, 0, lane, L)
            fh_hi = fh_hi ^ _select_seed(shifted, f_hi_t[j])
            fh_lo = fh_lo ^ _select_seed(shifted, f_lo_t[j])
            rh_hi = rh_hi ^ _select_seed(shifted, r_hi_t[j])
            rh_lo = rh_lo ^ _select_seed(shifted, r_lo_t[j])

        can_lo = fh_lo + rh_lo
        carry = (can_lo < fh_lo).astype(jnp.uint32)
        can_hi = fh_hi + rh_hi + carry

        # reported hash: (canonical * const) mod 2^64 via 16-bit limbs
        a = [can_lo & 0xFFFF, can_lo >> 16, can_hi & 0xFFFF, can_hi >> 16]
        cols = [jnp.zeros((ROWS, L), jnp.uint32) for _ in range(5)]
        for i in range(4):
            for jj in range(4 - i):
                p = a[i] * jnp.uint32(limbs[jj])
                c = i + jj
                cols[c] = cols[c] + (p & 0xFFFF)
                if c + 1 < 5:
                    cols[c + 1] = cols[c + 1] + (p >> 16)
        outv = []
        carry2 = jnp.zeros((ROWS, L), jnp.uint32)
        for c in range(4):
            v = cols[c] + carry2
            outv.append(v & 0xFFFF)
            carry2 = v >> 16
        t_lo = outv[0] | (outv[1] << 16)
        t_hi = outv[2] | (outv[3] << 16)
        out_hi = t_hi ^ (t_hi >> MULTISHIFT)
        out_lo = t_lo ^ ((t_lo >> MULTISHIFT) | (t_hi << (32 - MULTISHIFT)))

        fwd = (fh_hi < rh_hi) | ((fh_hi == rh_hi) & (fh_lo <= rh_lo))

        invalid = lane > (lengths - k)
        key_hi = jnp.where(invalid, FULL, can_hi)
        key_lo = jnp.where(invalid, FULL, can_lo)

        # log-doubling sliding leftmost-argmin over (key, idx)
        m_hi, m_lo = key_hi, key_lo
        m_idx = lane
        IMAX = jnp.int32(0x7FFFFFFF)
        span = 1
        while span * 2 <= w:
            o = span
            s_hi = _shift_left(m_hi, o, FULL, lane, L)
            s_lo = _shift_left(m_lo, o, FULL, lane, L)
            s_idx = _shift_left(m_idx, o, IMAX, lane, L)
            take = _lex_lt(
                s_hi, s_lo, s_idx.astype(jnp.uint32),
                m_hi, m_lo, m_idx.astype(jnp.uint32),
            )
            m_hi = jnp.where(take, s_hi, m_hi)
            m_lo = jnp.where(take, s_lo, m_lo)
            m_idx = jnp.where(take, s_idx, m_idx)
            span *= 2
        o = w - span
        if o:
            b_hi = _shift_left(m_hi, o, FULL, lane, L)
            b_lo = _shift_left(m_lo, o, FULL, lane, L)
            b_idx = _shift_left(m_idx, o, IMAX, lane, L)
        else:
            b_hi, b_lo, b_idx = m_hi, m_lo, m_idx
        take = _lex_lt(
            b_hi, b_lo, b_idx.astype(jnp.uint32),
            m_hi, m_lo, m_idx.astype(jnp.uint32),
        )
        winner = jnp.where(take, b_idx, m_idx)
        win_hi = jnp.where(take, b_hi, m_hi)

        # previous window's winner = winner shifted RIGHT by one lane
        rolled = pltpu.roll(winner, 1, 1)
        prev = jnp.where(lane == 0, jnp.full_like(winner, -1), rolled)

        n_win = jnp.maximum(lengths - k + 1 - w + 1, 0)
        emit = (
            (winner != prev)
            & (lane < n_win)
            & (win_hi != FULL)
        )

        out_hi_ref[:, :] = out_hi
        out_lo_ref[:, :] = out_lo
        fwd_ref[:, :] = fwd.astype(jnp.int32)
        winner_ref[:, :] = winner
        emit_ref[:, :] = emit.astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def sketch_batch_pallas(codes, lengths, k: int, w: int, interpret: bool = False):
    """Pallas-fused equivalent of sketch_batch_kernel for N-free batches.

    codes: (B, L) int32 base codes (0..3), B % ROWS == 0, L % 128 == 0.
    Returns (out_hi, out_lo, fwd, winner, emit) with (B, L) layouts; the
    caller slices columns [0, L-k+1) / [0, L-k+1-w+1) as needed.
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
    out_hi, out_lo, fwd, winner, emit = pl.pallas_call(
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
        out_hi[:, :M],
        out_lo[:, :M],
        fwd[:, :M].astype(jnp.bool_),
        winner[:, :NW],
        emit[:, :NW].astype(jnp.bool_),
    )
