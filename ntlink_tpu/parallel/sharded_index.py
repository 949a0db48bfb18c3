"""Hash-sharded contig index across a 2-D (data, idx) device mesh.

The default engine replicates the contig hash table per device (~1.7 GB for
a human assembly at w=100 — see DESIGN.md sizing). For indexes that outgrow
one chip's HBM (pangenomes, very small w), this variant shards the table by
a hash bucket over the ``idx`` mesh axis:

- host build partitions entries by the top bits of the Fibonacci slot hash
  (uniform by construction) into `n_shards` independent open-addressing
  sub-tables,
- the join runs under shard_map on a 2-D mesh: batch rows shard over
  ``data``, each ``idx`` rank probes its local sub-table with the full query
  set of its data row-block, and per-query results combine with a
  ``psum`` over ``idx`` (each query hits exactly one shard, so the sum is
  the unique answer),
- the sketch is computed once per data shard (on idx rank 0's input; inputs
  along ``idx`` are replicated by sharding, XLA broadcasts them).

The reduction rides ICI on a real pod slice; tests run it on the virtual
CPU mesh.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from .mesh import _FIB
from ..ops.sketch_jax import sketch_batch_kernel


class ShardedDeviceIndex:
    """Per-shard open-addressing sub-tables, stacked (n_shards, size)."""

    def __init__(self, hashes: np.ndarray, contig_ids: np.ndarray,
                 positions: np.ndarray, strands: np.ndarray, n_shards: int):
        assert n_shards & (n_shards - 1) == 0, "n_shards must be a power of 2"
        self.n_shards = n_shards
        hi = (hashes >> np.uint64(32)).astype(np.uint32)
        lo = (hashes & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        slot_hash = ((lo ^ hi) * np.uint32(_FIB)).astype(np.uint32)
        shard_shift = np.uint32(32 - int(np.log2(n_shards))) if n_shards > 1 else None
        shard = (
            (slot_hash >> shard_shift).astype(np.int64)
            if n_shards > 1
            else np.zeros(hashes.shape[0], np.int64)
        )

        counts = np.bincount(shard, minlength=n_shards)
        size = 1
        while size < max(2 * int(counts.max() if counts.size else 1), 16):
            size <<= 1
        self.size = size
        self.mask = size - 1

        t_hi = np.zeros((n_shards, size), np.uint32)
        t_lo = np.zeros((n_shards, size), np.uint32)
        t_cid = np.full((n_shards, size), -1, np.int32)
        t_pos = np.zeros((n_shards, size), np.int32)
        t_strand = np.zeros((n_shards, size), bool)

        max_probes = 1
        for s in range(n_shards):
            sel = shard == s
            sh, sl = hi[sel], lo[sel]
            scid, spos, sstr = contig_ids[sel], positions[sel], strands[sel]
            slots = (
                ((sl ^ sh) * np.uint32(_FIB)).astype(np.uint32)
                & np.uint32(self.mask)
            ).astype(np.int64)
            occupied = t_cid[s]
            for i in range(sh.shape[0]):
                p = int(slots[i])
                probes = 1
                while occupied[p] != -1:
                    p = (p + 1) & self.mask
                    probes += 1
                t_hi[s, p] = sh[i]
                t_lo[s, p] = sl[i]
                t_cid[s, p] = scid[i]
                t_pos[s, p] = spos[i]
                t_strand[s, p] = sstr[i]
                max_probes = max(max_probes, probes)
        self.max_probes = (max_probes + 3) & ~3
        self.t_hi = t_hi
        self.t_lo = t_lo
        self.t_cid = t_cid
        self.t_pos = t_pos
        self.t_strand = t_strand

    @classmethod
    def from_contig_index(cls, index, n_shards: int) -> "ShardedDeviceIndex":
        index.finalize()
        return cls(
            index.hashes, index.contig_ids, index.positions, index.strands,
            n_shards,
        )


def make_sharded_index_join(mesh: Mesh, sidx: ShardedDeviceIndex,
                            k: int, w: int, max_anchors: int):
    """jitted sketch+join with the table sharded over the ``idx`` axis.

    Returns fn(codes (B, L) uint8, lengths (B,)) -> per-read compacted
    anchors (count, read_pos, cid, cpos, strand_bits).
    """
    n_shards = sidx.n_shards
    mask = sidx.mask
    max_probes = sidx.max_probes
    shard_shift = 32 - int(np.log2(n_shards)) if n_shards > 1 else 32

    def local_probe(t_hi, t_lo, t_cid, t_pos, t_strand, q_hi, q_lo):
        """Probe this rank's sub-table; miss -> found False."""
        slot_hash = (q_lo ^ q_hi) * jnp.uint32(_FIB)
        my_shard = jax.lax.axis_index("idx").astype(jnp.uint32)
        want_shard = (
            (slot_hash >> jnp.uint32(shard_shift))
            if n_shards > 1
            else jnp.zeros_like(slot_hash)
        )
        mine = want_shard == my_shard
        slot = (slot_hash & jnp.uint32(mask)).astype(jnp.int32)
        found = jnp.zeros(q_hi.shape, jnp.bool_)
        payload = jnp.zeros(q_hi.shape, jnp.int32)
        alive = mine

        def body(_, carry):
            slot, found, payload, alive = carry
            cid = t_cid[slot]
            hit = alive & (cid != -1) & (t_hi[slot] == q_hi) & (t_lo[slot] == q_lo)
            payload = jnp.where(hit, slot, payload)
            found = found | hit
            alive = alive & ~hit & (cid != -1)
            slot = (slot + 1) & mask
            return slot, found, payload, alive

        _, found, payload, _ = jax.lax.fori_loop(
            0, max_probes, body, (slot, found, payload, alive)
        )
        return found, t_cid[payload], t_pos[payload], t_strand[payload]

    def step(codes, lengths, t_hi, t_lo, t_cid, t_pos, t_strand):
        # per-rank table block has a leading shard dim of 1
        t_hi, t_lo = t_hi[0], t_lo[0]
        t_cid, t_pos, t_strand = t_cid[0], t_pos[0], t_strand[0]
        out_hi, out_lo, fwd, winner, emit = sketch_batch_kernel(
            codes, lengths, k, w
        )
        sel = jnp.argsort(~emit, axis=1, stable=True)[:, :max_anchors]
        sel_ok = jnp.take_along_axis(emit, sel, axis=1)
        m_pos = jnp.take_along_axis(winner, sel, axis=1)
        q_hi = jnp.take_along_axis(out_hi, jnp.maximum(m_pos, 0), axis=1)
        q_lo = jnp.take_along_axis(out_lo, jnp.maximum(m_pos, 0), axis=1)
        m_fwd = jnp.take_along_axis(fwd, jnp.maximum(m_pos, 0), axis=1)

        found, cid, cpos, cstrand = local_probe(
            t_hi, t_lo, t_cid, t_pos, t_strand, q_hi, q_lo
        )
        # each query lives in exactly one shard: psum yields the unique hit
        found = found & sel_ok
        found_any = jax.lax.psum(found.astype(jnp.int32), "idx") > 0
        cid_g = jax.lax.psum(jnp.where(found, cid, 0), "idx")
        cpos_g = jax.lax.psum(jnp.where(found, cpos, 0), "idx")
        cstr_g = jax.lax.psum(jnp.where(found, cstrand.astype(jnp.int32), 0), "idx")
        count = found_any.sum(axis=1).astype(jnp.int32)
        strand_bits = cstr_g | (m_fwd.astype(jnp.int32) << 1)
        # compact matches to the front, order preserved
        order = jnp.argsort(~found_any, axis=1, stable=True)
        take = lambda a: jnp.take_along_axis(a, order, axis=1)
        found_c = take(found_any)
        anchors = jnp.stack(
            [
                jnp.where(found_c, take(m_pos), -1),
                jnp.where(found_c, take(cid_g), -1),
                jnp.where(found_c, take(cpos_g), -1),
                jnp.where(found_c, take(strand_bits), 0),
            ],
            axis=1,
        )
        return count, anchors

    data_spec = P("data", None)
    table_spec = P("idx", None)

    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(
            data_spec, P("data"),
            table_spec, table_spec, table_spec, table_spec, table_spec,
        ),
        out_specs=(P("data"), P("data", None, None)),
        check_rep=False,
    )
    jitted = jax.jit(sharded)

    t_args = tuple(
        jnp.asarray(a)
        for a in (sidx.t_hi, sidx.t_lo, sidx.t_cid, sidx.t_pos,
                  sidx.t_strand.astype(np.bool_))
    )
    return lambda codes, lengths: jitted(codes, lengths, *t_args)
