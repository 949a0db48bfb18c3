"""Batched device mapping: sketch + index join on-chip, chaining on host.

This is the engine's hot path. Reads stream into padded, length-bucketed
(B, L) code batches; one fused jitted step per batch computes minimizer
sketches and joins them against the replicated contig index (binary search
over the sorted (hi, lo) hash table); the host receives dense per-window
anchor payloads and compacts each read's matched anchors for the exact-order
chaining/tally stages. Reads the device cannot handle exactly (interior N,
oversized) fall back to the NumPy sketch + dict join, preserving bit-exact
semantics everywhere.

With more than one device, the same step runs sharded over a 1-D data mesh
(rows split across chips, index replicated) — see parallel.mesh.
"""
from __future__ import annotations

from typing import Dict, Iterable, Iterator, List, Optional, Tuple

import numpy as np

from .index import ContigIndex
from .mapping import AnchorHit
from .ops import nthash_np


class DeviceMapper:
    MIN_PAD = 1 << 10
    MAX_PAD = 1 << 21

    def __init__(self, index: ContigIndex, k: int, w: int,
                 batch_bases: int = 8_000_000, use_mesh: bool = True):
        import jax

        from .parallel.mesh import DeviceIndex, make_mesh, make_sharded_mapping_step

        self.index = index
        self.k, self.w = k, w
        self.batch_bases = batch_bases
        self.contig_names: List[str] = []
        order: Dict[str, int] = {}
        for entry in index._table.values():
            if entry.contig not in order:
                order[entry.contig] = len(self.contig_names)
                self.contig_names.append(entry.contig)
        self.didx = DeviceIndex.from_contig_index(index, order)
        self.n_devices = len(jax.devices()) if use_mesh else 1
        if self.n_devices > 1:
            mesh = make_mesh()
            self._step = make_sharded_mapping_step(mesh, k, w)
        else:
            self._step = self._single_step()

    def _single_step(self):
        import functools

        import jax

        from .parallel.mesh import mapping_step

        @functools.partial(jax.jit, static_argnums=(7, 8))
        def step(codes, lengths, hi, lo, cid, pos, strand, k, w):
            return mapping_step(codes, lengths, hi, lo, cid, pos, strand, k, w)

        return lambda codes, lengths, didx: step(
            codes, lengths, didx.hi, didx.lo, didx.contig_ids, didx.positions,
            didx.strands, self.k, self.w,
        )

    # -- host fallback ----------------------------------------------------

    def _host_map(self, codes: np.ndarray):
        mins = nthash_np.sketch_codes(codes, self.k, self.w)
        mask = self.index.member_mask(mins.hashes)
        out = []
        for h, p, f in zip(
            mins.hashes[mask].tolist(),
            mins.positions[mask].tolist(),
            mins.forward[mask].tolist(),
        ):
            e = self.index.get(h)
            out.append(
                (e.contig, AnchorHit(h, e.position, e.strand, p, "+" if f else "-"))
            )
        return out

    def _pad_len(self, n: int) -> int:
        p = self.MIN_PAD
        while p < n and p < self.MAX_PAD:
            p <<= 1
        return p

    def map_stream(
        self, named_seqs: Iterable[Tuple[str, str]]
    ) -> Iterator[Tuple[str, int, List[Tuple[str, AnchorHit]]]]:
        """Yield (read_name, read_len, [(contig, AnchorHit)...]) in order."""
        import jax
        import jax.numpy as jnp

        pending: List[Tuple[str, int]] = []   # (name, length)
        results: Dict[int, list] = {}
        encoded: Dict[int, np.ndarray] = {}
        buckets: Dict[int, List[int]] = {}

        def flush_bucket(pad: int, idxs: List[int]) -> None:
            B = max(self.n_devices, 1)
            while B < len(idxs):
                B <<= 1
            codes = np.full((B, pad), 4, dtype=np.uint8)
            lengths = np.zeros(B, dtype=np.int32)
            for row, i in enumerate(idxs):
                c = encoded.pop(i)
                codes[row, : len(c)] = c
                lengths[row] = len(c)
            out = self._step(jnp.asarray(codes), jnp.asarray(lengths), self.didx)
            jax.block_until_ready(out)
            found = np.asarray(out["found"])
            winner = np.asarray(out["winner"])
            cid = np.asarray(out["anchor_cid"])
            cpos = np.asarray(out["anchor_pos"])
            cstr = np.asarray(out["anchor_strand"])
            rstr = np.asarray(out["read_strand"])
            hi = np.asarray(out["mx_hi"]).astype(np.uint64)
            lo = np.asarray(out["mx_lo"]).astype(np.uint64)
            for row, i in enumerate(idxs):
                sel = np.nonzero(found[row])[0]
                hits = []
                for s in sel:
                    name = self.contig_names[cid[row, s]]
                    h = int((hi[row, s] << np.uint64(32)) | lo[row, s])
                    hits.append(
                        (
                            name,
                            AnchorHit(
                                h,
                                int(cpos[row, s]),
                                "+" if cstr[row, s] else "-",
                                int(winner[row, s]),
                                "+" if rstr[row, s] else "-",
                            ),
                        )
                    )
                results[i] = hits

        def flush_all():
            for pad, idxs in list(buckets.items()):
                if idxs:
                    flush_bucket(pad, idxs)
            buckets.clear()
            for i, (name, length) in enumerate(pending):
                yield name, length, results[i]
            pending.clear()
            results.clear()

        budget = 0
        for name, seq in named_seqs:
            i = len(pending)
            pending.append((name, len(seq)))
            codes = nthash_np.encode(seq)
            if (
                len(seq) < self.k
                or len(seq) > self.MAX_PAD
                or (codes > 3).any()
            ):
                results[i] = self._host_map(codes)
                continue
            encoded[i] = codes
            pad = self._pad_len(len(seq))
            buckets.setdefault(pad, []).append(i)
            budget += pad
            if budget >= self.batch_bases:
                yield from flush_all()
                budget = 0
        yield from flush_all()
