#!/usr/bin/env python3
"""Benchmark: long-read mapping throughput.

Synthesizes a deterministic human-like workload (16 x 250 kbase contigs cut
from one genome, 15 kb reads at 95% identity, ~5% spanning contig junctions
so the pair tally carries real evidence), then measures the full mapping hot
loop — minimizer sketching + index join, chaining + pair tally — end to end
in three configurations: device-only (TPU), strong host (native C path,
t=4), and hybrid (device + host concurrently; the headline).

Two CPU baselines are measured (btllib/indexlr is not installable in this
image; the reference publishes no numbers of its own — see BASELINE.md):

- strong host: the engine's best pure-CPU configuration — native C reader,
  threaded C rolling-ntHash sketch + binary-search index join
  (native/sketch.c), native C chain_batch (pipeline.map_reads
  backend=numpy, t=4). `vs_baseline` is scored against THIS leg. Note this
  is far FASTER than real ntLink would be: the reference tallies anchors
  in a single-threaded Python loop (ntlink_pair.py:336-435); only its
  sketching (indexlr -t4, ntLink:199,221-225) is native.
- weak host: single-threaded per-hit Python objects — structurally the
  closest stand-in for the reference's actual Python hot loop (reported
  as `vs_weak_host`).

The device leg in THIS environment is wire-bound: the chip sits behind a
shared ~20 MB/s tunnel (vs >=8 GB/s PCIe/DMA on a production TPU host), so
the JSON also carries a wire-ceiling analysis (`wire_*` fields) showing
how close the engine runs to the link's theoretical reads/s and what the
same pipeline clears once transfers are not the bottleneck.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

K, W, Z = 32, 100, 1000
N_CONTIGS = 16
CONTIG_LEN = 250_000
GAP_LEN = 120
N_READS = 30_000  # long enough that scheduler warmup/tail effects
#                     are <10% of the measured stream (r4 used 6000: on a
#                     ~6-block stream the hybrid's makespan tail dominated)
READ_LEN = 15_000
ERR = 0.05
BASES = np.array(list("ACGT"))
_COMP = str.maketrans("ACGT", "TGCA")


def make_dataset(rng, n_contigs=N_CONTIGS, contig_len=CONTIG_LEN,
                 n_reads=N_READS, read_len=READ_LEN, gap_len=GAP_LEN,
                 err=ERR):
    """Synthetic scaffolding workload with REAL joins.

    The underlying genome is `n_contigs` contigs separated by short
    unassembled gap sequences; reads are drawn from the GENOME, so ~5%
    span a contig junction and produce two accepted runs — the reference's
    pair condition (ntlink_pair.py:416-435). The pair tally, gap-estimate
    math, scaffold-graph build, and (in the scaling harness) the tally
    all-gather therefore exchange non-trivial payloads under load.
    """
    contigs = {}
    parts = []
    for i in range(n_contigs):
        c = "".join(BASES[rng.integers(0, 4, contig_len)])
        contigs[f"ctg{i}"] = c
        parts.append(c)
        if i < n_contigs - 1:
            parts.append("".join(BASES[rng.integers(0, 4, gap_len)]))
    genome = "".join(parts)
    reads = []
    for r in range(n_reads):
        start = int(rng.integers(0, len(genome) - read_len))
        arr = np.frombuffer(
            genome[start : start + read_len].encode(), dtype=np.uint8
        ).copy()
        # substitution errors
        n_err = int(read_len * err)
        pos = rng.integers(0, read_len, n_err)
        arr[pos] = BASES[rng.integers(0, 4, n_err)].astype("S1").view(np.uint8)
        seq = arr.tobytes().decode()
        if rng.random() < 0.5:
            seq = seq.translate(_COMP)[::-1]
        reads.append((f"read{r}", seq))
    return contigs, reads


def run_mapping(contigs, reads, index, contig_lengths, cfg, mapper=None):
    """The mapping hot loop (mirrors pipeline.map_reads without file IO)."""
    from ntlink_tpu.mapping import chain_read_hits
    from ntlink_tpu.pairs import PairTally

    tally = PairTally(contig_lengths, cfg.k, cfg.f)
    n_reads = 0
    n_bases = 0
    if mapper is not None:
        stream = mapper.map_stream(iter(reads))
    else:
        def host_stream():
            from ntlink_tpu.ops import nthash_np
            from ntlink_tpu.mapping import AnchorHit

            for name, seq in reads:
                mins = nthash_np.sketch_sequence(seq, cfg.k, cfg.w)
                mask = index.member_mask(mins.hashes)
                hits = []
                for h, p, f in zip(
                    mins.hashes[mask], mins.positions[mask], mins.forward[mask]
                ):
                    e = index.get(int(h))
                    hits.append(
                        (e.contig, AnchorHit(int(h), e.position, e.strand, int(p), "+" if f else "-"))
                    )
                yield name, len(seq), hits

        stream = host_stream()
    for name, read_len, hits in stream:
        n_reads += 1
        n_bases += read_len
        if not hits:
            continue
        runs = chain_read_hits(
            hits, read_len, contig_lengths, cfg.k, cfg.z, x=cfg.x
        )
        if runs:
            tally.add_read(runs, read_len)
    return n_reads, n_bases, tally


def build_workload():
    from ntlink_tpu.index import ContigIndex
    from ntlink_tpu.ops import nthash_np

    rng = np.random.default_rng(42)
    t0 = time.time()
    contigs, reads = make_dataset(rng)
    contig_lengths = {n: len(s) for n, s in contigs.items()}
    index = ContigIndex.from_sketches(
        (name, nthash_np.sketch_sequence(seq, K, W)) for name, seq in contigs.items()
    )
    print(f"# dataset+index built in {time.time()-t0:.1f}s; index={len(index)}",
          file=sys.stderr)
    return contigs, reads, contig_lengths, index


def _kernel_bench():
    """On-hardware sketch-kernel throughput (XLA + Pallas) and a
    compiled-Pallas == XLA equality check. Returns a dict for the JSON
    artifact (empty on CPU-only hosts)."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        return {}
    from ntlink_tpu.ops.sketch_jax import sketch_batch_kernel
    from ntlink_tpu.ops.sketch_pallas import (
        sketch_batch_pallas,
        sketch_batch_pallas_chunked,
    )

    rng = np.random.default_rng(7)
    B, L = 2048, 16384
    codes = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    lengths = jnp.full((B,), L, jnp.int32)
    out = {}

    # The tunnel to the chip costs ~0.2 s per dispatch — orders of magnitude
    # more than the kernel itself — and has been observed to serve repeated
    # identical dispatches from a cache and to return from block_until_ready
    # without blocking. Defenses: (a) one dispatch runs the kernel N times
    # inside a fori_loop with a cross-iteration data dependency that folds a
    # full reduction of every output into the carry (defeats hoisting, DCE
    # and output slicing), (b) a per-call seed argument makes every dispatch
    # distinct, (c) the scalar result is fetched with int() (a D2H that
    # cannot return early), (d) per-iteration time is the difference
    # (t_long - t_short) / (N_long - N_short), cancelling dispatch cost.
    N_SHORT, N_LONG = 9, 65

    def make_chain(fn, iters):
        @jax.jit
        def chained(c, l, seed):
            def body(_, carry):
                acc, c = carry
                c = c.at[0, 0].set((acc & 3).astype(c.dtype))
                r = fn(c, l, K, W)
                acc = acc ^ (
                    r[0].sum() + r[3].sum().astype(jnp.uint32)
                ).astype(jnp.uint32)
                return acc, c
            acc, _ = jax.lax.fori_loop(
                0, iters, body, (seed, c)
            )
            return acc
        return chained

    seed = [0]

    def run(fn, name, c=None, l=None, pair=(N_SHORT, N_LONG)):
        c = codes if c is None else c
        l = lengths if l is None else l
        times = {}
        for iters in pair:
            f = make_chain(fn, iters)
            int(f(c, l, jnp.uint32(9999)))  # compile + warm
            best = None
            for _ in range(3):
                seed[0] += 1
                t0 = time.time()
                int(f(c, l, jnp.uint32(seed[0])))
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            times[iters] = best
        per_iter = max(times[pair[1]] - times[pair[0]], 1e-9) / (
            pair[1] - pair[0]
        )
        rows, cols = c.shape
        out[f"sketch_{name}_gbase_per_s"] = round(
            rows * cols / per_iter / 1e9, 2
        )

    run(sketch_batch_kernel, "xla")
    run(
        lambda c, l, k, w: sketch_batch_pallas(c.astype(jnp.int32), l, k, w),
        "pallas",
    )

    # roofline: demonstrated VPU peak from a throughput-shaped u32
    # microkernel (a width-32 independent op DAG per loop iteration —
    # narrow loop-carried chains measure latency, not throughput, and
    # width >= 64 fails to compile; 32 was the max/best measured:
    # 1679/1921/2570 GOPS at width 8/16/32), fully VMEM-resident, result
    # force-fetched (block_until_ready has been observed to return early
    # through the tunnel). Sketch utilization = (analytic ops/base x
    # measured Gbase/s) / demonstrated peak; ops/base counts the fused
    # kernel's elementwise + roll ops (sketch_pallas.kernel_ops_per_base;
    # derivation in DESIGN.md "Sketch kernel roofline").
    try:
        from jax.experimental import pallas as pl

        from ntlink_tpu.ops.sketch_pallas import kernel_ops_per_base

        SH = (256, 1024)
        WIDTH = 32

        def make_micro(iters):
            def kern(x_ref, o_ref):
                a = x_ref[:, :]
                b = a ^ jnp.uint32(0xDEADBEEF)

                def body(_, carry):
                    a, b = carry
                    ts = [a ^ jnp.uint32(0x9E3779B1 + i)
                          for i in range(WIDTH // 2)]
                    us = [b + jnp.uint32(0x85EBCA6B + i)
                          for i in range(WIDTH // 2)]
                    vs = [t + u for t, u in zip(ts, us)]
                    acc1 = vs[0]
                    for v in vs[1 : len(vs) // 2]:
                        acc1 = acc1 ^ v
                    acc2 = vs[len(vs) // 2]
                    for v in vs[len(vs) // 2 + 1 :]:
                        acc2 = acc2 + v
                    return acc1, acc2

                a, b = jax.lax.fori_loop(0, iters, body, (a, b))
                o_ref[:, :] = a ^ b

            p = pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct(SH, jnp.uint32)
            )
            return jax.jit(lambda x: p(x).sum())

        n_ops = WIDTH + WIDTH // 2 + (WIDTH // 2 - 2) + 1
        numel = SH[0] * SH[1]
        R_S, R_L = 8_192, 40_960
        micro_times = {}
        x = jnp.asarray(rng.integers(0, 2**32, SH, dtype=np.uint32))
        for iters in (R_S, R_L):
            f = make_micro(iters)
            int(f(x))  # compile + warm; int() forces a real D2H
            best = None
            for _ in range(3):
                x = x + jnp.uint32(1)
                t0 = time.time()
                int(f(x))
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            micro_times[iters] = best
        per_iter = max(micro_times[R_L] - micro_times[R_S], 1e-9) / (R_L - R_S)
        vpu_peak = n_ops * numel / per_iter
        out["vpu_demonstrated_peak_gops"] = round(vpu_peak / 1e9, 1)
        opb = kernel_ops_per_base(K, W)
        out["sketch_ops_per_base"] = opb
        achieved = out.get("sketch_pallas_gbase_per_s", 0.0) * 1e9 * opb
        out["sketch_effective_gops"] = round(achieved / 1e9, 1)
        # vs a demonstrated FLOOR of true peak (the best constructible
        # microkernel): values >= 100 mean the fused kernel is at least as
        # issue-dense as that microkernel — headroom is in ops/base, not
        # scheduling
        out["sketch_vpu_util_pct"] = round(100.0 * achieved / vpu_peak, 1)
    except Exception as exc:
        print(f"# vpu roofline unavailable: {exc}", file=sys.stderr)

    # column-chunked kernel in the long-read regime (rows past the single-
    # tile VMEM gate); fewer chain iterations — same Gbase/iter as above
    B_c, L_c = 512, 65536
    codes_c = jnp.asarray(
        rng.integers(0, 4, size=(B_c, L_c), dtype=np.int32)
    )
    lengths_c = jnp.full((B_c,), L_c, jnp.int32)
    run(
        lambda c, l, k, w: sketch_batch_pallas_chunked(c, l, k, w),
        "pallas_chunked",
        codes_c,
        lengths_c,
        pair=(5, 21),
    )

    # equality of the compiled kernels on hardware (one plain dispatch
    # each); hash/strand planes are full-width with garbage past L-k+1
    # (different between the two lowerings), so compare valid columns only
    f_xla = jax.jit(lambda c, l: sketch_batch_kernel(c, l, K, W))
    f_pal = jax.jit(
        lambda c, l: sketch_batch_pallas(c.astype(jnp.int32), l, K, W)
    )
    r_xla = f_xla(codes, lengths)
    r_pal = f_pal(codes, lengths)
    M = L - K + 1
    same = all(
        bool(jnp.array_equal(a[:, :M], b[:, :M]))
        for a, b in zip(r_xla, r_pal)
    )
    out["pallas_equals_xla_on_hw"] = same
    assert same, "compiled Pallas kernel diverged from XLA on hardware"

    # chunked kernel parity past the single-tile gate (small batch — the
    # XLA lowering is ~13x slower per base at this row length). The chunked
    # wrapper already dedups winners globally, so compare its emitted
    # minimizers against the XLA kernel's.
    B_p, L_p = 8, 32768
    codes_p = codes_c[:B_p, :L_p]
    lengths_p = jnp.full((B_p,), L_p, jnp.int32)
    r_c = jax.jit(
        lambda c, l: sketch_batch_pallas_chunked(c, l, K, W)
    )(codes_p, lengths_p)
    r_x = jax.jit(
        lambda c, l: sketch_batch_kernel(c, l, K, W)
    )(codes_p.astype(jnp.uint8), lengths_p)
    M_p = L_p - K + 1
    same_c = all(
        bool(jnp.array_equal(a[:, :M_p], b[:, :M_p]))
        for a, b in zip(r_c[:3], r_x[:3])
    ) and all(
        bool(jnp.array_equal(a, b)) for a, b in zip(r_c[3:], r_x[3:])
    )
    out["pallas_chunked_equals_xla_on_hw"] = same_c
    assert same_c, "chunked Pallas kernel diverged from XLA on hardware"
    return out


def device_run() -> None:
    """Child-process entry: device mapping throughput, one JSON line.

    Exercises the full production verbose=False path: native C FASTA
    reader -> packed device batches -> fused sketch+join+chain on-chip ->
    O(runs) summary payload -> pair tally (pipeline.map_reads). Artifact
    config matches the strong-host baseline leg (no verbose/PAF).
    """
    from ntlink_tpu import pipeline
    from ntlink_tpu.config import ScaffoldConfig

    contigs, reads, contig_lengths, index = build_workload()
    reads_fa = "/tmp/ntlink_bench_reads.fa"
    with open(reads_fa, "w") as fh:
        for name, seq in reads:
            fh.write(f">{name}\n{seq}\n")
    n_bases = sum(len(s) for _, s in reads)
    batch_bases = int(os.environ.get("NTLINK_BENCH_BATCH_BASES", 16_000_000))
    cfg = ScaffoldConfig(
        k=K, w=W, z=Z, reads=[reads_fa], batch_bases=batch_bases
    )
    import jax

    device_kind = jax.devices()[0].device_kind
    # link weather snapshot (helps interpret run-to-run swings: the shared
    # tunnel to the chip has been observed from ~19 MB/s down to <0.1 MB/s)
    link = {}
    try:
        # up to 3 probes: a single reading of ~0 (observed once for D2H)
        # is a transient tunnel artifact, not link capacity — retry and
        # keep the best, annotating how many probes were needed
        probes = 0
        for attempt in range(3):
            probes += 1
            buf = np.random.default_rng(int(time.time()) + attempt).integers(
                0, 256, 4 << 20, dtype=np.uint8
            )
            t0 = time.time()
            d = jax.device_put(buf)
            d.block_until_ready()
            h2d = round(buf.nbytes / (time.time() - t0) / 1e6, 1)
            t0 = time.time()
            np.asarray(d)
            d2h = round(buf.nbytes / (time.time() - t0) / 1e6, 1)
            link["link_mbps_h2d"] = max(link.get("link_mbps_h2d", 0.0), h2d)
            link["link_mbps_d2h"] = max(link.get("link_mbps_d2h", 0.0), d2h)
            if d2h >= 1.0 and h2d >= 1.0:
                break
        link["link_probes"] = probes
    except Exception:
        pass
    print(f"# link: {link}", file=sys.stderr)
    from ntlink_tpu.device_map import DeviceMapper

    # one DeviceMapper for every device-leg run: the index transfers to the
    # chip once and the jit caches stay warm across repeats (matches how a
    # production run holds the index resident for the whole read sweep).
    # prechain turns ON the on-device chaining stage and runs_only ships
    # O(runs) summaries — the production verbose=False configuration,
    # matching the strong-host leg's artifact config (it also maps with
    # no verbose/PAF rendering), so the comparison is like for like.
    clen = np.zeros(len(index.contig_names), np.int32)
    for i, nme in enumerate(index.contig_names):
        clen[i] = contig_lengths[nme]
    dm = DeviceMapper(
        index, K, W, batch_bases=batch_bases, with_hashes=cfg.repeats,
        prechain=(clen, Z), runs_only=True,
    )
    # warmup (compiles the bucket shapes used by the run)
    warm_fa = "/tmp/ntlink_bench_warm.fa"
    with open(warm_fa, "w") as fh:
        for name, seq in reads[:64]:
            fh.write(f">{name}\n{seq}\n")
    warm_cfg = ScaffoldConfig(
        k=K, w=W, z=Z, reads=[warm_fa], batch_bases=batch_bases
    )
    pipeline.map_reads(warm_cfg, index, contig_lengths, None, None, mapper=dm)

    # best of 4: the shared tunnel to the chip swings 2-3x run to run;
    # the best run reflects the engine's per-chip capability. Under truly
    # bad weather (observed <0.1 MB/s) a single run takes minutes — stop
    # repeating once the budget is clearly better spent reporting what we
    # have than timing out the whole attempt.
    dm.wire_stats.update(h2d=0, d2h=0, h2d_s=0.0, d2h_s=0.0)
    best_t, tally, dev_runs, tot_t = None, None, 0, 0.0
    for _ in range(4):
        t0 = time.time()
        tally = pipeline.map_reads(
            cfg, index, contig_lengths, None, None, mapper=dm,
        )
        dt = time.time() - t0
        dev_runs += 1
        tot_t += dt
        best_t = dt if best_t is None else min(best_t, dt)
        if dt > 90:
            print(f"# slow link ({dt:.0f}s/run); stopping early",
                  file=sys.stderr)
            break
    dev_t = best_t
    n_reads = len(reads)
    n_pairs = len(tally.pairs)
    print(
        f"# device[{device_kind}]: {n_reads} reads {n_bases/1e6:.0f} Mbase in "
        f"{dev_t:.2f}s (best of {dev_runs}) -> {n_reads/dev_t:.0f} reads/s, "
        f"{n_bases/dev_t/1e6:.0f} Mbase/s, {n_pairs} pairs",
        file=sys.stderr,
    )

    # wire analysis from the run's OWN transfers: counted bytes AND the
    # seconds each stream thread actually spent blocked in them (feeder
    # H2D puts, drainer meta/flat waits) — no one-shot probes, whose
    # single readings mis-stated the r04 ceiling by 4x. The fraction is
    # in (0, 1] by construction: each direction's blocked seconds are
    # measured on one thread so cannot exceed the wall; if the two
    # directions' sum exceeds the wall they overlapped (parallel-capable
    # link), and the binding fraction is the larger direction.
    wire = {}
    try:
        h2d_b = dm.wire_stats["h2d"] / (dev_runs * n_reads)
        d2h_b = dm.wire_stats["d2h"] / (dev_runs * n_reads)
        h2d_s = dm.wire_stats["h2d_s"]
        d2h_s = dm.wire_stats["d2h_s"]
        if tot_t > 0 and (h2d_s + d2h_s) > 0:
            f_h2d = min(1.0, h2d_s / tot_t)
            f_d2h = min(1.0, d2h_s / tot_t)
            frac = f_h2d + f_d2h
            if frac > 1.0:  # directions overlapped: link is parallel
                frac = max(f_h2d, f_d2h)
            assert 0.0 < frac <= 1.0, frac
            wire = {
                "wire_bytes_per_read_h2d": int(h2d_b),
                "wire_bytes_per_read_d2h": int(d2h_b),
                # observed effective link rates from the counted
                # transfers' own timings (MB/s)
                "wire_mbps_h2d_observed": round(
                    dm.wire_stats["h2d"] / max(h2d_s, 1e-9) / 1e6, 1
                ),
                "wire_mbps_d2h_observed": round(
                    dm.wire_stats["d2h"] / max(d2h_s, 1e-9) / 1e6, 1
                ),
                "wire_blocked_s_per_run_h2d": round(h2d_s / dev_runs, 3),
                "wire_blocked_s_per_run_d2h": round(d2h_s / dev_runs, 3),
                # reads/s if wire-blocked time were the only cost
                "wire_ceiling_reads_per_s": round(
                    n_reads * dev_runs / (h2d_s + d2h_s), 1
                ),
                "wire_bound_fraction": round(frac, 3),
            }
            print(f"# wire ceiling: {wire}", file=sys.stderr)
    except Exception as exc:
        print(f"# wire analysis unavailable: {exc}", file=sys.stderr)

    # hybrid leg: the same DeviceMapper plus the native C host path (t
    # threads) run concurrently through HybridMapper — output bytes are
    # identical to either path alone. On CPU-rich production hosts this is
    # pure added throughput; on THIS 4-core box the host path alone is
    # near the machine ceiling and the adaptive split tracks whichever
    # path today's tunnel weather favors.
    # hybrid vs strong-host, INTERLEAVED: the two legs alternate in the
    # same process minutes apart at most, so the captured comparison sees
    # the same box CPU load and tunnel weather (separately-timed legs
    # drifted 20-30% between measurements and could invert the verdict).
    hyb = {}
    try:
        from ntlink_tpu.host_map import HostMapper
        from ntlink_tpu.hybrid_map import HybridMapper

        hm = HybridMapper(
            dm,
            HostMapper(
                index, K, W, threads=4, prechain=(clen, Z), runs_only=True
            ),
        )
        hyb_cfg = ScaffoldConfig(
            k=K, w=W, z=Z, reads=[reads_fa], batch_bases=batch_bases,
            backend="hybrid", t=4,
        )
        strong_cfg = ScaffoldConfig(
            k=K, w=W, z=Z, reads=[reads_fa], backend="numpy", t=4
        )
        pipeline.map_reads(warm_cfg, index, contig_lengths, None, None,
                           mapper=hm)
        best_h, h_tally = None, None
        best_s, s_tally = None, None
        for _ in range(3):
            t0 = time.time()
            h_tally = pipeline.map_reads(
                hyb_cfg, index, contig_lengths, None, None, mapper=hm
            )
            dt = time.time() - t0
            best_h = dt if best_h is None else min(best_h, dt)
            t0 = time.time()
            s_tally = pipeline.map_reads(
                strong_cfg, index, contig_lengths, None, None
            )
            ds = time.time() - t0
            best_s = ds if best_s is None else min(best_s, ds)
            if dt > 90:
                break
        hyb = {
            "hybrid_reads_per_s": round(n_reads / best_h, 1),
            "hybrid_device_share": round(
                hm.device_reads / max(1, hm.device_reads + hm.host_reads), 2
            ),
            "hybrid_pairs": len(h_tally.pairs),
            "host_strong_interleaved_reads_per_s": round(n_reads / best_s, 1),
        }
        if len(h_tally.pairs) != n_pairs or len(s_tally.pairs) != n_pairs:
            raise AssertionError(
                f"tally diverged: hybrid {len(h_tally.pairs)} / host "
                f"{len(s_tally.pairs)} != {n_pairs}"
            )
        print(
            f"# hybrid[device+4 host threads]: {n_reads} reads (best of 3, "
            f"interleaved with host) -> {hyb['hybrid_reads_per_s']:.0f} "
            f"reads/s (device share {hyb['hybrid_device_share']}) vs "
            f"interleaved strong host "
            f"{hyb['host_strong_interleaved_reads_per_s']:.0f} reads/s",
            file=sys.stderr,
        )
    except AssertionError:
        raise
    except Exception as exc:
        print(f"# hybrid leg unavailable: {exc}", file=sys.stderr)
    try:
        extra = _kernel_bench()
    except AssertionError:
        raise  # kernel parity failure is a real defect — surface it
    except Exception as exc:  # transport blip: keep the mapping result
        print(f"# kernel bench unavailable: {exc}", file=sys.stderr)
        extra = {}
    print(f"# kernels: {extra}", file=sys.stderr)
    print(json.dumps({
        "reads_per_s": n_reads / dev_t,
        "pairs": n_pairs,
        **hyb, **link, **wire, **extra,
    }))


def main():
    import subprocess

    # The device leg runs in a subprocess with retries: the shared-TPU
    # tunnel in this environment occasionally wedges; a fresh process
    # re-establishes the claim cleanly.
    dev_rps = None
    extra = {}
    # 4 attempts with growing backoff: a wedged tunnel (killed TPU process
    # upstream) typically recovers after a few quiet minutes
    backoffs = (20, 90, 240)
    for attempt in range(4):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--device"],
                capture_output=True,
                text=True,
                timeout=420 if attempt < 3 else 560,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            for line in proc.stderr.splitlines():
                if line.startswith("#"):
                    print(line, file=sys.stderr)
            for line in proc.stdout.splitlines():
                if line.startswith("{"):
                    payload = json.loads(line)
                    dev_rps = payload.pop("reads_per_s")
                    extra = payload
            if dev_rps is not None:
                break
            print(f"# device attempt {attempt+1} produced no result; retrying",
                  file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"# device attempt {attempt+1} timed out; retrying",
                  file=sys.stderr)
        if attempt < 3:  # no pointless backoff after the final attempt
            time.sleep(backoffs[min(attempt, len(backoffs) - 1)])

    from ntlink_tpu import pipeline
    from ntlink_tpu.config import ScaffoldConfig

    contigs, reads, contig_lengths, index = build_workload()

    # strong host leg: the engine's best pure-CPU configuration (native C
    # reader + threaded NumPy sketch/join + C chain_batch, t=4) over the
    # full workload — the honest stand-in for 4-thread CPU ntLink
    reads_fa = "/tmp/ntlink_bench_reads_host.fa"
    with open(reads_fa, "w") as fh:
        for name, seq in reads:
            fh.write(f">{name}\n{seq}\n")
    strong_cfg = ScaffoldConfig(
        k=K, w=W, z=Z, reads=[reads_fa], backend="numpy", t=4
    )
    # baseline of record: the strong-host runs interleaved with the hybrid
    # runs in the device subprocess (same box load + weather — the honest
    # comparison). The parent re-measures only when the subprocess didn't
    # produce one (device unavailable).
    strong_rps = extra.get("host_strong_interleaved_reads_per_s", 0.0)
    if strong_rps:
        print(
            f"# strong-host baseline (interleaved with hybrid in the "
            f"device process): {strong_rps:.0f} reads/s",
            file=sys.stderr,
        )
    else:
        strong_pairs = 0
        for _ in range(2):  # best of 2: host load swings
            t0 = time.time()
            st = pipeline.map_reads(
                strong_cfg, index, contig_lengths, None, None
            )
            strong_rps = max(strong_rps, len(reads) / (time.time() - t0))
            strong_pairs = len(st.pairs)
        print(
            f"# strong-host baseline (C reader + threaded C sketch/join + "
            f"C chain, t=4): {len(reads)} reads (best of 2) -> "
            f"{strong_rps:.0f} reads/s, {strong_pairs} pairs",
            file=sys.stderr,
        )
        if "pairs" in extra and extra["pairs"] != strong_pairs:
            raise AssertionError(
                f"device tally diverged from host: {extra['pairs']} "
                f"!= {strong_pairs}"
            )

    # weak host leg (round-to-round comparability): single-threaded
    # per-hit Python objects
    cfg = ScaffoldConfig(k=K, w=W, z=Z)
    sub = reads[: max(100, N_READS // 75)]
    weak_rps = 0.0
    for _ in range(2):
        t0 = time.time()
        n_r, _, _ = run_mapping(contigs, sub, index, contig_lengths, cfg, None)
        weak_rps = max(weak_rps, n_r / (time.time() - t0))
    print(
        f"# weak-host baseline (single-thread python objects): {n_r} reads "
        f"(best of 2) -> {weak_rps:.0f} reads/s",
        file=sys.stderr,
    )

    if dev_rps is None:
        print("# WARNING: device unavailable; reporting host throughput",
              file=sys.stderr)
        dev_rps = strong_rps
    # headline = the engine's best single-host configuration. That is the
    # hybrid path (device + host C path concurrently, byte-identical
    # output) when it ran; device-only / host-only figures stay in their
    # own fields. vs_baseline scores the headline against the strong-host
    # stand-in for 4-thread CPU ntLink (BASELINE.md target #2).
    hybrid_rps = extra.get("hybrid_reads_per_s", 0.0)
    engine_best = max(dev_rps, strong_rps, hybrid_rps)
    print(
        json.dumps(
            {
                "metric": "long_read_mapping_throughput",
                "value": round(engine_best, 1),
                "unit": "reads/s",
                "vs_baseline": round(engine_best / strong_rps, 2),
                "device_reads_per_s": round(dev_rps, 1),
                "host_strong_reads_per_s": round(strong_rps, 1),
                "host_weak_reads_per_s": round(weak_rps, 1),
                "device_vs_strong_host": round(dev_rps / strong_rps, 2),
                "device_vs_weak_host": round(dev_rps / weak_rps, 2),
                "engine_best_reads_per_s": round(engine_best, 1),
                "engine_best_vs_weak_host": round(engine_best / weak_rps, 2),
                **extra,
            }
        )
    )


if __name__ == "__main__":
    if "--device" in sys.argv:
        device_run()
    else:
        main()
