"""Multi-host tally merge semantics (single-process exercised)."""
from ntlink_tpu.mapping import AnchorHit, ContigRun
from ntlink_tpu.pairs import PairTally
from ntlink_tpu.parallel.distributed import (
    merge_tallies,
    serialize_tally,
    shard_read_files,
)

LENGTHS = {"A": 5000, "B": 5000}


def mk_tally(gaps):
    t = PairTally(LENGTHS, 32, 10)
    for g in gaps:
        runs = [
            ContigRun("A", [AnchorHit(1, 4000, "+", 100, "+"),
                            AnchorHit(2, 4500, "+", 600, "+")]),
            ContigRun("B", [AnchorHit(3, 100, "+", 600 + 400 + g + 100, "+"),
                            AnchorHit(4, 600, "+", 600 + 400 + g + 600, "+")]),
        ]
        t.add_read(runs, 50000)
    return t


def test_merge_matches_single_host():
    combined = mk_tally([10, 20, 30, 40])
    part1 = mk_tally([10, 20])
    part2 = mk_tally([30, 40])
    merged = merge_tallies(
        PairTally(LENGTHS, 32, 10),
        [serialize_tally(part1), serialize_tally(part2)],
    )
    assert set(merged.pairs) == set(combined.pairs)
    for key in combined.pairs:
        assert merged.pairs[key].gap_estimates == combined.pairs[key].gap_estimates
        assert merged.pairs[key].anchor == combined.pairs[key].anchor
        assert merged.pairs[key].gap_estimate() == combined.pairs[key].gap_estimate()


def test_shard_read_files():
    files = [f"r{i}" for i in range(5)]
    shards = [shard_read_files(files, p, 2) for p in range(2)]
    assert shards[0] == ["r0", "r2", "r4"]
    assert shards[1] == ["r1", "r3"]
    assert sorted(shards[0] + shards[1]) == sorted(files)
