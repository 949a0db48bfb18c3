"""Unit tests for the layout engine and stitch stage."""

from ntlink_tpu.graphio import EdgeAttr, ScaffoldGraph
from ntlink_tpu.layout import layout, remove_transitive_edges, run_n_sweep
from ntlink_tpu.stitch import find_optimal_n, stitch


def chain_graph(edges, lengths):
    g = ScaffoldGraph()
    for name, l in lengths.items():
        for ori in "+-":
            g.add_node(name + ori, l)
    for s, t, d, n in edges:
        g.add_edge(s, t, EdgeAttr(d=d, n=n))
        flip = lambda x: x[:-1] + ("-" if x[-1] == "+" else "+")
        g.add_edge(flip(t), flip(s), EdgeAttr(d=d, n=n))
    return g


LENGTHS = {"A": 2000, "B": 3000, "C": 4000, "D": 5000}


def test_transitive_reduction_keeps_chain():
    g = chain_graph(
        [
            ("A+", "B+", 100, 10),
            ("B+", "C+", 200, 10),
            ("A+", "C+", 3350, 4),   # transitive over B
        ],
        LENGTHS,
    )
    r = remove_transitive_edges(g)
    assert r.has_edge("A+", "B+") and r.has_edge("B+", "C+")
    assert not r.has_edge("A+", "C+")


def test_layout_chain_with_min_gap_and_bias():
    g = chain_graph([("A+", "B-", -50, 5), ("B-", "C+", 7, 5)], LENGTHS)
    res = layout(g, LENGTHS, min_weight=1, seed_length=1000, min_gap=20)
    assert len(res.paths) == 1
    # clamped to min_gap, +1 path-file bias
    assert res.paths[0].render() in (
        "A+ 21N B- 21N C+",
        "C- 21N B+ 21N A-",
    )


def test_layout_weight_filter_breaks_weak_edge():
    g = chain_graph([("A+", "B+", 100, 5), ("B+", "C+", 100, 1)], LENGTHS)
    res = layout(g, LENGTHS, min_weight=3, seed_length=1000, min_gap=20)
    assert len(res.paths) == 1
    assert set(n[:-1] for n in res.paths[0].nodes) == {"A", "B"}


def test_ambiguous_fork_not_joined():
    g = chain_graph(
        [("A+", "B+", 100, 5), ("A+", "C+", 100, 5)], LENGTHS
    )
    res = layout(g, LENGTHS, min_weight=1, seed_length=1000, min_gap=20)
    assert res.paths == []


def test_n_sweep_and_optimal_selection(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    g = chain_graph([("A+", "B+", 100, 5), ("B+", "C+", 100, 2)], LENGTHS)
    files = run_n_sweep(g, LENGTHS, 1, 5, 1000, 20, "pre")
    assert len(files) == 5
    best = find_optimal_n(files)
    assert best == files[0]  # n=1 keeps the full chain -> best N50


def test_sweep_prefers_higher_n_when_it_untangles(tmp_path, monkeypatch):
    """A fork at n=1 that even the ambiguity heuristics cannot resolve
    (the spur is no tip and no weak edge) blocks the A-join; n=2 drops it
    by weight and the chain forms — the sweep must pick n=2."""
    monkeypatch.chdir(tmp_path)
    lengths = {"A": 5000, "B": 6000, "C": 4000, "D": 5000}
    g = chain_graph(
        [("A+", "B+", 100, 5), ("A+", "C+", 100, 1), ("C+", "D+", 100, 5)],
        lengths,
    )
    files = run_n_sweep(g, lengths, 1, 5, 1000, 20, "pre")
    best = find_optimal_n(files)
    assert best == files[1]  # n=2
    from ntlink_tpu.stitch import stitch

    stitch(files, g, "out.path", max_gap=-1, conservative=True)
    with open("out.path") as fh:
        lines = sorted(l.rstrip("\n").split("\t")[1] for l in fh)
    assert lines in (
        ["A+ 101N B+", "C+ 101N D+"],
        ["A+ 101N B+", "D- 101N C-"],
        ["B- 101N A-", "C+ 101N D+"],
        ["B- 101N A-", "D- 101N C-"],
    )


def test_non_conservative_stitch_grafts_terminal_edges(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    # best (n=2) layout drops the weak B+->C+ edge; the alternate n=1 layout
    # still shows it end-to-end, so non-conservative mode grafts it back
    g = chain_graph([("A+", "B+", 100, 5), ("B+", "C+", 150, 1)], LENGTHS)
    files = run_n_sweep(g, LENGTHS, 1, 2, 1000, 20, "pre")
    # make n=2 the N50 winner by rigging the sweep order: feed files reversed
    # is unnecessary — craft explicit inputs instead
    with open("best.path", "w") as fh:
        fh.write("0\tA+ 101N B+\n")
    with open("best.path.sterr", "w") as fh:
        fh.write("n\tn:500\tL50\tmin\tN75\tN50\tN25\tE-size\tmax\tsum\tname\n")
        fh.write("3\t3\t1\t2000\t4000\t5000\t5000\t4000\t5000\t9000\tn=2 s=1000\n")
    with open("alt.path", "w") as fh:
        fh.write("0\tA+ 101N B+ 151N C+\n")
    with open("alt.path.sterr", "w") as fh:
        fh.write("n\tn:500\tL50\tmin\tN75\tN50\tN25\tE-size\tmax\tsum\tname\n")
        fh.write("1\t1\t1\t9000\t9000\t4999\t9000\t9000\t9000\t9000\tn=1 s=1000\n")

    stitch(["best.path", "alt.path"], g, "out.path", max_gap=-1,
           conservative=False)
    with open("out.path") as fh:
        lines = [l.rstrip("\n").split("\t")[1] for l in fh]
    assert lines == ["A+ 101N B+ 151N C+"] or lines == ["C- 151N B- 101N A-"]


def test_conservative_stitch_normalizes_and_sorts(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    g = chain_graph([("D+", "B+", 100, 5)], LENGTHS)
    with open("p.path", "w") as fh:
        fh.write("7\tD+ 101N B+\n")
    with open("p.path.sterr", "w") as fh:
        fh.write("n\tn:500\tL50\tmin\tN75\tN50\tN25\tE-size\tmax\tsum\tname\n")
        fh.write("1\t1\t1\t8000\t8000\t8000\t8000\t8000\t8000\t8000\tn=1 s=1000\n")
    stitch(["p.path"], g, "out.path", max_gap=-1, conservative=True)
    with open("out.path") as fh:
        line = fh.read().strip()
    # normalized: lexicographically smaller end first (B < D)
    assert line == "ntLink_0\tB- 101N D-"
