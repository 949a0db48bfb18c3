"""Regression pin for the layout-ambiguity oracle result (DESIGN.md table):
the shipped configuration (support-weighted tips, transitive reduction
before resolution) must keep beating the flipped variants on synthetic
truth graphs. Small seed count — the full table comes from
scripts/layout_oracle.py --seeds 40."""
import os
import sys

import numpy as np

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts"),
)
from layout_oracle import build_truth_graph, run_variant, score  # noqa: E402


def _avg(variant_args, seeds=12, **grid):
    mis = rec = 0.0
    for s in range(seeds):
        rng = np.random.default_rng(1000 + s)
        g, truth, lengths = build_truth_graph(rng, **grid)
        m, r, _ = score(run_variant(g, lengths, *variant_args), truth, lengths)
        mis += m
        rec += r / (len(truth) / 2)
    return mis / seeds, rec / seeds


def test_shipped_variant_beats_flips():
    grid = dict(n_chimeric=10, n_tips=10, noise_n=3)
    mis_a, rec_a = _avg((True, True), **grid)    # shipped
    mis_b, rec_b = _avg((False, True), **grid)   # topological tips
    mis_c, rec_c = _avg((True, False), **grid)   # resolve before reduce
    # support-weighted tips: no more misjoins, no less recovery (ties ok)
    assert mis_a <= mis_b + 1e-9
    assert rec_a >= rec_b - 1e-9
    # reduce-first: strictly dominant
    assert mis_a < mis_c
    assert rec_a > rec_c


def test_shipped_variant_beats_flips_adversarial_families():
    """Round-5 families (DESIGN.md table): tandem repeats with self-edges,
    near-true-support chimeras, and near-tie branches must not flip the
    verdict — the shipped config stays at least as good on misjoins and
    recovery as the topological-tip flip."""
    for grid in (
        dict(n_chimeric=6, n_tips=4, noise_n=2, n_tandem=3),
        dict(n_chimeric=10, n_tips=4, chimera_ratio=0.85),
        dict(n_chimeric=0, n_tips=0, n_neartie=10),
    ):
        mis_a, rec_a = _avg((True, True), **grid)
        mis_b, rec_b = _avg((False, True), **grid)
        assert mis_a <= mis_b + 1e-9, grid
        assert rec_a >= rec_b - 1e-9, grid


def test_unambiguous_graph_is_untouched():
    """On clean chains every resolution pass is a no-op regardless of the
    tip rule (golden byte parity depends on this)."""
    rng = np.random.default_rng(0)
    g, truth, lengths = build_truth_graph(
        rng, n_repeats=0, n_chimeric=0, n_tips=0, p_transitive=0.0
    )
    for st in (True, False):
        res = run_variant(g, lengths, st, True)
        mis, rec, _ = score(res, truth, lengths)
        assert mis == 0
        assert rec == len(truth) / 2
