"""JAX sketch backend parity vs the NumPy reference (bit-exact)."""
import numpy as np
import pytest

from ntlink_tpu.ops import nthash_np
from ntlink_tpu.ops.sketch_jax import JaxSketcher
from ntlink_tpu.seqio import stream_fastx

from conftest import REF_TESTS_DIR


def random_seq(rng, n):
    return "".join(rng.choice(list("ACGT"), size=n))


@pytest.mark.parametrize("k,w", [(32, 100), (15, 5), (20, 10), (40, 100)])
def test_jax_matches_numpy_random(k, w):
    rng = np.random.default_rng(k * 1000 + w)
    seqs = [("s%d" % i, random_seq(rng, int(n))) for i, n in
            enumerate(rng.integers(w + k + 5, 5000, size=12))]
    # include one with N (falls back to numpy path) and one short
    seqs.append(("withn", random_seq(rng, 800) + "N" + random_seq(rng, 800)))
    seqs.append(("short", "ACGTACG"))
    sk = JaxSketcher(batch_bases=50_000)
    got = {name: m for name, _, m in sk.sketch_stream(iter(seqs), k, w)}
    for name, seq in seqs:
        ref = nthash_np.sketch_sequence(seq, k, w)
        g = got[name]
        assert np.array_equal(g.positions, ref.positions), name
        assert np.array_equal(g.hashes, ref.hashes), name
        assert np.array_equal(g.forward, ref.forward), name


def test_jax_matches_numpy_real_contigs():
    sk = JaxSketcher()
    seqs = [(r.name, r.seq) for r in stream_fastx(f"{REF_TESTS_DIR}/scaffolds_2.fa")]
    got = {name: m for name, _, m in sk.sketch_stream(iter(seqs), 32, 100)}
    for name, seq in seqs:
        ref = nthash_np.sketch_sequence(seq, 32, 100)
        g = got[name]
        assert np.array_equal(g.hashes, ref.hashes)
        assert np.array_equal(g.positions, ref.positions)
        assert np.array_equal(g.forward, ref.forward)


def test_stream_preserves_order():
    rng = np.random.default_rng(7)
    seqs = [(f"r{i}", random_seq(rng, 1200 + i)) for i in range(9)]
    sk = JaxSketcher(batch_bases=4000)
    names = [name for name, _, _ in sk.sketch_stream(iter(seqs), 16, 10)]
    assert names == [name for name, _ in seqs]
