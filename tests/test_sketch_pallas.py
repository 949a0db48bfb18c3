"""Pallas fused sketch kernel parity (interpret mode on CPU)."""
import numpy as np
import pytest

from ntlink_tpu.ops import nthash_np
from ntlink_tpu.ops.sketch_jax import finish_hash
from ntlink_tpu.ops.sketch_pallas import ROWS, sketch_batch_pallas


@pytest.mark.parametrize(
    "k,w", [(32, 100), (20, 10), (15, 5), (40, 100), (24, 250), (17, 8)]
)
def test_pallas_matches_numpy(k, w):
    rng = np.random.default_rng(k + w)
    B, L = ROWS, 2048
    codes = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
    lengths = rng.integers(L // 2, L + 1, size=B).astype(np.int32)
    # edge rows: shorter than a full window (no emissions), shorter than k,
    # zero-length padding, exactly one window
    lengths[0] = k + w - 2
    lengths[1] = max(k - 1, 1)
    lengths[2] = 0
    lengths[3] = k + w - 1
    can_hi, can_lo, fwd, winner, emit = [
        np.asarray(o)
        for o in sketch_batch_pallas(codes, lengths, k, w, True)
    ]
    out_hi, out_lo = (np.asarray(o) for o in finish_hash(can_hi, can_lo, k))
    out = (out_hi.astype(np.uint64) << np.uint64(32)) | out_lo.astype(np.uint64)
    for r in range(B):
        ref = nthash_np.sketch_codes(codes[r, : lengths[r]], k, w)
        sel = winner[r][emit[r].astype(bool)]
        assert np.array_equal(sel, ref.positions), f"row {r} positions"
        assert np.array_equal(out[r][sel], ref.hashes), f"row {r} hashes"
        assert np.array_equal(fwd[r][sel].astype(bool), ref.forward), f"row {r} strand"


@pytest.mark.parametrize("k,w", [(32, 100), (24, 250), (15, 5)])
def test_pallas_chunked_matches_numpy(k, w):
    """Column-chunked kernel (chunk=512 to force many chunks) == NumPy,
    including winner dedup across chunk boundaries and edge-length rows."""
    from ntlink_tpu.ops.sketch_jax import finish_hash
    from ntlink_tpu.ops.sketch_pallas import sketch_batch_pallas_chunked

    rng = np.random.default_rng(3 * k + w)
    B, L = ROWS, 4096
    codes = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
    lengths = rng.integers(L // 2, L + 1, size=B).astype(np.int32)
    lengths[0] = k + w - 2
    lengths[1] = 0
    can_hi, can_lo, fwd, winner, emit = [
        np.asarray(o)
        for o in sketch_batch_pallas_chunked(
            codes.astype(np.int32), lengths, k, w, 512, True
        )
    ]
    out_hi, out_lo = (np.asarray(o) for o in finish_hash(can_hi, can_lo, k))
    out = (out_hi.astype(np.uint64) << np.uint64(32)) | out_lo.astype(np.uint64)
    for r in range(B):
        ref = nthash_np.sketch_codes(codes[r, : lengths[r]], k, w)
        sel = winner[r][emit[r].astype(bool)]
        assert np.array_equal(sel, ref.positions), f"row {r} positions"
        assert np.array_equal(out[r][sel], ref.hashes), f"row {r} hashes"
        assert np.array_equal(fwd[r][sel].astype(bool), ref.forward), f"row {r} strand"
