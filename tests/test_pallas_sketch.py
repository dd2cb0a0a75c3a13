"""The fused Pallas sketch kernel must equal the XLA path bit for bit.
Runs in interpreter mode on the CPU test mesh; compiled on real TPU."""

import numpy as np

from groot_tpu.ops import nthash, u64
from groot_tpu.ops.pallas_sketch import khf_sketch_pallas


def test_pallas_sketch_matches_xla():
    rng = np.random.default_rng(5)
    k, s = 31, 20
    B, L = 16, 256
    codes = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    lens = rng.integers(100, L + 1, size=B).astype(np.int32)
    for i in range(B):
        codes[i, lens[i] :] = 4
    hi, lo = khf_sketch_pallas(codes, lens, k, s, interpret=True)
    got = u64.to_np(np.asarray(hi), np.asarray(lo))
    xhi, xlo = nthash.khf_sketch(codes, k, s, valid_len=lens)
    expect = u64.to_np(np.asarray(xhi), np.asarray(xlo))
    assert (got == expect).all()


def test_pallas_sketch_k51():
    rng = np.random.default_rng(6)
    k, s = 51, 30
    codes = rng.integers(0, 4, size=(8, 128)).astype(np.uint8)
    lens = np.full(8, 100, np.int32)
    codes[:, 100:] = 4
    hi, lo = khf_sketch_pallas(codes, lens, k, s, interpret=True)
    got = u64.to_np(np.asarray(hi), np.asarray(lo))
    for i in range(8):
        golden = nthash.khf_sketch_np(codes[i, :100], k, s)
        assert (got[i] == golden).all()
