import numpy as np
import pytest

from groot_tpu.ops import nthash, u64

# the reference's RC-property test sequences
# (/root/reference/src/minhash/minhash_test.go:9-15)
SEQ_A = b"ACTGCGTGCGTGAAACGTGCACGTGACGTG"
SEQ_A_RC = b"CACGTCACGTGCACGTTTCACGCACGCAGT"


def test_encode_decode():
    codes = nthash.encode_seq(b"ACGTNacgtnX-")
    assert list(codes) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 4, 4]
    assert nthash.decode_seq(codes[:5]) == b"ACGTN"


def test_rolling_equals_direct():
    """Prefix-xor JAX formulation must equal the direct O(L*k) definition."""
    rng = np.random.default_rng(1)
    for k in (3, 7, 31, 51):
        codes = rng.integers(0, 4, size=200).astype(np.uint8)
        golden = nthash.canonical_hashes_np(codes, k)
        hi, lo = nthash.canonical_hashes(codes[None, :], k)
        got = u64.to_np(hi, lo)[0]
        assert (got == golden).all(), f"k={k}"


def test_canonical_property():
    """A sequence and its reverse complement share all k-mer hashes."""
    codes = nthash.encode_seq(SEQ_A)
    rc = nthash.revcomp_codes(codes)
    assert nthash.decode_seq(rc) == SEQ_A_RC
    h1 = nthash.canonical_hashes_np(codes, 7)
    h2 = nthash.canonical_hashes_np(rc, 7)
    assert set(h1) == set(h2)
    assert (h1 == h2[::-1]).all()


def test_multihash_matches_numpy():
    rng = np.random.default_rng(2)
    base = rng.integers(0, 2**64, size=64, dtype=np.uint64)
    golden = nthash.multihash_np(base, 31, 21)
    got = u64.to_np(*nthash.multihash(u64.from_np(base), 31, 21))
    assert (got == golden).all()


def test_khf_sketch_rc_similarity_one():
    """The reference's KHF RC-pair property: similarity must be exactly 1.0
    (src/minhash/minhash_test.go:139-147)."""
    k, s = 7, 10
    codes = nthash.encode_seq(SEQ_A)
    sk1 = nthash.khf_sketch_np(codes, k, s)
    sk2 = nthash.khf_sketch_np(nthash.encode_seq(SEQ_A_RC), k, s)
    assert (sk1 == sk2).all()


def test_khf_sketch_jax_matches_numpy_batched():
    k, s = 31, 21
    rng = np.random.default_rng(3)
    lens = [100, 150, 120, 31]
    L = max(lens)
    batch = np.full((len(lens), L), 4, dtype=np.uint8)
    goldens = []
    for i, ln in enumerate(lens):
        seq = rng.integers(0, 4, size=ln).astype(np.uint8)
        batch[i, :ln] = seq
        goldens.append(nthash.khf_sketch_np(seq, k, s))
    hi, lo = nthash.khf_sketch(batch, k, s, valid_len=np.array(lens))
    got = u64.to_np(hi, lo)
    assert (got == np.stack(goldens)).all()


def test_short_sequence_raises():
    with pytest.raises(ValueError):
        nthash.khf_sketch_np(nthash.encode_seq(b"A"), 7, 10)


def test_khf_sketch_np_batch_matches_golden():
    """The batched host scan (prefix-XOR) must equal the per-read O(L*k)
    golden for ragged batches, incl. too-short rows (all-ones sketch)."""
    rng = np.random.default_rng(7)
    k, s = 31, 20
    B, L = 16, 96
    codes = rng.integers(0, 5, size=(B, L), dtype=np.uint8)
    lens = rng.integers(20, L + 1, size=B).astype(np.int64)
    lens[0] = L
    lens[1] = k  # exactly one k-mer
    lens[2] = k - 1  # too short
    out = nthash.khf_sketch_np_batch(codes, lens, k, s)
    FULL = np.uint64(0xFFFFFFFFFFFFFFFF)
    for i in range(B):
        if lens[i] < k:
            assert (out[i] == FULL).all()
        else:
            golden = nthash.khf_sketch_np(codes[i, : lens[i]], k, s)
            np.testing.assert_array_equal(out[i], golden)
