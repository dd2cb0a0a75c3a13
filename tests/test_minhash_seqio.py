"""Reference API-surface tests for src/minhash and src/seqio equivalents
(mirroring /root/reference/src/minhash/minhash_test.go and
src/seqio/seqio_test.go)."""

import numpy as np
import pytest

from groot_tpu.io.fastx import FastqRead
from groot_tpu.io.seqio import base_check, deep_copy, qual_trim, rev_complement
from groot_tpu.ops.minhash import BloomFilter, KHFsketch, KMVsketch, run_minhash

SEQ_A = b"ACTGCGTGCGTGAAACGTGCACGTGACGTG"
SEQ_A_RC = b"CACGTCACGTGCACGTTTCACGCACGCAGT"
K, S = 7, 10


def test_bloom_filter():
    f = BloomFilter(10)
    for v in (12345, 54321, 9999999, 98765):
        f.add(v)
        assert f.check(v)
    f.reset()
    assert not f.check(12345)


def test_constructors_and_short_seq():
    khf = KHFsketch(K, S)
    assert len(khf.get_sketch()) == S
    with pytest.raises(ValueError):
        khf.add_sequence(SEQ_A[:1])
    kmv = KMVsketch(K, S)
    with pytest.raises(ValueError):
        kmv.add_sequence(SEQ_A[:1])


def test_similarity_estimates_rc_pair():
    """Both flavours must report similarity 1.0 for a sequence vs its
    reverse complement (minhash_test.go:111-157)."""
    k1, k2 = KHFsketch(K, S), KHFsketch(K, S)
    k1.add_sequence(SEQ_A)
    k2.add_sequence(SEQ_A_RC)
    assert k1.get_similarity(k2) == 1.0
    m1, m2 = KMVsketch(K, S), KMVsketch(K, S)
    m1.add_sequence(SEQ_A)
    m2.add_sequence(SEQ_A_RC)
    assert m1.get_similarity(m2) == 1.0


def test_run_minhash_kmv_padding():
    # 8 k-mers < sketch size 10 -> zero padding (seqio.go:57-64)
    sk = run_minhash(SEQ_A[:14], K, 10, kmv=True)
    assert len(sk) == 10
    assert (sk[8:] == 0).all()


def test_base_check():
    assert base_check(b"acgtnXq-") == b"ACGTNNNN"


def test_rev_complement_flags_and_qual():
    r = FastqRead(id=b"@r", seq=b"AACGT", qual=b"IIIH#")
    rev_complement(r)
    assert r.seq == b"ACGTT"
    assert r.qual == b"#HIII"
    assert r.rc is True
    rev_complement(r)
    assert r.seq == b"AACGT"
    assert r.rc is False


def test_deep_copy_independent():
    r = FastqRead(id=b"@r", seq=b"AACGT", qual=b"IIIII")
    c = deep_copy(r)
    rev_complement(c)
    assert r.seq == b"AACGT" and c.seq != r.seq


def test_qual_trim():
    # low-quality tail ('#' = phred 2) is trimmed at cutoff 20
    r = FastqRead(id=b"@r", seq=b"ACGTACGTAC", qual=b"IIIIIIII##")
    qual_trim(r, 20)
    assert r.seq == b"ACGTACGT"
    # all-bad read collapses to empty
    r2 = FastqRead(id=b"@r", seq=b"ACGT", qual=b"####")
    qual_trim(r2, 20)
    assert r2.seq == b""
