"""Native IO runtime tests: the C++ scanner/encoder/BGZF must agree with the
pure-Python paths bit for bit."""

import gzip

import numpy as np
import pytest

from groot_tpu.io import native
from groot_tpu.io.fastx import stream_fastq
from groot_tpu.ops.nthash import ASCII_TO_CODE

FASTQ = (
    "/root/reference/src/pipeline/test-data/"
    "test-reads-OXA90-OXA106-100bp-with-errors.fastq"
)


def test_native_builds():
    assert native.available(), "native lib should build in this image"


def test_parse_matches_python():
    buf = open(FASTQ, "rb").read()
    io_, il, so, sl, qo, ql, consumed = native.parse_fastq_buffer(buf)
    reads = list(stream_fastq([FASTQ]))
    assert len(io_) == len(reads) == 2062
    for i in (0, 1, 1000, 2061):
        assert buf[io_[i] : io_[i] + il[i]] == reads[i].id
        assert buf[so[i] : so[i] + sl[i]] == reads[i].seq
        assert buf[qo[i] : qo[i] + ql[i]] == reads[i].qual
    assert consumed <= len(buf)

    # numpy fallback agrees with native
    out_np = native._parse_fastq_np(buf, 1 << 30)
    for a, b in zip((io_, il, so, sl, qo, ql), out_np[:6]):
        assert (a == b).all()


def test_parse_partial_record():
    buf = open(FASTQ, "rb").read()
    cut = buf[: len(buf) - 37]  # truncate mid-record
    io_, *_rest, consumed = native.parse_fastq_buffer(cut)
    assert len(io_) == 2061
    assert consumed < len(cut)


def test_parse_rejects_bad_id():
    with pytest.raises(ValueError):
        native.parse_fastq_buffer(b"no_at_sign\nACGT\n+\nIIII\n")


def test_encode_matches_python():
    buf = b"@r1\nACGTNacgtnXX\n+\nIIIIIIIIIIII\n"
    io_, il, so, sl, qo, ql, _ = native.parse_fastq_buffer(buf)
    codes = native.encode_batch(buf, so, sl, 16)
    expect = np.full((1, 16), 4, np.uint8)
    expect[0, :12] = ASCII_TO_CODE[
        np.frombuffer(b"ACGTNacgtnXX", np.uint8)
    ]
    assert (codes == expect).all()


def test_bgzf_block_roundtrip():
    data = b"groot" * 1000
    block = native.bgzf_block(data)
    if block is None:
        pytest.skip("native lib unavailable")
    assert gzip.decompress(block) == data
    # BC extra field encodes block size
    assert block[12:14] == b"BC"


def test_native_sketch_matches_numpy_batch():
    from groot_tpu.io import native
    from groot_tpu.ops import nthash

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    B, L, k, s = 32, 128, 31, 20
    codes = rng.integers(0, 5, (B, L), dtype=np.uint8)
    lens = rng.integers(20, L + 1, B).astype(np.int64)
    out = native.sketch(codes, lens, k, s)
    ref = nthash.khf_sketch_np_batch(codes, lens, k, s)
    np.testing.assert_array_equal(out, ref)
