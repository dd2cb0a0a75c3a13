"""The BAM fast paths must agree with their reference-faithful twins:

* bgzf_decompress vs gzip.decompress (multi-member BGZF and plain gzip);
* the native report scan (gio_bam_scan + global range-update pileup) vs
  the record-loop report.
"""

import gzip
import io
import os

import numpy as np
import pytest

from groot_tpu.io import bam as bamio
from groot_tpu.io import native


def _write_bam(records, tmp_path, quals=True):
    """Small BAM with two references and the given (ref_id, pos, rev) recs."""
    from groot_tpu.align.aligner import AlignmentRecord

    refs = bamio.References()
    for i, (name, length) in enumerate(
        (("*argA", 200), ("argB", 150))
    ):
        r = bamio.Reference(name=name, length=length, ref_id=i, path_id=i)
        refs.setdefault(i, []).append(r)
        refs.by_path[(i, i)] = r
    path = str(tmp_path / "t.bam")
    with open(path, "wb") as fh:
        w = bamio.BamWriter(fh, refs)
        for j, (gid, pos, rev) in enumerate(records):
            w.write(
                AlignmentRecord(
                    name=f"r{j}",
                    graph_id=gid,
                    path_id=gid,
                    pos=pos,
                    seq=b"ACGTACGTACGTACGTACGT",
                    qual=b"I" * 20 if quals else b"",
                    mapq=30,
                    reverse=rev,
                    secondary=False,
                    start_clip=1 if j % 3 == 0 else 0,
                    end_clip=1 if j % 4 == 0 else 0,
                )
            )
        w.close()
    return path


def test_bgzf_decompress_matches_gzip(tmp_path):
    recs = [(j % 2, (j * 7) % 100, j % 2 == 0) for j in range(500)]
    path = _write_bam(recs, tmp_path)
    raw = open(path, "rb").read()
    assert bamio.bgzf_decompress(raw) == gzip.decompress(raw)


def test_bgzf_decompress_plain_gzip_fallback():
    blob = os.urandom(1000) + b"hello" * 2000
    raw = gzip.compress(blob)
    assert bamio.bgzf_decompress(raw) == blob


def test_bam_scan_matches_reader(tmp_path):
    recs = [(j % 2, (j * 11) % 120, j % 3 == 0) for j in range(300)]
    path = _write_bam(recs, tmp_path)
    data = bamio.bgzf_decompress(open(path, "rb").read())
    refs, off = bamio.parse_bam_header(data)
    res = native.bam_scan(np.frombuffer(data, np.uint8), off)
    assert res is not None
    ref_id, pos, flag, aln = res
    _, records = bamio.read_bam(path)
    py = [(r.ref_id, r.pos, r.flag, r.aln_len()) for r in records]
    got = list(zip(ref_id.tolist(), pos.tolist(), flag.tolist(), aln.tolist()))
    assert got == py


def test_report_fast_matches_slow(tmp_path):
    # dense coverage on ref 0 only -> ref 0 passes the cutoff
    recs = [(0, p, False) for p in range(0, 181, 1)] + [(1, 3, False)]
    path = _write_bam(recs, tmp_path)
    from groot_tpu.report.pileup import report_from_bam

    fast = report_from_bam(path, coverage_cutoff=0.9)
    orig = native.available
    native.available = lambda: False
    try:
        slow = report_from_bam(path, coverage_cutoff=0.9)
    finally:
        native.available = orig
    assert fast == slow
    assert [a.arg for a in fast] == ["argA"]


def test_bgzf_decompress_corrupt_bsize_falls_back(tmp_path):
    """A block whose declared BSIZE is smaller than its own header+footer
    (negative compressed length) must never reach native code with a bogus
    length; the gzip fallback ignores the BC subfield and still recovers
    the stream."""
    recs = [(0, 5, False) for _ in range(10)]
    path = _write_bam(recs, tmp_path)
    raw = open(path, "rb").read()
    want = gzip.decompress(raw)
    bad = bytearray(raw)
    # BSIZE lives at offset 16 of the first block header (BC subfield);
    # declare a 20-byte block: 20 < 18-byte header + 8-byte footer
    bad[16:18] = (20 - 1).to_bytes(2, "little")
    assert bamio.bgzf_decompress(bytes(bad)) == want
