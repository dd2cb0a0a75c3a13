"""Frozen regression goldens (VERDICT r3 item 9).

No Go toolchain exists in this image, so reference-minted golden outputs
cannot be produced (SURVEY §7 M0); instead these freeze THIS tool's own
outputs on the two checked-in workloads so later rounds cannot drift
silently. The parity surface is order-canonicalized (PARITY.md §divergence
1): BAM records are compared as a sorted (name, ref, pos, flag, len,
cigar) digest.

If an intentional behavior change moves these values, update the constants
in the same commit and say why in the commit message.
"""

import hashlib
import os
import shutil
import tarfile

import pytest

from groot_tpu.config import AlignCmd, Info
from groot_tpu.index.lshe import ContainmentIndex
from groot_tpu.io import bam as bamio
from groot_tpu.pipeline.align_pipeline import run_align
from groot_tpu.pipeline.index_pipeline import run_index
from groot_tpu.report.pileup import report_from_bam

DB_TAR = "/root/reference/db/clustered-ARG-databases/1.1/arg-annot.90.tar"
B7_READS = "/root/reference/testing/data/bla-b7-150bp-5x.fq"
ACC_READS = (
    "/root/reference/testing/data/argannot-150bp-10000-reads.fq.gz"
)

# ---- frozen values (minted 2026-08-20, round 4) -------------------------
B7_STATS = (24, 24, 0, 28)  # received, mapped, multimapped, alignments
B7_BAM_SHA256 = (
    "11da911514b14e8bc0d3cdb1e112b639e33e4db47a07127b2bd7f322c5ba8af6"
)
B7_REPORT = [("argannot~~~(Bla)B-7~~~AF189304:1-747", 24, 747, "729M18D")]
ACC_GOLDEN = {
    "aligned": 9947,
    "multialigned": 4955,
    "unaligned": 53,
    "misaligned": 622,
    "correct_start": 9323,
}
ACC_MAPPED = 9954
ACC_ALIGNMENTS = 91889
ACC_BREAKDOWN = {
    "same_cluster": 450,
    "cross_cluster": 0,
    "mangled_correct": 172,
    "origin_unknown": 0,
}


def _align(info, reads, bam_path):
    info.containment_threshold = 0.99
    info.sketch = AlignCmd(min_kmer_coverage=1.0)
    refs = bamio.build_references(info.store)
    with open(bam_path, "wb") as fh:
        writer = bamio.BamWriter(fh, refs)
        stats = run_align(info, [reads], bam_writer=writer)
        writer.close()
    return stats


def _canonical_bam_sha(bam_path: str) -> str:
    refs, recs = bamio.read_bam(bam_path)
    names = {i: r.name for i, r in enumerate(refs)}
    canon = sorted(
        (r.name, names[r.ref_id], r.pos, r.flag, r.seq_len, tuple(r.cigar))
        for r in recs
    )
    return hashlib.sha256(repr(canon).encode()).hexdigest()


@pytest.fixture(scope="module")
def b7_index(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden-b7")
    with tarfile.open(DB_TAR) as tar:
        tar.extractall(tmp, filter="data")
    src = tmp / "arg-annot.90"
    sub = tmp / "subset"
    sub.mkdir()
    wanted = {f"cluster-{i}.msa" for i in range(1, 25)} | {
        "cluster-139.msa",
        "cluster-155.msa",
        "cluster-187.msa",
        "cluster-224.msa",
        "cluster-299.msa",
    }
    for name in wanted:
        p = src / name
        if p.exists():
            shutil.copy(p, sub / name)
    index_dir = str(tmp / "index")
    info = Info(
        kmer_size=31,
        sketch_size=20,
        window_size=150,
        containment_threshold=0.99,
        index_dir=index_dir,
    )
    run_index(info, str(sub))
    return index_dir


def test_b7_golden(b7_index, tmp_path):
    info = Info.load(os.path.join(b7_index, "groot.gg"))
    info.attach_db(
        ContainmentIndex.load(os.path.join(b7_index, "groot.lshe"))
    )
    bam_path = str(tmp_path / "b7.bam")
    stats = _align(info, B7_READS, bam_path)
    assert (
        stats.received, stats.mapped, stats.multimapped,
        stats.alignment_count,
    ) == B7_STATS
    assert _canonical_bam_sha(bam_path) == B7_BAM_SHA256
    rows = [
        (a.arg, a.count, a.length, a.cigar)
        for a in report_from_bam(bam_path, coverage_cutoff=0.97)
    ]
    assert rows == B7_REPORT


@pytest.fixture(scope="module")
def full_index(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden-full")
    with tarfile.open(DB_TAR) as tar:
        tar.extractall(tmp, filter="data")
    index_dir = str(tmp / "index")
    info = Info(
        kmer_size=31,
        sketch_size=20,
        window_size=150,
        containment_threshold=0.99,
        index_dir=index_dir,
    )
    run_index(info, str(tmp / "arg-annot.90"))
    return index_dir


def test_accuracy_10k_golden(full_index, tmp_path):
    """The 10k-perfect-read accuracy harness numbers, frozen (the
    reference records none in-repo; these are this tool's own,
    testing/run_accuracy_tests.sh is the reference procedure)."""
    from groot_tpu.report.accuracy import evaluate_bam

    info = Info.load(os.path.join(full_index, "groot.gg"))
    info.attach_db(
        ContainmentIndex.load(os.path.join(full_index, "groot.lshe"))
    )
    bam_path = str(tmp_path / "acc.bam")
    stats = _align(info, ACC_READS, bam_path)
    assert stats.mapped == ACC_MAPPED
    assert stats.alignment_count == ACC_ALIGNMENTS
    acc = evaluate_bam(bam_path, 10000)
    got = {key: getattr(acc, key) for key in ACC_GOLDEN}
    assert got == ACC_GOLDEN

    # the 622 "misaligned" decomposed (r4 verdict item 6, PARITY.md): 450
    # are paralog multimaps INSIDE the origin's ~90%-identity cluster
    # (ambiguity the reference harness counts identically), 172 are
    # actually-correct alignments hidden by bbmap's '_'->'{' read-name
    # mangling (the Go harness does no un-mangling either,
    # testing/groot-accuracy.go:86-109), and ZERO are genuine
    # cross-cluster seeding/cascade divergences.
    from groot_tpu.report.accuracy import misaligned_breakdown

    assert misaligned_breakdown(bam_path, info.store) == ACC_BREAKDOWN
