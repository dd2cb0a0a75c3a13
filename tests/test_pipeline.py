"""End-to-end pipeline tests mirroring the reference's staged pipeline tests
(/root/reference/src/pipeline/2_index_test.go, 3_sketch_test.go): index the
OXA cluster MSA, align simulated error-containing OXA-90+OXA-106 reads and
assert the OXA-90 allele survives pruning. Shared params k=51 s=30 w=100
t=0.99 minKmerCov=10 (1_pipeline_test.go:32-55)."""

import os

import pytest

from groot_tpu.config import AlignCmd, Info
from groot_tpu.index.lshe import ContainmentIndex
from groot_tpu.io import bam as bamio
from groot_tpu.pipeline.align_pipeline import prune_graphs, run_align, save_graphs
from groot_tpu.pipeline.index_pipeline import run_index

TEST_DATA = "/root/reference/src/pipeline/test-data"
FASTQ = f"{TEST_DATA}/test-reads-OXA90-OXA106-100bp-with-errors.fastq"
OXA90 = "argannot~~~(Bla)OXA-90~~~EU547443:1-825"


def make_info(tmp_path):
    return Info(
        num_proc=1,
        kmer_size=51,
        sketch_size=30,
        window_size=100,
        num_part=8,
        max_k=4,
        max_sketch_span=30,
        containment_threshold=0.99,
        index_dir=str(tmp_path / "index"),
    )


@pytest.fixture(scope="module")
def built_index(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("idx")
    info = make_info(tmp_path)
    run_index(info, TEST_DATA)
    return str(tmp_path / "index")


def test_index_artifacts(built_index):
    assert os.path.exists(os.path.join(built_index, "groot.gg"))
    assert os.path.exists(os.path.join(built_index, "groot.lshe"))
    info = Info.load(os.path.join(built_index, "groot.gg"))
    assert len(info.store) == 1  # one MSA file -> one graph
    graph = info.store[0]
    assert len(graph.paths) == 81
    index = ContainmentIndex.load(os.path.join(built_index, "groot.lshe"))
    assert index.num_sketches > 0
    assert index.num_window_kmers == 100 - 51 + 1


def test_align_noalign_finds_oxa90(built_index, tmp_path):
    """3_sketch_test equivalent in --noAlign mode: weighting alone must keep
    the OXA-90 allele through pruning."""
    info = Info.load(os.path.join(built_index, "groot.gg"))
    index = ContainmentIndex.load(os.path.join(built_index, "groot.lshe"))
    info.attach_db(index)
    info.containment_threshold = 0.99
    info.sketch = AlignCmd(min_kmer_coverage=10, no_exact_align=True)
    stats = run_align(info, [FASTQ])
    assert stats.received == 2062
    assert stats.mapped > 0
    found = prune_graphs(info, info.sketch.min_kmer_coverage)
    assert OXA90 in found


def test_align_exact_finds_oxa90_and_writes_bam(built_index, tmp_path):
    """3_sketch_test equivalent with exact alignment + BAM output."""
    info = Info.load(os.path.join(built_index, "groot.gg"))
    index = ContainmentIndex.load(os.path.join(built_index, "groot.lshe"))
    info.attach_db(index)
    info.containment_threshold = 0.99
    info.sketch = AlignCmd(min_kmer_coverage=10, no_exact_align=False)
    bam_path = str(tmp_path / "out.bam")
    refs = bamio.build_references(info.store)
    with open(bam_path, "wb") as fh:
        writer = bamio.BamWriter(fh, refs)
        stats = run_align(info, [FASTQ], bam_writer=writer)
        writer.close()
    assert stats.alignment_count > 0
    found = prune_graphs(info, info.sketch.min_kmer_coverage)
    assert OXA90 in found

    # save GFA (consumed by the haplotype stage)
    save_graphs(info, str(tmp_path / "graphs"), stats.total_kmers)
    assert os.path.exists(str(tmp_path / "graphs" / "groot-graph-0.gfa"))

    # BAM must be readable and contain records aligned to OXA-90
    read_refs, records = bamio.read_bam(bam_path)
    names = {r.ref_id: r.name for r in read_refs}
    count = 0
    oxa90_hits = 0
    for rec in records:
        count += 1
        assert 0 <= rec.pos < read_refs[rec.ref_id].length
        if names[rec.ref_id] == OXA90:
            oxa90_hits += 1
    assert count == stats.alignment_count
    assert oxa90_hits > 0
