"""DeviceAligner (on-device cascade) must reproduce GraphAligner (host
cascade) record for record."""

import copy

import numpy as np
import pytest

from groot_tpu.align.aligner import GraphAligner
from groot_tpu.align.device_cascade import DeviceAligner
from groot_tpu.graph.grootgraph import GrootGraph
from groot_tpu.index.lshe import ContainmentIndex
from groot_tpu.index.window import sketch_graph
from groot_tpu.io.fastx import FastqRead, stream_fastq
from groot_tpu.io.msa2gfa import msa_to_gfa
from groot_tpu.io.fastx import read_msa
from groot_tpu.ops import nthash

TEST_MSA = "/root/reference/src/pipeline/test-data/test-genes.msa"
FASTQ = (
    "/root/reference/src/pipeline/test-data/"
    "test-reads-OXA90-OXA106-100bp-with-errors.fastq"
)
K, S, W, T = 51, 30, 100, 0.99


@pytest.fixture(scope="module")
def setup():
    graph = GrootGraph.from_gfa(msa_to_gfa(read_msa(TEST_MSA)), 0)
    lookup = sketch_graph(graph, W, K, S)
    index = ContainmentIndex(
        num_part=8, max_k=4, num_window_kmers=W - K + 1, sketch_size=S
    )
    for kb, keys in lookup.items():
        for i, key in enumerate(keys):
            index.add_window(f"{kb}-{i}", key)
    index.prepare()
    reads = list(stream_fastq([FASTQ]))[:400]
    codes = np.full((len(reads), 100), 4, dtype=np.uint8)
    for i, r in enumerate(reads):
        codes[i, : len(r.seq)] = nthash.ASCII_TO_CODE[
            np.frombuffer(r.seq, np.uint8)
        ]
    hi, lo = nthash.khf_sketch(codes, K, S)
    qsizes = np.full(len(reads), 100 - K + 1, dtype=np.int32)
    results = index.query_batch(np.asarray(hi), np.asarray(lo), qsizes, T)
    items = [
        (r, res[0], float(100 - K + 1))
        for r, res in zip(reads, results)
        if res
    ]
    assert len(items) > 100
    return graph, items


def _rec_tuple(rec):
    return (
        rec.name,
        rec.path_id,
        rec.pos,
        rec.seq,
        rec.start_clip,
        rec.end_clip,
        rec.reverse,
        rec.secondary,
    )


def test_device_matches_host_cascade(setup):
    graph, items = setup
    g_host = copy.deepcopy(graph)
    g_dev = copy.deepcopy(graph)
    host = GraphAligner({0: g_host})
    dev = DeviceAligner({0: g_dev})

    host_out = host.align_read_batch(g_host, items)
    dev_out = dev.align_read_batch(g_dev, items)
    n_aligned = 0
    for (h_recs, h_w), (d_recs, d_w) in zip(host_out, dev_out):
        assert h_w == d_w
        assert [_rec_tuple(r) for r in h_recs] == [_rec_tuple(r) for r in d_recs]
        n_aligned += bool(h_recs)
    assert n_aligned > 50

    # weighting replay must agree too
    for nh, nd in zip(g_host.sorted_nodes, g_dev.sorted_nodes):
        assert abs(nh.kmer_freq - nd.kmer_freq) < 1e-6
    assert g_host.kmer_total == g_dev.kmer_total
