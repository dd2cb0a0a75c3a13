"""Haplotype calling: weighted GFAs -> EM -> called alleles.

Reference: /root/reference/src/pipeline/haplotype.go (GFAreader ->
EMpathFinder -> HaplotypeParser). The reference wires this only in tests and
the WASM build (no CLI command in v1.1.2, SURVEY §2.1); groot_tpu exposes it
as the `haplotype` subcommand for capability completeness."""

from __future__ import annotations

import logging
import re
from typing import Dict, List

from ..config import Info
from ..em.em import process_em_paths, run_em_on_graphs
from ..graph.grootgraph import GrootGraph, Store
from ..io.gfa import parse_gfa
from ..version import get_version

log = logging.getLogger("groot")

_TOTAL_KMERS_RE = re.compile(r"graphs: (\d+)\)")


def load_weighted_gfas(info: Info, gfa_files: List[str]) -> List[GrootGraph]:
    """GFAreader.Run (haplotype.go:37-66): load GFAs; the total k-mer count
    round-trips through the first file's comment."""
    graphs = []
    for i, path in enumerate(gfa_files):
        g = parse_gfa(path)
        if i == 0:
            m = _TOTAL_KMERS_RE.search(" ".join(g.comments))
            if not m:
                raise ValueError(
                    f"could not parse total k-mer count from GFA comment: {path}"
                )
            info.haplotype.total_kmers = int(m.group(1))
        graphs.append(GrootGraph.from_gfa(g, i))
    return graphs


def find_haplotypes(info: Info, graphs: List[GrootGraph]) -> List[str]:
    """EMpathFinder + HaplotypeParser (haplotype.go:91-181)."""
    for g in graphs:
        info.store[g.graph_id] = g
    mean_iterations = 0
    kept: Store = {}
    kept_paths: List[str] = []
    # EM over ALL graphs as one padded jit call (the reference runs one
    # goroutine per graph, haplotype.go:95-119; here graphs are a batch dim)
    for g in graphs:
        g.remove_dead_paths()
    run_em_on_graphs(
        graphs, info.haplotype.min_iterations, info.haplotype.max_iterations
    )
    for g in graphs:
        process_em_paths(g, info.haplotype.cutoff, info.haplotype.total_kmers)
        mean_iterations += g.em_iterations
        if not g.paths:
            continue
        g.remove_dead_paths()
        log.info("\tgraph %d has %d called alleles after EM", g.graph_id, len(g.paths))
        for pid in sorted(g.paths):
            log.info(
                "\t- [%s (abundance: %.3f)]",
                g.paths[pid],
                g.abundances.get(pid, 0.0),
            )
            kept_paths.append(g.paths[pid])
        g.groot_version = get_version()
        kept[g.graph_id] = g
    info.store = kept
    if not kept:
        return kept_paths
    log.info("summarising...")
    log.info("\tmean number of EM iterations: %d", mean_iterations // len(kept))
    log.info("\tnumber of graphs with viable paths: %d", len(kept))
    log.info("\tnumber of called alleles: %d", len(kept_paths))
    return kept_paths
