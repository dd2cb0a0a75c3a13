"""Resistome report: BAM -> coverage-filtered TSV.

Reference: /root/reference/src/reporting/reporting.go. Behavioral quirks
reproduced exactly (they are observable in the output):

  * only records with Flags == 4 are skipped (secondary alignments count,
    reporting.go:82-84);
  * the pileup loop is INCLUSIVE of recStart + alignment length, i.e. each
    record covers Len()+1 bases unless truncated at the reference end
    (reporting.go:106-123);
  * a leading '*' (cluster representative marker) is stripped from reported
    names (reporting.go:131-134);
  * the coverage cigar comes from cigarClean, including its quirky handling
    of single-symbol and final-element cases (reporting.go:178-213);
  * --lowCov drops ARGs whose cigar shows INTERNAL deletions only
    (reporting.go:147-149).

Output rows are sorted by reference name (the reference's order is
goroutine-nondeterministic)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, List, Optional, Tuple

import numpy as np

from ..io import bam as bamio


@dataclass
class Annotation:
    arg: str
    count: int
    length: int
    cigar: str


def cigar_clean(symbols: List[str]) -> Tuple[str, bool]:
    """Behavioral port of cigarClean (reporting.go:178-213)."""
    counter = 1
    pre_val = symbols[0]
    cigar = ""
    dm: dict = {}
    for i, val in enumerate(symbols):
        if i == 0:
            continue
        if i == len(symbols) - 1:
            if val == pre_val:
                counter += 1
                cigar += f"{counter}{val}"
                dm[val] = dm.get(val, 0) + 1
            else:
                cigar += f"{counter}{pre_val}1{val}"
                dm[val] = dm.get(val, 0) + 1
            break
        if val == pre_val:
            counter += 1
        else:
            dm[pre_val] = dm.get(pre_val, 0) + 1
            cigar += f"{counter}{pre_val}"
            pre_val = val
            counter = 1
    d, m = dm.get("D", 0), dm.get("M", 0)
    internal_d = not ((d + m <= 2) or (d == 2 and m == 1))
    return cigar, internal_d


def report_from_bam(
    bam_path: Optional[str],
    coverage_cutoff: float = 0.97,
    low_cov: bool = False,
    fh=None,
) -> List[Annotation]:
    """BAMreader.Run equivalent; returns annotations (and prints via caller)."""
    if bam_path:
        refs, records = bamio.read_bam(bam_path)
    else:
        import sys

        refs, records = bamio.read_bam(fh or sys.stdin.buffer)

    per_ref: dict = {}
    for rec in records:
        if rec.flag == bamio.FLAG_UNMAPPED:
            continue
        per_ref.setdefault(rec.ref_id, []).append(rec)

    annotations: List[Annotation] = []
    for ref in refs:
        recs = per_ref.get(ref.ref_id)
        if not recs:
            continue
        pileup = np.zeros(ref.length, dtype=np.int64)
        for rec in recs:
            start = rec.pos
            end = start + rec.aln_len()
            if end > ref.length - 1:
                end = ref.length - 1
            pileup[start : end + 1] += 1  # inclusive-end quirk
        covered = int((pileup > 0).sum())
        if covered / ref.length < coverage_cutoff:
            continue
        name = ref.name[1:] if ref.name.startswith("*") else ref.name
        symbols = ["M" if v else "D" for v in pileup]
        cigar, internal_d = cigar_clean(symbols)
        if internal_d and low_cov:
            continue
        annotations.append(
            Annotation(arg=name, count=len(recs), length=ref.length, cigar=cigar)
        )
    annotations.sort(key=lambda a: a.arg)
    return annotations


def format_report(annotations: Iterable[Annotation]) -> str:
    return "".join(
        f"{a.arg}\t{a.count}\t{a.length}\t{a.cigar}\n" for a in annotations
    )
