"""Alignment accuracy harness.

Reference: /root/reference/testing/groot-accuracy.go — parses a BAM of
simulated reads whose bbmap-randomreads names encode the origin reference
and position (field 9 after '_' splitting holds the reference ID, field 2
the position), and reports %aligned / %multialigned / %unaligned /
%misaligned. Usable via `groot-tpu accuracy` or the library."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List

from ..io import bam as bamio


@dataclass
class AccuracyStats:
    num_test_reads: int
    aligned: int
    multialigned: int
    unaligned: int
    misaligned: int
    correct_start: int
    false_positive_alignments: int

    def format(self) -> str:
        n = self.num_test_reads
        lines = [
            f"{self.aligned}\t{self.aligned / n * 100:.2f}%\t\taligned reads",
            f"{self.multialigned}\t{self.multialigned / n * 100:.2f}%\t\t"
            "multialigned reads",
            f"{self.unaligned}\t{self.unaligned / n * 100:.2f}%\t\t"
            "unaligned reads",
            f"{self.misaligned}\t{self.misaligned / n * 100:.2f}%\t\t"
            "incorrectly aligned reads",
        ]
        return "\n".join(lines) + "\n"


def evaluate_bam(bam_path: str, num_test_reads: int) -> AccuracyStats:
    refs, records = bamio.read_bam(bam_path)
    names = {r.ref_id: r.name for r in refs}
    read_map: Dict[str, List] = {}
    multimap = 0
    for rec in records:
        if rec.flag == bamio.FLAG_UNMAPPED:
            continue
        hits = read_map.setdefault(rec.name, [])
        if len(hits) == 1:
            multimap += 1
        hits.append(rec)

    aligned = len(read_map)
    correct_aligned = 0
    correct_start = 0
    false_pos = 0
    for read, hits in read_map.items():
        parts = read.split("_")
        read_id = parts[9].split("$")[0].split(" ")[0] if len(parts) > 9 else ""
        try:
            read_pos = int(parts[2])
        except (IndexError, ValueError):
            read_pos = -1
        match = False
        for hit in hits:
            ref = names[hit.ref_id]
            if ref.startswith("*"):
                ref = ref[1:]
            if ref != read_id:
                false_pos += 1
            else:
                match = True
                if hit.pos == read_pos:
                    correct_start += 1
        if match:
            correct_aligned += 1

    return AccuracyStats(
        num_test_reads=num_test_reads,
        aligned=aligned,
        multialigned=multimap,
        unaligned=num_test_reads - aligned,
        misaligned=aligned - correct_aligned,
        correct_start=correct_start,
        false_positive_alignments=false_pos,
    )
