"""Runtime configuration — the Info equivalent.

Reference: /root/reference/src/pipeline/runtime.go:15-91. Info centralises
every runtime parameter plus the graph Store, and its gob serialisation IS
the on-disk `groot.gg` artifact; align inherits index params by loading it.
Here the artifact is a gzip-pickle with an explicit version gate
(cmd/align.go:96-98)."""

from __future__ import annotations

import gzip
import os
import pickle
from dataclasses import dataclass, field
from typing import Dict, Optional

from .graph.grootgraph import Store
from .version import get_version


@dataclass
class AlignCmd:
    fasta: bool = False
    bloom_filter: bool = False
    min_kmer_coverage: float = 1.0
    bam_out: str = ""
    no_exact_align: bool = False


@dataclass
class HaploCmd:
    cutoff: float = 1.0
    min_iterations: int = 50
    max_iterations: int = 10000
    total_kmers: int = 0
    haplo_dir: str = ""


@dataclass
class Info:
    version: str = field(default_factory=get_version)
    # host worker parallelism (the reference's -p; its default is 1, ours
    # is the machine — the batch pipeline is sized for all host cores).
    # 0 means "unset": resolved to os.cpu_count() at load/use time, so an
    # EXPLICIT num_proc=1 (bounding CPU on a shared host) survives a
    # dump/load round-trip instead of being clobbered to the machine size.
    num_proc: int = 0
    profiling: bool = False
    kmer_size: int = 31
    sketch_size: int = 21
    window_size: int = 100
    num_part: int = 8
    max_k: int = 4
    max_sketch_span: int = 30
    containment_threshold: float = 0.99
    index_dir: str = ""
    store: Store = field(default_factory=dict)
    sketch: AlignCmd = field(default_factory=AlignCmd)
    haplotype: HaploCmd = field(default_factory=HaploCmd)
    # attached containment index (not serialised into groot.gg; runtime.go:29-32)
    db: Optional[object] = None

    def attach_db(self, db) -> None:
        self.db = db

    def save_db(self, file_path: str) -> None:
        self.db.dump(file_path)

    def dump(self, path: str) -> None:
        db = self.db
        rt = self.__dict__.pop("_align_rt", None)  # runtime-only (holds mmaps)
        self.db = None
        try:
            with gzip.open(path, "wb") as fh:
                pickle.dump(self, fh, protocol=4)
        finally:
            self.db = db
            if rt is not None:
                self._align_rt = rt

    @classmethod
    def load(cls, path: str) -> "Info":
        if not os.path.exists(path) or os.path.getsize(path) == 0:
            raise ValueError("groot graph store appears empty")
        with gzip.open(path, "rb") as fh:
            info = pickle.load(fh)
        if not isinstance(info, cls):
            raise ValueError(f"not a groot_tpu Info artifact: {path}")
        # resolve "unset" (0 or a pre-r4 pickle missing the field) to the
        # machine size; an explicit value — including 1 — is kept as-is
        if getattr(info, "num_proc", 0) == 0:
            info.num_proc = os.cpu_count() or 1
        return info
