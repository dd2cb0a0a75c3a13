#!/usr/bin/env python
"""Microbenchmark of the v6 device cascade kernel (align/device_join).

Builds the arg-annot.90 tables (from the bench cache), packs one synthetic
call of each lane bucket, and times repeat execution on the current
backend. Usage: python tools/cascade_bench.py [--steps 6] [--bucket N]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--bucket", type=int, default=None)
    ap.add_argument("--batch", type=int, default=8192)
    args = ap.parse_args()

    import jax
    import numpy as np

    cache_dir = os.path.expanduser("~/.cache/groot_tpu/jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from groot_tpu.align.batch_host import WindowTables, sort_hits
    from groot_tpu.align.device_join import DeviceJoinAligner, PB_BUCKETS
    from groot_tpu.config import Info
    from groot_tpu.index.lshe import ContainmentIndex
    from groot_tpu.io import bam as bamio
    from groot_tpu.ops.pallas_sketch import sketch_reads_u64

    idx = os.path.join(REPO, ".bench", "arg-annot.90-w150-k31-s20")
    info = Info.load(os.path.join(idx, "groot.gg"))
    index = ContainmentIndex.load(os.path.join(idx, "groot.lshe"))
    info.attach_db(index)
    refs = bamio.build_references(info.store)
    al = DeviceJoinAligner(info.store, refs)
    cache = os.path.join(idx, "groot.align")
    tables = al.try_load(index, cache, info.kmer_size) if (
        os.path.exists(cache)
    ) else None
    if tables is None:
        tables = WindowTables(index, info.store)
        al.attach_tables(tables, index, info.kmer_size)
    print(f"# backend {jax.default_backend()}  D1={al._d1}", flush=True)

    # one real dense batch: sketch + query on host
    import gzip

    from groot_tpu.ops.nthash import ASCII_TO_CODE

    with gzip.open(
        "/root/reference/testing/data/argannot-150bp-10000-reads.fq.gz", "rb"
    ) as fh:
        lines = fh.read().splitlines()
    seqs = lines[1 :: 4][: args.batch]
    B = len(seqs)
    L = 160
    codes = np.full((B, L), 4, np.uint8)
    lengths = np.zeros(B, np.int32)
    for i, s in enumerate(seqs):
        codes[i, : len(s)] = ASCII_TO_CODE[np.frombuffer(s, np.uint8)]
        lengths[i] = len(s)
    kc = (lengths - info.kmer_size + 1).astype(np.int32)
    u64 = sketch_reads_u64(codes, lengths, info.kmer_size, 20, None)
    rows, wins = index.query_batch_np(None, None, kc, 0.99, q64=u64)
    rows, wins, combo_start = sort_hits(tables, rows, wins)
    print(f"# {B} reads -> {len(rows)} pairs, {len(combo_start)} combos",
          flush=True)

    class FakeBatch:
        pass

    fb = FakeBatch()
    fb.codes = codes
    fb.lengths = lengths

    # time submit+drain as the pipeline would
    for it in range(args.steps):
        t0 = time.time()
        handles = al.submit_pairs(fb, rows, wins, combo_start)
        t1 = time.time()
        calls = handles[0][0]
        for (pair_idx, total_pairs, Pb), out in calls:
            np.asarray(out)
        t2 = time.time()
        print(
            f"step {it}: submit {t1-t0:.2f}s  drain {t2-t1:.2f}s "
            f"({len(calls)} calls)", flush=True,
        )
    # per-bucket breakdown on the last iteration
    handles = al.submit_pairs(fb, rows, wins, combo_start)
    calls = handles[0][0]
    jax.block_until_ready([out for _m, out in calls])
    per = {}
    for (pair_idx, total_pairs, Pb), out in calls:
        t0 = time.time()
        np.asarray(out)
        per.setdefault(Pb, []).append(time.time() - t0)
    # re-dispatch one call per bucket, synchronously
    for (pair_idx, total_pairs, Pb), out in calls:
        pass
    print("# (drain times after block_until_ready are D2H only)")
    for Pb, ts in sorted(per.items()):
        print(f"bucket Pb={Pb}: {len(ts)} calls, drain sum {sum(ts):.3f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
