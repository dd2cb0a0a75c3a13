#!/usr/bin/env python
"""Throughput of the fused on-device align step (sketch -> LSH seed ->
containment -> weight scatter) on the real chip, over the full arg-annot.90
index.

This is the pod data plane (parallel/device_index.align_step): everything
after FASTQ decode runs on the TPU; the host only feeds uint8 code batches
and reads back per-read window hits + merged tallies. The single-chip
production path instead runs sketch+seed on the host (the read stream is
host-fed and the tunnel adds latency), so this tool exists to measure what
a chip does when the input pipeline is not the constraint.

Usage: python tools/device_step_bench.py [--batch 8192] [--steps 8]

Round-3 note, resolved in round 4: the repeat-dispatch stall this
docstring used to document no longer reproduces — the step sustains
~114 ms/step over 32+ consecutive dispatches at batch 8192 (TUNNEL.md
records the full repro matrix and the measured tunnel ceilings).
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--arg-frac", type=float, default=0.01,
                    help="fraction of reads drawn from ARG genes")
    args = ap.parse_args()

    import jax
    import numpy as np

    cache_dir = os.path.expanduser("~/.cache/groot_tpu/jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from groot_tpu.config import Info
    from groot_tpu.index.lshe import ContainmentIndex
    from groot_tpu.ops.nthash import ASCII_TO_CODE
    from groot_tpu.parallel.device_index import DeviceIndex, align_step

    index_dir = os.path.join(REPO, ".bench", "arg-annot.90-w150-k31-s20")
    if not os.path.exists(os.path.join(index_dir, "groot.gg")):
        print("run `python bench.py` once to build the cached index")
        return 1
    t0 = time.time()
    info = Info.load(os.path.join(index_dir, "groot.gg"))
    index = ContainmentIndex.load(os.path.join(index_dir, "groot.lshe"))
    dev = DeviceIndex.build(index, info.store, info.kmer_size, 0.99)
    tree = jax.device_put(dev.tree())
    print(f"# index + device tables in {time.time()-t0:.1f}s "
          f"(backend {jax.default_backend()}, cf={dev.cf})")

    # synthetic batch: args.arg_frac exact ARG substrings, rest random
    rng = np.random.default_rng(11)
    B, L = args.batch, 160
    seqs = []
    for g in info.store.values():
        seqs.extend(g.graph2seqs().values())
        if len(seqs) > 500:
            break
    codes = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
    codes[:, 150:] = 4
    n_arg = int(B * args.arg_frac)
    for i in range(n_arg):
        ref = seqs[int(rng.integers(0, len(seqs)))]
        if len(ref) < 150:
            continue
        start = int(rng.integers(0, len(ref) - 150 + 1))
        codes[i, :150] = ASCII_TO_CODE[
            np.frombuffer(ref[start : start + 150], np.uint8)
        ]
    lengths = np.full(B, 150, np.int32)

    kwargs = dict(
        k=dev.k, s=dev.s, band_k=dev.band_k,
        num_window_kmers=dev.num_window_kmers,
        num_nodes=dev.num_nodes, num_graphs=dev.num_graphs,
        threshold=0.99, full_equality=True, cf=dev.cf,
    )
    step = jax.jit(lambda t, c, ln: align_step(t, c, ln, **kwargs))
    t0 = time.time()
    out = step(tree, codes, lengths)
    jax.block_until_ready(out)
    print(f"# compile + first step {time.time()-t0:.1f}s")

    best = float("inf")
    for _ in range(args.steps):
        t0 = time.time()
        win, contain, node_w, graph_k, mapped, dropped = step(
            tree, codes, lengths
        )
        mapped_n = int(np.asarray(mapped).sum())  # forces D2H of the result
        best = min(best, time.time() - t0)
    print(
        f"device step: {B} reads in {best*1e3:.1f} ms = "
        f"{B/best:,.0f} reads/s/chip (mapped {mapped_n}/{B})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
