"""Device-resident hierarchical alignment (aligner v2).

Same semantics as groot_tpu.align.aligner (the reference cascade of
/root/reference/src/graph/alignment.go + graphminion.go), but the entire
probe cascade runs ON DEVICE and only a ~50-byte winner summary per read
returns to the host. This matters twice over:

  * on real hardware every device->host fetch of match bits costs a full
    interconnect round trip (the per-graph bits volume is ~100KB x 583
    graphs x batches); the winner summary is 3 orders of magnitude smaller;
  * it removes the per-read Python cascade from the hot path.

Winner summary per (read, graph): success flag, winning mapping index,
orientation, stage, probe node row + in-node offset, clip counts, and the
matching-path bitmask. The host reconstructs SAM records from its node
position tables (start_p = pos_p(node) + offset, alignment.go:294-296) and
replays increment_subpath for mappings up to the winner.

Per-graph static arrays are uploaded once and cached on device; per batch
only read codes and mapping indices move host->device.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.grootgraph import GrootGraph
from ..io.fastx import FastqRead
from ..ops.nthash import ASCII_TO_CODE, CODE_TO_ASCII, RC_CODE_NP
from .aligner import AlignmentRecord, MAX_CLIP, NODE_SHUFFLES, _GraphPack

INF = np.int32(2**30)


class _DeviceGraph:
    """Per-graph device arrays (uploaded once)."""

    def __init__(self, graph: GrootGraph):
        gp = _GraphPack(graph)
        self.gp = gp
        P = len(gp.path_ids)
        self.P = P
        self.Pb = next((b for b in (16, 64, 256) if P <= b),
                       -(-P // 256) * 256)
        codes = gp.packed.codes
        L = codes.shape[1]
        # trailing wildcard pad must cover the longest read so overhang
        # probes (dead-end partials, alignment.go:229) see match-anything
        self.max_read = 352
        Lneed = L + self.max_read
        self.Lb = next((b for b in (1024, 2048, 4096) if Lneed <= b),
                       -(-Lneed // 1024) * 1024)
        padded = np.full((self.Pb, self.Lb), 4, dtype=np.uint8)
        padded[:P, :L] = codes
        self.codes = jnp.asarray(padded)
        # node tables: row index = dense node rank (sorted segment id).
        # Nn is a static dim of the cascade — bucket it (like Pb/Lb) or every
        # distinct per-graph node count forces a fresh tunnel compile
        # (arg-annot.90 alone has 102 distinct node counts across 583 graphs).
        self.node_ids = sorted(gp.node_pos)
        self.node_rank = {nid: i for i, nid in enumerate(self.node_ids)}
        Nn = len(self.node_ids)
        Nb = next((b for b in (64, 160, 640) if Nn + 1 <= b),
                  -(-(Nn + 1) // 640) * 640)
        node_pos = np.full((Nb, self.Pb), -1, dtype=np.int32)  # trailing pad rows
        node_len = np.zeros(Nb, dtype=np.int32)
        for i, nid in enumerate(self.node_ids):
            node_len[i] = gp.node_len[nid]
            for row, pid in enumerate(gp.path_ids):
                pos = gp.node_pos[nid].get(pid)
                if pos is not None:
                    node_pos[i, row] = pos
        self.node_pos = jnp.asarray(node_pos)
        self.node_len = jnp.asarray(node_len)
        self.pad_node = Nn  # rank used for padding (no paths, zero length)
        path_len = np.zeros(self.Pb, dtype=np.int32)
        path_len[:P] = gp.lengths
        self.path_len = jnp.asarray(path_len)
        term = np.zeros(self.Pb, dtype=bool)
        for row, pid in enumerate(gp.path_ids):
            term[row] = gp.terminal_free[pid]
        self.terminal_free = jnp.asarray(term)


def _bucket(x: int, mults: Tuple[int, ...]) -> int:
    for m in mults:
        if x <= m:
            return m
    return mults[-1]


@partial(jax.jit, static_argnames=("n_shuffles",))
def _device_cascade(
    path_codes,      # u8 [Pb, Lb]
    node_pos,        # i32 [Nn+1, Pb]
    node_len,        # i32 [Nn+1]
    path_len,        # i32 [Pb]
    terminal_free,   # bool [Pb]
    read_codes,      # u8 [R, Lr]
    read_len,        # i32 [R]
    map_valid,       # bool [R, Mx]
    seed_idx,        # i32 [R, Mx] node rank
    seed_offset,     # i32 [R, Mx]
    span_limit,      # i32 [R, Mx] mergeSpan + windowSize
    contained_idx,   # i32 [R, Mx, Cn] node ranks (pad row when absent)
    n_shuffles: int = NODE_SHUFFLES,
):
    """Full cascade for one graph x read-group. Returns per read:
    (found, win_m, win_ori, win_stage, win_node, win_off, clip_s, clip_e,
    ids_mask [Pb] bool)."""
    Pb, Lb = path_codes.shape
    R, Lr = read_codes.shape
    Mx = map_valid.shape[1]
    Cn = contained_idx.shape[2]

    # ---- one-hot path matrix with wildcard rows (N/pad match anything)
    codes32 = path_codes.astype(jnp.int32)
    base_oh = (codes32[:, :, None] == jnp.arange(4)[None, None, :])
    wild = (codes32 == 4)[:, :, None]
    path_oh = jnp.concatenate(
        [base_oh | wild, wild], axis=-1
    ).astype(jnp.bfloat16)  # [Pb, Lb, 5]

    # ---- read kernels: (fwd|rc) x (full|clip_start|clip_end)
    rc_tab = jnp.asarray(RC_CODE_NP.astype(np.int32))
    rcodes = read_codes.astype(jnp.int32)
    valid_pos = jnp.arange(Lr)[None, :] < read_len[:, None]
    fwd = jnp.where(valid_pos, rcodes, 5)  # 5 = no channel (zero row)
    # rc: reverse within valid length: index = len-1-j for j < len
    rev_idx = jnp.clip(read_len[:, None] - 1 - jnp.arange(Lr)[None, :], 0, Lr - 1)
    rc = jnp.where(valid_pos, rc_tab[jnp.take_along_axis(rcodes, rev_idx, 1)], 5)

    def onehot_read(c):  # [R, Lr] codes -> [R, Lr, 5]
        return (c[:, :, None] == jnp.arange(5)[None, None, :]).astype(jnp.bfloat16)

    def clip_start(c):  # shift left one: read[1:]
        shifted = jnp.concatenate([c[:, 1:], jnp.full((R, 1), 5, c.dtype)], axis=1)
        return shifted

    def clip_end(c):  # zero the last REAL base
        last = read_len[:, None] - 1
        return jnp.where(jnp.arange(Lr)[None, :] == last, 5, c)

    kernels = jnp.stack(
        [
            onehot_read(fwd),
            onehot_read(clip_start(fwd)),
            onehot_read(clip_end(fwd)),
            onehot_read(rc),
            onehot_read(clip_start(rc)),
            onehot_read(clip_end(rc)),
        ],
        axis=1,
    ).reshape(R * 6, Lr, 5)  # [R6, Lr, 5]
    eff = jnp.stack(
        [read_len, read_len - 1, read_len - 1] * 2, axis=1
    ).reshape(R * 6)  # full uses Lr, clips Lr-1 (ori order matches stack)

    counts = jax.lax.conv_general_dilated(
        path_oh,
        kernels,
        window_strides=(1,),
        padding="VALID",  # trailing wildcard pad in path_codes covers overhang
        dimension_numbers=("NHC", "OHI", "NHC"),
        preferred_element_type=jnp.float32,
    )  # [Pb, W, K]
    W = Lb - Lr + 1
    M = (counts == eff[None, None, :].astype(jnp.float32)).transpose(2, 0, 1)
    M = M.reshape(R, 6, Pb, W)  # [R, 6(variants: f,fs,fe,r,rs,re), Pb, W]

    eff_full = read_len  # [R]
    eff_clip = read_len - 1

    # ---- bake the offset-dependent validity gates into the full-match
    # volumes, then build NXT = first valid match offset >= w. Stage-1/2
    # shuffle loops collapse to single NXT gathers: a path's winning shuffle
    # from start position b is NXT[p, b] - b (its first valid match), and
    # the per-stage shuffle bounds become simple comparisons.
    offs = jnp.arange(W, dtype=jnp.int32)

    def gate_full(m_var, eff_r):  # [R, Pb, W], eff [R] -> gated bool
        in_path = offs[None, None, :] < path_len[None, :, None]
        over_ok = (
            offs[None, None, :] + eff_r[:, None, None] <= path_len[None, :, None]
        ) | terminal_free[None, :, None]
        return m_var & in_path & over_ok

    def nxt(m):  # gated [R, Pb, W] -> i32 [R, Pb, W]
        v = jnp.where(m, offs[None, None, :], INF)
        return jax.lax.associative_scan(jnp.minimum, v, axis=v.ndim - 1, reverse=True)

    NXT = (
        nxt(gate_full(M[:, 0], eff_full)),  # fwd full
        nxt(gate_full(M[:, 3], eff_full)),  # rc full
    )

    def per_read_mapping(
        nxt_f, nxt_r, m_cs_f, m_ce_f, m_cs_r, m_ce_r, eff_c, valid_m,
        s_idx, s_off, s_lim, c_idx,
    ):
        """Cascade for ONE (read, mapping); nxt_* [Pb, W], m_* [Pb, W]."""
        seed_starts = node_pos[s_idx]  # [Pb]
        seed_len = node_len[s_idx]
        base = seed_starts + s_off
        base_safe = jnp.clip(base, 0, W - 1)
        prow = jnp.arange(Pb)

        def per_ori(nxt_v, m_cs, m_ce):
            # stage 1: first valid match at/after base, bounded by the
            # shuffle limit and the seed node length
            first1 = nxt_v[prow, base_safe] - base  # [Pb]
            bound1 = jnp.minimum(s_lim, seed_len - 1 - s_off)
            ok1 = (seed_starts >= 0) & (first1 <= bound1)
            j1 = jnp.min(jnp.where(ok1, first1, INF))
            s1_found = j1 < INF
            ids1 = ok1 & (first1 == j1)

            # stage 2: contained nodes (ascending), shuffles 0..n_shuffles
            c_starts = node_pos[c_idx]  # [Cn, Pb]
            c_len = node_len[c_idx]     # [Cn]
            c_safe = jnp.clip(c_starts, 0, W - 1)
            first2 = nxt_v[prow[None, :], c_safe] - c_starts  # [Cn, Pb]
            bound2 = jnp.minimum(n_shuffles, c_len - 1)[:, None]
            ok2 = (c_starts >= 0) & (first2 <= bound2)
            prio2 = jnp.where(
                ok2,
                jnp.arange(c_idx.shape[0], dtype=jnp.int32)[:, None]
                * (n_shuffles + 1)
                + first2,
                INF,
            )
            best2 = jnp.min(prio2)
            s2_found = best2 < INF
            c2 = best2 // (n_shuffles + 1)
            jj2 = best2 % (n_shuffles + 1)
            ids2 = ok2[c2] & (first2[c2] == jj2)

            # stages 3/4: single clipped probes at the original seed offset
            def probe_clip(m_var):
                valid = (
                    (seed_starts >= 0)
                    & (s_off < seed_len)
                    & (base < path_len)
                )
                bit = m_var[prow, base_safe]
                over_ok = (base + eff_c <= path_len) | terminal_free
                return valid & bit & over_ok

            ok3 = probe_clip(m_cs)
            s3_found = ok3.any()
            ok4 = probe_clip(m_ce)
            s4_found = ok4.any()

            found = s1_found | s2_found | s3_found | s4_found
            stage = jnp.where(
                s1_found, 1, jnp.where(s2_found, 2, jnp.where(s3_found, 3, 4))
            )
            win_node = jnp.where(s2_found & ~s1_found, c_idx[c2], s_idx)
            win_off = jnp.where(
                s1_found,
                s_off + j1,
                jnp.where(s2_found, jj2, s_off),
            )
            ids = jnp.where(
                s1_found,
                ids1,
                jnp.where(s2_found & ~s1_found, ids2, jnp.where(s3_found, ok3, ok4)),
            )
            return found, stage, win_node, win_off, ids

        f0, st0, n0, o0, ids0 = per_ori(nxt_f, m_cs_f, m_ce_f)
        f1, st1, n1, o1, ids1 = per_ori(nxt_r, m_cs_r, m_ce_r)
        found = f0 | f1
        use0 = f0
        return (
            found & valid_m,
            jnp.where(use0, 0, 1),
            jnp.where(use0, st0, st1),
            jnp.where(use0, n0, n1),
            jnp.where(use0, o0, o1),
            jnp.where(use0[..., None], ids0, ids1),
        )

    # vmap over mappings then reads (probe tensors are [Cn, Pb] — cheap)
    vm = jax.vmap(
        per_read_mapping,
        in_axes=(None, None, None, None, None, None, None, 0, 0, 0, 0, 0),
    )
    vr = jax.vmap(vm)
    found, ori, stage, node, off, ids = vr(
        NXT[0],
        NXT[1],
        M[:, 1],
        M[:, 2],
        M[:, 4],
        M[:, 5],
        eff_clip,
        map_valid,
        seed_idx,
        seed_offset,
        span_limit,
        contained_idx,
    )  # each [R, Mx] (+ ids [R, Mx, Pb])

    # first successful mapping wins (mappings are pre-sorted by node/offset)
    win_m = jnp.argmax(found, axis=1)  # [R]
    any_found = found.any(axis=1)
    take = lambda a: jnp.take_along_axis(a, win_m[:, None], axis=1)[:, 0]
    win_ori = take(ori)
    win_stage = take(stage)
    win_node = take(node)
    win_off = take(off)
    win_ids = jnp.take_along_axis(ids, win_m[:, None, None], axis=1)[:, 0]
    clip_s = jnp.where(win_stage == 3, MAX_CLIP, 0)
    clip_e = jnp.where(win_stage == 4, MAX_CLIP, 0)
    # pack everything into ONE i32 matrix so the host pays a single fetch:
    # [R, 8 + Pb] = (found, m, ori, stage, node, off, clip_s, clip_e, ids...)
    scalars = jnp.stack(
        [
            any_found.astype(jnp.int32),
            win_m.astype(jnp.int32),
            win_ori.astype(jnp.int32),
            win_stage.astype(jnp.int32),
            win_node.astype(jnp.int32),
            win_off.astype(jnp.int32),
            clip_s.astype(jnp.int32),
            clip_e.astype(jnp.int32),
        ],
        axis=1,
    )
    return jnp.concatenate([scalars, win_ids.astype(jnp.int32)], axis=1)


class DeviceAligner:
    """Drop-in alternative to GraphAligner with the cascade on device."""

    # coarse buckets: every static dim combination is one XLA compile, and
    # remote (tunnelled) compiles cost tens of seconds each
    R_BUCKETS = (16, 128)
    M_BUCKETS = (4, 16, 64)
    C_BUCKETS = (32, 160)

    def __init__(self, store: Dict[int, GrootGraph], references=None):
        self.store = store
        self._graphs: Dict[int, _DeviceGraph] = {}

    def graph_dev(self, graph: GrootGraph) -> _DeviceGraph:
        dg = self._graphs.get(graph.graph_id)
        if dg is None:
            dg = _DeviceGraph(graph)
            self._graphs[graph.graph_id] = dg
        return dg

    MEM_BUDGET = 1024 * 1024 * 1024  # bytes of transient HBM per chunk

    def align_read_batch(
        self, graph: GrootGraph, items: List[Tuple[FastqRead, List, float]]
    ) -> List[Tuple[List[AlignmentRecord], int]]:
        return self.collect(graph, self.submit(graph, items))

    def submit(self, graph: GrootGraph, items):
        """Phase 1: launch the cascade asynchronously (chunked so the conv
        counts / match / NXT volumes fit the transient-HBM budget).
        Returns opaque handles; pass to collect()."""
        dg = self.graph_dev(graph)
        # per-read HBM: f32 conv counts [Pb, W, 6] + bool match volume +
        # two i32 NXT volumes
        per_read = dg.Pb * dg.Lb * (6 * 5 + 2 * 4)
        # chunk to the largest R bucket whose PADDED size fits the budget
        max_r = self.R_BUCKETS[0]
        for b in self.R_BUCKETS:
            if b * per_read <= self.MEM_BUDGET:
                max_r = b
        handles = []
        for i in range(0, len(items), max_r):
            chunk = items[i : i + max_r]
            handles.append((chunk, self._submit_chunk(dg, chunk)))
        return (dg, handles)

    def collect(self, graph: GrootGraph, submitted):
        """Phase 2: fetch results (one D2H per chunk), replay weighting and
        build records."""
        dg, handles = submitted
        out: List[Tuple[List[AlignmentRecord], int]] = []
        for chunk, dev_out in handles:
            out.extend(self._collect_chunk(graph, dg, chunk, dev_out))
        return out

    def _submit_chunk(
        self, dg: _DeviceGraph, items: List[Tuple[FastqRead, List, float]]
    ):
        R = len(items)
        Rb = _bucket(R, self.R_BUCKETS)
        Lr_max = max(len(it[0].seq) for it in items)
        Lr = -(-max(Lr_max, 32) // 32) * 32
        Mx = _bucket(max(len(it[1]) for it in items), self.M_BUCKETS)
        Cn = _bucket(
            max(
                (len(m.contained_nodes) for it in items for m in it[1]),
                default=1,
            ),
            self.C_BUCKETS,
        )
        read_codes = np.full((Rb, Lr), 4, dtype=np.uint8)
        read_len = np.zeros(Rb, dtype=np.int32)
        map_valid = np.zeros((Rb, Mx), dtype=bool)
        seed_idx = np.full((Rb, Mx), dg.pad_node, dtype=np.int32)
        seed_offset = np.zeros((Rb, Mx), dtype=np.int32)
        span_limit = np.full((Rb, Mx), -1, dtype=np.int32)
        contained_idx = np.full((Rb, Mx, Cn), dg.pad_node, dtype=np.int32)
        for r, (read, mappings, _kc) in enumerate(items):
            codes = ASCII_TO_CODE[np.frombuffer(read.seq, np.uint8)]
            read_codes[r, : len(codes)] = codes
            read_len[r] = len(codes)
            for m, mapping in enumerate(mappings[:Mx]):
                map_valid[r, m] = True
                seed_idx[r, m] = dg.node_rank[mapping.node]
                seed_offset[r, m] = mapping.offset
                span_limit[r, m] = int(mapping.merge_span + mapping.window_size)
                for c, nid in enumerate(sorted(mapping.contained_nodes)[:Cn]):
                    contained_idx[r, m, c] = dg.node_rank[nid]

        return _device_cascade(
            dg.codes,
            dg.node_pos,
            dg.node_len,
            dg.path_len,
            dg.terminal_free,
            jnp.asarray(read_codes),
            jnp.asarray(read_len),
            jnp.asarray(map_valid),
            jnp.asarray(seed_idx),
            jnp.asarray(seed_offset),
            jnp.asarray(span_limit),
            jnp.asarray(contained_idx),
        )

    def _collect_chunk(
        self, graph, dg: _DeviceGraph, items, dev_out
    ) -> List[Tuple[List[AlignmentRecord], int]]:
        packed = np.asarray(dev_out)  # single D2H fetch per chunk
        found = packed[:, 0].astype(bool)
        win_m = packed[:, 1]
        win_ori = packed[:, 2]
        win_node = packed[:, 4]
        win_off = packed[:, 5]
        clip_s = packed[:, 6]
        clip_e = packed[:, 7]
        win_ids = packed[:, 8:]

        results: List[Tuple[List[AlignmentRecord], int]] = []
        gp = dg.gp
        for r, (read, mappings, kmer_count) in enumerate(items):
            n_weighted = (
                int(win_m[r]) + 1 if found[r] else len(mappings)
            )
            n_weighted = min(n_weighted, len(mappings))
            for mapping in mappings[:n_weighted]:
                graph.increment_subpath(mapping.contained_nodes, kmer_count)
            records: List[AlignmentRecord] = []
            if found[r]:
                records = self._build_records(
                    graph,
                    gp,
                    dg,
                    read,
                    int(win_ori[r]),
                    int(win_node[r]),
                    int(win_off[r]),
                    int(clip_s[r]),
                    int(clip_e[r]),
                    win_ids[r],
                )
            results.append((records, n_weighted))
        return results

    def _build_records(
        self, graph, gp, dg, read, ori, node_rank, o_node, cs, ce, ids_mask
    ) -> List[AlignmentRecord]:
        node_id = dg.node_ids[node_rank]
        pos_map = gp.node_pos[node_id]
        seq = read.seq
        qual = read.qual
        if ori == 1:
            codes = ASCII_TO_CODE[np.frombuffer(read.seq, np.uint8)]
            seq = CODE_TO_ASCII[RC_CODE_NP[codes][::-1]].tobytes()
            qual = read.qual[::-1]
        Lr = len(read.seq)
        seq_len = Lr - cs - ce
        aligned = seq[cs : cs + seq_len]
        aligned_qual = qual[cs : cs + seq_len] if qual else b""
        records = []
        hit_pids = [
            pid
            for row, pid in enumerate(gp.path_ids)
            if ids_mask[row] and pid in pos_map
        ]
        for i, pid in enumerate(sorted(hit_pids)):
            records.append(
                AlignmentRecord(
                    name=read.id[1:].decode(),
                    graph_id=graph.graph_id,
                    path_id=pid,
                    pos=pos_map[pid] + o_node,
                    seq=aligned,
                    qual=aligned_qual,
                    start_clip=cs,
                    end_clip=ce,
                    reverse=ori == 1,
                    secondary=len(hit_pids) > 1 and i != 0,
                )
            )
        return records
