"""Device-resident hierarchical alignment (aligner v2).

Same semantics as groot_tpu.align.aligner (the reference cascade of
/root/reference/src/graph/alignment.go + graphminion.go), but the entire
probe cascade runs ON DEVICE and only a ~50-byte winner summary per read
returns to the host. This matters twice over:

  * on real hardware every device->host fetch of match bits costs a full
    interconnect round trip (the per-graph bits volume is ~100KB x 583
    graphs x batches); the winner summary is 3 orders of magnitude smaller;
  * it removes the per-read Python cascade from the hot path.

v2.1: calls are batched ACROSS GRAPHS. A read batch seeds ~hundreds of
graphs; one device call per graph costs hundreds of dispatch+fetch round
trips per batch (through a tunnelled TPU that alone caps throughput at
~50 reads/s). Instead graphs are packed into per-shape-signature stacks
(sig = (Pb, Lb) padded path-matrix shape) resident on device, and each
call processes G rows of (graph slot, <=RB reads) at once via vmap —
device calls per read batch drop from ~600 to ~5-15.

Winner summary per (read, graph): success flag, winning mapping index,
orientation, stage, probe node row + in-node offset, clip counts, and the
matching-path bitmask. The host reconstructs SAM records from its node
position tables (start_p = pos_p(node) + offset, alignment.go:294-296) and
replays increment_subpath for mappings up to the winner.
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

NB = 640        # node-table rows per graph (shared; last row = pad)
RB = 16         # reads per row
CN = 160        # contained-node probes per mapping
MAX_READ = 352  # longest supported read (trailing wildcard pad)


class _HostGraph:
    """Per-graph host arrays + shape signature (device residency is managed
    by the per-signature stacks in DeviceAligner)."""

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
        Lneed = L + MAX_READ
        self.Lb = next((b for b in (1024, 2048, 4096) if Lneed <= b),
                       -(-Lneed // 1024) * 1024)
        self.codes = np.full((self.Pb, self.Lb), 4, dtype=np.uint8)
        self.codes[:P, :L] = codes
        # node tables: row index = dense node rank (sorted segment id).
        # All dims are bucketed — every distinct static shape is a fresh
        # (tunnelled, tens-of-seconds) XLA compile.
        self.node_ids = sorted(gp.node_pos)
        self.node_rank = {nid: i for i, nid in enumerate(self.node_ids)}
        Nn = len(self.node_ids)
        self.Nb = NB if Nn < NB else -(-(Nn + 1) // NB) * NB
        self.node_pos = np.full((self.Nb, self.Pb), -1, dtype=np.int32)
        self.node_len = np.zeros(self.Nb, dtype=np.int32)
        for i, nid in enumerate(self.node_ids):
            self.node_len[i] = gp.node_len[nid]
            for row, pid in enumerate(gp.path_ids):
                pos = gp.node_pos[nid].get(pid)
                if pos is not None:
                    self.node_pos[i, row] = pos
        self.pad_node = self.Nb - 1  # all -1/0: probes there never match
        self.node_pos[self.pad_node] = -1
        self.node_len[self.pad_node] = 0
        self.path_len = np.zeros(self.Pb, dtype=np.int32)
        self.path_len[:P] = gp.lengths
        self.terminal_free = np.zeros(self.Pb, dtype=bool)
        for row, pid in enumerate(gp.path_ids):
            self.terminal_free[row] = gp.terminal_free[pid]
        self.sig = (self.Pb, self.Lb, self.Nb)
        # per-mapping packed probe params, cached by Key identity (the same
        # Key object seeds many reads; Keys live as long as the index)
        self.map_cache: Dict[int, Tuple[int, int, np.ndarray]] = {}

    def mapping_params(self, mapping) -> Tuple[int, int, np.ndarray, np.ndarray, bool]:
        """(seed_rank, span_limit, contained_ranks[:CN], weight_shares,
        multi_node) for a window Key. weight_shares replays
        increment_subpath vectorized (grootgraph.py:180-196): per-node
        kmer_freq delta = share * num_kmers; multi_node windows also bump
        kmer_total by int(num_kmers)."""
        params = self.map_cache.get(id(mapping))
        if params is None:
            nodes = sorted(mapping.contained_nodes)
            # probe ranks cap at CN; weighting covers EVERY contained node
            # (the reference weights the full dict, graphminion.go:67)
            all_ranks = np.array(
                [self.node_rank[n] for n in nodes], dtype=np.int32
            )
            gp = self.gp
            if len(nodes) == 1:
                shares = np.ones(1, dtype=np.float64)
                multi = False
            else:
                lens = np.array(
                    [gp.node_len[n] for n in nodes], dtype=np.float64
                )
                counts = np.array(
                    [mapping.contained_nodes[n] for n in nodes],
                    dtype=np.float64,
                )
                shares = (lens / lens.sum()) * counts
                multi = True
            params = (
                self.node_rank[mapping.node],
                int(mapping.merge_span + mapping.window_size),
                all_ranks[:CN],
                (all_ranks, shares, multi),
            )
            self.map_cache[id(mapping)] = params
        return params


class _SigStack:
    """Device-resident stack of all (so far seen) graphs of one signature."""

    def __init__(self, sig):
        self.sig = sig
        self.slots: Dict[int, int] = {}   # graph_id -> slot
        self.host: List[_HostGraph] = []
        self._dev = None                  # tuple of jnp arrays or None

    def add(self, graph_id: int, hg: _HostGraph) -> int:
        slot = len(self.host)
        self.slots[graph_id] = slot
        self.host.append(hg)
        self._dev = None  # stale
        return slot

    def device(self):
        if self._dev is None:
            self._dev = (
                jnp.asarray(np.stack([h.codes for h in self.host])),
                jnp.asarray(np.stack([h.node_pos for h in self.host])),
                jnp.asarray(np.stack([h.node_len for h in self.host])),
                jnp.asarray(np.stack([h.path_len for h in self.host])),
                jnp.asarray(np.stack([h.terminal_free for h in self.host])),
            )
        return self._dev


def _bucket(x: int, mults: Tuple[int, ...]) -> int:
    for m in mults:
        if x <= m:
            return m
    return mults[-1]


def _cascade_core(
    path_codes,      # u8 [Pb, Lb]
    node_pos,        # i32 [Nb, Pb]
    node_len,        # i32 [Nb]
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
    """Full cascade for one graph x read-group. Returns per read a packed
    i32 [R, 8 + Pb] row: (found, win_m, win_ori, win_stage, win_node,
    win_off, clip_s, clip_e, ids_mask...)."""
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


@partial(jax.jit, static_argnames=("n_shuffles",))
def _device_cascade(*args, n_shuffles: int = NODE_SHUFFLES):
    """Single-graph cascade (kept for direct use/tests)."""
    return _cascade_core(*args, n_shuffles=n_shuffles)


@partial(jax.jit, static_argnames=("n_shuffles",))
def _device_cascade_g(
    stack_codes,     # u8 [Gs, Pb, Lb]   (full signature stack)
    stack_npos,      # i32 [Gs, Nb, Pb]
    stack_nlen,      # i32 [Gs, Nb]
    stack_plen,      # i32 [Gs, Pb]
    stack_term,      # bool [Gs, Pb]
    gidx,            # i32 [G] slot per row
    read_codes,      # u8 [G, R, Lr]
    read_len,        # i32 [G, R]
    map_valid,       # bool [G, R, Mx]
    seed_idx,        # i32 [G, R, Mx]
    seed_offset,     # i32 [G, R, Mx]
    span_limit,      # i32 [G, R, Mx]
    contained_idx,   # i32 [G, R, Mx, Cn]
    n_shuffles: int = NODE_SHUFFLES,
):
    """Graph-batched cascade: one call per (signature, row-chunk) instead of
    one per graph. Rows gather their graph's arrays from the resident stack."""

    def row(gi, rc, rl, mv, si, so, sl, ci):
        return _cascade_core(
            stack_codes[gi],
            stack_npos[gi],
            stack_nlen[gi],
            stack_plen[gi],
            stack_term[gi],
            rc, rl, mv, si, so, sl, ci,
            n_shuffles=n_shuffles,
        )

    return jax.vmap(row)(
        gidx, read_codes, read_len, map_valid, seed_idx, seed_offset,
        span_limit, contained_idx,
    )


class DeviceAligner:
    """Drop-in alternative to GraphAligner with the cascade on device."""

    # coarse buckets: every static dim combination is one XLA compile, and
    # remote (tunnelled) compiles cost tens of seconds each
    G_BUCKETS = (8, 32, 128)
    M_BUCKETS = (16, 64)

    MEM_BUDGET = 4 * 1024 * 1024 * 1024  # transient HBM per call

    def __init__(
        self, store: Dict[int, GrootGraph], references=None, prebuild: bool = True
    ):
        self.store = store
        self._graphs: Dict[int, _HostGraph] = {}
        self._stacks: Dict[Tuple[int, int, int], _SigStack] = {}
        # deferred weighting: per-graph (kmer_freq deltas, kmer_total delta)
        # accumulated in numpy, flushed to graph objects by flush_weights()
        self._kf_acc: Dict[int, np.ndarray] = {}
        self._kt_acc: Dict[int, float] = {}
        if prebuild:
            # pack every graph up front: stacks upload once instead of
            # re-stacking every time a batch sees a new graph
            for gid in sorted(store):
                self.graph_dev(store[gid])

    def flush_weights(self) -> None:
        """Apply the accumulated increment_subpath replay to the graphs.
        MUST be called before prune/EM/GFA-save read node.kmer_freq."""
        for gid, kf in self._kf_acc.items():
            graph = self.store[gid]
            hg = self._graphs[gid]
            for i, nid in enumerate(hg.node_ids):
                if kf[i]:
                    graph.get_node(nid).kmer_freq += float(kf[i])
            graph.kmer_total += self._kt_acc.get(gid, 0.0)
        self._kf_acc.clear()
        self._kt_acc.clear()

    def graph_dev(self, graph: GrootGraph) -> _HostGraph:
        hg = self._graphs.get(graph.graph_id)
        if hg is None:
            hg = _HostGraph(graph)
            self._graphs[graph.graph_id] = hg
            stack = self._stacks.get(hg.sig)
            if stack is None:
                stack = self._stacks[hg.sig] = _SigStack(hg.sig)
            hg.slot = stack.add(graph.graph_id, hg)
        return hg

    # ------------------------------------------------------------------
    # batch-level API: one submit for ALL graphs seeded by a read batch
    # ------------------------------------------------------------------
    def submit_batch(self, per_graph: Dict[int, List[Tuple[FastqRead, List, float]]]):
        """Launch the cascade for every (graph, items) group in as few
        device calls as possible. Returns an opaque handle for collect."""
        # build rows: (hg, items_chunk, graph_id, item_offset)
        rows_by_sig: Dict[Tuple[int, int, int], List] = {}
        for gid, items in per_graph.items():
            hg = self.graph_dev(self.store[gid])
            rows = rows_by_sig.setdefault(hg.sig, [])
            for i in range(0, len(items), RB):
                rows.append((hg, items[i : i + RB], gid, i))

        calls = []
        for sig, rows in rows_by_sig.items():
            Pb, Lb, Nb = sig
            stack = self._stacks[sig]
            dev = stack.device()
            # per-row transient HBM: conv counts f32 [Pb, W, RB*6] + match
            # volume + two i32 NXT volumes
            per_row = RB * Pb * Lb * (6 * 5 + 2 * 4)
            g_max = self.G_BUCKETS[0]
            for b in self.G_BUCKETS:
                if b * per_row <= self.MEM_BUDGET:
                    g_max = b
            Lr_max = max(
                len(it[0].seq) for _, chunk, _, _ in rows for it in chunk
            )
            Lr = -(-max(Lr_max, 32) // 32) * 32
            for i in range(0, len(rows), g_max):
                chunk_rows = rows[i : i + g_max]
                calls.append(
                    (chunk_rows, self._submit_rows(stack, dev, chunk_rows, Lr))
                )
        return calls

    def collect_batch(self, calls):
        """Fetch all results; returns {graph_id: [(records, n_weighted), ...]}
        in the per-graph item order."""
        out: Dict[int, List[Tuple[List[AlignmentRecord], int]]] = {}
        for chunk_rows, dev_out in calls:
            packed = np.asarray(dev_out)  # [G, R, 8+Pb]
            for g, (hg, items, gid, _off) in enumerate(chunk_rows):
                graph = self.store[gid]
                res = self._collect_row(graph, hg, items, packed[g])
                out.setdefault(gid, []).extend(res)
        return out

    def _submit_rows(self, stack: _SigStack, dev, rows, Lr: int):
        Pb, Lb, Nb = stack.sig
        G = _bucket(len(rows), self.G_BUCKETS)
        Mx = _bucket(
            max((len(it[1]) for _, chunk, _, _ in rows for it in chunk), default=1),
            self.M_BUCKETS,
        )
        pad_node = Nb - 1
        gidx = np.zeros(G, dtype=np.int32)
        read_codes = np.full((G, RB, Lr), 4, dtype=np.uint8)
        read_len = np.zeros((G, RB), dtype=np.int32)
        map_valid = np.zeros((G, RB, Mx), dtype=bool)
        seed_idx = np.full((G, RB, Mx), pad_node, dtype=np.int32)
        seed_offset = np.zeros((G, RB, Mx), dtype=np.int32)
        span_limit = np.full((G, RB, Mx), -1, dtype=np.int32)
        contained_idx = np.full((G, RB, Mx, CN), pad_node, dtype=np.int32)
        for g, (hg, items, _gid, _off) in enumerate(rows):
            gidx[g] = hg.slot
            for r, (read, mappings, _kc) in enumerate(items):
                codes = ASCII_TO_CODE[np.frombuffer(read.seq, np.uint8)]
                read_codes[g, r, : len(codes)] = codes
                read_len[g, r] = len(codes)
                for m, mapping in enumerate(mappings[:Mx]):
                    map_valid[g, r, m] = True
                    s_rank, s_lim, c_ranks, _w = hg.mapping_params(mapping)
                    seed_idx[g, r, m] = s_rank
                    seed_offset[g, r, m] = mapping.offset
                    span_limit[g, r, m] = s_lim
                    contained_idx[g, r, m, : len(c_ranks)] = c_ranks

        out = _device_cascade_g(
            *dev,
            jnp.asarray(gidx),
            jnp.asarray(read_codes),
            jnp.asarray(read_len),
            jnp.asarray(map_valid),
            jnp.asarray(seed_idx),
            jnp.asarray(seed_offset),
            jnp.asarray(span_limit),
            jnp.asarray(contained_idx),
        )
        try:
            out.copy_to_host_async()  # overlap D2H with later dispatches
        except AttributeError:
            pass
        return out

    # ------------------------------------------------------------------
    # single-graph API (tests / host-aligner drop-in)
    # ------------------------------------------------------------------
    def align_read_batch(
        self, graph: GrootGraph, items: List[Tuple[FastqRead, List, float]]
    ) -> List[Tuple[List[AlignmentRecord], int]]:
        calls = self.submit_batch({graph.graph_id: items})
        out = self.collect_batch(calls)[graph.graph_id]
        self.flush_weights()  # single-graph API weights eagerly
        return out

    def _collect_row(
        self, graph, hg: _HostGraph, items, packed
    ) -> List[Tuple[List[AlignmentRecord], int]]:
        found = packed[:, 0].astype(bool)
        win_m = packed[:, 1]
        win_ori = packed[:, 2]
        win_node = packed[:, 4]
        win_off = packed[:, 5]
        clip_s = packed[:, 6]
        clip_e = packed[:, 7]
        win_ids = packed[:, 8:]

        results: List[Tuple[List[AlignmentRecord], int]] = []
        gp = hg.gp
        gid = graph.graph_id
        kf = self._kf_acc.get(gid)
        if kf is None:
            kf = self._kf_acc[gid] = np.zeros(len(hg.node_ids), np.float64)
            self._kt_acc[gid] = 0.0
        for r, (read, mappings, kmer_count) in enumerate(items):
            n_weighted = (
                int(win_m[r]) + 1 if found[r] else len(mappings)
            )
            n_weighted = min(n_weighted, len(mappings))
            for mapping in mappings[:n_weighted]:
                _s, _l, _c, (w_ranks, shares, multi) = hg.mapping_params(
                    mapping
                )
                kf[w_ranks] += shares * kmer_count
                if multi:
                    self._kt_acc[gid] += float(int(kmer_count))
            records: List[AlignmentRecord] = []
            if found[r]:
                records = self._build_records(
                    graph,
                    gp,
                    hg,
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
        self, graph, gp, hg, read, ori, node_rank, o_node, cs, ce, ids_mask
    ) -> List[AlignmentRecord]:
        node_id = hg.node_ids[node_rank]
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
