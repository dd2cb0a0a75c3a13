"""Device-resident hierarchical alignment (aligner v4, pair-major).

Same semantics as groot_tpu.align.aligner (the reference cascade of
/root/reference/src/graph/alignment.go + graphminion.go), but the entire
probe cascade runs ON DEVICE and only a ~50-byte winner summary per
(read, mapping) pair returns to the host.

Layout history. v2 batched the cascade per graph ([G, R, Mx] padded
volumes); measured on hardware the padding was the whole cost: a 1024-read
batch has ~1k real (read, mapping) pairs but the padded volumes carried
~340k slots, and the stage-2 contained-node probes gathered
G*R*Mx*Cn*Pb ~ 3.4e9 elements per call (~4.5s/call, ~26 reads/s e2e).

v4 flattens the REAL work into two dense axes and pads only to coarse
buckets:

  * combo axis C — one entry per (graph, read) with >=1 mapping: the
    match-volume phase (one-hot paths, 6-variant conv on the MXU, validity
    gating, NXT suffix-min scan) runs vmapped over combos;
  * pair axis Np — one entry per (read, mapping): the probe phase reads
    the combo volumes at seed/contained-node positions via flat gathers
    ([Np, Cn, Pb] elements total, ~1000x less than v2).

Winner summary per pair: success flag, orientation, stage, probe node row +
in-node offset, clip counts, and the matching-path bitmask. The host picks
the first successful mapping per read (mappings are pre-sorted), rebuilds
SAM records from its node position tables (start_p = pos_p(node) + offset,
alignment.go:294-296) and replays increment_subpath for mappings up to the
winner.
"""

from __future__ import annotations

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


@partial(jax.jit, static_argnames=("n_shuffles",))
def _pair_cascade(
    stack_codes,     # u8 [Gs, Pb, Lb]   (full signature stack, resident)
    stack_npos,      # i32 [Gs, Nb, Pb]
    stack_nlen,      # i32 [Gs, Nb]
    stack_plen,      # i32 [Gs, Pb]
    stack_term,      # bool [Gs, Pb]
    g_idx,           # i32 [C]  graph slot per combo
    read_codes,      # u8 [C, Lr]
    read_len,        # i32 [C]
    pair_combo,      # i32 [Np] combo row per pair
    pair_valid,      # bool [Np]
    seed_idx,        # i32 [Np] node rank
    seed_off,        # i32 [Np]
    span_lim,        # i32 [Np] mergeSpan + windowSize
    probe_pair,      # i32 [Nq] pair row per stage-2 probe (real probes only)
    probe_node,      # i32 [Nq] contained-node rank
    probe_rank,      # i32 [Nq] ascending-node order within the pair
    n_shuffles: int = NODE_SHUFFLES,
):
    """Pair-major cascade. Returns packed i32 [Np, 8 + Pb]:
    (found, 0, ori, stage, node, off, clip_s, clip_e, ids_mask...).

    Stage-2 contained-node probes are FLATTENED to a real-probe axis Nq
    (one row per (pair, contained node)) instead of a padded [Np, Cn]
    matrix: contained counts are wildly skewed (p50=1, max~90 on
    arg-annot.90), so padding Cn cost ~20-40x the gather traffic."""
    Gs, Pb, Lb = stack_codes.shape
    Nb = stack_nlen.shape[1]
    C, Lr = read_codes.shape
    Np = pair_combo.shape[0]
    Nq = probe_pair.shape[0]
    # winner recovery packs (priority << 15) | probe_row into one i32
    # (segment_min below): both fields must fit their bit budgets
    assert Nq <= 1 << 15, f"probe bucket {Nq} overflows the 15-bit row field"
    assert CN * (n_shuffles + 1) < 1 << 15, "stage-2 priority overflows 15 bits"
    W = Lb - Lr + 1
    DB = 128                 # window-position block for the banded matmul
    nb = -(-W // DB)
    Wp = nb * DB             # padded position axis (flat-index stride)
    T = Lr + DB - 1          # path window feeding one block

    # ================= phase A: per-combo match volumes =================
    # The naive formulation (vmap of conv_general with per-combo kernels)
    # lowers to a non-MXU direct fusion on TPU (~1.8 TF/s); instead the
    # sliding exact-match count is a banded matmul: per position block,
    # counts[c,p,d,v] = <path_oh window, band(read kernels)> on the MXU.
    path_codes = stack_codes[g_idx]   # [C, Pb, Lb]
    plen = stack_plen[g_idx]          # [C, Pb]
    term = stack_term[g_idx]          # [C, Pb]

    codes32 = path_codes.astype(jnp.int32)
    base_oh = codes32[..., None] == jnp.arange(4)[None, None, None, :]
    wild = (codes32 == 4)[..., None]
    path_oh = jnp.concatenate(
        [base_oh | wild, wild], axis=-1
    ).astype(jnp.bfloat16)  # [C, Pb, Lb, 5]
    pad_cols = Wp + Lr - 1 - Lb
    if pad_cols > 0:
        # pad positions are gated off below (pos >= plen), value irrelevant
        path_oh = jnp.pad(path_oh, ((0, 0), (0, 0), (0, pad_cols), (0, 0)))

    rc_tab = jnp.asarray(RC_CODE_NP.astype(np.int32))
    rcodes = read_codes.astype(jnp.int32)
    valid_pos = jnp.arange(Lr)[None, :] < read_len[:, None]
    fwd = jnp.where(valid_pos, rcodes, 5)  # 5 = no channel (zero row)
    rev_idx = jnp.clip(read_len[:, None] - 1 - jnp.arange(Lr)[None, :], 0, Lr - 1)
    rc = jnp.where(valid_pos, rc_tab[jnp.take_along_axis(rcodes, rev_idx, 1)], 5)

    def onehot(c):  # [C, Lr] codes -> [C, Lr, 5]
        return (c[..., None] == jnp.arange(5)[None, None, :]).astype(jnp.bfloat16)

    def clip_start(c):  # shift left one: read[1:]
        return jnp.concatenate([c[:, 1:], jnp.full((C, 1), 5, c.dtype)], axis=1)

    def clip_end(c):  # zero the last REAL base
        return jnp.where(jnp.arange(Lr)[None, :] == read_len[:, None] - 1, 5, c)

    kernels = jnp.stack(
        [
            onehot(fwd),
            onehot(clip_start(fwd)),
            onehot(clip_end(fwd)),
            onehot(rc),
            onehot(clip_start(rc)),
            onehot(clip_end(rc)),
        ],
        axis=1,
    )  # [C, 6, Lr, 5]
    eff = jnp.stack([read_len, read_len - 1, read_len - 1] * 2, axis=1)  # [C, 6]

    # band tensor: B[c, t*5+ch, v*DB+d] = kernels[c, v, t-d, ch] (0 inside pad)
    t_i = jnp.arange(T)[:, None]
    d_i = jnp.arange(DB)[None, :]
    j_td = t_i - d_i
    j_clip = jnp.clip(j_td, 0, Lr - 1)
    band_mask = ((j_td >= 0) & (j_td < Lr)).astype(jnp.bfloat16)  # [T, DB]
    Bm = kernels[:, :, j_clip, :] * band_mask[None, None, :, :, None]
    Bm = Bm.transpose(0, 2, 4, 1, 3).reshape(C, T * 5, 6 * DB)

    eff_f = eff[:, 0].astype(jnp.float32)[:, None, None]   # [C,1,1]
    eff_c = eff[:, 1].astype(jnp.float32)[:, None, None]

    # one REVERSE scan over position blocks: banded matmul + gating +
    # blockwise suffix-min with carry => NXT and clip-match volumes come
    # out block-major ([nb, C, Pb, DB]); phase-B gathers index that layout
    # directly, so no [C, Pb, Wp] transposes ever materialise.
    def scan_fn(carry, b):
        carry_f, carry_r = carry  # [C, Pb] min match pos of later blocks
        sl = jax.lax.dynamic_slice(
            path_oh, (0, 0, b * DB, 0), (C, Pb, T, 5)
        ).reshape(C, Pb, T * 5)
        counts = jax.lax.dot_general(
            sl, Bm, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(C, Pb, 6, DB)  # [C, Pb, v, d]
        pos = b * DB + jnp.arange(DB, dtype=jnp.int32)
        in_path = pos[None, None, :] < plen[..., None]
        over_f = (
            pos[None, None, :] + read_len[:, None, None] <= plen[..., None]
        ) | term[..., None]
        gate = in_path & over_f

        def suffmin(v, carry_v):
            sm = jax.lax.cummin(v, axis=2, reverse=True)
            return jnp.minimum(sm, carry_v[..., None])

        nxt_f = suffmin(
            jnp.where((counts[:, :, 0] == eff_f) & gate, pos[None, None, :], INF),
            carry_f,
        )
        nxt_r = suffmin(
            jnp.where((counts[:, :, 3] == eff_f) & gate, pos[None, None, :], INF),
            carry_r,
        )
        out = (
            nxt_f, nxt_r,
            counts[:, :, 1] == eff_c, counts[:, :, 2] == eff_c,
            counts[:, :, 4] == eff_c, counts[:, :, 5] == eff_c,
        )
        return (nxt_f[..., 0], nxt_r[..., 0]), out

    carry0 = (jnp.full((C, Pb), INF), jnp.full((C, Pb), INF))
    _, (NXT_f, NXT_r, mcs_f, mce_f, mcs_r, mce_r) = jax.lax.scan(
        scan_fn, carry0, jnp.arange(nb, dtype=jnp.int32), reverse=True
    )  # each [nb, C, Pb, DB]

    nf, nr = NXT_f.reshape(-1), NXT_r.reshape(-1)
    mcsf, mcef = mcs_f.reshape(-1), mce_f.reshape(-1)
    mcsr, mcer = mcs_r.reshape(-1), mce_r.reshape(-1)
    npos_flat = stack_npos.reshape(-1)
    nlen_flat = stack_nlen.reshape(-1)

    # ================= phase B: per-pair probes (flat gathers) ==========
    pg = g_idx[pair_combo]                      # [Np] graph slot
    prow = jnp.arange(Pb, dtype=jnp.int32)

    def blk_flat(combo, p, w):
        """Flat index into the block-major [nb, C, Pb, DB] volumes."""
        return ((w // DB) * C + combo) * (Pb * DB) + p * DB + (w % DB)

    srow = pg * Nb + seed_idx                   # [Np]
    seed_starts = npos_flat[srow[:, None] * Pb + prow[None, :]]  # [Np, Pb]
    seed_len = nlen_flat[srow]                  # [Np]
    base = seed_starts + seed_off[:, None]
    base_safe = jnp.clip(base, 0, W - 1)
    flat1 = blk_flat(pair_combo[:, None], prow[None, :], base_safe)

    p_plen = plen[pair_combo]                   # [Np, Pb]
    p_term = term[pair_combo]
    p_effc = read_len[pair_combo] - 1           # [Np] clipped length

    crow = pg[probe_pair] * Nb + probe_node     # [Nq]
    c_starts = npos_flat[crow[:, None] * Pb + prow[None, :]]  # [Nq, Pb]
    c_len = nlen_flat[crow]                     # [Nq]
    c_safe = jnp.clip(c_starts, 0, W - 1)
    flat2 = blk_flat(pair_combo[probe_pair][:, None], prow[None, :], c_safe)

    q_iota = jnp.arange(Nq, dtype=jnp.int32)

    def per_ori(nxt_flat, mcs_flat, mce_flat):
        # stage 1: first valid match at/after base, bounded by the shuffle
        # limit and the seed node length (alignment.go:36-45)
        first1 = nxt_flat[flat1] - base                      # [Np, Pb]
        bound1 = jnp.minimum(span_lim, seed_len - 1 - seed_off)[:, None]
        ok1 = (seed_starts >= 0) & (first1 <= bound1)
        j1 = jnp.min(jnp.where(ok1, first1, INF), axis=1)    # [Np]
        s1 = j1 < INF
        ids1 = ok1 & (first1 == j1[:, None])

        # stage 2: contained nodes (ascending), shuffles 0..n_shuffles
        # (alignment.go:48-70); priority = (node order, shuffle), winner
        # probe row recovered from the low bits of the segment-min value
        first2 = nxt_flat[flat2] - c_starts                  # [Nq, Pb]
        bound2 = jnp.minimum(n_shuffles, c_len - 1)[:, None]
        ok2 = (c_starts >= 0) & (first2 <= bound2)
        prio_q = jnp.min(
            jnp.where(ok2, probe_rank[:, None] * (n_shuffles + 1) + first2, INF),
            axis=1,
        )  # [Nq]
        val = jnp.where(prio_q < INF, (prio_q << 15) | q_iota, INF)
        best2 = jax.ops.segment_min(
            val, probe_pair, num_segments=Np, indices_are_sorted=True
        )  # [Np]
        s2 = best2 < INF
        prio_w = best2 >> 15
        jj2 = prio_w % (n_shuffles + 1)
        q_w = jnp.clip(best2 & 32767, 0, Nq - 1)
        ok2_w = ok2[q_w]                                     # [Np, Pb]
        first2_w = first2[q_w]
        ids2 = ok2_w & (first2_w == jj2[:, None])
        win_cn = probe_node[q_w]                             # [Np]

        # stages 3/4: single clipped probes at the original seed offset
        # (alignment.go:73-103)
        def probe_clip(m_flat):
            valid = (
                (seed_starts >= 0)
                & (seed_off[:, None] < seed_len[:, None])
                & (base < p_plen)
            )
            bit = m_flat[flat1]
            over_ok = (base + p_effc[:, None] <= p_plen) | p_term
            return valid & bit & over_ok

        ok3 = probe_clip(mcs_flat)
        s3 = ok3.any(axis=1)
        ok4 = probe_clip(mce_flat)
        s4 = ok4.any(axis=1)

        found = s1 | s2 | s3 | s4
        stage = jnp.where(s1, 1, jnp.where(s2, 2, jnp.where(s3, 3, 4)))
        win_node = jnp.where(s2 & ~s1, win_cn, seed_idx)
        win_off = jnp.where(s1, seed_off + j1, jnp.where(s2, jj2, seed_off))
        ids = jnp.where(
            s1[:, None],
            ids1,
            jnp.where(
                (s2 & ~s1)[:, None],
                ids2,
                jnp.where(s3[:, None], ok3, ok4),
            ),
        )
        return found, stage, win_node, win_off, ids

    f0, st0, n0, o0, ids0 = per_ori(nf, mcsf, mcef)
    f1, st1, n1, o1, ids1 = per_ori(nr, mcsr, mcer)
    found = (f0 | f1) & pair_valid
    use0 = f0  # forward orientation tried first (graphminion.go:76-98)
    stage = jnp.where(use0, st0, st1)
    scalars = jnp.stack(
        [
            found.astype(jnp.int32),
            jnp.zeros_like(stage, dtype=jnp.int32),
            jnp.where(use0, 0, 1),
            stage,
            jnp.where(use0, n0, n1).astype(jnp.int32),
            jnp.where(use0, o0, o1).astype(jnp.int32),
            jnp.where(stage == 3, MAX_CLIP, 0),
            jnp.where(stage == 4, MAX_CLIP, 0),
        ],
        axis=1,
    )
    ids = jnp.where(use0[:, None], ids0, ids1)
    return jnp.concatenate([scalars, ids.astype(jnp.int32)], axis=1)


class DeviceAligner:
    """Drop-in alternative to GraphAligner with the cascade on device."""

    # coarse buckets: every static dim combination is one XLA compile
    # (seconds each through the tunnel). Np/Nq pick the smallest bucket
    # covering the call's REAL pair/probe counts — probe padding directly
    # multiplies the stage-2 gather volume, the kernel's dominant cost.
    C_BUCKETS = (32, 128, 512)        # combos (graph x read) per call
    P_BUCKETS = (128, 512, 2048)      # pairs (read x mapping) per call
    Q_BUCKETS = (2048, 8192, 32768)   # stage-2 probes per call

    MEM_BUDGET = 4 * 1024 * 1024 * 1024  # transient HBM per call

    def __init__(
        self, store: Dict[int, GrootGraph], references=None, prebuild: bool = True
    ):
        self.store = store
        self._graphs: Dict[int, _HostGraph] = {}
        self._stacks: Dict[Tuple[int, int, int], _SigStack] = {}
        # on TPU every distinct static shape is a fresh (tunnelled,
        # minutes-long) XLA compile: pin ONE cascade shape per signature.
        # CPU (tests) keeps adaptive buckets — compiles are cheap there and
        # padded volumes are not.
        import jax

        self._fixed_buckets = jax.default_backend() not in ("cpu",)
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

    def _combo_cap(self, sig) -> int:
        """Largest combo bucket whose transient volumes fit MEM_BUDGET.
        Per combo: one-hot bf16 [Pb, Lb, 5] + counts f32 [Pb, W, 6] + match
        bools + two i32 NXT volumes ~= Pb*Lb*48 bytes, plus the banded
        kernel tensor Bm [(Lr+DB-1)*5, 6*DB] bf16 (dominant for small Pb)."""
        Pb, Lb, Nb = sig
        DB = 128
        bm_bytes = (MAX_READ + DB - 1) * 5 * 6 * DB * 2
        per_combo = Pb * Lb * 48 + bm_bytes
        cap = self.C_BUCKETS[0]
        for b in self.C_BUCKETS:
            if b * per_combo <= self.MEM_BUDGET:
                cap = b
        return cap

    # ------------------------------------------------------------------
    # batch-level API: one submit for ALL graphs seeded by a read batch
    # ------------------------------------------------------------------
    def submit_batch(self, per_graph: Dict[int, List[Tuple[FastqRead, List, float]]]):
        """Launch the cascade for every (graph, items) group in as few
        device calls as possible. Returns an opaque handle for collect."""
        items_by_sig: Dict[Tuple[int, int, int], List] = {}
        for gid, items in per_graph.items():
            hg = self.graph_dev(self.store[gid])
            dst = items_by_sig.setdefault(hg.sig, [])
            for item in items:
                dst.append((hg, gid, item))

        calls = []
        for sig, sig_items in items_by_sig.items():
            c_cap = self._combo_cap(sig)
            p_cap = self.P_BUCKETS[-1]
            q_cap = self.Q_BUCKETS[-1]
            stack = self._stacks[sig]
            dev = stack.device()
            chunk: List = []
            n_pairs = 0
            n_probes = 0
            for entry in sig_items:
                mappings = entry[2][1]
                # a single entry must fit one chunk on its own: cap its
                # mapping list explicitly (never silently mid-pack) — the
                # reference tries mappings in order and stops at the first
                # success, so dropping the tail only loses pathological
                # >2048-mapping reads' last-resort probes
                nq = 0
                for mi, m in enumerate(mappings):
                    mq = min(len(m.contained_nodes), CN)
                    if mi >= p_cap or nq + mq > q_cap:
                        import logging

                        logging.getLogger("groot").warning(
                            "read %s: truncating %d->%d mappings to fit the "
                            "device cascade buckets",
                            entry[2][0].id, len(mappings), mi,
                        )
                        mappings = mappings[:mi]
                        entry = (entry[0], entry[1],
                                 (entry[2][0], mappings, entry[2][2]))
                        break
                    nq += mq
                npair = max(len(mappings), 1)
                if chunk and (
                    len(chunk) + 1 > c_cap
                    or n_pairs + npair > p_cap
                    or n_probes + nq > q_cap
                ):
                    calls.append(self._submit_chunk(stack, dev, chunk, c_cap))
                    chunk, n_pairs, n_probes = [], 0, 0
                chunk.append(entry)
                n_pairs += npair
                n_probes += nq
            if chunk:
                calls.append(self._submit_chunk(stack, dev, chunk, c_cap))
        return calls

    def collect_batch(self, calls):
        """Fetch all results; returns {graph_id: [(records, n_weighted), ...]}
        in the per-graph item order."""
        out: Dict[int, List[Tuple[List[AlignmentRecord], int]]] = {}
        for meta, dev_out in calls:
            packed = np.asarray(dev_out)  # [Np, 8 + Pb]
            for hg, gid, (read, mappings, kc), p0 in meta:
                graph = self.store[gid]
                res = self._collect_item(
                    graph, hg, read, mappings, kc, packed[p0 : p0 + len(mappings)]
                )
                out.setdefault(gid, []).append(res)
        return out

    def _submit_chunk(self, stack: _SigStack, dev, chunk, c_cap: int):
        """One device call for <=c_cap items (combos) of one signature."""
        Pb, Lb, Nb = stack.sig
        C = _bucket(
            len(chunk), self.C_BUCKETS[: self.C_BUCKETS.index(c_cap) + 1]
        )
        total_pairs = sum(len(e[2][1]) for e in chunk)
        Np = _bucket(max(total_pairs, 1), self.P_BUCKETS)
        total_probes = sum(
            min(len(m.contained_nodes), CN) for e in chunk for m in e[2][1]
        )
        Nq = _bucket(max(total_probes, 1), self.Q_BUCKETS)
        # submit_batch's chunking + per-entry capping guarantee fit; a
        # violation here would silently mis-pack (stale pad rows reported
        # unaligned), so fail loudly instead
        assert total_pairs <= Np and total_probes <= Nq, (
            total_pairs, Np, total_probes, Nq,
        )
        Lr_max = max(len(e[2][0].seq) for e in chunk)
        Lr = -(-max(Lr_max, 32) // 32) * 32
        pad_node = Nb - 1

        g_idx = np.zeros(C, dtype=np.int32)
        read_codes = np.full((C, Lr), 4, dtype=np.uint8)
        read_len = np.zeros(C, dtype=np.int32)
        pair_combo = np.zeros(Np, dtype=np.int32)
        pair_valid = np.zeros(Np, dtype=bool)
        seed_idx = np.full(Np, pad_node, dtype=np.int32)
        seed_off = np.zeros(Np, dtype=np.int32)
        span_lim = np.full(Np, -1, dtype=np.int32)
        # padding probes point at the pad node of combo 0: never match
        probe_pair = np.full(Nq, Np - 1, dtype=np.int32)
        probe_node = np.full(Nq, pad_node, dtype=np.int32)
        probe_rank = np.zeros(Nq, dtype=np.int32)

        meta = []
        p = 0
        q = 0
        for c, (hg, gid, (read, mappings, kc)) in enumerate(chunk):
            g_idx[c] = hg.slot
            codes = ASCII_TO_CODE[np.frombuffer(read.seq, np.uint8)]
            read_codes[c, : len(codes)] = codes
            read_len[c] = len(codes)
            meta.append((hg, gid, (read, mappings, kc), p))
            for mapping in mappings[:Np - p]:
                s_rank, s_lim, c_ranks, _w = hg.mapping_params(mapping)
                pair_combo[p] = c
                pair_valid[p] = True
                seed_idx[p] = s_rank
                seed_off[p] = mapping.offset
                span_lim[p] = s_lim
                ncn = min(len(c_ranks), Nq - q)
                probe_pair[q : q + ncn] = p
                probe_node[q : q + ncn] = c_ranks[:ncn]
                probe_rank[q : q + ncn] = np.arange(ncn, dtype=np.int32)
                q += ncn
                p += 1

        out = _pair_cascade(
            *dev,
            jnp.asarray(g_idx),
            jnp.asarray(read_codes),
            jnp.asarray(read_len),
            jnp.asarray(pair_combo),
            jnp.asarray(pair_valid),
            jnp.asarray(seed_idx),
            jnp.asarray(seed_off),
            jnp.asarray(span_lim),
            jnp.asarray(probe_pair),
            jnp.asarray(probe_node),
            jnp.asarray(probe_rank),
        )
        try:
            out.copy_to_host_async()  # overlap D2H with later dispatches
        except AttributeError:
            pass
        return meta, out

    # ------------------------------------------------------------------
    # vectorized pair-list API (batch_host tables; no per-hit Python)
    # ------------------------------------------------------------------
    def attach_tables(self, tables) -> None:
        """Bind flat WindowTables and precompute graph-local cascade ranks
        for every window/contained-node (one pass at startup; per batch the
        pair arrays are pure numpy gathers)."""
        self.tables = tables
        t = tables
        grank = np.zeros(t.num_nodes, dtype=np.int32)
        gid_col = t.node_table[:, 0]
        starts = np.searchsorted(gid_col, t.graph_ids)
        ends = np.append(starts[1:], len(gid_col))
        self._sig_ids: Dict[Tuple[int, int, int], int] = {}
        self._sig_list: List[Tuple[int, int, int]] = []
        sig_by_g = np.zeros(len(t.graph_ids), dtype=np.int16)
        slot_by_g = np.zeros(len(t.graph_ids), dtype=np.int32)
        for gi, gid in enumerate(t.graph_ids.tolist()):
            hg = self.graph_dev(self.store[gid])
            nr = hg.node_rank
            seg_col = t.node_table[starts[gi] : ends[gi], 1]
            grank[starts[gi] : ends[gi]] = np.fromiter(
                (nr[int(s)] for s in seg_col), np.int32, len(seg_col)
            )
            sid = self._sig_ids.get(hg.sig)
            if sid is None:
                sid = self._sig_ids[hg.sig] = len(self._sig_list)
                self._sig_list.append(hg.sig)
            sig_by_g[gi] = sid
            slot_by_g[gi] = hg.slot
        gpos = np.searchsorted(t.graph_ids, t.w_graph)
        self.w_sig = sig_by_g[gpos]
        self.w_slot = slot_by_g[gpos]
        self.w_seed_rank = grank[t.w_seed_grow]
        self.cn_rank = grank[t.cn_grow]
        self.probe_cnt = np.minimum(t.cn_cnt, CN).astype(np.int32)

    def process_batch_pairs(
        self, batch, rows, wins, combo_start, kc_read, acc, bam_writer, stats
    ):
        """Full cascade for one read batch from sorted (read, window) hit
        lists: submit every chunk (async device calls), then collect —
        winner selection, weight replay and BAM records, all vectorized."""
        calls = self.submit_pairs(batch, rows, wins, combo_start)
        self.collect_pairs(calls, batch, rows, wins, kc_read, acc, bam_writer, stats)

    def submit_pairs(self, batch, rows, wins, combo_start):
        """Launch all cascade chunks for a batch (async); returns handles."""
        n_pairs_total = len(rows)
        if n_pairs_total == 0:
            return []
        combo_end = np.append(combo_start[1:], n_pairs_total)
        pair_cnt = (combo_end - combo_start).astype(np.int64)
        pc_pair = self.probe_cnt[wins].astype(np.int64)
        pc_combo = np.add.reduceat(pc_pair, combo_start)
        combo_sig = self.w_sig[wins[combo_start]]

        calls = []
        p_cap = self.P_BUCKETS[-1]
        q_cap = self.Q_BUCKETS[-1]
        for sid in np.unique(combo_sig):
            sig = self._sig_list[sid]
            stack = self._stacks[sig]
            dev = stack.device()
            c_cap = self._combo_cap(sig)
            combos = np.flatnonzero(combo_sig == sid)
            cp = np.cumsum(pair_cnt[combos])
            cq = np.cumsum(pc_combo[combos])
            i = 0
            while i < len(combos):
                base_p = int(cp[i - 1]) if i else 0
                base_q = int(cq[i - 1]) if i else 0
                j = min(
                    int(np.searchsorted(cp, base_p + p_cap, side="right")),
                    int(np.searchsorted(cq, base_q + q_cap, side="right")),
                    i + c_cap,
                )
                if j <= i:
                    j = i + 1  # oversized combo: pairs capped in the packer
                calls.append(
                    self._submit_pair_chunk(
                        stack, dev, batch, rows, wins, combo_start,
                        pair_cnt, combos[i:j],
                    )
                )
                i = j
        return calls

    def collect_pairs(
        self, calls, batch, rows, wins, kc_read, acc, bam_writer, stats
    ):
        """Drain cascade results: winner selection, weight replay, BAM."""
        from .batch_host import winners

        t = self.tables
        for meta, dev_out in calls:
            pair_idx, owner, starts_local, total_pairs = meta
            packed = np.asarray(dev_out)[:total_pairs]
            found = packed[:, 0].astype(bool)
            win, n_weighted = winners(found, starts_local)
            lim = (starts_local + n_weighted)[owner]
            sel = np.arange(total_pairs, dtype=np.int64) < lim
            sel_pairs = pair_idx[sel]
            acc.add_pairs(wins[sel_pairs], kc_read[rows[sel_pairs]])
            for ci in np.flatnonzero(win >= 0):
                p_local = int(win[ci])
                gpair = int(pair_idx[p_local])
                row = packed[p_local]
                gid = int(t.w_graph[wins[gpair]])
                hg = self._graphs[gid]
                read = batch.read(int(rows[gpair]))
                records = self._build_records(
                    self.store[gid], hg.gp, hg, read,
                    int(row[2]), int(row[4]), int(row[5]),
                    int(row[6]), int(row[7]), row[8:],
                )
                stats.alignment_count += len(records)
                if bam_writer is not None:
                    for rec in records:
                        bam_writer.write(rec)

    def _submit_pair_chunk(
        self, stack, dev, batch, rows, wins, combo_start, pair_cnt, chunk
    ):
        """Pack one chunk of combos into bucketed device arrays (all numpy
        gathers) and launch the cascade."""
        import logging

        Pb, Lb, Nb = stack.sig
        pad_node = Nb - 1
        c_cap = self._combo_cap(stack.sig)
        C = _bucket(
            len(chunk), self.C_BUCKETS[: self.C_BUCKETS.index(c_cap) + 1]
        )
        p_cap = self.P_BUCKETS[-1]
        q_cap = self.Q_BUCKETS[-1]

        capped = np.minimum(pair_cnt[chunk], p_cap)
        if (capped < pair_cnt[chunk]).any():
            logging.getLogger("groot").warning(
                "capping %d oversized combos to %d mappings",
                int((capped < pair_cnt[chunk]).sum()), p_cap,
            )
        total_pairs = int(capped.sum())
        owner = np.repeat(np.arange(len(chunk)), capped)
        starts_local = np.concatenate(
            ([0], np.cumsum(capped[:-1]))
        ).astype(np.int64)
        rank = np.arange(total_pairs, dtype=np.int64) - starts_local[owner]
        pair_idx = combo_start[chunk][owner] + rank
        wch = wins[pair_idx]
        pq = self.probe_cnt[wch].astype(np.int64)
        cum_pq = np.cumsum(pq)
        total_probes = int(cum_pq[-1]) if total_pairs else 0
        if total_probes > q_cap:
            # only reachable for a single-combo chunk: drop tail pairs
            keep = int(np.searchsorted(cum_pq, q_cap, side="right"))
            logging.getLogger("groot").warning(
                "truncating oversized combo to %d mappings (probe budget)",
                keep,
            )
            total_pairs = keep
            owner = owner[:keep]
            pair_idx = pair_idx[:keep]
            wch = wch[:keep]
            pq = pq[:keep]
            starts_local = np.zeros(len(chunk), dtype=np.int64)
            total_probes = int(pq.sum())

        if self._fixed_buckets:
            C = _bucket(c_cap, self.C_BUCKETS)
            Np = self.P_BUCKETS[-1]
            Nq = self.Q_BUCKETS[-1]
        else:
            Np = _bucket(max(total_pairs, 1), self.P_BUCKETS)
            Nq = _bucket(max(total_probes, 1), self.Q_BUCKETS)
        Lr = batch.codes.shape[1]

        t = self.tables
        heads = combo_start[chunk]
        crows = rows[heads]
        g_idx = np.zeros(C, np.int32)
        g_idx[: len(chunk)] = self.w_slot[wins[heads]]
        read_codes = np.full((C, Lr), 4, np.uint8)
        read_codes[: len(chunk)] = batch.codes[crows]
        read_len = np.zeros(C, np.int32)
        read_len[: len(chunk)] = batch.lengths[crows]

        pair_combo = np.zeros(Np, np.int32)
        pair_combo[:total_pairs] = owner
        pair_valid = np.zeros(Np, bool)
        pair_valid[:total_pairs] = True
        seed_idx = np.full(Np, pad_node, np.int32)
        seed_idx[:total_pairs] = self.w_seed_rank[wch]
        seed_off = np.zeros(Np, np.int32)
        seed_off[:total_pairs] = t.w_off[wch]
        span_lim = np.full(Np, -1, np.int32)
        span_lim[:total_pairs] = t.w_span[wch]

        from .batch_host import csr_expand

        pflat, powner, prank = csr_expand(t.cn_ptr, self.probe_cnt, wch)
        probe_pair = np.full(Nq, Np - 1, np.int32)
        probe_pair[:total_probes] = powner
        probe_node = np.full(Nq, pad_node, np.int32)
        probe_node[:total_probes] = self.cn_rank[pflat]
        probe_rank = np.zeros(Nq, np.int32)
        probe_rank[:total_probes] = prank

        out = _pair_cascade(
            *dev,
            jnp.asarray(g_idx),
            jnp.asarray(read_codes),
            jnp.asarray(read_len),
            jnp.asarray(pair_combo),
            jnp.asarray(pair_valid),
            jnp.asarray(seed_idx),
            jnp.asarray(seed_off),
            jnp.asarray(span_lim),
            jnp.asarray(probe_pair),
            jnp.asarray(probe_node),
            jnp.asarray(probe_rank),
        )
        try:
            out.copy_to_host_async()
        except AttributeError:
            pass
        return (pair_idx, owner, starts_local, total_pairs), out

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

    def _collect_item(
        self, graph, hg: _HostGraph, read, mappings, kmer_count, packed
    ) -> Tuple[List[AlignmentRecord], int]:
        """Winner = first successful mapping (mappings are pre-sorted,
        graphminion.go:57); weight replay covers mappings up to the winner
        inclusive (the reference weights each mapping as it tries it)."""
        found = packed[:, 0].astype(bool)
        win = int(np.argmax(found)) if found.any() else -1
        n_weighted = win + 1 if win >= 0 else len(mappings)
        n_weighted = min(n_weighted, len(mappings))

        gid = graph.graph_id
        kf = self._kf_acc.get(gid)
        if kf is None:
            kf = self._kf_acc[gid] = np.zeros(len(hg.node_ids), np.float64)
            self._kt_acc[gid] = 0.0
        for mapping in mappings[:n_weighted]:
            _s, _l, _c, (w_ranks, shares, multi) = hg.mapping_params(mapping)
            kf[w_ranks] += shares * kmer_count
            if multi:
                self._kt_acc[gid] += float(int(kmer_count))

        records: List[AlignmentRecord] = []
        if win >= 0:
            row = packed[win]
            records = self._build_records(
                graph, hg.gp, hg, read,
                int(row[2]), int(row[4]), int(row[5]),
                int(row[6]), int(row[7]), row[8:],
            )
        return records, n_weighted

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
