"""Expectation-Maximization over graph equivalence classes.

Reference: /root/reference/src/em/em.go (plain EM, no SQUAREM) driven by
GrootGraph.RunEM/ProcessEMpaths (/root/reference/src/graph/paths.go:32-98):
equivalence classes are graph nodes; each ec's member set is the node's
path IDs and its count is KmerFreq / len(sequence).

TPU-native form: the per-ec loops become two matmuls per iteration over a
dense membership matrix M [E, P]:

    denom      = M @ alpha                      (masked where count==0 or
                                                 denom < tolerance)
    next_alpha = alpha * (M^T @ (count/denom))

run under jax.lax.while_loop with the reference's convergence rule
(no path with alpha > 1e-2 changing by > 1% after min_iterations, then one
final round after zeroing alphas < 1e-8; em.go:60-150).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

TOLERANCE = np.nextafter(1.0, 2.0) - 1.0  # em.go:11
ALPHA_LIMIT = 1e-7
ALPHA_CHANGE = 1e-2
ALPHA_CHANGE_LIMIT = 1e-2


@partial(jax.jit, static_argnames=("min_iterations", "max_iterations"))
def _run_em(membership, counts, min_iterations: int, max_iterations: int):
    E, P = membership.shape
    m = membership.astype(jnp.float32)
    counts = counts.astype(jnp.float32)
    alpha0 = jnp.full((P,), 1.0 / P, dtype=jnp.float32)

    def update(alpha):
        denom = m @ alpha  # [E]
        valid = (counts != 0) & (denom >= TOLERANCE)
        count_norm = jnp.where(valid, counts / jnp.maximum(denom, TOLERANCE), 0.0)
        return alpha * (count_norm @ m)  # [P]

    def body(state):
        it, alpha, alpha_b4, final_round, done = state
        next_alpha = update(alpha)
        changed = (next_alpha > ALPHA_CHANGE_LIMIT) & (
            jnp.abs(next_alpha - alpha) / jnp.maximum(next_alpha, 1e-30)
            > ALPHA_CHANGE
        )
        stop = (~changed.any()) & (it > min_iterations)
        # if this was the final round, we are done (em.go:125-127)
        done = final_round
        # entering the final round: save pre-zero alphas, zero tiny ones
        enter_final = stop & (~final_round)
        alpha_b4 = jnp.where(enter_final, next_alpha, alpha_b4)
        next_alpha = jnp.where(
            enter_final & (next_alpha < ALPHA_LIMIT / 10.0), 0.0, next_alpha
        )
        return (it + 1, next_alpha, alpha_b4, final_round | enter_final, done)

    def cond(state):
        it, _, _, _, done = state
        return (~done) & (it < max_iterations)

    init = (
        jnp.array(0),
        alpha0,
        alpha0,
        jnp.array(False),
        jnp.array(False),
    )
    it, alpha, alpha_b4, final_round, done = jax.lax.while_loop(cond, body, init)
    # if we hit max_iterations without converging, keep alphas as-is
    alpha_b4 = jnp.where(done, alpha_b4, alpha)
    return it, alpha, alpha_b4


class EMRunner:
    """NewEM/Run/Return equivalent (em.go:29-158)."""

    def __init__(
        self,
        num_iterations: int,
        min_iterations: int,
        paths: Dict[int, str],
        lengths: Dict[int, int],
        ec_map: Dict[int, List[int]],
        counts: Dict[int, float],
    ):
        if num_iterations < min_iterations:
            raise ValueError(
                f"number of EM iterations ({num_iterations}) must be greater "
                f"than minimum iterations ({min_iterations})"
            )
        self.path_ids = sorted(paths)
        self.dense = {p: i for i, p in enumerate(self.path_ids)}
        P = len(self.path_ids)
        ecs = sorted(ec_map)
        E = len(ecs)
        self.membership = np.zeros((E, P), dtype=np.float32)
        self.counts = np.zeros(E, dtype=np.float32)
        for e, ec in enumerate(ecs):
            for pid in ec_map[ec]:
                self.membership[e, self.dense[pid]] = 1.0
            self.counts[e] = counts[ec]
        self.num_iterations = num_iterations
        self.min_iterations = min_iterations
        self.iterations_ran = 0
        self.alpha: np.ndarray | None = None

    def run(self) -> None:
        it, alpha, _alpha_b4 = _run_em(
            jnp.asarray(self.membership),
            jnp.asarray(self.counts),
            self.min_iterations,
            self.num_iterations,
        )
        self.iterations_ran = int(it)
        self.alpha = np.asarray(alpha, dtype=np.float64)

    def result(self) -> Tuple[int, Dict[int, float]]:
        if self.iterations_ran < 1:
            raise RuntimeError("no EM iterations were ran")
        return self.iterations_ran, {
            pid: float(self.alpha[i]) for i, pid in enumerate(self.path_ids)
        }


def run_em_on_graph(graph, min_iterations: int, num_iterations: int) -> None:
    """GrootGraph.RunEM (paths.go:32-69)."""
    ec_map: Dict[int, List[int]] = {}
    counts: Dict[int, float] = {}
    for node in graph.sorted_nodes:
        if node.marked:
            continue
        if node.segment_id in ec_map:
            raise ValueError("duplicate node ID found in graph")
        ec_map[node.segment_id] = list(node.path_ids)
        counts[node.segment_id] = node.kmer_freq / len(node.sequence)
    em = EMRunner(
        num_iterations,
        min_iterations,
        graph.paths,
        graph.lengths,
        ec_map,
        counts,
    )
    em.run()
    graph.em_iterations, alpha = em.result()
    graph.alpha = alpha


def process_em_paths(graph, cutoff: float, total_kmers: int) -> None:
    """GrootGraph.ProcessEMpaths (paths.go:72-98): normalise alpha -> rho,
    abundance = rho * KmerTotal / totalKmers, drop paths below cutoff."""
    if graph.em_iterations == 0:
        raise RuntimeError("EM has not been run for this graph")
    total = sum(graph.alpha.values())
    graph.abundances = {}
    for pid, a in graph.alpha.items():
        rho = a / total if total > 0 else 0.0
        kmer_share = rho * float(graph.kmer_total) / float(total_kmers)
        if kmer_share >= cutoff:
            graph.abundances[pid] = kmer_share
        else:
            graph.paths.pop(pid, None)
