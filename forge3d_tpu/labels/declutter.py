# forge3d_tpu/labels/declutter.py
# Declutter solvers: greedy, simulated annealing, bounded-optimal
# (branch-and-bound max-weight independent set with rationale).
#
# Parity notes (reference behavior, not code): /root/reference/src/labels/
# declutter.rs:159-318 (greedy + annealing) and optimal.rs
# ("CARTOGRAPHER-PRIME" declutter_optimal — exact bounded solver emitting a
# rationale). Problem: each label has candidate placements with priorities;
# choose ≤1 placement per label, no two chosen boxes overlapping, maximize
# total priority. This is max-weight independent set on the conflict graph.

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .collision import boxes_overlap

__all__ = ["declutter_greedy", "declutter_annealing", "declutter_optimal",
           "DeclutterResult"]

Box = Tuple[float, float, float, float]


@dataclass
class DeclutterResult:
    chosen: List[int]              # indices into the candidate list
    total_priority: float
    rationale: Dict[str, object] = field(default_factory=dict)


def _conflicts(boxes: Sequence[Box], labels: Sequence[int],
               margin: float) -> List[set]:
    n = len(boxes)
    adj: List[set] = [set() for _ in range(n)]
    arr = np.asarray(boxes, np.float64)
    for i in range(n):
        overl = ~((arr[i + 1:, 0] >= arr[i, 2] + margin)
                  | (arr[i, 0] >= arr[i + 1:, 2] + margin)
                  | (arr[i + 1:, 1] >= arr[i, 3] + margin)
                  | (arr[i, 1] >= arr[i + 1:, 3] + margin))
        for j in np.nonzero(overl)[0] + i + 1:
            adj[i].add(int(j))
            adj[int(j)].add(i)
    # same-label candidates are mutually exclusive
    by_label: Dict[int, List[int]] = {}
    for i, lab in enumerate(labels):
        by_label.setdefault(lab, []).append(i)
    for group in by_label.values():
        for a in group:
            for b in group:
                if a != b:
                    adj[a].add(b)
    return adj


def declutter_greedy(boxes: Sequence[Box], priorities: Sequence[float],
                     labels: Optional[Sequence[int]] = None, *,
                     margin: float = 0.0) -> DeclutterResult:
    """Priority-descending greedy: accept a candidate iff it conflicts with
    nothing accepted (reference declutter.rs greedy path). Deterministic
    tie-break by index."""
    n = len(boxes)
    labels = list(labels) if labels is not None else list(range(n))
    order = sorted(range(n), key=lambda i: (-float(priorities[i]), i))
    chosen: List[int] = []
    used_labels = set()
    for i in order:
        if labels[i] in used_labels:
            continue
        if any(boxes_overlap(boxes[i], boxes[j], margin=margin) for j in chosen):
            continue
        chosen.append(i)
        used_labels.add(labels[i])
    chosen.sort()
    return DeclutterResult(
        chosen=chosen,
        total_priority=float(sum(priorities[i] for i in chosen)),
        rationale={"algorithm": "greedy", "order": "priority_desc",
                   "candidates": n, "placed": len(chosen)},
    )


def declutter_annealing(boxes: Sequence[Box], priorities: Sequence[float],
                        labels: Optional[Sequence[int]] = None, *,
                        margin: float = 0.0, seed: int = 0,
                        iterations: int = 4000,
                        t_start: float = 1.0, t_end: float = 0.01
                        ) -> DeclutterResult:
    """Simulated annealing over feasible sets: flip a random candidate in /
    out (evicting its conflicts), Metropolis-accept on priority delta.
    Seeded and deterministic."""
    n = len(boxes)
    labels = list(labels) if labels is not None else list(range(n))
    pri = np.asarray(priorities, np.float64)
    adj = _conflicts(boxes, labels, margin)
    state = set(declutter_greedy(boxes, priorities, labels, margin=margin).chosen)
    best = set(state)
    best_score = float(pri[list(state)].sum()) if state else 0.0
    score = best_score
    rng = np.random.default_rng(seed)
    if n:
        for it in range(iterations):
            t = t_start * (t_end / t_start) ** (it / max(iterations - 1, 1))
            i = int(rng.integers(0, n))
            if i in state:
                new_score = score - pri[i]
                accept = (new_score > score
                          or rng.random() < math.exp((new_score - score) / max(t, 1e-9)))
                if accept:
                    state.discard(i)
                    score = new_score
            else:
                evict = adj[i] & state
                delta = pri[i] - pri[list(evict)].sum() if evict else pri[i]
                if delta > 0 or rng.random() < math.exp(delta / max(t, 1e-9)):
                    state -= evict
                    state.add(i)
                    score += delta
            if score > best_score:
                best_score, best = score, set(state)
    chosen = sorted(best)
    return DeclutterResult(
        chosen=chosen, total_priority=float(pri[chosen].sum()) if chosen else 0.0,
        rationale={"algorithm": "annealing", "seed": seed,
                   "iterations": iterations, "candidates": n,
                   "placed": len(chosen)},
    )


def declutter_optimal(boxes: Sequence[Box], priorities: Sequence[float],
                      labels: Optional[Sequence[int]] = None, *,
                      margin: float = 0.0, node_budget: int = 200_000
                      ) -> DeclutterResult:
    """Bounded-optimal solver (reference seam: declutter_optimal_py,
    CARTOGRAPHER-PRIME): branch-and-bound max-weight independent set on the
    conflict graph. Exact when the search completes within node_budget;
    otherwise returns the incumbent with rationale.optimal=False.

    Decomposes into connected components first, so real label layouts
    (sparse conflicts) solve exactly even at thousands of candidates.
    """
    n = len(boxes)
    labels = list(labels) if labels is not None else list(range(n))
    pri = np.asarray(priorities, np.float64)
    adj = _conflicts(boxes, labels, margin)

    # connected components of the conflict graph
    comp = [-1] * n
    ncomp = 0
    for s in range(n):
        if comp[s] >= 0:
            continue
        stack = [s]
        comp[s] = ncomp
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if comp[v] < 0:
                    comp[v] = ncomp
                    stack.append(v)
        ncomp += 1

    chosen_all: List[int] = []
    nodes_used = 0
    proven_optimal = True
    for c in range(ncomp):
        members = [i for i in range(n) if comp[i] == c]
        # order by weight desc for better bounds
        members.sort(key=lambda i: (-pri[i], i))
        local_index = {g: k for k, g in enumerate(members)}
        m = len(members)
        ladj = [set(local_index[v] for v in adj[g] if comp[v] == c)
                for g in members]
        w = pri[members]
        suffix = np.concatenate([np.cumsum(w[::-1])[::-1], [0.0]])

        if m > 400:
            # component too large for exact search: greedy incumbent
            proven_optimal = False
            sub = declutter_greedy([boxes[g] for g in members],
                                   [pri[g] for g in members],
                                   [labels[g] for g in members], margin=margin)
            chosen_all.extend(members[k] for k in sub.chosen)
            continue

        best_set: List[int] = []
        best_w = -1.0
        budget = [node_budget - nodes_used]

        def bb(idx: int, cur: List[int], cur_w: float, banned: set):
            nonlocal best_set, best_w
            if budget[0] <= 0:
                return
            budget[0] -= 1
            if cur_w > best_w:
                best_w, best_set = cur_w, list(cur)
            if idx >= m or cur_w + suffix[idx] <= best_w:
                return
            # include members[idx] if allowed
            if idx not in banned:
                bb(idx + 1, cur + [idx], cur_w + w[idx], banned | ladj[idx])
            # exclude
            bb(idx + 1, cur, cur_w, banned)

        bb(0, [], 0.0, set())
        if budget[0] <= 0:
            proven_optimal = False
        nodes_used = node_budget - budget[0]
        chosen_all.extend(members[k] for k in best_set)

    chosen_all.sort()
    return DeclutterResult(
        chosen=chosen_all,
        total_priority=float(pri[chosen_all].sum()) if chosen_all else 0.0,
        rationale={"algorithm": "optimal_bb", "optimal": proven_optimal,
                   "components": ncomp, "nodes_explored": nodes_used,
                   "node_budget": node_budget, "candidates": n,
                   "placed": len(chosen_all)},
    )
