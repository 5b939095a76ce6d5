"""Sequential oracle for the engine's deterministic Louvain spec.

Implements EXACTLY the spec documented in
csd363_sin_spark/operators/louvain.py (synchronous down-only-gated local
moves, integer-exact scaled gains, smallest-comm tie-breaks, identical
stopping rules) with plain Python dicts, so the distributed result must
match per-vertex, bit-for-bit.
"""

from __future__ import annotations

from collections import defaultdict


def _canonical(edges):
    agg = defaultdict(float)
    for u, v, w in edges:
        a, b = (u, v) if u <= v else (v, u)
        agg[(a, b)] += w
    return agg


def _strengths(cedges, vertices):
    k = {v: 0.0 for v in vertices}
    for (u, v), w in cedges.items():
        if u == v:
            k[u] += 2.0 * w
        else:
            k[u] += w
            k[v] += w
    return k


def _local_move(cedges, vertices, m, max_supersteps):
    adj = defaultdict(dict)
    for (u, v), w in cedges.items():
        if u != v:
            adj[u][v] = adj[u].get(v, 0.0) + w
            adj[v][u] = adj[v].get(u, 0.0) + w
    k = _strengths(cedges, vertices)
    assign = {v: v for v in vertices}

    steps = 0
    for step in range(max_supersteps):
        steps = step + 1
        S = defaultdict(float)
        for v in vertices:
            S[assign[v]] += k[v]
        next_assign = {}
        moves = 0
        for v in vertices:
            cur = assign[v]
            k_in = defaultdict(float)
            k_in[cur] += 0.0
            for nb, w in adj[v].items():
                k_in[assign[nb]] += w
            best_score, best_c = None, None
            for c, kin in k_in.items():
                s_eff = S[c] - (k[v] if c == cur else 0.0)
                score = 2.0 * m * kin - k[v] * s_eff
                key = (score, -c)
                if best_score is None or key > best_score:
                    best_score, best_c = key, c
            cur_s_eff = S[cur] - k[v]
            cur_score = 2.0 * m * k_in[cur] - k[v] * cur_s_eff
            improves = best_score[0] > cur_score
            if improves and best_c < cur:
                next_assign[v] = best_c
                if best_c != cur:
                    moves += 1
            else:
                next_assign[v] = cur
        assign = next_assign
        if moves == 0:
            break
    return assign, steps


def _modularity(cedges_orig, composed, m):
    intra = defaultdict(float)
    S = defaultdict(float)
    for (u, v), w in cedges_orig.items():
        if composed[u] == composed[v]:
            intra[composed[u]] += w
        S[composed[u]] += w
        S[composed[v]] += w
    return sum(
        intra[c] / m - (S[c] / (2.0 * m)) ** 2 for c in set(composed.values())
    )


def _contract(cedges, assign):
    agg = defaultdict(float)
    for (u, v), w in cedges.items():
        a, b = assign[u], assign[v]
        if a > b:
            a, b = b, a
        agg[(a, b)] += w
    verts = sorted(set(assign.values()))
    return agg, verts


def oracle_louvain(
    edge_rows,
    vertices,
    min_gain=1.0e-7,
    max_levels=10,
    max_supersteps=64,
):
    """edge_rows: (u, v, w) triples; vertices: iterable of vertex ids.
    Returns (composed dict, modularity, levels, history)."""
    vertices = sorted(set(vertices))
    cedges_orig = _canonical(edge_rows)
    m_orig = sum(cedges_orig.values())

    cedges = dict(cedges_orig)
    verts = list(vertices)
    composed = {v: v for v in vertices}
    q_prev = None
    history = []
    levels = 0

    for level in range(max_levels):
        m = sum(cedges.values())
        if m == 0.0:
            break
        assign, _steps = _local_move(cedges, verts, m, max_supersteps)
        new_composed = {v: assign[composed[v]] for v in vertices}
        q = _modularity(cedges_orig, new_composed, m_orig)
        levels = level + 1
        if q_prev is not None and q - q_prev <= min_gain:
            if q > q_prev:
                composed, history = new_composed, history + [q]
            break
        composed = new_composed
        history.append(q)
        q_prev = q
        cedges, verts = _contract(cedges, assign)
        if len(verts) <= 1:
            break

    return composed, (history[-1] if history else 0.0), levels, history
