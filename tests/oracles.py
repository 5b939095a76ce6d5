"""Pure-Python oracle implementations of the reference's metric formulas.

Written fresh from the formulas in reference evaluation.py (cited per
function) — used to check the Spark implementations on small graphs.
These are intentionally naive O(n+m) dict loops: clarity over speed.
"""

from __future__ import annotations

import math
from collections import defaultdict


def oracle_modularity(nxg, partition: dict) -> float:
    """Q = sum_c [ L_c/m - (d_c/2m)^2 ] (reference evaluation.py:11-47)."""
    m = nxg.number_of_edges()
    if m == 0:
        return 0.0
    intra = defaultdict(float)
    deg = defaultdict(float)
    for u, v in nxg.edges():
        if partition[u] == partition[v]:
            intra[partition[u]] += 1.0
    for node, d in nxg.degree():
        deg[partition[node]] += d
    return sum(
        intra[c] / m - (deg[c] / (2.0 * m)) ** 2 for c in set(partition.values())
    )


def oracle_conductance(nxg, partition: dict):
    """Reference evaluation.py:49-128: per-inside-endpoint cut counting."""
    communities = defaultdict(set)
    for node, c in partition.items():
        communities[c].add(node)
    total_volume = sum(d for _, d in nxg.degree())
    per = {}
    for cid, nodes in communities.items():
        cut = 0
        vol = 0
        for node in nodes:
            vol += nxg.degree(node)
            for nb in nxg.neighbors(node):
                if nb not in nodes:
                    cut += 1
        rest = total_volume - vol
        if min(vol, rest) > 0:
            cond = cut / min(vol, rest)
        else:
            cond = 0.0 if cut == 0 else 1.0
        per[cid] = max(0.0, min(1.0, cond))
    avg = sum(per.values()) / len(per) if per else 0.0
    return per, avg


def oracle_coverage(nxg, partition: dict) -> float:
    m = nxg.number_of_edges()
    if m == 0:
        return 0.0
    intra = sum(1 for u, v in nxg.edges() if partition[u] == partition[v])
    return intra / m


def oracle_description_length(nxg, partition: dict):
    """Reference evaluation.py:187-248 map-equation approximation."""
    m2 = nxg.number_of_edges() * 2
    if m2 == 0:
        return 0.0, {}
    communities = defaultdict(set)
    for node, c in partition.items():
        communities[c].add(node)
    H = 0.0
    per = {}
    for cid, nodes in communities.items():
        p_comm = sum(nxg.degree(n) for n in nodes) / m2
        if p_comm <= 0:
            continue
        internal = external = 0
        for node in nodes:
            for nb in nxg.neighbors(node):
                if nb in nodes:
                    internal += 1
                else:
                    external += 1
        if internal + external > 0:
            p_exit = external / (internal + external)
            if 0 < p_exit < 1:
                e = -p_comm * (
                    p_exit * math.log2(p_exit) + (1 - p_exit) * math.log2(1 - p_exit)
                )
                H += e
                per[cid] = e
    return H, per


def oracle_nmi(pred: dict, true: dict) -> float:
    """sklearn normalized_mutual_info_score semantics on the overlap
    (arithmetic-mean normalization; reference evaluation.py:250-289)."""
    common = set(pred) & set(true)
    if not common:
        return 0.0
    n = len(common)
    cont = defaultdict(int)
    a = defaultdict(int)
    b = defaultdict(int)
    for node in common:
        cont[(pred[node], true[node])] += 1
        a[pred[node]] += 1
        b[true[node]] += 1
    mi = 0.0
    for (i, j), nij in cont.items():
        mi += (nij / n) * math.log(n * nij / (a[i] * b[j]))
    mi = max(0.0, mi)
    hu = -sum((x / n) * math.log(x / n) for x in a.values())
    hv = -sum((x / n) * math.log(x / n) for x in b.values())
    if hu == 0.0 and hv == 0.0:
        return 1.0
    denom = (hu + hv) / 2.0
    if denom == 0.0 or mi == 0.0:
        return 0.0
    return min(1.0, mi / denom)
