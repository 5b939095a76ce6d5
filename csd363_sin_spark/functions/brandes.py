"""Local (single-partition) Brandes edge-betweenness + GN kernels.

Algorithm: Brandes, "A Faster Algorithm for Betweenness Centrality" (J. Math.
Sociology 2001) — forward BFS sigma counts + backward dependency accumulation.

These are the numpy/pure-Python kernels executed INSIDE grouped Arrow UDFs
(one community subgraph per group, reference detection.py:44-142 processes
them one at a time in a Python loop — we run all groups in parallel).
No networkx dependency: the engine is self-contained.

Determinism spec (mirrored by tests):
* betweenness accumulated in vertex-id order over sources;
* GN removes the max-betweenness edge, ties broken by smallest (u, v);
* components labeled by their minimum vertex id.
"""

from __future__ import annotations

from collections import defaultdict, deque


def edge_betweenness_local(adj: dict, sources=None, max_depth: int | None = None) -> dict:
    """Unweighted Brandes edge betweenness.

    ``adj``: dict vertex -> set/list of neighbors (symmetric).
    Returns dict (u, v) [u < v] -> raw betweenness (undirected halved),
    matching ``nx.edge_betweenness_centrality(G, normalized=False)``.
    ``max_depth``: stop discovering vertices beyond this BFS distance —
    the SAME truncation rule as the distributed dataflow kernel, so the
    two dispatch paths agree on diameter > max_depth graphs too.
    """
    bet: dict = defaultdict(float)
    nodes = sorted(adj)
    if sources is None:
        sources = nodes
    for s in sources:
        # forward BFS
        dist = {s: 0}
        sigma = defaultdict(float)
        sigma[s] = 1.0
        preds = defaultdict(list)
        order = []
        dq = deque([s])
        while dq:
            v = dq.popleft()
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    if max_depth is not None and dist[v] >= max_depth:
                        continue
                    dist[w] = dist[v] + 1
                    dq.append(w)
                if dist.get(w) == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        # backward accumulation
        delta = defaultdict(float)
        for w in reversed(order):
            for v in preds[w]:
                c = sigma[v] / sigma[w] * (1.0 + delta[w])
                key = (v, w) if v < w else (w, v)
                bet[key] += c
                delta[v] += c
    return {k: v / 2.0 for k, v in bet.items()}


def vertex_betweenness_local(
    adj: dict, sources=None, max_depth: int | None = None
) -> dict:
    """Unweighted Brandes VERTEX betweenness (same pass as the edge kernel,
    accumulating per-vertex dependencies instead of per-edge contributions).

    Returns dict vertex -> raw betweenness (undirected halved), matching
    ``nx.betweenness_centrality(G, normalized=False)``: every vertex of
    ``adj`` appears, leaves with 0.0.  ``sources``/``max_depth`` follow
    ``edge_betweenness_local`` exactly, so the sampled/truncated variants
    of the two kernels stay aligned.
    """
    bet: dict = {v: 0.0 for v in adj}
    nodes = sorted(adj)
    if sources is None:
        sources = nodes
    for s in sources:
        dist = {s: 0}
        sigma = defaultdict(float)
        sigma[s] = 1.0
        preds = defaultdict(list)
        order = []
        dq = deque([s])
        while dq:
            v = dq.popleft()
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    if max_depth is not None and dist[v] >= max_depth:
                        continue
                    dist[w] = dist[v] + 1
                    dq.append(w)
                if dist.get(w) == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = defaultdict(float)
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bet[w] += delta[w]
    return {v: b / 2.0 for v, b in bet.items()}


def components_local(adj: dict) -> dict:
    """vertex -> component id (= min vertex id in the component)."""
    comp = {}
    for start in sorted(adj):
        if start in comp:
            continue
        stack = [start]
        members = []
        seen = {start}
        while stack:
            v = stack.pop()
            members.append(v)
            for w in adj[v]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        root = min(members)
        for v in members:
            comp[v] = root
    return comp


def _modularity_local(edges: list, partition: dict) -> float:
    m = len(edges)
    if m == 0:
        return 0.0
    intra = defaultdict(float)
    deg = defaultdict(float)
    for u, v in edges:
        if partition[u] == partition[v]:
            intra[partition[u]] += 1.0
        deg[partition[u]] += 1.0
        deg[partition[v]] += 1.0
    return sum(
        intra[c] / m - (deg[c] / (2.0 * m)) ** 2 for c in set(partition.values())
    )


def girvan_newman_local(
    edges: list,
    vertices: list,
    max_communities: int | None = None,
    max_iterations: int | None = None,
    betweenness_sources: int | None = None,
) -> dict:
    """Deterministic GN with best-modularity tracking
    (reference girvan_newman_wrapper.py:13-129 semantics).

    Each "iteration" removes max-betweenness edges one at a time until the
    component count increases (one nx.girvan_newman yield), evaluates the
    split's modularity on the ORIGINAL subgraph, and keeps the best; stops
    at ``max_communities`` components or ``max_iterations`` splits.
    ``betweenness_sources``: if set, Brandes runs from the first k vertices
    (sampled-source approximation, reference :77-80).

    Returns vertex -> community id (min vertex id labeling) of the
    best-modularity split seen.
    """
    vertices = sorted(set(vertices))
    orig_edges = [tuple(sorted(e)) for e in edges]
    cur = set(orig_edges)
    adj = {v: set() for v in vertices}
    for u, v in cur:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)

    n_comp = len(set(components_local(adj).values()))
    best_q, best_part = None, None
    iteration = 0
    while cur:
        iteration += 1
        # remove edges until component count increases
        start_comp = n_comp
        while cur and n_comp == start_comp:
            sources = (
                vertices[:betweenness_sources] if betweenness_sources else None
            )
            bet = edge_betweenness_local(adj, sources=sources)
            if not bet:
                break
            target = max(bet.items(), key=lambda kv: (kv[1], (-kv[0][0], -kv[0][1])))[0]
            cur.discard(target)
            adj[target[0]].discard(target[1])
            adj[target[1]].discard(target[0])
            comp = components_local(adj)
            n_comp = len(set(comp.values()))
        part = components_local(adj)
        q = _modularity_local(orig_edges, part)
        if best_q is None or q > best_q:
            best_q, best_part = q, dict(part)
        if max_communities is not None and n_comp >= max_communities:
            break
        if max_iterations is not None and iteration >= max_iterations:
            break
    if best_part is None:
        best_part = {v: min(vertices) if vertices else 0 for v in vertices}
    return best_part
