"""Pure-numpy graph oracles (scipy/networkx are not available in this env;
these implement the same semantics the reference delegates to them)."""

from __future__ import annotations

import numpy as np


def cc_oracle(edges, n: int) -> np.ndarray:
    """Undirected connected components; label = min vertex id of component."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return np.array([find(i) for i in range(n)])


def triangle_oracle(edges, n: int) -> int:
    nbrs = [set() for _ in range(n)]
    for a, b in edges:
        a, b = int(a), int(b)
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    cnt = 0
    for a in range(n):
        for b in nbrs[a]:
            if b > a:
                cnt += len([c for c in (nbrs[a] & nbrs[b]) if c > b])
    return cnt


def triangles_per_vertex_oracle(edges, n: int) -> np.ndarray:
    nbrs = [set() for _ in range(n)]
    for a, b in edges:
        a, b = int(a), int(b)
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    out = np.zeros(n, dtype=np.int64)
    for a in range(n):
        for b in nbrs[a]:
            if b > a:
                for c in nbrs[a] & nbrs[b]:
                    if c > b:
                        out[a] += 1
                        out[b] += 1
                        out[c] += 1
    return out


def lpa_oracle(edges, n: int, iters: int = 10) -> np.ndarray:
    """Synchronous LPA, mode update, ties -> smaller label."""
    nbrs = [[] for _ in range(n)]
    for a, b in edges:
        a, b = int(a), int(b)
        if a != b:
            nbrs[a].append(b)
            nbrs[b].append(a)
    nbrs = [sorted(set(x)) for x in nbrs]
    lab = np.arange(n)
    for _ in range(iters):
        new = lab.copy()
        for v in range(n):
            if not nbrs[v]:
                continue
            cnt: dict = {}
            for u in nbrs[v]:
                cnt[lab[u]] = cnt.get(lab[u], 0) + 1
            new[v] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if (new == lab).all():
            break
        lab = new
    return lab


def random_digraph(n: int, m: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    e = np.unique(rng.integers(0, n, size=(m, 2)), axis=0)
    return e[e[:, 0] != e[:, 1]]


def star_graph(n: int) -> np.ndarray:
    """Hub vertex 0 — the skew fixture (FIXTURES.md F4)."""
    return np.column_stack([np.zeros(n - 1, dtype=np.int64), np.arange(1, n, dtype=np.int64)])


def scc_oracle(edges, n: int) -> np.ndarray:
    """Strongly connected components (iterative Tarjan); label = min vertex
    id of each SCC — the canonical labeling the engine emits with
    label_by_size=False."""
    adj = [[] for _ in range(n)]
    for a, b in edges:
        a, b = int(a), int(b)
        if a != b:
            adj[a].append(b)
    index = [-1] * n
    low = [0] * n
    on_stack = [False] * n
    stack: list[int] = []
    label = np.full(n, -1, dtype=np.int64)
    counter = 0
    for root in range(n):
        if index[root] != -1:
            continue
        # iterative Tarjan: (vertex, child-iterator position) work stack
        work = [(root, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack[v] = True
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if index[w] == -1:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                if on_stack[w]:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    label[w] = m
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
    return label


def bfs_oracle(edges, n: int, sources, directed: bool = True) -> np.ndarray:
    """Multi-source BFS hop distance; -1 = unreached."""
    from collections import deque

    adj = [[] for _ in range(n)]
    for a, b in edges:
        a, b = int(a), int(b)
        if a == b:
            continue
        adj[a].append(b)
        if not directed:
            adj[b].append(a)
    dist = np.full(n, -1, dtype=np.int64)
    dq = deque()
    for s in sources:
        if dist[int(s)] == -1:
            dist[int(s)] = 0
            dq.append(int(s))
    while dq:
        v = dq.popleft()
        for w in adj[v]:
            if dist[w] == -1:
                dist[w] = dist[v] + 1
                dq.append(w)
    return dist


def four_cycle_oracle(edges, n: int) -> int:
    """Brute-force C4 count: unordered vertex-distinct 4-cycles."""
    nbrs = [set() for _ in range(n)]
    for a, b in edges:
        a, b = int(a), int(b)
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    count = 0
    for a in range(n):
        for b in range(a + 1, n):
            p = len(nbrs[a] & nbrs[b])
            count += p * (p - 1) // 2
    return count // 2


def sssp_oracle(wedges, n: int, sources, directed: bool = True) -> np.ndarray:
    """Min weighted distance (Bellman-Ford); np.inf = unreached."""
    adj = [[] for _ in range(n)]
    for a, b, w in wedges:
        a, b = int(a), int(b)
        if a == b:
            continue
        adj[a].append((b, float(w)))
        if not directed:
            adj[b].append((a, float(w)))
    dist = np.full(n, np.inf)
    for s in sources:
        dist[int(s)] = 0.0
    for _ in range(n):
        changed = False
        for v in range(n):
            if dist[v] == np.inf:
                continue
            for w_, c in adj[v]:
                if dist[v] + c < dist[w_]:
                    dist[w_] = dist[v] + c
                    changed = True
        if not changed:
            break
    return dist


def weighted_lpa_oracle(edges, weights, n: int, iters: int = 10) -> np.ndarray:
    """Weighted synchronous LPA: votes sum symmetrized edge weight (parallel
    /bidirectional duplicates accumulate), ties -> smaller label."""
    w: dict = {}
    for (a, b), wt in zip(edges, weights):
        a, b = int(a), int(b)
        if a != b:
            w[(a, b)] = w.get((a, b), 0.0) + float(wt)
            w[(b, a)] = w.get((b, a), 0.0) + float(wt)
    nbrs = [[] for _ in range(n)]
    for (a, b), wt in w.items():
        nbrs[a].append((b, wt))
    lab = np.arange(n)
    for _ in range(iters):
        new = lab.copy()
        for v in range(n):
            if not nbrs[v]:
                continue
            cnt: dict = {}
            for u, wt in nbrs[v]:
                cnt[lab[u]] = cnt.get(lab[u], 0.0) + wt
            new[v] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if (new == lab).all():
            break
        lab = new
    return lab
