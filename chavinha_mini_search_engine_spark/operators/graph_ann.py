"""Graph-based ANN: a deterministic per-shard HNSW index.

The reference delegates vector search to Vespa's HNSW attribute index
(reference config/vespa/schemas/doc.sd:55-60, 94-99 — ``index { hnsw {
max-links-per-node: 16, neighbors-to-explore-at-insert: 200 } }``) and
queries it with ``nearestNeighbor`` targetHits (api/main.py semantic
path).  SURVEY §O3 mapped that to multi-probe hyperplane LSH as the
first scale path; this module adds the faithful analog: a navigable
small-world graph per document shard, built once at index time and
searched greedily at query time.

Scale story (the 100 TB shape):

- **Build** is per-shard and embarrassingly parallel: one
  ``applyInPandas`` group per shard builds that shard's graph over only
  its own vectors — no cross-shard edges, no global structure, so 1000
  executors build 1000 graphs concurrently and the stage shuffles only
  the narrow (shard, local_id, embedding) projection.  This mirrors how
  a Vespa content node builds an HNSW index over just its own document
  slice.
- **Serve** loads each shard's neighbor lists next to the attributes it
  already holds and answers a query by greedy beam search —
  O(ef · M · log n) dot products instead of the brute-force O(n) scan,
  with recall controlled by ``ef_search`` (the targetHits analog).
  Cross-shard results merge through the same top-k scatter/gather as
  every other query type.

Determinism: HNSW is normally randomized (level sampling) and
insert-order-dependent.  Here levels come from a splitmix64 hash of the
node's insertion index and vectors are inserted in ascending local_id
order, so the same shard contents always yield the same graph — builds
are reproducible and resume-safe, and tests can assert exact structures.

Pure numpy; no Spark imports at module top (the kernel runs inside
Arrow-batched workers).
"""

from __future__ import annotations

import heapq
import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

DEFAULT_M = 16
DEFAULT_EF_CONSTRUCTION = 200
DEFAULT_EF_SEARCH = 64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public splitmix64 constants)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def node_levels(n: int, m: int = DEFAULT_M, seed: int = 42) -> np.ndarray:
    """Deterministic HNSW level per node: the standard geometric
    distribution floor(-ln(u) * mL), mL = 1/ln(M), with u drawn from a
    hash of (seed, node index) instead of an RNG stream."""
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    h = _splitmix64(np.arange(n, dtype=np.uint64) + np.uint64(seed) * np.uint64(0x9E3779B9))
    u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    u = np.maximum(u, 1e-12)
    m_l = 1.0 / math.log(max(m, 2))
    return np.minimum(np.floor(-np.log(u) * m_l), 31).astype(np.int32)


class HnswGraph:
    """Frozen adjacency: ``adj[level][node] -> int32 array of neighbors``
    (node-indexed dict per level; nodes absent from a level have no
    entry).  ``entry`` is the max-level node (smallest index on ties)."""

    __slots__ = ("levels", "adj", "entry", "m")

    def __init__(self, levels: np.ndarray, adj: List[Dict[int, np.ndarray]],
                 entry: int, m: int):
        self.levels = levels
        self.adj = adj
        self.entry = entry
        self.m = m


def _search_layer(vecs: np.ndarray, adj: Dict[int, np.ndarray],
                  q: np.ndarray, eps: List[Tuple[float, int]], ef: int,
                  visited: np.ndarray) -> List[Tuple[float, int]]:
    """Beam search one layer.  ``eps``: [(dist, node)] entry points
    (dist = 1 - cosine).  Returns up to ``ef`` closest as a sorted list
    of (dist, node).  ``visited`` is a reusable bool scratch array the
    caller clears between queries (cleared here for touched entries)."""
    cand: List[Tuple[float, int]] = []     # min-heap by dist
    result: List[Tuple[float, int]] = []   # max-heap by -dist (store (-d, n))
    touched = []
    for d, n in eps:
        if not visited[n]:
            visited[n] = True
            touched.append(n)
            heapq.heappush(cand, (d, n))
            heapq.heappush(result, (-d, n))
    while len(result) > ef:
        heapq.heappop(result)
    while cand:
        d, n = heapq.heappop(cand)
        worst = -result[0][0]
        if d > worst and len(result) >= ef:
            break
        nbrs = adj.get(n)
        if nbrs is None or not len(nbrs):
            continue
        # lists during build, frozen int32 arrays at query time -- asarray
        # is a no-op view for the latter.  Converting ONLY the visited
        # node's list here (instead of snapshotting the whole level per
        # insert) keeps construction O(n log n), not O(n^2).
        nbrs = np.asarray(nbrs, dtype=np.int64)
        new = nbrs[~visited[nbrs]]
        if not len(new):
            continue
        visited[new] = True
        touched.extend(int(x) for x in new)
        dists = 1.0 - vecs[new] @ q
        for nd, nn in zip(dists, new):
            nd = float(nd)
            if len(result) < ef or nd < -result[0][0]:
                heapq.heappush(cand, (nd, int(nn)))
                heapq.heappush(result, (-nd, int(nn)))
                if len(result) > ef:
                    heapq.heappop(result)
    for n in touched:
        visited[n] = False
    return sorted(((-nd, n) for nd, n in result), key=lambda t: (t[0], t[1]))


def _select_neighbors(cands: List[Tuple[float, int]], m: int,
                      vecs: np.ndarray) -> List[int]:
    """Diversity heuristic (HNSW paper Alg. 4): take a candidate only if
    it is closer to the query node than to every already-selected
    neighbor.  Plain closest-first selection collapses into local
    cliques on clustered data (documents embed into tight topic groups)
    and strands whole regions of the graph; the heuristic keeps a few
    long-range links so greedy search can cross clusters.  Rejected
    candidates backfill remaining slots (keepPruned), preserving degree.
    """
    k = len(cands)
    if k == 0 or m <= 0:
        return []
    ids = np.fromiter((n for _, n in cands), dtype=np.int64, count=k)
    dq = np.fromiter((d for d, _ in cands), dtype=np.float64, count=k)
    # one gather + one Gram matrix per call instead of a fancy-indexed
    # matmul per candidate (profiling: that loop was ~60% of build time);
    # dmin[j] tracks min distance from candidate j to the selected set
    C = vecs[ids]
    D = 1.0 - C @ C.T
    dmin = np.full(k, np.inf)
    selected: List[int] = []
    pruned: List[int] = []
    for j in range(k):
        if len(selected) >= m:
            break
        if dq[j] < dmin[j]:
            selected.append(j)
            np.minimum(dmin, D[j], out=dmin)
        else:
            pruned.append(j)
    out = [int(ids[j]) for j in selected]
    for j in pruned:
        if len(out) >= m:
            break
        out.append(int(ids[j]))
    return out


def build_hnsw(vecs: np.ndarray, m: int = DEFAULT_M,
               ef_construction: int = DEFAULT_EF_CONSTRUCTION,
               seed: int = 42) -> HnswGraph:
    """Build a deterministic HNSW graph over unit-norm float64 rows.

    Insertion order is row order (callers sort by local_id); levels are
    hash-derived (node_levels).  Level-0 degree cap is 2*M, upper levels
    M, as in the HNSW paper (Malkov & Yashunin 2016).
    """
    n = len(vecs)
    levels = node_levels(n, m, seed)
    max_possible = int(levels.max()) + 1 if n else 0
    adj: List[Dict[int, List[int]]] = [dict() for _ in range(max_possible)]
    entry = -1
    entry_level = -1
    visited = np.zeros(n, dtype=bool)

    for i in range(n):
        li = int(levels[i])
        q = vecs[i]
        for lc in range(li + 1):
            adj[lc][i] = []
        if entry < 0:
            entry, entry_level = i, li
            continue
        eps = [(float(1.0 - vecs[entry] @ q), entry)]
        # greedy descend through levels above the node's level
        for lc in range(entry_level, li, -1):
            eps = _search_layer(vecs, adj[lc], q, eps, 1, visited)
        # insert with beam ef_construction at each level <= li
        for lc in range(min(entry_level, li), -1, -1):
            cands = _search_layer(
                vecs, adj[lc], q, eps, ef_construction, visited
            )
            m_level = m * 2 if lc == 0 else m
            nbrs = _select_neighbors(cands, m_level, vecs)
            adj[lc][i] = list(nbrs)
            for nb in nbrs:
                lst = adj[lc][nb]
                lst.append(i)
                # amortized shrink: let a list run to 2x its cap, then
                # heuristic-shrink back to m_level once.  Shrinking on
                # EVERY overflow re-ran the gather + Gram per added edge
                # and dominated build time (profiled ~50%); the slack
                # edges only improve recall until the next shrink.
                if len(lst) > 2 * m_level:
                    _shrink(adj[lc], nb, m_level, vecs)
            eps = cands
        if li > entry_level:
            entry, entry_level = i, li

    # final pass: enforce the degree cap everywhere (bounds the persisted
    # row width and the per-hop search cost to the paper's 2M/M)
    for lc, level in enumerate(adj):
        m_level = m * 2 if lc == 0 else m
        for node, lst in level.items():
            if len(lst) > m_level:
                _shrink(level, node, m_level, vecs)

    frozen: List[Dict[int, np.ndarray]] = [
        {k: np.asarray(sorted(v), dtype=np.int32) for k, v in level.items()}
        for level in adj
    ]
    return HnswGraph(levels, frozen, entry, m)


def _shrink(level: Dict[int, List[int]], node: int, m_level: int,
            vecs: np.ndarray) -> None:
    """Heuristic-shrink ``node``'s neighbor list to ``m_level`` entries
    (distance-ranked, ties on neighbor id -- deterministic)."""
    lst = np.asarray(level[node], dtype=np.int64)
    d = 1.0 - vecs[lst] @ vecs[node]
    order = np.lexsort((lst, d))
    ranked = [(float(d[j]), int(lst[j])) for j in order]
    level[node] = _select_neighbors(ranked, m_level, vecs)


def search_hnsw(vecs: np.ndarray, graph: HnswGraph, q: np.ndarray, k: int,
                ef_search: int = DEFAULT_EF_SEARCH,
                visited: Optional[np.ndarray] = None
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy HNSW query: returns (node indices, cosine similarity)
    ordered best-first with (similarity desc, index asc) tie-break."""
    n = len(vecs)
    if n == 0 or graph.entry < 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0)
    if visited is None:
        visited = np.zeros(n, dtype=bool)
    ef = max(ef_search, k)
    eps = [(float(1.0 - vecs[graph.entry] @ q), graph.entry)]
    top = int(graph.levels[graph.entry])
    for lc in range(top, 0, -1):
        eps = _search_layer(vecs, graph.adj[lc], q, eps, 1, visited)
    out = _search_layer(vecs, graph.adj[0], q, eps, ef, visited)[:k]
    idx = np.asarray([n_ for _, n_ in out], dtype=np.int64)
    sims = 1.0 - np.asarray([d for d, _ in out])
    return idx, sims


# ---------- (de)serialization: one row per node ----------

def graph_rows(graph: HnswGraph, ids: np.ndarray) -> List[dict]:
    """Flatten to rows {id, level, nbrs: [[ids at level 0], [level 1]...]}
    with neighbors expressed as the caller's ids (not node indices), so a
    reload maps through whatever subset/order the ids come back in."""
    rows = []
    for i in range(len(graph.levels)):
        nbrs = [
            [int(ids[j]) for j in graph.adj[lc].get(i, ())]
            for lc in range(int(graph.levels[i]) + 1)
        ]
        rows.append({"id": int(ids[i]), "level": int(graph.levels[i]),
                     "nbrs": nbrs})
    return rows


def graph_from_rows(ids: np.ndarray, levels: Sequence[int],
                    nbrs: Sequence[Sequence[Sequence[int]]],
                    m: int = DEFAULT_M) -> HnswGraph:
    """Rebuild a frozen HnswGraph from persisted per-node rows; ``ids``
    gives the node order the caller's vector matrix uses."""
    pos = {int(v): i for i, v in enumerate(ids)}
    lv = np.asarray(levels, dtype=np.int32)
    max_level = int(lv.max()) + 1 if len(lv) else 0
    adj: List[Dict[int, np.ndarray]] = [dict() for _ in range(max_level)]
    for i, per_level in enumerate(nbrs):
        for lc, lst in enumerate(per_level):
            adj[lc][i] = np.asarray(
                sorted(pos[int(x)] for x in lst if int(x) in pos),
                dtype=np.int32,
            )
    entry = -1
    if len(lv):
        top = int(lv.max())
        entry = int(np.flatnonzero(lv == top)[0])
    return HnswGraph(lv, adj, entry, m)


# ---------- index-build stage: one graph per document shard ----------

def build_graph_table(attrs, cfg):
    """attributes DataFrame -> per-shard HNSW graph rows.

    One ``applyInPandas`` group per shard builds that shard's graph over
    only its own embedded chunk docs — embarrassingly parallel (the
    100 TB shape: 1000 executors build 1000 shard graphs concurrently),
    shuffling only the narrow (shard, local_id, embedding) projection.
    Node and neighbor ids are local_ids, so the serve loader is
    independent of row order.  Deterministic per shard (hash levels +
    local_id insertion order): rebuilds and resumes are reproducible.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    dim, m = cfg.embedding_dim, cfg.graph_m
    efc, seed = cfg.graph_ef_construction, cfg.graph_seed
    nodes = attrs.filter(
        F.col("embedding").isNotNull()
        & (F.size("embedding") == dim)
        & (F.col("doc_type") != "full_doc")
    ).select("shard", "local_id", "embedding")

    def _per_shard(key, pdf):
        pdf = pdf.sort_values("local_id")
        ids = pdf["local_id"].to_numpy()
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        unit = mat / np.where(norms == 0, 1.0, norms)[:, None]
        g = build_hnsw(unit, m=m, ef_construction=efc, seed=seed)
        rows = graph_rows(g, ids)
        return pd.DataFrame({
            "shard": np.full(len(rows), key[0], dtype=np.int32),
            "local_id": [r["id"] for r in rows],
            "level": [r["level"] for r in rows],
            "nbrs": [r["nbrs"] for r in rows],
        })

    return nodes.groupBy("shard").applyInPandas(
        _per_shard,
        schema="shard int, local_id long, level int, nbrs array<array<bigint>>",
    )


# ---------- Spark operator over an embeddings table ----------

def graph_topk(emb, query: Sequence[float], k: int = 10,
               id_col: str = "vec_id", vec_col: str = "embedding",
               n_partitions: Optional[int] = None, m: int = DEFAULT_M,
               ef_search: int = 200, seed: int = 42,
               slice_target: int = 128):
    """Distributed graph-ANN top-k over an embeddings DataFrame.

    The scale shape: hash-partition the table, build one HNSW graph per
    partition inside ``mapInPandas`` (each partition is independent — at
    cluster scale this is one graph per core over its slice, built once
    and cached/persisted), search each graph for the query's local
    top-k, then exact-rank only the <= n_partitions*k candidates
    globally.  With ``ef_search`` >= the partition's true top-k frontier
    this equals the exact brute-force top-k; recall is asserted in
    tests (and the gate runs at a scale where it is exact).

    ``n_partitions`` defaults to ceil(n / slice_target): the sequential
    python insert loop is the whole cost of this operator, so the slice
    size — not a fixed partition count — is what must stay bounded as the
    table grows.  A fixed count meant 4 ever-growing graphs on 4 cores
    (guide §2: derive partitioning from input size, not a constant tuned
    for one scale); hash-partitioning on ``vec_id`` into a size-derived
    count keeps the result independent of cluster size, and with
    slice_target < ef_search every slice stays within the beam, so the
    per-slice search remains exhaustive-grade at gate scale.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    q = np.asarray([float(x) for x in query], dtype=np.float64)
    qn = np.linalg.norm(q)
    q = q / qn if qn else q

    if n_partitions is None:
        n_partitions = max(1, -(-emb.count() // slice_target))
    part = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    ).repartition(n_partitions, F.col("vec_id"))

    def _per_part(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True).sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        mat = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        unit = mat / np.where(norms == 0, 1.0, norms)[:, None]
        g = build_hnsw(unit, m=m, seed=seed)
        idx, sims = search_hnsw(unit, g, q, k, ef_search=ef_search)
        yield pd.DataFrame({
            "vec_id": ids[idx].astype(np.int64),
            "cosine": np.round(sims, 6),
        })

    cand = part.mapInPandas(_per_part, schema="vec_id long, cosine double")
    return cand.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
