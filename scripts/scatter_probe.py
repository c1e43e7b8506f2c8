"""Decompose the scatter-path per-query fixed cost (verdict-r4 task 5).

query_scaling_bench measured a ~6.5 ms/query floor at P=4 on the 480k
store.  Before optimizing, split it: per query at P in QSCALE_LEVELS this
probe times (a) the scatter round trip (send->recv over all nodes, which
includes node-side scoring), (b) node-side scoring alone (measured inside
the worker), (c) gateway merge, (d) two-phase summary fill round trip,
(e) gateway enrichment (snippets).  (a) - max(b) is pure IPC/wakeup tax.

Reuses query_scaling_bench's build + query classes.

Usage:
  QSCALE_REPLICATE=24 QSCALE_EMBED=0 python scripts/scatter_probe.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import query_scaling_bench as qsb  # noqa: E402  (same scripts/ dir)

NUM_SHARDS = qsb.NUM_SHARDS


def _worker(idx_dir: str, shards, conn) -> None:
    from chavinha_mini_search_engine_spark.operators.serve import ResidentSearcher
    from chavinha_mini_search_engine_spark.sources.tables import IndexStore

    rs = ResidentSearcher(IndexStore(idx_dir, build_id="q"), shards=shards)
    conn.send(("ready", len(rs.state_by_shard)))
    while True:
        msg = conn.recv()
        if msg[0] == "stop":
            return
        if msg[0] == "q":
            _, query, st, k = msg
            t0 = time.time()
            pool = rs.search_candidates(query, st, k)
            conn.send((pool, time.time() - t0))
        elif msg[0] == "q1":
            _, query, st, k = msg
            t0 = time.time()
            pool, rows = rs.search_candidates_filled(query, st, k)
            conn.send((pool, rows, time.time() - t0))
        elif msg[0] == "fill":
            t0 = time.time()
            rows = rs.fill_docrows(msg[1])
            conn.send((rows, time.time() - t0))


def main() -> None:
    idx_dir = os.environ.get("QSCALE_IDX_DIR", "/tmp/scatter_probe_idx")
    qjson = idx_dir.rstrip("/") + "_queries.json"
    if not os.path.exists(qjson):
        env = dict(os.environ)
        subprocess.run(
            [sys.executable, os.path.abspath(qsb.__file__), "--build",
             idx_dir, qjson],
            check=True, cwd=REPO, env=env,
        )
    with open(qjson) as f:
        meta = json.load(f)
    classes = meta["classes"]

    from chavinha_mini_search_engine_spark.functions.xxhash import spark_pmod_bucket
    from chavinha_mini_search_engine_spark.operators.search import _query_terms
    from chavinha_mini_search_engine_spark.operators.serve import ResidentSearcher
    from chavinha_mini_search_engine_spark.sources.tables import IndexStore

    P = int(os.environ.get("PROBE_P", "4"))
    k = 10
    ctx = mp.get_context("spawn")
    procs = []
    for r in range(P):
        parent, child = ctx.Pipe()
        p = ctx.Process(
            target=_worker,
            args=(idx_dir, [s for s in range(NUM_SHARDS) if s % P == r], child),
            daemon=True,
        )
        p.start()
        procs.append((p, parent))
    for _, conn in procs:
        conn.recv()
    gateway = ResidentSearcher(IndexStore(idx_dir, build_id="q"), shards=[])

    rec: dict = {"P": P, "n_pages": meta["n_pages"]}
    for cls, qs in classes.items():
        phases = {ph: [] for ph in
                  ("roundtrip", "node_score_max", "merge", "fill", "enrich",
                   "total")}
        for i, q in enumerate(qs):
            for rep in range(2 if i == 0 else 1):  # warm first query
                t_all = time.time()
                t0 = time.time()
                for _, conn in procs:
                    conn.send(("q", q, "bm25", k))
                replies = [conn.recv() for _, conn in procs]
                t_rt = time.time() - t0
                pools = [r[0] for r in replies]
                node_max = max(r[1] for r in replies)
                t0 = time.time()
                hits = ResidentSearcher.merge_candidates(pools, k)
                t_merge = time.time() - t0
                t0 = time.time()
                docrows = {}
                by_node: dict = {}
                for h in hits:
                    node = spark_pmod_bucket(str(h[0]), NUM_SHARDS) % P
                    by_node.setdefault(node, []).append(str(h[0]))
                for r, ids in by_node.items():
                    procs[r][1].send(("fill", ids))
                for r in by_node:
                    docrows.update(procs[r][1].recv()[0])
                t_fill = time.time() - t0
                t0 = time.time()
                gateway._enrich(hits, _query_terms(q), docrows=docrows)
                t_enrich = time.time() - t0
            phases["roundtrip"].append(t_rt)
            phases["node_score_max"].append(node_max)
            phases["merge"].append(t_merge)
            phases["fill"].append(t_fill)
            phases["enrich"].append(t_enrich)
            phases["total"].append(time.time() - t_all)
        rec[cls] = {
            ph: round(statistics.median(v) * 1e3, 3) for ph, v in phases.items()
        }
        rec[cls]["n"] = len(qs)

        # one-round speculative fill over the SAME queries: total latency
        # + parity with the two-phase result
        one_lat, one_missing = [], 0
        for i, q in enumerate(qs):
            for rep in range(2 if i == 0 else 1):
                t_all = time.time()
                for _, conn in procs:
                    conn.send(("q1", q, "bm25", k))
                replies = [conn.recv() for _, conn in procs]
                hits = ResidentSearcher.merge_candidates(
                    [r[0] for r in replies], k
                )
                docrows = {}
                for r in replies:
                    docrows.update(r[1])
                missing = [str(h[0]) for h in hits
                           if str(h[0]) not in docrows]
                one_missing += len(missing)
                if missing:
                    docrows.update(gateway.fill_docrows(missing))
                res = gateway._enrich(hits, _query_terms(q), docrows=docrows)
                el = time.time() - t_all
            one_lat.append(el)
            assert all(h["url"] for h in res), f"unfilled summary for {q!r}"
        rec[cls]["one_round_total"] = round(
            statistics.median(one_lat) * 1e3, 3
        )
        rec[cls]["one_round_missing_fills"] = one_missing
    for p, conn in procs:
        conn.send(("stop",))
        p.join()
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
