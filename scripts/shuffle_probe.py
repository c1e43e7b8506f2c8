"""EXACT shuffle-byte measurement of the index build per postings strategy.

Wall-clock A/Bs on this box are confounded by multi-tenant host noise
(BENCH_SCALING.md round 4: code-identical stages moved 2-10x between
back-to-back runs).  Shuffle bytes are DETERMINISTIC: this probe runs the
same full build (embeddings OFF) under each postings strategy with the
Spark event log enabled and sums Shuffle Bytes Written / Read and records
across all tasks -- the quantity a real cluster pays NIC+disk for, and
the one the mapside partial-run encoding exists to cut.

Usage:
  python scripts/shuffle_probe.py [replicate]       # default 96 (480k pages)
  python scripts/shuffle_probe.py --child STRATEGY REPLICATE OUT

Prints one JSON line per strategy: total shuffle write/read bytes,
records, wall (informational only), and the per-stage-name breakdown.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(strategy: str, replicate: int, out_path: str) -> None:
    import shutil

    from pyspark.sql import functions as F

    os.environ["SPARK_GRAFT_POSTINGS"] = strategy
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

    from chavinha_mini_search_engine_spark.fixtures.pages import pages_from_documents
    from chavinha_mini_search_engine_spark.operators.index_build import (
        IndexConfig,
        build_index,
    )
    from chavinha_mini_search_engine_spark.session import get_spark
    from chavinha_mini_search_engine_spark.sources.tables import IndexStore

    evdir = tempfile.mkdtemp(prefix="shufev_")
    spark = get_spark(
        f"shuffle-probe-{strategy}", master="local[16]", shuffle_partitions=32,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.compress": "false",
            "spark.eventLog.dir": f"file://{evdir}",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    reps = spark.range(replicate).repartition(48).select(F.col("id").alias("rep"))
    big = reps.join(F.broadcast(docs)).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string")).alias("text"),
        "lang", "source", "n_chars",
    )
    pages = pages_from_documents(big, html_repeat=8)
    idx = tempfile.mkdtemp(prefix=f"shuf_{strategy}_")
    cfg = IndexConfig(num_doc_shards=256, shard_groups=1, heavy_term_df=20000,
                      num_salts=8, term_buckets=64, encode_buckets=8)
    t = time.time()
    store = IndexStore(os.path.join(idx, "i"), build_id="p")
    build_index(spark, pages, store, cfg, with_embeddings=False,
                verify_text_invariant=False, collect_metrics=False)
    wall = time.time() - t
    shutil.rmtree(idx, ignore_errors=True)
    spark.stop()

    # parse the event log: per-task shuffle metrics, grouped by stage name
    write_b = read_b = write_rec = read_rec = 0
    by_stage: dict = {}
    stage_names: dict = {}
    # Spark 4 rolling event logs are directories (eventlog_v2_*/events_*)
    paths = [p for p in glob.glob(os.path.join(evdir, "**", "*"), recursive=True)
             if os.path.isfile(p) and "appstatus" not in os.path.basename(p)]
    for path in paths:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    grp = (ev.get("Properties") or {}).get(
                        "spark.jobGroup.id", "untagged"
                    )
                    for sid in ev.get("Stage IDs", []):
                        stage_names[sid] = grp
                elif ev.get("Event") == "SparkListenerTaskEnd":
                    m = ev.get("Task Metrics") or {}
                    sw = m.get("Shuffle Write Metrics") or {}
                    sr = m.get("Shuffle Read Metrics") or {}
                    wb = sw.get("Shuffle Bytes Written", 0)
                    rb = (sr.get("Local Bytes Read", 0)
                          + sr.get("Remote Bytes Read", 0))
                    write_b += wb
                    read_b += rb
                    write_rec += sw.get("Shuffle Records Written", 0)
                    read_rec += sr.get("Total Records Read", 0)
                    sid = ev.get("Stage ID")
                    name = stage_names.get(sid, "untagged")
                    agg = by_stage.setdefault(name, [0, 0])
                    agg[0] += wb
                    agg[1] += rb
    shutil.rmtree(evdir, ignore_errors=True)
    top = {
        k: {"write_mb": round(v[0] / 1e6, 1), "read_mb": round(v[1] / 1e6, 1)}
        for k, v in sorted(by_stage.items(), key=lambda kv: -kv[1][0])[:8]
        if v[0] or v[1]
    }
    with open(out_path, "w") as f:
        json.dump({
            "strategy": strategy,
            "n_pages": 5000 * replicate,
            "shuffle_write_mb": round(write_b / 1e6, 1),
            "shuffle_read_mb": round(read_b / 1e6, 1),
            "shuffle_write_records": write_rec,
            "shuffle_read_records": read_rec,
            "wall_sec_informational": round(wall, 1),
            "by_stage_op": top,
        }, f)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], int(sys.argv[3]), sys.argv[4])
        return
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    for strategy in ("salted", "mapside"):
        out = f"/tmp/shuffle_probe_{strategy}.json"
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", strategy,
             str(replicate), out],
            check=True, cwd=REPO,
        )
        with open(out) as f:
            print(json.dumps(json.load(f)), flush=True)


if __name__ == "__main__":
    main()
