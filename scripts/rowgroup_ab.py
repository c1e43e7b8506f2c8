"""A/B the unified doc-store parquet row-group size: build-write wall vs
point-fetch latency.

Round-4 finding: writing `unified` with ``parquet.block.size = 1 MB``
(cc7298c, for id min/max point-fetch pruning) made the unified stage FLAT
across parallelism levels (85.9 s @local[4] vs 82.8 s @local[16] at 3.84M
pages) where the default-block build scaled 3.64x (57.8/15.9 s).  This
probe isolates the writer: same wide synthetic table, several block sizes,
both parallelism levels, wall per write -- then a point-fetch timing per
block size with the serve _DocFetcher to quantify the read-side trade.

Usage: python scripts/rowgroup_ab.py [n_rows] [text_bytes]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = {"1MB": 1 << 20, "4MB": 1 << 22, "16MB": 1 << 24, "128MB": 1 << 27}


def child(cpus: int, n_rows: int, text_bytes: int, out_path: str) -> None:
    from pyspark.sql import functions as F

    from chavinha_mini_search_engine_spark.session import get_spark

    spark = get_spark(f"rgab-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")
    df = (
        spark.range(n_rows)
        .withColumn("shard", (F.col("id") % 256).cast("int"))
        .withColumn("content", F.concat(
            F.lit("x" * text_bytes), F.col("id").cast("string")))
        .repartition(256, "shard")
        .sortWithinPartitions("shard", "id")
    )
    df.count()  # warm the input
    res = {}
    for name, size in SIZES.items():
        d = tempfile.mkdtemp(prefix=f"rgab_{cpus}_{name}_")
        t = time.time()
        (df.write.mode("overwrite")
           .option("parquet.block.size", str(size))
           .partitionBy("shard").parquet(d))
        res[name] = round(time.time() - t, 1)
        shutil.rmtree(d, ignore_errors=True)
    with open(out_path, "w") as f:
        json.dump({"cpus": cpus, "walls": res}, f)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), sys.argv[5])
        return
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    text_bytes = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    for cpus in (4, 16):
        out = f"/tmp/rgab_{cpus}.json"
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(cpus),
             str(n_rows), str(text_bytes), out],
            check=True, cwd=REPO,
        )
        with open(out) as f:
            print(json.dumps(json.load(f)))


if __name__ == "__main__":
    main()
