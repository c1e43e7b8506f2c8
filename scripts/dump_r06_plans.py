"""Dump .explain("formatted") for the round-6 touched queries.

Usage: python scripts/dump_r06_plans.py <out_dir> <suffix>
Run from a checkout of the tree to snapshot (round-start worktree for
``_before``, HEAD for ``_after``); writes <out_dir>/<query>_<suffix>.txt.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from chavinha_mini_search_engine_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

QUERIES = [
    "embedding_neardup_banded",
    "ann_lsh_topk",
    "ann_cosine_topk",
    "minhash_lsh_dedup",
    "ngram_jaccard_pairs",
    "simhash_neardup",
    "ann_graph_topk",
    "quality_features",
    "language_id",
    "bm25_topk",
]


def main():
    out_dir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans-r06", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in QUERIES:
        df = qs[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print("wrote", name, suffix)
    spark.stop()


if __name__ == "__main__":
    main()
