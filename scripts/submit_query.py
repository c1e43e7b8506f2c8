"""spark-submit entry point: query serving.

  spark-submit --py-files engine.zip scripts/submit_query.py \
      --index /mnt/index --q "python async programming" \
      --search-type bm25 --limit 10
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--index", required=True)
    p.add_argument("--q", required=True)
    p.add_argument("--search-type", default="bm25",
                   choices=["bm25", "semantic", "hybrid"])
    p.add_argument("--limit", type=int, default=10)
    p.add_argument("--shards", type=int, default=32)
    p.add_argument("--term-buckets", type=int, default=64)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    from chavinha_mini_search_engine_spark.api import SearchAPI, to_json_dict
    from chavinha_mini_search_engine_spark.operators.index_build import IndexConfig
    from chavinha_mini_search_engine_spark.sources.tables import IndexStore

    spark = SparkSession.builder.appName("chavinha-query").getOrCreate()
    cfg = IndexConfig(num_doc_shards=args.shards, term_buckets=args.term_buckets)
    api = SearchAPI(spark, IndexStore(args.index), cfg)
    resp = api.search(args.q, args.search_type, args.limit)
    print(json.dumps(to_json_dict(resp), default=str))


if __name__ == "__main__":
    main()
