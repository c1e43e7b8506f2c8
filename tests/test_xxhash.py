"""Python XXH64 must equal Spark's xxhash64 expression bit-for-bit."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from chavinha_mini_search_engine_spark.functions.xxhash import (
    spark_pmod_bucket,
    spark_xxhash64_str,
)

SAMPLES = [
    "", "a", "python", "the", "0", "x" * 7, "y" * 8, "z" * 31, "w" * 32,
    "v" * 100, "unicode café 🐍", "tab\tnewline\n",
]


def test_vs_spark(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    got = {
        r["s"]: (r["h"], r["b"])
        for r in df.select(
            "s",
            F.xxhash64("s").alias("h"),
            F.pmod(F.xxhash64("s"), F.lit(64)).alias("b"),
        ).collect()
    }
    for s in SAMPLES:
        assert got[s][0] == spark_xxhash64_str(s), s
        assert got[s][1] == spark_pmod_bucket(s, 64), s


@given(st.text(max_size=64))
@settings(max_examples=30, deadline=None)
def test_vs_spark_fuzz(spark, s):
    h = spark.createDataFrame([(s,)], "s string").select(F.xxhash64("s")).first()[0]
    assert h == spark_xxhash64_str(s)
