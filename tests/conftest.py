import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chavinha_mini_search_engine_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("chavinha-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def tiny_pages(spark, tmp_path_factory):
    from chavinha_mini_search_engine_spark.fixtures.pages import write_pages_parquet

    path = str(tmp_path_factory.mktemp("pages") / "tiny")
    write_pages_parquet(spark, path, n=200)
    return path


@pytest.fixture(scope="session")
def built(spark, tiny_pages, tmp_path_factory):
    """Full index over the tiny corpus, shared by parity/API/plan tests."""
    from chavinha_mini_search_engine_spark.operators.index_build import build_index
    from chavinha_mini_search_engine_spark.sources.tables import IndexStore
    from tests.parity_cfg import CFG

    root = str(tmp_path_factory.mktemp("index") / "idx")
    store = IndexStore(root, build_id="parity-build")
    pages = spark.read.parquet(tiny_pages)
    build_index(spark, pages, store, CFG)
    return store
