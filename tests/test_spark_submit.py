"""spark-submit --py-files deployment smoke test.

The north rule requires the build to run "via spark-submit --py-files on a
multi-executor cluster".  This sandbox has no multi-node cluster, but the
PACKAGING contract is fully testable: the engine is zipped, the driver
script is copied OUTSIDE the repo, PYTHONPATH is scrubbed, and the job is
launched with ``spark-submit --py-files engine.zip`` — so the
``chavinha_mini_search_engine_spark`` import can only resolve from the
shipped zip, exactly as it would on a cluster's driver and executors
(reference deploy analog: /root/reference/README.md's Docker/Vespa deploy;
our scripts/submit_build.py documents the cluster invocation).
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "chavinha_mini_search_engine_spark"


def _zip_engine(zip_path: str) -> None:
    src = os.path.join(REPO, PKG)
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(src):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, REPO))


@pytest.mark.slow
def test_spark_submit_py_files_build(spark, tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    from chavinha_mini_search_engine_spark.fixtures.pages import write_pages_parquet

    pages = str(tmp_path / "pages_parquet")
    write_pages_parquet(spark, pages, n=40)

    zip_path = str(tmp_path / "engine.zip")
    _zip_engine(zip_path)

    # driver script copied outside the repo: its own sys.path.insert points
    # at tmp, so the package import MUST come from --py-files
    script = str(tmp_path / "submit_build.py")
    shutil.copy(os.path.join(REPO, "scripts", "submit_build.py"), script)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    index = str(tmp_path / "idx")
    cmd = [
        spark_submit, "--master", "local[2]",
        "--conf", "spark.sql.shuffle.partitions=4",
        "--conf", "spark.driver.memory=4g",
        "--py-files", zip_path, script,
        "--pages", pages, "--index", index,
        "--build-id", "submit-smoke", "--shards", "4", "--shard-groups", "1",
        "--no-embeddings",
    ]
    res = subprocess.run(
        cmd, cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=900,
    )
    assert res.returncode == 0, res.stderr[-4000:]

    # the driver prints one JSON line with per-stage metrics
    report = None
    for line in res.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                report = json.loads(line)
            except ValueError:
                continue
    assert report is not None, res.stdout[-2000:]
    assert report["build_id"] == "submit-smoke"

    with open(os.path.join(index, "manifest.json")) as f:
        manifest = json.load(f)
    stages = manifest["stages"]
    for stage in ("docs", "postings", "attributes"):
        assert stages[stage]["status"] == "done", stages[stage]

    # the submitted build is a real, queryable index: load it in-process
    # and run a BM25 query against it
    from chavinha_mini_search_engine_spark.operators.serve import ResidentSearcher
    from chavinha_mini_search_engine_spark.sources.tables import IndexStore

    store = IndexStore(index, build_id="submit-smoke")
    searcher = ResidentSearcher(store)
    hits = searcher.search("spark", k=5)
    assert isinstance(hits, list)
