import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from chavinha_mini_search_engine_spark.functions.codec import (
    delta_decode,
    delta_encode,
    varbyte_decode,
    varbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)


@given(
    st.lists(st.integers(min_value=0, max_value=2**35), min_size=1, max_size=400, unique=True)
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


def test_varbyte_known_values():
    # 0 -> 0x00 ; 127 -> 0x7f ; 128 -> 0x80 0x01 (LEB128 little-endian)
    assert varbyte_encode(np.array([0])) == b"\x00"
    assert varbyte_encode(np.array([127])) == b"\x7f"
    assert varbyte_encode(np.array([128])) == b"\x80\x01"
    assert varbyte_encode(np.array([300])) == b"\xac\x02"


def test_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0
    assert delta_encode(np.array([], dtype=np.uint64)) == b""


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_varbyte_encode_segmented_matches_per_segment(values, data):
    from chavinha_mini_search_engine_spark.functions.codec import (
        varbyte_encode_segmented,
    )

    arr = np.array(values, dtype=np.uint64)
    n_segs = data.draw(st.integers(min_value=1, max_value=min(8, len(arr))))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=len(arr) - 1)
                if len(arr) > 1 else st.nothing(),
                max_size=n_segs - 1, unique=True,
            )
        )
    ) if len(arr) > 1 else []
    starts = np.array([0] + cuts, dtype=np.int64)
    buf, offs = varbyte_encode_segmented(arr, starts)
    raw = buf.tobytes()
    bounds = list(starts) + [len(arr)]
    for i in range(len(starts)):
        seg = arr[bounds[i]:bounds[i + 1]]
        assert raw[offs[i]:offs[i + 1]] == varbyte_encode(seg)
    assert offs[-1] == len(raw)


def test_postings_paths_identical(spark, built, monkeypatch):
    """mapside (default), salted-tid, and salted-str postings strategies
    must produce identical merged block tables: doc/tf payload bytes
    byte-identical; max_score equal within 1e-9 relative (the mapside
    path stores idf * max_tfnorm * (1+1e-12) -- a documented
    association-order epsilon vs the salted paths' per-posting
    max(fl(idf*tf/denom)) -- and the bound must never be BELOW the
    salted value by more than float ulps, or pruning soundness is
    broken)."""
    from chavinha_mini_search_engine_spark.operators.index_build import (
        build_postings_for,
    )
    from tests.parity_cfg import CFG

    tf = built.read(spark, "tf")
    td = built.read(spark, "term_dict")
    stats = built.read(spark, "corpus_stats")

    def blocks_under(env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        try:
            rows = build_postings_for(tf, td, stats, CFG).collect()
        finally:
            for k in env:
                monkeypatch.delenv(k, raising=False)
        return {
            (r["field"], r["term"], r["shard"], r["block_idx"]):
            (r["first_local"], r["last_local"], r["n"],
             r["max_score"], bytes(r["doc_bytes"]), bytes(r["tf_bytes"]))
            for r in rows
        }

    # force a small chunk size so the mapside path exercises multi-chunk
    # partial runs (multiple runs per term k-way merged) even at fixture scale
    monkeypatch.setenv("SPARK_GRAFT_ENCODE_CHUNK", "700")
    mapside = blocks_under({"SPARK_GRAFT_POSTINGS": "mapside"})
    salted = blocks_under({"SPARK_GRAFT_POSTINGS": "salted"})
    legacy = blocks_under({"SPARK_GRAFT_POSTINGS": "salted",
                           "SPARK_GRAFT_TERM_KEYS": "str"})
    assert salted == legacy
    assert set(mapside) == set(salted)
    for key, m in mapside.items():
        s = salted[key]
        assert m[:3] == s[:3], key
        assert m[4:] == s[4:], key
        # bound parity: within 1e-9 relative AND never below the salted
        # per-posting max (minus float-op ulps) -- soundness direction
        assert abs(m[3] - s[3]) <= 1e-9 * max(abs(s[3]), 1e-30), key
        assert m[3] >= s[3] * (1.0 - 1e-13), key
