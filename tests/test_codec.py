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
