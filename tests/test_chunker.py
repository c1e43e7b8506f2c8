"""Chunker semantics (oracle/chunker.py) -- properties the reference
algorithm guarantees (indexer/chunker.py:41-196), tested on the REAL
implementation (the reference's own chunker tests mock it; SURVEY.md §5.1)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from chavinha_mini_search_engine_spark.config import (
    CHUNK_OVERLAP,
    CHUNK_SIZE,
    MIN_CHUNK_SIZE,
)
from chavinha_mini_search_engine_spark.oracle.chunker import (
    chunk_document,
    clean_content,
    split_positions,
)


def doc(content, title="Title Here", id_="d1"):
    return {
        "id": id_,
        "url": "https://x.y/p",
        "domain": "x.y",
        "title": title,
        "content": content,
        "crawled_at": "2025-08-01T00:00:00+00:00",
        "doc_type": "general",
    }


def test_empty_content_no_chunks():
    assert chunk_document(doc("   ")) == []


def test_small_doc_single_chunk():
    d = doc("Short content body.")
    out = chunk_document(d)
    assert len(out) == 1
    c = out[0]
    assert c["id"] == "d1_chunk_000"
    assert c["chunk_index"] == 0
    assert c["chunk_content"] == "Title Here\n\nShort content body."
    assert c["chunk_start"] == 0
    assert c["chunk_end"] == len(c["chunk_content"])
    assert c["chunk_size"] == len(c["chunk_content"])
    assert c["parent_id"] == "d1"
    assert c["parent_doc_type"] == "general"


def test_title_prepended_only_when_present():
    out = chunk_document(doc("Body.", title=""))
    assert out[0]["chunk_content"] == "Body."


def test_clean_content():
    assert clean_content("a\n\n\n\nb") == "a\n\nb"
    assert clean_content("a    b\t\tc") == "a b c"
    assert clean_content("  x  ") == "x"


def test_long_doc_chunks_cover_and_overlap():
    sents = " ".join(
        f"Sentence number {i} talks about python functions and data." for i in range(80)
    )
    out = chunk_document(doc(sents))
    assert len(out) > 1
    full = clean_content(f"Title Here\n\n{sents}")
    for c in out:
        # positions index into the cleaned full content
        assert full[c["chunk_start"]:c["chunk_end"]].strip() == c["chunk_content"]
        assert c["chunk_size"] >= MIN_CHUNK_SIZE
    # consecutive chunks overlap (except possibly at forced advances)
    for a, b in zip(out, out[1:]):
        assert b["chunk_start"] < a["chunk_end"]
        assert b["chunk_start"] >= a["chunk_start"] + MIN_CHUNK_SIZE


def test_ids_zero_padded_sequence():
    sents = " ".join(f"Sentence {i} is here to fill space properly." for i in range(120))
    out = chunk_document(doc(sents))
    assert [c["id"] for c in out] == [f"d1_chunk_{c['chunk_index']:03d}" for c in out]
    assert out[0]["chunk_index"] == 0


def test_no_whitespace_run_fallback():
    content = "x" * 3000  # no sentence/word boundaries at all
    out = chunk_document(doc(content, title=""))
    # hard cuts at target positions
    assert out[0]["chunk_end"] == CHUNK_SIZE
    assert out[1]["chunk_start"] == CHUNK_SIZE - CHUNK_OVERLAP


@given(st.text(alphabet=" abcdefgh.\nA", min_size=0, max_size=5000))
@settings(max_examples=100, deadline=None)
def test_split_invariants(content):
    cleaned = clean_content(content)
    if len(cleaned) <= CHUNK_SIZE:
        return
    pieces = split_positions(cleaned)
    # full coverage: first starts at 0, last ends at len
    assert pieces[0][1] == 0
    assert pieces[-1][2] == len(cleaned)
    for text, s, e in pieces:
        assert cleaned[s:e] == text
    # monotone progress
    starts = [s for _, s, _ in pieces]
    assert all(b > a for a, b in zip(starts, starts[1:]))
