"""Pinned HTML extraction -- the per-row invariant of the whole engine.

Reproduces the semantics of the reference extractor
(/root/reference/crawler/doc_scraper.py:449-497 ``parse_page`` and
:218-234 ``extract_code_snippets``):

1. title   = <title> text stripped, else the URL path (doc_scraper.py:453-454)
2. scope   = first match of the CSS priority list
             ['main','article','[role="main"]','.main-content','#content',
              '#main','.content','.documentation'] else whole document
             (doc_scraper.py:457-462)
3. noise   = script/style/nav/footer/header/aside subtrees dropped
             (doc_scraper.py:467-468)
4. content = text joined with ' ' separator, per-node stripped, whitespace
             collapsed to single spaces, truncated to 10000 chars
             (doc_scraper.py:471-472)
5. code_snippets = <pre>(inner <code> preferred) >10 chars ->[:1000];
             bare <code> (parent != pre) 5<len<500; cap 20
             (doc_scraper.py:218-234)
6. id      = md5(url).hexdigest() (doc_scraper.py:528)

The reference uses BeautifulSoup(html.parser); bs4 is not available in this
environment, so this module re-implements the pipeline on the stdlib
``html.parser`` tokenizer with bs4-compatible behavior for the constructs
the corpus exercises (see tests/test_extractor.py).  This pinned function is
BOTH the oracle and the kernel inside the engine's Arrow UDF
(operators/extract.py), which is what makes "byte-identical extracted text
per url" a meaningful, testable invariant end-to-end.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import List, Optional
from urllib.parse import urlparse

from ..config import (
    CONTENT_MAX_CHARS,
    SNIPPET_CAP,
    SNIPPET_CODE_MAX,
    SNIPPET_CODE_MIN,
    SNIPPET_PRE_MAX,
    SNIPPET_PRE_MIN,
)

_WS_RE = re.compile(r"\s+")

# bs4's get_text(strip=True) strips each text node with str.strip(); html
# entities are unescaped by the parser (convert_charrefs=True default).

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
# minimal HTML5-ish implied-end-tag handling for <p> (enough for the corpus;
# html.parser does not auto-close, bs4's html.parser builder does for <p>)
_P_CLOSERS = frozenset(
    "address article aside blockquote div dl fieldset footer form h1 h2 h3 "
    "h4 h5 h6 header hr main nav ol p pre section table ul".split()
)

NOISE_TAGS = frozenset(("script", "style", "nav", "footer", "header", "aside"))

# selector priority list, doc_scraper.py:457
_SELECTORS = (
    ("tag", "main"),
    ("tag", "article"),
    ("attr", ("role", "main")),
    ("class", "main-content"),
    ("id", "content"),
    ("id", "main"),
    ("class", "content"),
    ("class", "documentation"),
)


@dataclass
class _Node:
    tag: str                      # "" for text nodes
    attrs: dict = field(default_factory=dict)
    children: list = field(default_factory=list)
    text: str = ""                # only for text nodes
    parent: Optional["_Node"] = None


class _TreeBuilder(HTMLParser):
    """Builds a simple DOM tree; convert_charrefs=True (bs4 default)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node(tag="[document]")
        self.stack = [self.root]
        self._rawdata_tag: Optional[str] = None

    def handle_starttag(self, tag, attrs):
        if tag in _VOID_TAGS:
            self.handle_startendtag(tag, attrs)
            return
        if tag == "p" or tag in _P_CLOSERS:
            # close an open <p> (mirrors browsers/bs4 html.parser treebuilder)
            for i in range(len(self.stack) - 1, 0, -1):
                if self.stack[i].tag == "p":
                    del self.stack[i:]
                    break
        node = _Node(tag=tag, attrs=dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(node)
        self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = _Node(tag=tag, attrs=dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignored

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(
                _Node(tag="", text=data, parent=self.stack[-1])
            )


def _parse(html: str) -> _Node:
    p = _TreeBuilder()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return p.root


def _iter_nodes(node: _Node):
    yield node
    for c in node.children:
        if c.tag != "":
            yield from _iter_nodes(c)


def _classes(node: _Node) -> List[str]:
    return (node.attrs.get("class") or "").split()


def _select_one(root: _Node, kind: str, arg) -> Optional[_Node]:
    for n in _iter_nodes(root):
        if n.tag == "":
            continue
        if kind == "tag" and n.tag == arg:
            return n
        if kind == "attr" and n.attrs.get(arg[0]) == arg[1]:
            return n
        if kind == "class" and arg in _classes(n):
            return n
        if kind == "id" and n.attrs.get("id") == arg:
            return n
    return None


def _get_text(node: _Node, separator: str = " ", strip: bool = True) -> str:
    """bs4-compatible get_text: join stripped text nodes with separator."""
    parts: List[str] = []

    def rec(n: _Node):
        for c in n.children:
            if c.tag == "":
                t = c.text.strip() if strip else c.text
                if t:
                    parts.append(t)
            else:
                rec(c)

    rec(node)
    return separator.join(parts)


def _decompose_noise(node: _Node) -> None:
    node.children = [
        c for c in node.children if c.tag not in NOISE_TAGS
    ]
    for c in node.children:
        if c.tag != "":
            _decompose_noise(c)


def _find_all(root: _Node, tag: str):
    for n in _iter_nodes(root):
        if n.tag == tag:
            yield n


def extract_code_snippets(root: _Node) -> List[str]:
    """doc_scraper.py:218-234 semantics."""
    snippets: List[str] = []
    for pre in _find_all(root, "pre"):
        code = None
        for n in _iter_nodes(pre):
            if n is not pre and n.tag == "code":
                code = n
                break
        snippet_text = _get_text(code, "", True) if code is not None else _get_text(pre, "", True)
        if snippet_text and len(snippet_text) > SNIPPET_PRE_MIN:
            snippets.append(snippet_text[:SNIPPET_PRE_MAX])
    for code in _find_all(root, "code"):
        if code.parent is not None and code.parent.tag != "pre":
            snippet_text = _get_text(code, "", True)
            if snippet_text and SNIPPET_CODE_MIN < len(snippet_text) < SNIPPET_CODE_MAX:
                snippets.append(snippet_text)
    return snippets[:SNIPPET_CAP]


def extract_page(html_bytes: bytes, url: str) -> dict:
    """Full extraction: returns dict(id, url, title, content, code_snippets).

    Mirrors parse_page (doc_scraper.py:449-475) + the id derivation
    (doc_scraper.py:528). ``html_bytes`` is decoded as UTF-8 with
    errors='replace' (requests .content -> bs4 default sniffing; the
    synthetic corpus is UTF-8 by construction, FIXTURES.md §1).
    """
    html = html_bytes.decode("utf-8", errors="replace") if isinstance(
        html_bytes, (bytes, bytearray)
    ) else str(html_bytes)
    root = _parse(html)

    title_node = next(_find_all(root, "title"), None)
    title = ""
    if title_node is not None:
        # bs4 .string: the single text child, else None
        texts = [c for c in title_node.children if c.tag == ""]
        s = texts[0].text if len(texts) == 1 and len(title_node.children) == 1 else None
        title = s.strip() if s else ""
    if not title:
        title = urlparse(url).path

    main = None
    for kind, arg in _SELECTORS:
        main = _select_one(root, kind, arg)
        if main is not None:
            break
    scope = main if main is not None else root

    # snippets first: reference extracts from the *whole* soup but only
    # after decompose() has removed noise from content_soup -- decompose
    # mutates the shared tree, so when scope==soup the snippets see the
    # pruned tree; when a main container matched, only that subtree is
    # pruned and snippets still see noise outside it.  (doc_scraper.py:
    # 464-475: decompose happens before extract_code_snippets(soup)).
    _decompose_noise(scope)

    content = _get_text(scope, " ", True)
    content = _WS_RE.sub(" ", content).strip()[:CONTENT_MAX_CHARS]

    code_snippets = extract_code_snippets(root)

    return {
        "id": hashlib.md5(url.encode()).hexdigest(),
        "url": url,
        "title": title,
        "content": content,
        "code_snippets": code_snippets,
    }
