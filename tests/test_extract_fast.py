"""The fast-path extractor must be byte-identical to the pinned parser
on everything it ACCEPTS, and must PUNT (return None) on every construct
whose HTMLParser semantics it does not replicate. extract_auto therefore
equals extract() on arbitrary input."""

import pytest

from raylinkgraph.extract import extract, extract_auto, extract_fast
from raylinkgraph.schema import PageGen


def test_corpus_parity_and_full_coverage():
    g = PageGen(5000, 42)
    fallbacks = 0
    for s in range(g.num_shards()):
        t = g.shard_table(s)
        for h, u in zip(t.column("html").to_pylist(), t.column("url").to_pylist()):
            fast = extract_fast(h, u)
            ref = extract(h, u)
            if fast is None:
                fallbacks += 1
            else:
                assert fast == ref, u
            assert extract_auto(h, u) == ref, u
    # the generator's template family must be fully on the fast path —
    # a fallback here means the gates regressed and the speedup is gone
    assert fallbacks == 0


ADVERSARIAL = [
    b"<html><!-- <p>hidden</p> --><p>shown</p></html>",
    b"<html><![CDATA[raw]]><p>x</p></html>",
    b"<?xml version='1.0'?><p>x</p>",
    b"<HTML><P>upper</P></HTML>",
    b"<p>x &#38; y</p>",
    b"<a href='single'>q</a>",
    b"<a class=\"z\" href=\"https://a.example/\">q</a>",
    b"<p>1 < 2 and 3 > 2</p>",
    b'<a href="https://a.example/p q">sp</a>',
    b'<a href="../rel">r</a>',
    b'<a href="?only=query">r</a>',
    b'<a href="//proto.relative/x">r</a>',
    b'<a href="http:no-slashes">r</a>',
    b"<script><script>nested</script></script><p>t</p>",
]


@pytest.mark.parametrize("html", ADVERSARIAL)
def test_adversarial_constructs_punt_or_match(html):
    base = "https://site0.example/p0"
    fast = extract_fast(html, base)
    ref = extract(html, base)
    if fast is not None:
        assert fast == ref
    assert extract_auto(html, base) == ref


def test_gated_simple_cases_take_fast_path():
    base = "https://site0.example/p0"
    cases = [
        b'<html><body><p>a &amp; b</p><a href="/p1">x</a>'
        b'<a href="HTTPS://H.EX/p2#f">y</a>'
        b'<a href="mailto:z@q.ex">m</a></body></html>',
        b"<html><style>p{}</style><p>only text</p></html>",
    ]
    for h in cases:
        fast = extract_fast(h, base)
        assert fast is not None
        assert fast == extract(h, base)
