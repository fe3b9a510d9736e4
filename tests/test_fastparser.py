"""Fast regex DOM scanner vs stdlib HTMLParser builder: A/B equivalence.

The fast scanner replaces stdlib html.parser on the hot path; the stdlib
builder stays available (WCM_STDLIB_PARSER=1) and serves as the oracle:
on the whole synthetic corpus and on the reference-golden fixtures, both
parsers must produce byte-identical serialized trees and identical
extraction output.
"""

import os

from hypothesis import given, settings
from hypothesis import strategies as st

from wcm_spark.corpus import corpus_rows
from wcm_spark.htmlkit import _DomBuilder, _XmlDomBuilder, _fast_parse, extract_links, serialize_node


def _stdlib_parse(text, xml):
    builder = _XmlDomBuilder() if xml else _DomBuilder()
    builder.feed(text)
    builder.close()
    root = builder.root
    root.xml = xml
    return root


def _ab(text, xml=False):
    fast = serialize_node(_fast_parse(text, xml))
    std = serialize_node(_stdlib_parse(text, xml))
    assert fast == std, f"parser divergence on {text[:120]!r}"


def test_ab_whole_corpus():
    for r in corpus_rows(6, 30, with_images=False):
        ct = r["content_type"] or ""
        if "html" not in ct and "xml" not in ct:
            continue
        body = r["body"].decode("utf-8", errors="replace")
        xml = body.lstrip()[:5].lower() == "<?xml"
        _ab(body, xml)


def test_ab_extraction_whole_corpus():
    for r in corpus_rows(4, 20, with_images=False):
        if not r["content_type"] or "html" not in r["content_type"]:
            continue
        os.environ["WCM_STDLIB_PARSER"] = "1"
        try:
            want = extract_links(r["url"], r["content_type"], r["content_length"], r["body"])
        finally:
            del os.environ["WCM_STDLIB_PARSER"]
        got = extract_links(r["url"], r["content_type"], r["content_length"], r["body"])
        assert got == want, r["url"]


TRICKY = [
    '<a href="a&amp;b">x</a>',
    "<script>var a = \"<a href='x'>\";</script><a href=y>z</a>",
    "<style>a { color: red } /* </div> */</style>",
    '<img src=unquoted alt="q uo ted"/>',
    "<!-- comment with <tags> --><p>after</p>",
    "<!DOCTYPE html><html><body>t</body></html>",
    "<SELECT Name=UPPER><OPTION SELECTED>o</OPTION></SELECT>",
    "<input type=checkbox checked>",
    "<div><p>implied<p>close</div>",
    "text < notatag > more",
    "<a href='mixed\"quotes'>x</a>",
    "<br/><hr /><area href=x>",
    "unterminated <a href=",
    "<a ><b></a></b>",
    "<td>a<td>b</td>",
    # unquoted attribute values ending in '/' must NOT self-close the tag
    "<a href=http://example.com/>text</a>",
    "<div id=x/><span>inside?</span></div>",
    "<a href=x />startend</a>",
    # CDATA end scan must not terminate at a prefix match of '</script'
    "<script>var s = 1;</scripty><b>still script</b></script><i>out</i>",
    "<script>x</script ><p>after</p>",
]


def test_ab_tricky_cases():
    for html in TRICKY:
        _ab(html)


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=200))
@settings(max_examples=400, deadline=None)
def test_fast_parser_total(html):
    """Arbitrary junk: never throws, serialization reaches a fixed point."""
    once = serialize_node(_fast_parse(html, False))
    twice = serialize_node(_fast_parse(once, False))
    assert serialize_node(_fast_parse(twice, False)) == twice
