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


def test_ab_adversarial_attr_garbage():
    """Structured adversarial generator (the round-3 hardening fuzzer,
    fixed seed): quotes/equals/slashes mangled through the attr region,
    truncated constructs, stray closers — the fast scanner must equal
    the stdlib oracle on every one (non-canonical tags route through the
    exact stdlib-regex fallback)."""
    import random

    rng = random.Random(4242)
    tags = ["a", "div", "p", "li", "script", "style", "img", "br", "base",
            "form", "input", "option", "table"]
    attrs = ["href", "src", "class", "id", "style", "data-x", "action",
             "method", "name", "value"]
    snippets = ["<!-- c -->", "<!doctype html>", "<?pi x?>", "&amp;", "&",
                "<", ">", "<![CDATA[x]]>", "text ", "\n"]

    def rand_val():
        style = rng.random()
        body = "".join(rng.choice("abc<>&\"' /=x.:") for _ in range(rng.randint(0, 8)))
        if style < 0.4:
            return '"%s"' % body.replace('"', "")
        if style < 0.6:
            return "'%s'" % body.replace("'", "")
        return body.replace(" ", "").replace(">", "") or "v"

    def rand_doc(depth=0):
        out = []
        for _ in range(rng.randint(1, 6)):
            r = rng.random()
            if r < 0.35:
                out.append(rng.choice(snippets))
            elif r < 0.85:
                tag = rng.choice(tags)
                a = "".join(
                    " %s%s" % (rng.choice(attrs),
                               "=" + rand_val() if rng.random() < 0.8 else "")
                    for _ in range(rng.randint(0, 3))
                )
                out.append("<%s%s%s>" % (tag, a, "/" if rng.random() < 0.15 else ""))
                if depth < 4 and rng.random() < 0.6:
                    out.append(rand_doc(depth + 1))
                if rng.random() < 0.7:
                    out.append("</%s>" % tag)
            else:
                out.append("</%s>" % rng.choice(tags))
        return "".join(out)

    for _ in range(2000):
        doc = rand_doc()
        _ab(doc, False)
        _ab(doc, True)
