"""Scrape-stage goldens — emit order, selectors, forms, sitemap, guards.

Pinned against reference tests: t/main.t, t/collect_urls.t, t/form.t,
t/sitemap.t (expected values transcribed as fixtures, not code).
"""

from wcm_spark.crawlcore import make_child
from wcm_spark.htmlkit import extract_links, parse_html, weave_form

MAIN_HTML = """<html>
<head>
    <link rel="stylesheet" type="text/css" href="css1.css" />
    <link rel="stylesheet" type="text/css" href="css2.css" />
    <script type="text/javascript" src="js1.js"></script>
    <script type="text/javascript" src="js2.js"></script>
    <script type="text/javascript" src="//example.com/js3.js"></script>
</head>
<body>
<a href="index1.html">A</a>
<a href="index2.html">B</a>
<a href="mailto:a@example.com">C</a>
<a href="tel:0000">D</a>
<map name="m_map" id="m_map">
    <area href="index3.html" coords="" title="E" />
</map>
<a href="foo://example.com/foo"></a>
<a href="index1.html ">duplication</a>
<a href=" index1.html ">duplication</a>
</body>
</html>
"""


def scrape_children(url, html, containers=None, content_type="text/html"):
    """extract → make_child → dedup-at-enqueue, like the reference flow."""
    items = extract_links(url, content_type, len(html), html, containers)
    out, seen = [], set()
    for it in items:
        child = make_child(it["literal_uri"], it["base"], it["method"], it["params"])
        if child is None:
            continue
        curl, method, params, digest = child
        if digest in seen:
            continue
        seen.add(digest)
        out.append((it["literal_uri"], curl, method, params, it["tag"]))
    return out


def test_main_emit_order_and_scheme_filter():
    # t/main.t:50-76 — a[href] < area < link < script, schemes filtered,
    # whitespace-trimmed duplicates collapse
    got = scrape_children("http://example.com/", MAIN_HTML)
    assert [(g[0], g[1]) for g in got] == [
        ("index1.html", "http://example.com/index1.html"),
        ("index2.html", "http://example.com/index2.html"),
        ("index3.html", "http://example.com/index3.html"),
        ("css1.css", "http://example.com/css1.css"),
        ("css2.css", "http://example.com/css2.css"),
        ("js1.js", "http://example.com/js1.js"),
        ("js2.js", "http://example.com/js2.js"),
        ("//example.com/js3.js", "http://example.com/js3.js"),
    ]


def test_main_relative_base():
    # t/main.t:78-106
    got = scrape_children("http://example.com/a/a", MAIN_HTML)
    assert got[3][:2] == ("css1.css", "http://example.com/a/css1.css")
    got = scrape_children("https://example.com/", MAIN_HTML)
    assert got[3][:2] == ("css1.css", "https://example.com/css1.css")
    assert got[7][:2] == ("//example.com/js3.js", "https://example.com/js3.js")


BASE_ABS = """<html>
<head>
    <base href="http://example2.com/">
    <link rel="stylesheet" type="text/css" href="css1.css" />
</head>
<body>
</body>
</html>
"""

BASE_ROOT = BASE_ABS.replace('href="http://example2.com/"', 'href="/"').replace(
    '<base href="/">', '<base href="/">'
)

BASE_BARE = """<html>
<head>
    <base>
    <link rel="stylesheet" type="text/css" href="css1.css" />
</head>
<body>
</body>
</html>
"""


def test_base_tag_trio():
    # t/main.t:108-212
    got = scrape_children("http://example.com/", BASE_ABS)
    assert got[0][:2] == ("css1.css", "http://example2.com/css1.css")
    got = scrape_children("http://example.com/a/", BASE_ABS)
    assert got[0][:2] == ("css1.css", "http://example2.com/css1.css")

    root = """<html><head><base href="/">
    <link rel="stylesheet" type="text/css" href="css1.css" /></head><body></body></html>"""
    got = scrape_children("http://example.com/", root)
    assert got[0][:2] == ("css1.css", "http://example.com/css1.css")
    got = scrape_children("http://example.com/a/", root)
    assert got[0][:2] == ("css1.css", "http://example.com/css1.css")

    got = scrape_children("http://example.com/", BASE_BARE)
    assert got[0][:2] == ("css1.css", "http://example.com/css1.css")


COLLECT_HTML = """<html>
<head>
    <meta content="5;URL=http://example.com/no-a-redirection">
    <meta http-equiv="Refresh" content="5;URL=http://example.com/redirected">
    <link rel="stylesheet" type="text/css" href="css1.css" />
    <link rel="stylesheet" type="text/css" href="css2.css" />
    <script type="text/javascript" src="js1.js"></script>
    <script type="text/javascript" src="js2.js"></script>
    <style>
        a {
            background-image:url(http://example.com/bgimg.png);
        }
    </style>
</head>
<body>
<a href="index1.html">A</a>
<a href="index2.html">B</a>
<a href="mailto:a@example.com">C</a>
<a href="tel:0000">D</a>
<map name="m_map" id="m_map">
    <area href="index3.html" coords="" title="E" ping="http://example.com/" />
</map>
<script>
    var a = "<a href='hoge'>F</a>";
</script>
<div id="cont1">
    <a href="escaped?foo=bar&amp;baz=yada">G</a>
</div>
<div id="cont2">
    <a href="//example.com">ommit scheme</a>
    <a href="http://doublehit.com/" style="background-image:url(http://example.com/bgimg2.png);"></a>
</div>
</body>
</html>
"""


def extract_pairs(url, html, containers=None):
    items = extract_links(url, "text/html", len(html), html, containers)
    return [(it["literal_uri"], it["tag"]) for it in items]


def test_collect_urls_full_order():
    # t/collect_urls.t:79-107 — the exhaustive sorted-selector order pin
    assert extract_pairs("http://example.com/", COLLECT_HTML) == [
        ("http://example.com/bgimg2.png", "a"),
        ("index1.html", "a"),
        ("index2.html", "a"),
        ("mailto:a@example.com", "a"),
        ("tel:0000", "a"),
        ("escaped?foo=bar&baz=yada", "a"),
        ("//example.com", "a"),
        ("http://doublehit.com/", "a"),
        ("index3.html", "area"),
        ("http://example.com/", "area"),
        ("css1.css", "link"),
        ("css2.css", "link"),
        ("http://example.com/redirected", "meta"),
        ("js1.js", "script"),
        ("js2.js", "script"),
        ("http://example.com/bgimg.png", "style"),
    ]


def test_collect_urls_containers():
    # t/collect_urls.t:109-121
    assert extract_pairs("http://example.com/", COLLECT_HTML, "#cont1") == [
        ("escaped?foo=bar&baz=yada", "a"),
    ]
    assert extract_pairs("http://example.com/", COLLECT_HTML, ["#cont1", "#cont2"]) == [
        ("escaped?foo=bar&baz=yada", "a"),
        ("http://example.com/bgimg2.png", "a"),
        ("//example.com", "a"),
        ("http://doublehit.com/", "a"),
    ]


XHTML_SCRIPT = """<?xml version="1.0" encoding="UTF-8"?>
<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Transitional//EN" "http://www.w3.org/TR/xhtml1/DTD/xhtml1-transitional.dtd">
<html xmlns="http://www.w3.org/1999/xhtml" lang="en" xml:lang="en">
<head>
</head>
<body>
    <script>
        var a = "<a href='hoge'>a</a>";
    </script>
</body>
</html>
"""


def test_xml_script_guard():
    # t/collect_urls.t:159-188 — XHTML script content yields no links
    assert extract_pairs("http://example.com/", XHTML_SCRIPT) == []


SITEMAP = """<?xml version="1.0" encoding="utf-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"
    xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"
    xsi:schemaLocation="http://www.sitemaps.org/schemas/sitemap/0.9 http://www.sitemaps.org/schemas/sitemap/0.9/sitemap.xsd">
    <url>
        <loc>http://example.com/1</loc>
    </url>
    <url>
        <loc>http://example.com/2</loc>
    </url>
</urlset>
"""

SITEMAP_NO_NS = """<?xml version="1.0" encoding="utf-8"?>
<urlset
    xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"
    xsi:schemaLocation="http://www.sitemaps.org/schemas/sitemap/0.9 http://www.sitemaps.org/schemas/sitemap/0.9/sitemap.xsd">
    <url>
        <loc>http://example.com/1</loc>
    </url>
</urlset>
"""


def test_sitemap():
    # t/sitemap.t:17-76
    assert extract_pairs("http://example.com/", SITEMAP) == [
        ("http://example.com/1", "urlset"),
        ("http://example.com/2", "urlset"),
    ]
    assert extract_pairs("http://example.com/", SITEMAP_NO_NS) == []


def weave(html):
    dom = parse_html(html)
    forms = [n for n in dom.iter() if n.tag == "form"]
    return [weave_form(f) for f in forms]


def as_hash(pairs):
    h = {}
    for k, v in pairs:
        h.setdefault(k, []).append(v)
    return {k: (v[0] if len(v) == 1 else v) for k, v in h.items()}


def test_form_unnamed_and_empty_names():
    # t/form.t:22-38
    action, method, pairs = weave(
        """<div><form action="/index1.html" method="get">
      <select name=""><option>a</option></select>
      <select name="" multiple><option>a</option></select>
      <input type="text" name="">
      <input type="submit" value="submit1">
      <input type="submit" name='buttonName' value="submit2">
    </form></div>"""
    )[0]
    assert (action, method, as_hash(pairs)) == ("/index1.html", "GET", {})


def test_form_first_submit_wins():
    # t/form.t:40-53 — valueless first submit contributes empty string
    _, _, pairs = weave(
        """<form action="/i" method="get">
        <input type="submit" name='buttonName'>
        <input type="submit" name='buttonName' value="submit2">
    </form>"""
    )[0]
    assert as_hash(pairs) == {"buttonName": ""}


def test_form_image_consumes_submit():
    # t/form.t:55-68
    _, _, pairs = weave(
        """<form action="/i" method="get">
        <input type="image">
        <input type="submit" name='buttonName' value="submit2">
    </form>"""
    )[0]
    assert as_hash(pairs) == {}


def test_form_submit_and_button():
    # t/form.t:70-131
    _, _, pairs = weave(
        """<form action="/i" method="get">
        <input type="text" name="foo" value="default">
        <input type="submit" name='buttonName' value="submit1">
        <input type="submit" name='buttonName' value="submit2">
    </form>"""
    )[0]
    assert as_hash(pairs) == {"buttonName": "submit1", "foo": "default"}

    _, _, pairs = weave(
        """<form action="/i" method="get">
        <input type="text" name="foo" value="default">
        <button type="submit" name="buttonName" value="submit1">btn1</button>
        <button type="submit" name="buttonName" value="submit2">btn2</button>
    </form>"""
    )[0]
    assert as_hash(pairs) == {"buttonName": "submit1", "foo": "default"}

    _, _, pairs = weave(
        """<form action="/i" method="get">
        <input type="text" name="foo" value="default">
        <button type="submit" name="buttonName" value="">btn1</button>
        <button type="submit" name="buttonName" value="submit2">btn2</button>
    </form>"""
    )[0]
    assert as_hash(pairs) == {"buttonName": "", "foo": "default"}


BIG_FORM_BLOCK = """<html>
    <body>
        <form action="/receptor1" method="post">
            <input type="text" name="foo" value="fooValue">
            <input type="text" name="bar" value="barValue">
            <input type="hidden" name="baz" value="bazValue">
            <input type="hidden" name="yada" value="yadaValue" disabled="disabled">
            <input type="submit" name='btn' value="send">
            <input type="submit" name='btn' value="send2">
            <input type="submit" name='btn3' value="send3">
        </form>
        <form action="/receptor1" method="post">
            <input type="text" name="foo" value="fooValue">
            <input type="submit" value="send">
        </form>
        <form action="/receptor1" method="post">
            <input type="radio" name="foo" value="fooValue2"> fooValue2
            <input type="radio" name="foo" value="fooValue3"> fooValue3
            <input type="submit" value="send">
        </form>
        <form action="/receptor1" method="post">
            <input type="radio" name="foo" value="fooValue2"> fooValue2
            <input type="radio" name="foo" value="fooValue3" checked="checked"> fooValue3
            <input type="submit" value="send">
        </form>
        <form action="/receptor1" method="post">
            <input type="hidden" name="foo" value="">
            <input type="radio" name="foo" value="fooValue1"> fooValue1
            <input type="radio" name="foo" value="fooValue2" checked="checked"> fooValue2
            <input type="submit" value="send">
        </form>
        <form action="/receptor1" method="post">
            <input type="radio" name="foo" value="fooValue1"> fooValue1
            <input type="radio" name="foo" value="fooValue2" checked> fooValue2
            <input type="radio" name="foo" value="fooValue3"> fooValue3
            <input type="submit" value="send">
        </form>
        <form action="/receptor1" method="post">
            <select name="foo">
                <option value="">a</option>
                <option value="fooValue1">a</option>
                <option value="fooValue2">b</option>
                <option value="a&quot;b">b</option>
                <option value="a/b">b</option>
            </select>
            <input type="submit" value="send">
        </form>
        <form action="/receptor1" method="post">
            <input type="text" name="foo" value="" pattern="\\d\\d\\d">
            <input type="submit" value="send">
        </form>
        <form action="/receptor1" method="post">
            <input type="number" name="foo" value="" min="5" max="10">
            <input type="submit" value="send">
        </form>
        <form action="/receptor3" method="post">
        </form>
        <form action="/receptor1" method="post">
            <input type="text" name="foo" value="">
            <input type="file" name="bar">
            <input type="submit" value="send">
        </form>
        <form action="/receptor1" method="post">
            <input type="hidden" name="foo" value="value1">
            <select name="foo" multiple>
                <option value="value2" selected>a</option>
                <option value="value3" selected>a</option>
                <option value="value4">a</option>
            </select>
            <input type="submit" value="send">
        </form>
        <form action="/receptor1" method="post">
            <input type="hidden" name="foo" value="やったー">
        </form>
        <form action="/receptor1" method="post">
            <textarea name="foo">foo default</textarea>
            <textarea name="bar" disabled>bar default</textarea>
            <textarea name="baz" required>baz default</textarea>
            <input type="submit" value="send">
        </form>
        <form action="/receptor1" method="post">
            <input type="hidden" name="foo" value="value1">
            <select name="foo">
                <option value="value2" selected>a</option>
                <option value="value3" selected>a</option>
            </select>
            <input type="submit" value="send">
        </form>
        <form action="/receptor1" method="post">
            <input type="hidden" name="foo" value="value1">
            <select name="foo">
                <option value="value2">a</option>
                <option value="value3" selected>a</option>
            </select>
            <input type="submit" value="send">
        </form>
        <form action="/receptor1" method="post">
            <input type="hidden" name="foo" value="value1">
            <select name="foo">
                <option value="value2">a</option>
                <option value="value3">a</option>
            </select>
            <input type="submit" value="send">
        </form>
    </body>
</html>
"""

EXPECTED_FORMS = [
    {"baz": "bazValue", "bar": "barValue", "btn": "send", "foo": "fooValue", "yada": "yadaValue"},
    {"foo": "fooValue"},
    {},
    {"foo": "fooValue3"},
    {"foo": ["", "fooValue2"]},
    {"foo": "fooValue2"},
    {"foo": ""},
    {"foo": ""},
    {"foo": ""},
    {},
    {"foo": ""},
    {"foo": ["value1", "value2", "value3"]},
    {"foo": "やったー"},
    {"foo": "foo default", "bar": "bar default", "baz": "baz default"},
    {"foo": ["value1", "value2"]},
    {"foo": ["value1", "value3"]},
    {"foo": ["value1", "value2"]},
]


def test_form_seventeen_golden_block():
    # t/form.t:149-333
    woven = weave(BIG_FORM_BLOCK)
    assert len(woven) == 17
    for i, (_, _, pairs) in enumerate(woven):
        assert as_hash(pairs) == EXPECTED_FORMS[i], f"form {i}"


def test_form_e2e_get_post():
    # t/form.t:335-416
    html = """<html>
<body>
<form action="/index1.html">
    <input type="text" name="foo" value="default">
    <input type="submit" value="submit">
</form>
<form action="/index2.html" method="post">
    <textarea name="foo">foo</textarea>
    <input type="submit" value="submit">
</form>
<form action="/index2.html" method="post">
    <textarea name="bar">bar</textarea>
    <input type="submit" value="submit">
</form>
</body>
</html>
"""
    got = scrape_children("http://example.com/", html)
    assert got == [
        ("/index1.html", "http://example.com/index1.html?foo=default", "GET", None, "form"),
        ("/index2.html", "http://example.com/index2.html", "POST", "foo=foo", "form"),
        ("/index2.html", "http://example.com/index2.html", "POST", "bar=bar", "form"),
    ]

    html2 = """<html>
<body>
<form>
    <input type="text" name="foo" value="default">
    <input type="submit" value="submit">
</form>
</body>
</html>
"""
    got = scrape_children("http://example.com/", html2)
    assert got == [("", "http://example.com/?foo=default", "GET", None, "form")]


def test_get_form_appends_to_existing_query():
    # t/practical.t:98-106
    html = """<form action="/form_receptor2?a=b" method="get">
        <input type="text" name="query2" value="default">
    </form>"""
    got = scrape_children("http://example.com/", html)
    assert got[0][1] == "http://example.com/form_receptor2?a=b&query2=default"


def test_context_serialization():
    # t/practical.t:65-79 — Mojo::DOM-style sorted-attribute serialization
    html = '<html><head><script src="./js/js1.js" type="text/javascript"></script>' \
           '<link href="./css/css1.css" rel="stylesheet" type="text/css">' \
           '</head><body><img src="./img/png1.png" alt="png1"></body></html>'
    items = extract_links("http://x/", "text/html", len(html), html)
    ctx = {it["literal_uri"]: it["context"] for it in items}
    assert ctx["./js/js1.js"] == '<script src="./js/js1.js" type="text/javascript"></script>'
    assert ctx["./css/css1.css"] == '<link href="./css/css1.css" rel="stylesheet" type="text/css">'
    assert ctx["./img/png1.png"] == '<img alt="png1" src="./img/png1.png">'


def test_scrape_guard_no_body():
    assert extract_links("http://x/", "text/html", 0, "") == []
    assert extract_links("http://x/", "text/html", None, None) == []
    assert extract_links("http://x/", None, 10, "<a href='y'>z</a>") == []


def test_selector_class_child_not_and_attr_ops():
    from wcm_spark.htmlkit import parse_html, find

    html = """
    <div class="nav main"><ul><li><a href="/n1" class="x">n1</a></li></ul></div>
    <div id="body"><p><a href="/c1">c1</a></p>
      <a href="/c2" rel="nofollow external">c2</a>
      <span data-role="widget-big"><a href="/w">w</a></span>
    </div>
    <div><a href="/plain">plain</a></div>
    """
    dom = parse_html(html)

    def hrefs(sel):
        return [n.attrs.get("href") for n in find(dom, sel)]

    assert hrefs(".nav a") == ["/n1"]
    assert hrefs("div.nav a") == ["/n1"]
    assert hrefs("#body > a") == ["/c2"]           # child, not descendant
    assert hrefs("#body a") == ["/c1", "/c2", "/w"]
    assert hrefs("a:not(.x)") == ["/c1", "/c2", "/w", "/plain"]
    assert hrefs("a:not([rel])") == ["/n1", "/c1", "/w", "/plain"]
    assert hrefs("[rel~=nofollow]") == ["/c2"]
    assert hrefs("[data-role^=widget] a") == ["/w"]
    assert hrefs("[data-role$=big] a") == ["/w"]
    assert hrefs("[data-role*=et-b] a") == ["/w"]
    assert hrefs("div > ul li > a") == ["/n1"]
    # container scoping through extract_links still works with new syntax
    from wcm_spark.htmlkit import extract_links

    page = html.encode()
    items = extract_links("http://x/", "text/html", len(page), page,
                          containers=[".nav"])
    assert [it["literal_uri"] for it in items] == ["/n1"]


def test_selector_sibling_combinators_and_positional_pseudos():
    """Mojo::DOM container grammar, the round-2 gaps: adjacent (+) and
    general (~) sibling combinators, :nth-of-type, :first/last-child,
    :first/last-of-type — including no-space forms and ~ inside [attr~=]
    staying an attribute op."""
    from wcm_spark.htmlkit import find, parse_html

    html = """
    <div id="list">
      <h2>head</h2>
      <a href="/a1">a1</a>
      <p>between</p>
      <a href="/a2">a2</a>
      <a href="/a3">a3</a>
    </div>
    <div id="other"><a href="/o1" rel="me nofollow">o1</a></div>
    """
    dom = parse_html(html)

    def hrefs(sel):
        return [n.attrs.get("href") for n in find(dom, sel)]

    assert hrefs("h2 + a") == ["/a1"]            # adjacent only
    assert hrefs("p + a") == ["/a2"]
    assert hrefs("a + a") == ["/a3"]
    assert hrefs("h2 ~ a") == ["/a1", "/a2", "/a3"]  # any later sibling
    assert hrefs("p ~ a") == ["/a2", "/a3"]
    assert hrefs("p+a") == ["/a2"]               # no-space form
    assert hrefs("p~a") == ["/a2", "/a3"]
    assert hrefs("[rel~=nofollow]") == ["/o1"]   # ~ in attr op untouched
    assert hrefs("a:first-child") == ["/o1"]     # a1 is 2nd child of #list
    assert hrefs("#list a:first-of-type") == ["/a1"]
    assert hrefs("#list a:last-of-type") == ["/a3"]
    assert hrefs("#list a:nth-of-type(2)") == ["/a2"]
    assert hrefs("#list :last-child") == ["/a3"]
    # chains mixing sibling and ancestor combinators
    assert hrefs("#list h2 + a") == ["/a1"]
    assert hrefs("div > h2 ~ a:nth-of-type(3)") == ["/a3"]
    # selector groups: any alternative matches, document order kept
    assert hrefs("h2 + a, #other a") == ["/a1", "/o1"]
    assert hrefs("#list a:first-of-type, #list a:last-of-type, [rel~=me]") == [
        "/a1", "/a3", "/o1",
    ]
    # an+b formulas (children of #list: h2, a1, p, a2, a3 at 1..5)
    assert hrefs("#list a:nth-child(even)") == ["/a1", "/a2"]
    assert hrefs("#list a:nth-child(odd)") == ["/a3"]
    assert hrefs("#list a:nth-child(2n)") == ["/a1", "/a2"]
    assert hrefs("#list :nth-child(n+4)") == ["/a2", "/a3"]
    assert hrefs("#list a:nth-of-type(2n+1)") == ["/a1", "/a3"]
    assert hrefs("#list a:nth-of-type(-n+2)") == ["/a1", "/a2"]


def test_selector_round4_residue_forms():
    """The round-3 verdict's remaining grammar residue, matching
    Mojo::DOM/CSS semantics: :nth-last-child, :nth-last-of-type,
    :only-child, :only-of-type, and the CSS4 case-insensitivity flag
    [attr=v i] on every attribute operator."""
    from wcm_spark.htmlkit import find, parse_html

    html = """
    <div id="list">
      <h2>head</h2>
      <a href="/a1">a1</a>
      <p>between</p>
      <a href="/a2">a2</a>
      <a href="/a3">a3</a>
    </div>
    <div id="solo"><a href="/only" rel="ME NoFollow">only</a></div>
    """
    dom = parse_html(html)

    def hrefs(sel):
        return [n.attrs.get("href") for n in find(dom, sel)]

    # children of #list: h2 a1 p a2 a3 at 1..5 (reverse 5..1)
    assert hrefs("#list :nth-last-child(1)") == ["/a3"]
    assert hrefs("#list :nth-last-child(2)") == ["/a2"]
    # reverse positions: a3=1, a2=2, p=3, a1=4, h2=5
    assert hrefs("#list a:nth-last-child(odd)") == ["/a3"]
    assert hrefs("#list a:nth-last-child(even)") == ["/a1", "/a2"]
    assert hrefs("#list a:nth-last-child(-n+2)") == ["/a2", "/a3"]
    # a-of-type positions in #list: a1 a2 a3 (reverse a3 a2 a1)
    assert hrefs("#list a:nth-last-of-type(2)") == ["/a2"]
    assert hrefs("#list a:nth-last-of-type(2n+1)") == ["/a1", "/a3"]
    assert hrefs(":only-child") == ["/only"]
    assert hrefs("#list a:only-child") == []
    assert hrefs("h2:only-of-type") != []  # single h2 among its siblings
    assert hrefs("#list a:only-of-type") == []
    assert hrefs("#solo a:only-of-type") == ["/only"]
    # [attr=v i]: case-insensitive value compare, every operator
    assert hrefs('[rel="me nofollow" i]') == ["/only"]
    assert hrefs('[rel="me nofollow"]') == []
    assert hrefs("[rel~=nofollow i]") == ["/only"]
    assert hrefs("[rel~=nofollow]") == []
    assert hrefs("[rel^=me i]") == ["/only"]
    assert hrefs("[rel$=nofollow i]") == ["/only"]
    assert hrefs("[rel*=FOLLOW i]") == ["/only"]
    assert hrefs("[href=/ONLY i]") == ["/only"]
    assert hrefs("[href=/ONLY]") == []
    # unquoted value + flag must not swallow the flag into the value
    assert hrefs("[rel~=ME i]") == ["/only"]


def test_fast_preset_collection_equals_generic():
    """The tag-switch preset path must emit EXACTLY what the compiled
    selector path emits — same items, same order (forcing the generic
    path by passing handlers=HANDLER_PRESETS explicitly)."""
    import glob

    from wcm_spark.htmlkit import HANDLER_PRESETS, extract_links

    pages = [
        """<html><head><base href="/b/"><link href="c.css" rel="x">
        <script src="j.js"></script><style>a{background:url(s.png)}</style>
        </head><body><a href="1.html">1</a><area href="ar" ping="pg">
        <img src="i.png"><iframe src="f.html"></iframe>
        <div style="background:url(d.png)"><a href="2.html">2</a></div>
        <form action="/go" method="post"><input name="q" value="v">
        <input type="submit"></form>
        <meta http-equiv="refresh" content="3;URL=/next">
        <object data="o.swf"></object><embed src="e.mov">
        <input src="btn.png" type="image"></body></html>""",
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>http://s/1</loc></url><url><loc>http://s/2</loc></url></urlset>",
        "<p>no links at all</p>",
        '<style>@import url("x.css");</style><frame src="fr.html">',
    ]
    for body in pages:
        b = body.encode()
        fast = extract_links("http://x/p", "text/html", len(b), b)
        slow = extract_links(
            "http://x/p", "text/html", len(b), b, handlers=dict(HANDLER_PRESETS)
        )
        assert fast == slow
