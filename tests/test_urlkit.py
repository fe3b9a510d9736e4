"""urlkit goldens — reference parity.

resolve cases: all 74 from t/resolve_href.t:17-165
host_key:      t/user_agent_userinfo.t:22-31 (+ IDNA pair :40-52)
digest:        Job.pm:77-82 semantics
encoding:      t/guess_encoding.t:38-64
css urls:      t/collect_urls.t:123-157
"""

import pytest

from wcm_spark.urlkit import (
    append_query,
    collect_urls_css,
    decode_body,
    guess_encoding,
    host_key,
    job_digest,
    resolve_href,
)

from wcm_spark.goldens import HOST_KEY_CASES, RESOLVE_CASES

# 74 t/resolve_href.t goldens + 5 repo-pinned ';' path-param cases
assert len(RESOLVE_CASES) == 79


@pytest.mark.parametrize("base,href,expected", RESOLVE_CASES)
def test_resolve_href(base, href, expected):
    assert resolve_href(base, href) == expected




@pytest.mark.parametrize("url,expected", HOST_KEY_CASES)
def test_host_key(url, expected):
    assert host_key(url) == expected


def test_host_key_idna():
    assert host_key("http://☃.net") == host_key("http://xn--n3h.net") == "http://xn--n3h.net"


def test_digest():
    import hashlib

    assert job_digest("http://example.com/") == hashlib.md5(b"http://example.com/").hexdigest()
    assert job_digest("http://x/", "POST", "a=1") == hashlib.md5(b"http://x/POSTa=1").hexdigest()
    # method/params change the digest
    assert job_digest("http://x/") != job_digest("http://x/", "POST", "a=1")


HTML_PLAIN = "<html>\n<body>\n日本\n</body>\n</html>\n".encode()
HTML_META = (
    '<html>\n<head>\n    <meta http-equiv="Content-Type" content="text/html; charset=cp932" />\n'
    "</head>\n<body>\n日本\n</body>\n</html>\n"
).encode()


def test_guess_encoding():
    assert guess_encoding("text/html", HTML_PLAIN) is None
    assert guess_encoding("text/html", HTML_META) == "cp932"
    assert guess_encoding("text/html; charset=cp932", HTML_PLAIN) == "cp932"
    assert guess_encoding("text/html; charset=cp932; hoge", HTML_PLAIN) == "cp932"
    assert guess_encoding(None, HTML_PLAIN) is None


def test_decode_body_cp932():
    body = "日本".encode("cp932")
    assert decode_body("text/html; charset=cp932", body) == "日本"
    # unknown charset falls back to utf-8
    assert decode_body("text/html; charset=nosuchenc", "日本".encode()) == "日本"
    css = '@charset "cp932";\nbody{}'.encode()
    assert guess_encoding("text/css", css) == "cp932"


CSS_BLOCK = """
body {
    background-image:url('/image/a.png');
}
div {
    background-image:url('/image/b.png');
}
div {
    background: #fff url('/image/c.png');
}
div {
    background: #fff url(/image/d.png);
}
div {
    background: #fff url("/image/e.png");
}
div {
    background: #fff url(/image/?spring15');
}
div {
    background: #fff URL(/image/f);
}
"""


def test_collect_urls_css():
    assert collect_urls_css(CSS_BLOCK) == [
        "/image/a.png",
        "/image/b.png",
        "/image/c.png",
        "/image/d.png",
        "/image/e.png",
        "/image/?spring15'",
        "/image/f",
    ]
    assert collect_urls_css(None) == []
    assert collect_urls_css("") == []


def test_append_query():
    assert append_query("http://h/form_receptor2?a=b", "query2=default") == (
        "http://h/form_receptor2?a=b&query2=default"
    )
    assert append_query("http://h/x", "q=1") == "http://h/x?q=1"
    assert append_query("http://h/x", "") == "http://h/x"
