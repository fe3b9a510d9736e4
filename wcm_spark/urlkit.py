"""Pure-Python URL kernel — vectorized by the Arrow UDF layer.

Re-implements, from public RFC 3986 / Mojolicious-documented behavior, the
URL semantics of the reference crawler (jamadam/WWW-Crawler-Mojo):

- ``resolve_href``   — lib/WWW/Crawler/Mojo/ScraperUtil.pm:147-156, pinned by
                       the 74 goldens in t/resolve_href.t:17-165
- ``host_key``       — lib/WWW/Crawler/Mojo/UserAgent.pm:65-74, pinned by
                       t/user_agent_userinfo.t:22-31
- ``job_digest``     — lib/WWW/Crawler/Mojo/Job.pm:77-82 (MD5 over
                       url + method + serialized params)
- ``guess_encoding`` / ``decode_body``
                     — lib/WWW/Crawler/Mojo/ScraperUtil.pm:17-38,158-171,
                       pinned by t/guess_encoding.t
- ``collect_urls_css`` — lib/WWW/Crawler/Mojo/ScraperUtil.pm:13-15, pinned by
                       t/collect_urls.t:123-157

These are plain functions over Python scalars so they can be unit-tested
without Spark and batched through pandas/Arrow UDFs (wcm_spark.functions)
without per-row Python overhead in the driver plan.
"""

from __future__ import annotations

import codecs
import hashlib
import re
from urllib.parse import quote, urljoin, urlsplit

__all__ = [
    "resolve_href",
    "host_key",
    "job_digest",
    "guess_encoding",
    "decode_body",
    "collect_urls_css",
    "serialize_params",
    "append_query",
    "url_scheme",
    "SCHEME_ALLOW",
]

# Schemes the reference keeps after link resolution (Mojo.pm:177).
SCHEME_ALLOW = frozenset({"http", "https", "ftp", "ws", "wss"})

# One leading whitespace char, one trailing whitespace char, every newline —
# a single global regex pass, matching the reference's s{^\s|\s$|\n}{}g.
_TRIM_RE = re.compile(r"^\s|\s$|\n")

# Characters never percent-encoded in a serialized path (RFC 3986 pchar set
# plus '%' so pre-encoded sequences survive a re-quote untouched).
_PATH_SAFE = "/%:@!$&'()*+,;=~.-_"

_CSS_URL_RE = re.compile(r"url\((.+?)\)", re.IGNORECASE | re.DOTALL)

_CHARSET_RE = re.compile(r"""\bcharset\s*=\s*['"]?([a-zA-Z0-9_\-]+)['"]?""", re.IGNORECASE)
_HEAD_RE = re.compile(r"<head>(.+)</head>", re.IGNORECASE | re.DOTALL)
_META_CT_RE = re.compile(
    r"""<meta[^>]*http-equiv\s*=\s*['"]?Content-Type['"]?[^>]*>""",
    re.IGNORECASE | re.DOTALL,
)
_CONTENT_ATTR_RE = re.compile(r"""content\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE)
_CSS_CHARSET_RE = re.compile(r"""^\s*@charset ['"](.+?)['"];""", re.IGNORECASE | re.DOTALL)

_WELL_KNOWN_PORTS = {"http": 80, "https": 443}


def _trim_href(href: str) -> str:
    """Single-pass strip: one leading \\s, one trailing \\s, all newlines."""
    return _TRIM_RE.sub("", href)


def _strip_fragment(url: str) -> str:
    i = url.find("#")
    return url if i < 0 else url[:i]


# characters that force the full resolution path (quoting, dot segments,
# scheme-relative forms, queries that need merge logic)
# ';' is admitted here because _resolve_full shields it from urljoin's
# RFC-1808 params drop (see the sentinel there), so origin + href and the
# full path agree on ';'-bearing hrefs — pinned by the hypothesis A/B test
# (historical counterexample: base 'http://a/b/c/d?q', href '/;').
_SIMPLE_PATH_RE = re.compile(r"^/(?!/)[A-Za-z0-9/._~%!$&'()*+,;=:@-]*$")
_SIMPLE_ABS_RE = re.compile(r"^https?://[A-Za-z0-9.-]+(?::\d+)?(/[A-Za-z0-9/._~%!$&'()*+,;=:@-]*)?(\?[^#\s]+)?$")
_DOTSEG_RE = re.compile(r"(?:^|/)\.\.?(?:/|$)")


def resolve_href(base: str, href: str) -> str:
    """Resolve ``href`` against ``base`` with the reference's quirks.

    RFC 3986 join, minus the href's fragment, with: whitespace pre-trim,
    newline removal anywhere, a trailing slash dropped when the href's last
    segment is a bare ``.``/``..`` (Mojo::Path keeps no trailing slash
    there), leading ``..`` segments that escape the root removed, and spaces
    percent-encoded in the final path.

    Fast paths (the two dominant link shapes in real pages) skip urljoin:
    site-absolute paths with no dot segments concatenate onto the base
    origin; clean absolute http(s) URLs pass through. Both are pinned
    equivalent to the full path by tests/test_properties.py A/B fuzzing.
    """
    href = _strip_fragment(_trim_href(href))
    base = _strip_fragment(str(base))

    if _SIMPLE_PATH_RE.match(href) and not _DOTSEG_RE.search(href):
        i = base.find("://")
        if i > 0:
            j = base.find("/", i + 3)
            origin = base if j < 0 else base[:j]
            if "?" not in origin:
                return origin + href
    elif _SIMPLE_ABS_RE.match(href) and not _DOTSEG_RE.search(href.split("?")[0]):
        return href

    return _resolve_full(base, href)


def _resolve_full(base: str, href: str) -> str:
    """The complete resolution path (fragments already stripped)."""
    # urljoin routes through urlparse, whose RFC-1808 params split drops an
    # empty trailing ';' param ('/;' -> '/'). Mojo::URL treats ';' as an
    # ordinary path character and keeps it (ScraperUtil.pm resolve via
    # Mojo::URL->to_abs), so shield ';' behind a sentinel across the join.
    if ";" in base or ";" in href:
        sent = "\ue000"
        while sent in base or sent in href:
            sent += "\ue000"
        joined = urljoin(base.replace(";", sent), href.replace(";", sent))
        joined = joined.replace(sent, ";")
    else:
        joined = urljoin(base, href)
    joined = _strip_fragment(joined)

    scheme, netloc, path, query, _ = urlsplit(joined)

    # urljoin already applies remove_dot_segments, but a relative base or
    # pathological input can leave leading '..' parts; drop them like the
    # reference does after to_abs.
    while path.startswith("/../"):
        path = path[3:]
    if path == "/..":
        path = "/"

    # Bare '.'/'..' final segment: Mojo::Path records no trailing slash.
    last_seg = href.rsplit("/", 1)[-1]
    q = href.find("?")
    if q >= 0:
        last_seg = None  # a query means the path part didn't end the href
    if last_seg in (".", "..") and path.endswith("/") and path != "/":
        path = path[:-1]

    path = quote(path, safe=_PATH_SAFE)

    out = f"{scheme}://{netloc}" if netloc or scheme else ""
    if not out:
        out = joined.split("?")[0].split("#")[0]
        out = quote(out, safe=_PATH_SAFE)
    else:
        out += path
    if query:
        out += "?" + query
    return out


_SCHEME_RE = re.compile(r"[A-Za-z][A-Za-z0-9+.\-]*")


def url_scheme(url: str) -> str | None:
    # fast path: the overwhelming majority of resolved crawl URLs —
    # skips the slice + regex machinery entirely
    if url.startswith("http://"):
        return "http"
    if url.startswith("https://"):
        return "https"
    i = url.find(":")
    if i <= 0:
        return None
    sch = url[:i]
    if _SCHEME_RE.fullmatch(sch):
        return sch.lower()
    return None


def host_key(url: str | None) -> str | None:
    """Politeness key: ``scheme://ihost[:port]`` with well-known port elided.

    Only absolute http/https URLs have a key (UserAgent.pm:65-74); the host
    is IDNA-encoded and lowercased so ``http://☃.net`` and
    ``http://xn--n3h.net`` share one key.
    """
    if not url:
        return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = (parts.scheme or "").lower()
    wkp = _WELL_KNOWN_PORTS.get(scheme)
    if wkp is None or not parts.netloc:
        return None
    host = parts.hostname or ""
    if not host:
        return None
    try:
        host.encode("ascii")
        ihost = host.lower()
    except UnicodeEncodeError:
        try:
            ihost = host.encode("idna").decode("ascii")
        except UnicodeError:
            ihost = host.lower()
    key = f"{scheme}://{ihost}"
    try:
        port = parts.port
    except ValueError:
        port = None
    if port is not None and port != wkp:
        key += f":{port}"
    return key


def job_digest(url: str, method: str | None = None, params: str | None = None) -> str:
    """MD5 hex over ``url + method + params`` UTF-8 bytes (Job.pm:77-82)."""
    seed = url + (method or "") + (params or "")
    return hashlib.md5(seed.encode("utf-8")).hexdigest()


# Mojo::Parameters-style escaping: unreserved + sub-delims kept literal.
_PARAM_SAFE = "-._~!$'()*,:@/"


def serialize_params(pairs: list[tuple[str, str]]) -> str:
    """Serialize (name, value) pairs ``a=1&a=2`` with URL escaping.

    The reference serializes via Mojo::Parameters->to_string whose pair
    order comes from Perl hash iteration (nondeterministic across runs); we
    pin a deterministic canonical order: first-seen name order, values in
    document order — the order the pairs were collected in.
    """
    out = []
    for name, value in pairs:
        out.append(quote(name or "", safe=_PARAM_SAFE) + "=" + quote(value or "", safe=_PARAM_SAFE))
    return "&".join(out)


def append_query(url: str, params: str) -> str:
    """Append serialized params to a URL's query (GET forms, Mojo.pm:179)."""
    if not params:
        return url
    frag = ""
    i = url.find("#")
    if i >= 0:
        url, frag = url[:i], url[i:]
    sep = "&" if "?" in url else "?"
    return url + sep + params + frag


def collect_urls_css(text: str | None) -> list[str]:
    """Extract ``url(...)`` refs from CSS, stripping matched quote pairs."""
    found = []
    for m in _CSS_URL_RE.finditer(text or ""):
        u = m.group(1)
        if u[:1] in ("'", '"') and u.endswith(u[0]) and len(u) > 1:
            u = u[1:-1]
        elif u[:1] in ("'", '"'):
            u = u[1:]
        found.append(u)
    return found


def guess_encoding(content_type: str | None, body: bytes) -> str | None:
    """Charset from Content-Type, else meta http-equiv in <head>, else CSS
    @charset (ScraperUtil.pm:30-38)."""
    if not content_type:
        return None
    m = _CHARSET_RE.search(content_type)
    if m:
        return m.group(1)
    text = body.decode("utf-8", errors="replace") if isinstance(body, (bytes, bytearray)) else str(body)
    if re.search(r"text/(html|xml)", content_type):
        head = _HEAD_RE.search(text)
        if not head:
            return None
        charset = None
        for meta in _META_CT_RE.finditer(head.group(1)):
            c = _CONTENT_ATTR_RE.search(meta.group(0))
            if c:
                content_val = c.group(2) or c.group(3) or c.group(4) or ""
                cm = _CHARSET_RE.search(content_val)
                if cm:
                    charset = cm.group(1)
        return charset
    if re.search(r"text/css", content_type):
        m = _CSS_CHARSET_RE.search(text)
        return m.group(1) if m else None
    return None


def decode_body(content_type: str | None, body: bytes) -> str:
    """Decode with the guessed charset, falling back to utf-8
    (ScraperUtil.pm:17-28)."""
    enc = guess_encoding(content_type, body) or "utf-8"
    try:
        codecs.lookup(enc)
    except LookupError:
        enc = "utf-8"
    if isinstance(body, str):
        return body
    return body.decode(enc, errors="replace")
