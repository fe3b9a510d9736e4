"""Mini-DOM + selector engine + link-extraction presets (pure Python).

Re-implements the reference's scrape stage semantics
(lib/WWW/Crawler/Mojo/ScraperUtil.pm:40-145, lib/WWW/Crawler/Mojo.pm:125-159)
on top of the stdlib ``html.parser`` so it can run inside Arrow-batched
pandas UDFs with no non-stdlib dependency:

- 13 selector→extractor presets (script[src], link[href], a[href], img[src],
  area, embed[src], frame[src], iframe[src], input[src], object[data], form,
  meta[content] refresh, style, [style], sitemap urlset) — emit order is
  ASCII-sorted selector key then document order, pinned by
  t/collect_urls.t:79-107 and t/main.t:50-76.
- form submission emulation (ScraperUtil.pm:52-112) with the reference's
  quirks: disabled inputs included, only the first submit/image contributes,
  select fallback to first-child options, checked-only radio/checkbox —
  pinned by t/form.t.
- container scoping (reduce_html_handlers, ScraperUtil.pm:131-145).
- XML script-ancestor guard (_wrong_dom_detection, ScraperUtil.pm:173-179).

Everything here is scalar-level; wcm_spark.operators.scrape batches it.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from .urlkit import collect_urls_css, decode_body

__all__ = ["Node", "parse_html", "find", "at", "serialize_node", "extract_links", "weave_form"]

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Minimal HTML implied-end-tag rules — enough for crawler-relevant markup.
_AUTOCLOSE = {
    "option": {"option"},
    "li": {"li"},
    "tr": {"tr", "td", "th"},
    "td": {"td", "th"},
    "th": {"td", "th"},
    "p": {"p"},
}


@dataclass(slots=True, eq=False)
class Node:
    # slots: ~20% cheaper construction/attr access on the parse hot path;
    # eq=False: node identity IS equality (the generated deep compare
    # recursed through parent/children cycles and was never wanted)
    tag: str | None  # None for the document root
    attrs: dict[str, str | None] = field(default_factory=dict)
    parent: "Node | None" = None
    children: list = field(default_factory=list)  # Node or str
    pos: int = 0  # document order
    xml: bool = False  # set on the document root by parse_html
    # document-order element list, captured during _fast_parse on the
    # ROOT node only (creation order IS pre-order) — walk() returns it
    # without re-traversing; subtree walks keep the stack loop
    elems: "list | None" = None

    def element_children(self):
        return [c for c in self.children if isinstance(c, Node)]

    @property
    def text(self) -> str:
        out = []
        for c in self.children:
            if isinstance(c, str):
                out.append(c)
            else:
                out.append(c.text)
        return "".join(out)

    def iter(self):
        yield self
        for c in self.children:
            if isinstance(c, Node):
                yield from c.iter()

    def walk(self) -> list:
        """All element nodes in document order (iterative, no generators).
        The root of a _fast_parse tree answers from the creation-order
        list captured during the parse (identical pre-order)."""
        if self.elems is not None:
            return self.elems
        out = []
        stack = [self]
        while stack:
            node = stack.pop()
            if node.tag is not None:
                out.append(node)
            stack.extend(
                c for c in reversed(node.children) if isinstance(c, Node)
            )
        return out

    def has_script_ancestor(self) -> bool:
        p = self.parent
        while p is not None:
            if p.tag == "script":
                return True
            p = p.parent
        return False


class _DomBuilder(HTMLParser):
    """HTML mode: script/style content treated as CDATA (default)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node(tag=None)
        self.stack = [self.root]
        self.counter = 0

    def _open(self, tag, attrs, self_closing):
        tag = tag.lower()
        rule = _AUTOCLOSE.get(tag)
        if rule and self.stack[-1].tag in rule:
            self.stack.pop()
        self.counter += 1
        attr_map = {}
        for k, v in attrs:
            if k not in attr_map:  # first occurrence wins
                attr_map[k.lower()] = v
        node = Node(tag=tag, attrs=attr_map, parent=self.stack[-1], pos=self.counter)
        self.stack[-1].children.append(node)
        if not self_closing and tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_starttag(self, tag, attrs):
        self._open(tag, attrs, self_closing=False)

    def handle_startendtag(self, tag, attrs):
        self._open(tag, attrs, self_closing=True)

    def handle_endtag(self, tag):
        tag = tag.lower()
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


class _XmlDomBuilder(_DomBuilder):
    """XML mode: no CDATA elements — markup inside <script> becomes nodes,
    which the script-ancestor guard then rejects (ScraperUtil.pm:173-179)."""

    CDATA_CONTENT_ELEMENTS = ()


# ---------------------------------------------------------------------------
# Fast scanner: a regex tokenizer replacing stdlib HTMLParser on the hot
# path (~45% of parse CPU). Produces the same tree for crawler-relevant
# markup; stdlib remains available via WCM_STDLIB_PARSER=1 and is the A/B
# oracle in tests/test_fastparser.py.
# ---------------------------------------------------------------------------

_FAST_TAG_RE = re.compile(
    r"""<(?:
        !--.*?-->                           # comment (closer REQUIRED —
                                            # unclosed takes the stdlib
                                            # incomplete rule in _fast_parse)
      | !\[CDATA\[.*?\]\]>                  # CDATA section (dropped)
      | [!?](?!--|\[CDATA\[)[^>]*>          # doctype / processing instr
                                            # (lookahead keeps unclosed
                                            # comments/CDATA out of the
                                            # bogus-decl branch)
        # close-tag name must start RIGHT after '</' (html.parser treats
        # '</ a>' as a bogus comment, not an end tag) and uses the same
        # tolerant charset as open tags ('</a\'>' closes element "a'")
      | (?P<close>/)(?P<ctag>[a-zA-Z][^\t\n\r\f\ />\x00]*+)[^>]*>
        # open-tag name charset matches html.parser's tagfind_tolerant:
        # anything after the first letter except whitespace, '/', '>'
        # (so <b'> is a tag named "b'", exactly like the stdlib oracle).
        # POSSESSIVE (*+): the stdlib name regex never gives characters
        # back to the attr scan, so neither may ours (<l"/"> is tag l",
        # not tag l with a quoted attr region).
        # attr region: quotes are legal ONLY as '='-led values (stdlib
        # name-scans a standalone '"f"' and then stalls — such tags go
        # to the exact fallback); '='-led unquoted values may CONTAIN
        # stray quotes (<a action=c"> is tolerated); else bare non-quote
        # chars
        # the '='-led branch must NOT cross whitespace: stdlib binds
        # ' v=' as the NEXT attr name, never as this '='s value (spaced
        # '= "quoted"' forms drop to the exact fallback instead)
      | (?P<tag>[a-zA-Z][^\t\n\r\f\ />\x00]*+)
        (?P<attrs>(?:=++(?:"[^"]*"|'[^']*'|[^>\s"'][^>\s]*)|[^>"'])*)>
    )""",
    re.DOTALL | re.VERBOSE,
)

# name charset = attrfind_tolerant's ([^\s/>][^\s/=>]*: the FIRST char
# may be '=' or a quote — '<t "=">' really has attrs '"' and '="'), then
# the tolerant value: '=+' collapses repeated equals, quoted alternatives
# first, else an unquoted run that must not START with a quote but may
# contain one
_FAST_ATTR_RE = re.compile(
    r"""([^\s/>][^\s/=>]*)(?:\s*=+\s*("([^"]*)"|'([^']*)'|(?!["'])[^\s>]*))?""",
    re.DOTALL,
)

_HAS_ENTITY = re.compile(r"&")

_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script\s*>", re.IGNORECASE),
    "style": re.compile(r"</\s*style\s*>", re.IGNORECASE),
}

# The fast path trusts its own (cheap) attr semantics ONLY for canonical
# attr regions: whitespace-separated name(=value)? pairs with plain names
# and unambiguous values, plus at most one trailing '/'. Anything else —
# '='-leading names, stray quotes, '==' indicators, quotes glued to the
# next token — re-parses through the exact stdlib-regex fallback. Real
# pages are ~always canonical; the gate is one fullmatch per tag.
_CANON_ATTRS_RE = re.compile(
    r"""(?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*
        (?:=(?:"[^"<]*"|'[^'<]*'|[^\s>"'<=][^\s>"'<]*))?
    )*\s*/?""",
    re.VERBOSE | re.DOTALL,
)


def _unescape(s: str) -> str:
    if "&" in s:
        import html as _html

        return _html.unescape(s)
    return s


def _stdlib_starttag_fallback(text: str, i: int):
    """Faithful replication of html.parser's parse_starttag +
    check_for_whole_start_tag (using the STDLIB's own tolerant regexes)
    for markup the fast tag regex rejects — stray quotes in the attr
    region, junk tag endings. Rare path: clean pages never reach it.

    Returns one of:
      ("tag", (tag, [(name, value)...], self_closing), endpos)
      ("data", raw_text, endpos)   # junk ending: emit RAW (no unescape)
      ("incomplete", None, -1)
    """
    from html.parser import (
        attrfind_tolerant,
        locatestarttagend_tolerant,
        tagfind_tolerant,
    )

    m = locatestarttagend_tolerant.match(text, i)
    j = m.end()
    nxt = text[j : j + 1]
    if nxt == ">":
        endpos = j + 1
    elif nxt == "/" and text.startswith("/>", j):
        endpos = j + 2
    elif nxt == "":
        return ("incomplete", None, -1)
    elif nxt == "/":
        endpos = j if j > i else i + 1
    elif nxt in (
        "abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    ):
        return ("incomplete", None, -1)
    else:
        endpos = j if j > i else i + 1
    tm = tagfind_tolerant.match(text, i + 1)
    tag = tm.group(1).lower()
    k = tm.end()
    attrs = []
    while k < endpos:
        am = attrfind_tolerant.match(text, k)
        if not am:
            break
        name, rest, val = am.group(1, 2, 3)
        if not rest:
            val = None
        elif val[:1] == "'" == val[-1:] or val[:1] == '"' == val[-1:]:
            val = val[1:-1]
        if val:
            val = _unescape(val)
        attrs.append((name.lower(), val))
        k = am.end()
    end = text[k:endpos].strip()
    if end not in (">", "/>"):
        # parse_starttag's junk-ending case passes the slice to
        # handle_data RAW (goahead's unescape does not apply there)
        return ("data", text[i:endpos], endpos)
    return ("tag", (tag, attrs, end.endswith("/>")), endpos)


def _fast_parse(text: str, xml: bool) -> Node:
    root = Node(tag=None)
    elems: list = []
    root.elems = elems
    stack = [root]
    counter = 0
    pos = 0
    n = len(text)
    lower = None  # lazily lowered copy for CDATA end scans
    # hot-loop local bindings (one LOAD_FAST vs LOAD_GLOBAL + attr hop
    # per tag; the loop runs once per '<' of every parsed page)
    find = text.find
    tag_match = _FAST_TAG_RE.match
    canon_full = _CANON_ATTRS_RE.fullmatch
    attr_finditer = _FAST_ATTR_RE.finditer
    autoclose_get = _AUTOCLOSE.get
    unescape = _unescape
    elems_append = elems.append

    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            if pos < n:
                seg = text[pos:]
                stack[-1].children.append(
                    unescape(seg) if "&" in seg else seg
                )
            break
        if lt > pos:
            seg = text[pos:lt]
            stack[-1].children.append(unescape(seg) if "&" in seg else seg)
        m = tag_match(text, lt)
        if m is not None:
            # positional groups (close, ctag, tag, attrs in appearance
            # order) — named lookup costs a dict hop per tag
            close, ctag, tag_name, raw_attrs = m.group(1, 2, 3, 4)
            if raw_attrs and not canon_full(raw_attrs):
                m = None  # non-canonical attr region: exact fallback path
        if m:
            pos = m.end()
            if close:
                ctag = ctag.lower()
                for i in range(len(stack) - 1, 0, -1):
                    if stack[i].tag == ctag:
                        del stack[i:]
                        break
                continue
            if not tag_name:
                continue  # comment / doctype / PI
            tag = tag_name.lower()
            attr_map = {}
            self_closing = False
            raw_attrs = raw_attrs or ""
            # Self-closing when the trailing '/' is NOT part of a bare
            # attribute value: html.parser's bare-value scan consumes
            # '/' (<a href=http://x/> stays open, <a href=/> has value
            # "/"), but a '/' after an attr NAME or a quoted value ends
            # the tag (<t c/> and <t c="x"/> are self-closing).
            _ra = raw_attrs.rstrip()
            if _ra.endswith("/"):
                if len(_ra) == 1 or _ra[-2] in " \t\r\n\"'":
                    self_closing = True
                else:
                    # '=' in the final word ⇒ the '/' sits inside a bare
                    # value (<a href=http://x/> stays open); the
                    # '='-leading ambiguity was routed to the fallback
                    _words = _ra[:-1].split()
                    self_closing = bool(_words) and "=" not in _words[-1]
            if raw_attrs and _ra.strip("/ \t\r\n"):
                for am in attr_finditer(raw_attrs):
                    g1, g2, g3, g4 = am.group(1, 2, 3, 4)
                    name = g1.lower().rstrip("/")
                    if not name or name in attr_map:
                        continue
                    if g2 is None:
                        attr_map[name] = None
                    else:
                        val = g3 if g3 is not None else (g4 if g4 is not None else g2)
                        attr_map[name] = unescape(val) if "&" in val else val
        else:
            tag = None
            attr_map = {}
            self_closing = False
            c1 = text[lt + 1 : lt + 2]
            c2 = text[lt + 2 : lt + 3]
            if c1 == "/" and not (c2.isascii() and c2.isalpha()):
                # '</' + non-name: html.parser's bogus-comment path —
                # silently consume through the next '>' ('</>', '</ >',
                # '</3>'); with no '>' left, fall to the bare-'<' path
                j = text.find(">", lt + 2)
                if j >= 0:
                    pos = j + 1
                    continue
            elif c1.isascii() and c1.isalpha():
                # pathological start tag — replicate the stdlib exactly
                kind, payload, endpos = _stdlib_starttag_fallback(text, lt)
                if kind == "data":
                    stack[-1].children.append(payload)
                    pos = endpos
                    continue
                if kind == "tag":
                    tag, attr_pairs, self_closing = payload
                    for name, val in attr_pairs:
                        if name not in attr_map:  # first occurrence wins
                            attr_map[name] = val
                    pos = endpos
                # incomplete falls through to the goahead end=1 rule
            if tag is None:
                if c1 in ("!", "?") or c1 == "/" or (
                    c1.isascii() and c1.isalpha()
                ):
                    # html.parser's incomplete-construct rule (goahead,
                    # end=1): emit everything through the NEXT '>'
                    # inclusive as literal text, then resume after it
                    j = text.find(">", lt + 1)
                    if j >= 0:
                        stack[-1].children.append(_unescape(text[lt : j + 1]))
                        pos = j + 1
                        continue
                    # no '>' at all: '<' now, the remainder re-scans
                # bare '<' opening no markup: literal text
                stack[-1].children.append("<")
                pos = lt + 1
                continue
        rule = autoclose_get(tag)
        if rule and stack[-1].tag in rule:
            stack.pop()
        counter += 1
        node = Node(tag=tag, attrs=attr_map, parent=stack[-1], pos=counter)
        elems_append(node)
        stack[-1].children.append(node)
        if not self_closing and tag not in VOID_ELEMENTS:
            if not xml and tag in ("script", "style"):
                # CDATA content: this stdlib (3.11) ends it ONLY at a
                # full '</\s*tag\s*>' closer (set_cdata_mode's
                # `interesting` regex) — '</script x>' or '</scripty>'
                # stay content, and with NO closer the parser breaks in
                # cdata mode and everything from here on is DISCARDED
                # (never flushed, even at close()).
                mclose = _CDATA_CLOSE[tag].search(text, pos)
                if mclose is None:
                    pos = n
                else:
                    if mclose.start() > pos:
                        node.children.append(text[pos : mclose.start()])
                    pos = mclose.end()
            else:
                stack.append(node)
    return root


def parse_html(text: str, xml: bool | None = None) -> Node:
    if xml is None:
        xml = text.lstrip()[:5].lower() == "<?xml"
    import os

    if os.environ.get("WCM_STDLIB_PARSER"):
        builder = _XmlDomBuilder() if xml else _DomBuilder()
        builder.feed(text)
        builder.close()
        root = builder.root
    else:
        root = _fast_parse(text, xml)
    root.xml = xml
    return root


# ---------------------------------------------------------------------------
# Selector engine: tag, #id, .class, [attr], [attr{=,^=,$=,*=,~=}v] with
# the CSS4 case-insensitivity flag [attr=v i], :nth-child(n),
# :nth-of-type(n), :nth-last-child(n), :nth-last-of-type(n),
# :first/last/only-child, :first/last/only-of-type, :not(compound);
# descendant, child (>), adjacent (+) and general (~) sibling combinators
# — the container grammar Mojo::DOM accepts in practice (Mojo.pm:139
# takes any CSS3 selector; these are the forms user scrape code writes).
# ---------------------------------------------------------------------------

_SIMPLE_RE = re.compile(
    r"""
    (?P<tag>[a-zA-Z][\w-]*)
  | \#(?P<id>[\w-]+)
  | \.(?P<cls>[\w-]+)
  | \[(?P<attr>[\w:-]+)
      (?:(?P<op>[\^\$\*~]?=)(?P<quote>['"]?)(?P<val>[^\]'"]*?)(?P=quote)
         (?P<ci>\s+[iI])?)?
    \]
  | :nth-last-child\((?P<nthlast>[^)]+)\)
  | :nth-last-of-type\((?P<nthlastot>[^)]+)\)
  | :nth-child\((?P<nth>[^)]+)\)
  | :nth-of-type\((?P<nthot>[^)]+)\)
  | :first-of-type(?P<firstot>)
  | :last-of-type(?P<lastot>)
  | :first-child(?P<firstc>)
  | :last-child(?P<lastc>)
  | :only-child(?P<onlyc>)
  | :only-of-type(?P<onlyot>)
  | :not\((?P<notsel>[^)]+)\)
""",
    re.VERBOSE,
)


def _parse_nth(expr: str) -> tuple[int, int]:
    """CSS an+b micro-grammar -> (a, b): '3', '2n', '2n+1', '-n+4',
    'odd', 'even'. A 1-based position i matches iff i = a*k + b for some
    integer k >= 0."""
    expr = expr.strip().lower().replace(" ", "")
    if expr == "odd":
        return (2, 1)
    if expr == "even":
        return (2, 0)
    m = re.fullmatch(r"([+-]?\d*)n([+-]\d+)?", expr)
    if m:
        raw_a = m.group(1)
        a = 1 if raw_a in ("", "+") else (-1 if raw_a == "-" else int(raw_a))
        return (a, int(m.group(2) or 0))
    return (0, int(expr))


def _nth_matches(a: int, b: int, i: int) -> bool:
    if a == 0:
        return i == b
    k, r = divmod(i - b, a)
    return r == 0 and k >= 0


def _parse_compound(token: str):
    tests = []
    pos = 0
    while pos < len(token):
        m = _SIMPLE_RE.match(token, pos)
        if not m:
            raise ValueError(f"unsupported selector: {token!r}")
        pos = m.end()
        if m.group("tag"):
            tag = m.group("tag").lower()
            tests.append(lambda n, tag=tag: n.tag == tag)
        elif m.group("id"):
            ident = m.group("id")
            tests.append(lambda n, ident=ident: n.attrs.get("id") == ident)
        elif m.group("cls"):
            cls = m.group("cls")
            tests.append(
                lambda n, cls=cls: cls in (n.attrs.get("class") or "").split()
            )
        elif m.group("notsel"):
            inner = _parse_compound(m.group("notsel").strip())
            tests.append(lambda n, inner=inner: not all(t(n) for t in inner))
        elif m.group("attr"):
            attr = m.group("attr").lower()
            op, val = m.group("op"), m.group("val")
            ci = m.group("ci") is not None  # CSS4 [attr=v i] case flag
            if ci:
                val = val.lower()

            def _av(n, attr=attr, ci=ci):
                v = n.attrs.get(attr) or ""
                return v.lower() if ci else v

            if op is None:
                tests.append(lambda n, attr=attr: attr in n.attrs)
            elif op == "=":
                # exact compare on the raw value (a valueless attr stays
                # None and never equals a string val — pre-ci behavior)
                tests.append(
                    lambda n, attr=attr, val=val, ci=ci: (
                        (lambda v: (v.lower() if ci and v is not None else v) == val)(
                            n.attrs.get(attr)
                        )
                    )
                )
            elif op == "^=":
                tests.append(
                    lambda n, attr=attr, val=val, _av=_av: attr in n.attrs
                    and _av(n).startswith(val)
                )
            elif op == "$=":
                tests.append(
                    lambda n, attr=attr, val=val, _av=_av: attr in n.attrs
                    and _av(n).endswith(val)
                )
            elif op == "*=":
                tests.append(
                    lambda n, attr=attr, val=val, _av=_av: attr in n.attrs
                    and val in _av(n)
                )
            else:  # ~= whitespace-separated word match
                tests.append(
                    lambda n, val=val, _av=_av: val in _av(n).split()
                )
        elif m.group("nth"):
            a, b = _parse_nth(m.group("nth"))
            def nth_test(n, a=a, b=b):
                if n.parent is None:
                    return False
                sibs = n.parent.element_children()
                i = next((j for j, s in enumerate(sibs, 1) if s is n), 0)
                return i > 0 and _nth_matches(a, b, i)
            tests.append(nth_test)
        elif m.group("nthot"):
            a, b = _parse_nth(m.group("nthot"))
            def nthot_test(n, a=a, b=b):
                if n.parent is None:
                    return False
                typed = [c for c in n.parent.element_children() if c.tag == n.tag]
                i = next((j for j, s in enumerate(typed, 1) if s is n), 0)
                return i > 0 and _nth_matches(a, b, i)
            tests.append(nthot_test)
        elif m.group("nthlast"):
            a, b = _parse_nth(m.group("nthlast"))
            def nthlast_test(n, a=a, b=b):
                if n.parent is None:
                    return False
                sibs = n.parent.element_children()
                i = next(
                    (j for j, s in enumerate(reversed(sibs), 1) if s is n), 0
                )
                return i > 0 and _nth_matches(a, b, i)
            tests.append(nthlast_test)
        elif m.group("nthlastot"):
            a, b = _parse_nth(m.group("nthlastot"))
            def nthlastot_test(n, a=a, b=b):
                if n.parent is None:
                    return False
                typed = [c for c in n.parent.element_children() if c.tag == n.tag]
                i = next(
                    (j for j, s in enumerate(reversed(typed), 1) if s is n), 0
                )
                return i > 0 and _nth_matches(a, b, i)
            tests.append(nthlastot_test)
        elif m.group("onlyc") is not None:
            tests.append(
                lambda n: n.parent is not None
                and len(n.parent.element_children()) == 1
            )
        elif m.group("onlyot") is not None:
            tests.append(
                lambda n: n.parent is not None
                and sum(
                    1 for c in n.parent.element_children() if c.tag == n.tag
                ) == 1
            )
        elif m.group("firstot") is not None:
            tests.append(
                lambda n: n.parent is not None
                and next(
                    (c for c in n.parent.element_children() if c.tag == n.tag),
                    None,
                )
                is n
            )
        elif m.group("lastot") is not None:
            tests.append(
                lambda n: n.parent is not None
                and next(
                    (c for c in reversed(n.parent.element_children()) if c.tag == n.tag),
                    None,
                )
                is n
            )
        elif m.group("firstc") is not None:
            tests.append(
                lambda n: n.parent is not None
                and (lambda s: bool(s) and s[0] is n)(n.parent.element_children())
            )
        elif m.group("lastc") is not None:
            tests.append(
                lambda n: n.parent is not None
                and (lambda s: bool(s) and s[-1] is n)(n.parent.element_children())
            )
    return tests


def _tokenize_selector(selector: str) -> list[str]:
    """Split a selector into compound tokens and combinator tokens.

    Char-scan with bracket/paren depth so ``~`` inside ``[attr~=v]`` and
    spaces inside ``:not(...)`` never read as combinators; handles the
    no-space forms (``a.b+c``) the whitespace split could not."""
    toks: list[str] = []
    buf: list[str] = []
    depth = 0
    for ch in selector.strip():
        if ch in "[(":
            depth += 1
            buf.append(ch)
        elif ch in "])":
            depth -= 1
            buf.append(ch)
        elif depth == 0 and ch in ">+~":
            if buf:
                toks.append("".join(buf))
                buf = []
            toks.append(ch)
        elif depth == 0 and ch.isspace():
            if buf:
                toks.append("".join(buf))
                buf = []
        else:
            buf.append(ch)
    if buf:
        toks.append("".join(buf))
    return toks


def _split_top_level(selector: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` outside brackets/parens (selector groups)."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    for ch in selector:
        if ch in "[(":
            depth += 1
        elif ch in "])":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def _compile_selector(selector: str):
    """Compile to (matches_fn, last_tag) — last_tag is the rightmost
    compound's tag requirement (None for attr-only selectors), used to
    bucket selectors for single-pass extraction.

    Combinators: descendant (whitespace), child (>), adjacent sibling (+)
    and general sibling (~); selector GROUPS (``a, b``) match if any
    alternative matches (their last_tag collapses to the shared tag, or
    None — the generic bucket — when alternatives end differently).
    Matching walks right-to-left with backtracking on descendant/
    general-sibling hops, so mixed chains like ``div > ul li + a``
    resolve correctly."""
    group = _split_top_level(selector)
    if len(group) > 1:
        compiled = [_compile_selector(part) for part in group]
        fns = [fn for fn, _ in compiled]
        tags = {tag for _, tag in compiled}
        last = tags.pop() if len(tags) == 1 else None

        def matches_any(node: Node) -> bool:
            return any(fn(node) for fn in fns)

        return matches_any, last
    tokens = _tokenize_selector(selector)
    compounds: list = []
    rels: list[str] = []  # rels[i]: relation between compounds[i] and [i+1]
    pending = " "
    for tok in tokens:
        if tok in (">", "+", "~"):
            pending = tok
            continue
        if compounds:
            rels.append(pending)
        compounds.append(_parse_compound(tok))
        pending = " "
    if not compounds:
        raise ValueError(f"empty selector: {selector!r}")
    last_tok = [t for t in tokens if t not in (">", "+", "~")][-1]
    m = re.match(r"[a-zA-Z][\w-]*", last_tok)
    last_tag = m.group(0).lower() if m else None

    def _match_up(node: Node, idx: int) -> bool:
        if idx < 0:
            return True
        rel = rels[idx]
        if rel in ("+", "~"):
            parent = node.parent
            if parent is None:
                return False
            sibs = parent.element_children()
            # identity scan — Node is a dataclass whose == is deep/recursive
            i = next((j for j, s in enumerate(sibs) if s is node), -1)
            if i < 0:
                return False
            if rel == "+":
                if i == 0:
                    return False
                prev = sibs[i - 1]
                return all(t(prev) for t in compounds[idx]) and _match_up(prev, idx - 1)
            for prev in sibs[:i]:
                if all(t(prev) for t in compounds[idx]) and _match_up(prev, idx - 1):
                    return True
            return False
        anc = node.parent
        if rel == ">":
            return (
                anc is not None
                and anc.tag is not None
                and all(t(anc) for t in compounds[idx])
                and _match_up(anc, idx - 1)
            )
        while anc is not None:
            if anc.tag is not None and all(t(anc) for t in compounds[idx]):
                if _match_up(anc, idx - 1):
                    return True
            anc = anc.parent
        return False

    def matches(node: Node) -> bool:
        if not all(t(node) for t in compounds[-1]):
            return False
        return _match_up(node, len(compounds) - 2)

    return matches, last_tag


_SELECTOR_CACHE: dict[str, object] = {}


def _compiled(selector: str):
    entry = _SELECTOR_CACHE.get(selector)
    if entry is None:
        entry = _compile_selector(selector)
        _SELECTOR_CACHE[selector] = entry
    return entry


def find(root: Node, selector: str) -> list[Node]:
    fn, _ = _compiled(selector)
    return [n for n in root.walk() if fn(n)]


def at(root: Node, selector: str) -> Node | None:
    found = find(root, selector)
    return found[0] if found else None


# ---------------------------------------------------------------------------
# Serialization (Mojo::DOM-compatible: attributes sorted by name, void
# elements unclosed) — practical.t:65-106 pins exact context strings.
# ---------------------------------------------------------------------------


def _esc_attr(v: str) -> str:
    return v.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace('"', "&quot;")


def _esc_text(v: str) -> str:
    return v.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def serialize_node(node: Node) -> str:
    if node.tag is None:
        return "".join(
            serialize_node(c) if isinstance(c, Node) else _esc_text(c) for c in node.children
        )
    parts = [f"<{node.tag}"]
    for k in sorted(node.attrs):
        v = node.attrs[k]
        parts.append(f' {k}="{_esc_attr(v)}"' if v is not None else f" {k}")
    parts.append(">")
    if node.tag in VOID_ELEMENTS and not node.children:
        return "".join(parts)
    for c in node.children:
        if isinstance(c, Node):
            parts.append(serialize_node(c))
        elif node.tag in ("script", "style"):
            parts.append(c)  # CDATA content kept raw
        else:
            parts.append(_esc_text(c))
    parts.append(f"</{node.tag}>")
    return "".join(parts)


# ---------------------------------------------------------------------------
# Handler presets (ScraperUtil.pm:40-129)
# ---------------------------------------------------------------------------


def _perl_truthy(v) -> bool:
    return v is not None and v != "" and v != "0"


def weave_form(form: Node):
    """Form → (action, METHOD, [(name, value), ...]) per ScraperUtil.pm:52-112.

    Quirks kept on purpose: disabled controls are included; only the first
    submit/image contributes (its value only if named); selects fall back to
    every first-child option; checkbox/radio need ``checked``; Perl-falsy
    names ('', '0') create no parameter.
    """
    seed: dict[str, list] = {}
    order: list[str] = []
    submit_seen = False

    matched = [
        n
        for n in form.iter()
        if n is not form
        and n.tag is not None
        and ("name" in n.attrs or n.attrs.get("type") in ("submit", "image"))
    ]
    for e in matched:
        name = e.attrs.get("name")
        named = _perl_truthy(name)
        if named and name not in seed:
            seed[name] = []
            order.append(name)

        if e.tag == "select" and named:
            found = 0
            if "multiple" in e.attrs:
                for opt in find(e, "option[selected]"):
                    seed[name].append(opt.attrs.get("value"))
                    found += 1
            else:
                opt = at(e, "option[selected]")
                if opt is not None:
                    seed[name].append(opt.attrs.get("value"))
                    found += 1
            if not found:
                for opt in find(e, "option:nth-child(1)"):
                    seed[name].append(opt.attrs.get("value"))
        elif e.tag == "textarea" and named:
            seed[name].append(e.text)

        etype = e.attrs.get("type")
        if not _perl_truthy(etype):
            continue
        if not submit_seen and etype in ("submit", "image"):
            submit_seen = True
            if named:
                seed[name].append(e.attrs.get("value"))
        if named:
            if etype in ("text", "hidden", "number", "password", "date"):
                seed[name].append(e.attrs.get("value"))
            elif etype in ("checkbox", "radio"):
                if "checked" in e.attrs:
                    seed[name].append(e.attrs.get("value"))

    pairs = [(n, v if v is not None else "") for n in order for v in seed[n]]
    action = form.attrs.get("action") or ""
    method = (form.attrs.get("method") or "GET").upper()
    return action, method, pairs


_REFRESH_RE = re.compile(r"URL=(.+)", re.IGNORECASE | re.DOTALL)


def _meta_refresh(node: Node):
    http_equiv = node.attrs.get("http-equiv") or ""
    if not re.match(r"refresh", http_equiv, re.IGNORECASE):
        return []
    m = _REFRESH_RE.search(node.attrs.get("content") or "")
    return [m.group(1)] if m else []


# Each preset returns a list of results; a result is a URL string or a
# ("form", action, method, pairs) tuple. Order of dict insertion is
# irrelevant — extraction iterates ASCII-sorted keys (Mojo.pm:140).
HANDLER_PRESETS = {
    "script[src]": lambda n: [n.attrs.get("src")],
    "link[href]": lambda n: [n.attrs.get("href")],
    "a[href]": lambda n: [n.attrs.get("href")],
    "img[src]": lambda n: [n.attrs.get("src")],
    "area": lambda n: [n.attrs.get("href"), n.attrs.get("ping")],
    "embed[src]": lambda n: [n.attrs.get("src")],
    "frame[src]": lambda n: [n.attrs.get("src")],
    "iframe[src]": lambda n: [n.attrs.get("src")],
    "input[src]": lambda n: [n.attrs.get("src")],
    "object[data]": lambda n: [n.attrs.get("data")],
    "form": lambda n: [("form",) + weave_form(n)],
    "meta[content]": _meta_refresh,
    "style": lambda n: collect_urls_css(n.text),
    "[style]": lambda n: collect_urls_css(n.attrs.get("style")),
    "urlset[xmlns^=http://www.sitemaps.org/schemas/sitemap/]": lambda n: [
        loc.text for loc in find(n, "url loc")
    ],
}

_HTMLISH_CT = re.compile(r"^(text|application)/(html|xml|xhtml)")
_CSS_CT = re.compile(r"text/css")


# preset keys in the ASCII-sorted emit order the generic path produces
_PRESET_KEYS_SORTED = sorted(HANDLER_PRESETS)
_SITEMAP_KEY = "urlset[xmlns^=http://www.sitemaps.org/schemas/sitemap/]"
# tag -> (key, handler, required attr or None) for the single-attr presets
_FAST_TAG_PRESETS = {
    tag: (key, HANDLER_PRESETS[key], need)
    for tag, (key, need) in {
        "script": ("script[src]", "src"),
        "link": ("link[href]", "href"),
        "a": ("a[href]", "href"),
        "img": ("img[src]", "src"),
        "area": ("area", None),
        "embed": ("embed[src]", "src"),
        "frame": ("frame[src]", "src"),
        "iframe": ("iframe[src]", "src"),
        "input": ("input[src]", "src"),
        "object": ("object[data]", "data"),
        "form": ("form", None),
        "meta": ("meta[content]", "content"),
        "style": ("style", None),
    }.items()
}


def _collect_presets_fast(dom: Node):
    """One walk, direct tag switch — semantically identical to compiling
    the 15 preset selectors, minus the matcher machinery (the hot ~45% of
    extraction CPU on real pages). Containers / custom handlers take the
    generic compiled path instead. Also returns the first base[href]
    element found on the same walk (document order — exactly what
    ``at(dom, "base[href]")`` would return) so the caller skips a second
    full-tree matcher scan per page."""
    out: dict = {k: [] for k in _PRESET_KEYS_SORTED}
    style_hits = out["[style]"]
    style_handler = HANDLER_PRESETS["[style]"]
    xml = getattr(dom, "xml", False)
    base_node = None
    for node in dom.walk():
        # base detection BEFORE the XML script guard: at("base[href]")
        # applies no such filter, and this must return exactly what it
        # would
        if base_node is None and node.tag == "base" and "href" in node.attrs:
            base_node = node
        if xml and node.has_script_ancestor():
            continue
        attrs = node.attrs
        hit = _FAST_TAG_PRESETS.get(node.tag)
        if hit is not None:
            key, handler, need = hit
            if need is None or need in attrs:
                out[key].append((node, handler))
        elif node.tag == "urlset" and (attrs.get("xmlns") or "").startswith(
            "http://www.sitemaps.org/schemas/sitemap/"
        ):
            out[_SITEMAP_KEY].append((node, HANDLER_PRESETS[_SITEMAP_KEY]))
        if "style" in attrs:
            style_hits.append((node, style_handler))
    return out, base_node


def extract_links(
    url: str,
    content_type: str | None,
    content_length: int | None,
    body: bytes | str | None,
    containers=None,
    handlers=None,
):
    """One fetched page → ordered candidate link dicts (the scrape stage).

    Mirrors WWW::Crawler::Mojo::scrape (Mojo.pm:125-159): guard on
    content_length+body, base-tag resolution, sorted-selector extraction for
    HTML/XML, css url() sweep for text/css. Returns list of dicts with keys:
    emit_idx, literal_uri, method, params (serialized), tag, context,
    context_kind, base — resolution/scheme-filtering happens downstream
    (operators.resolve) so this stage stays a pure parse.
    """
    from .urlkit import resolve_href, serialize_params

    if not content_length or body is None or body == b"" or body == "":
        return []

    items = []
    emit_idx = 0
    base = url

    if content_type and _HTMLISH_CT.match(content_type):
        text = decode_body(content_type, body)
        dom = parse_html(text)

        if containers is None and handlers is None:
            # Hot path: the preset selectors have fixed shapes (tag +
            # optional single attr), so a direct tag switch replaces the
            # compiled-matcher machinery — and the same walk yields the
            # base[href] element, saving a second full-tree scan. Output
            # is identical to the generic path (A/B-pinned in
            # tests/test_htmlkit.py).
            matches_by_key, base_tag = _collect_presets_fast(dom)
        else:
            matches_by_key = None
            base_tag = at(dom, "base[href]")
        if base_tag is not None:
            base = resolve_href(url, base_tag.attrs.get("href") or "")
        if containers is None:
            containers = [None]
        elif isinstance(containers, str):
            containers = [containers]

        if matches_by_key is None:
            # User handlers REPLACE the presets wholesale, like the
            # reference's html_handlers attribute (Mojo.pm:14,253-261;
            # exercised by t/collect_urls.t custom handlers). A handler
            # maps a selector to a callable(node) returning a URL string,
            # a list of strings, or a ('form', action, method, pairs)
            # tuple.
            active = HANDLER_PRESETS if handlers is None else handlers
            keyed = {}
            for sel, handler in active.items():
                for cont in containers:
                    key = (cont + " " + sel) if cont else sel
                    keyed[key] = (key if cont else sel, handler)

            # Single-pass extraction: one document-order walk, selectors
            # bucketed by their rightmost tag (a per-selector tree scan is
            # O(selectors × nodes) — the old hot spot). Emit order is
            # unchanged: matches collect per selector key, then flush in
            # ASCII-sorted key order (Mojo.pm:140).
            by_tag: dict = {}
            universal = []
            for key in keyed:
                selector, handler = keyed[key]
                fn, last_tag = _compiled(selector)
                entry = (key, fn, handler)
                if last_tag is None:
                    universal.append(entry)
                else:
                    by_tag.setdefault(last_tag, []).append(entry)

            matches_by_key = {k: [] for k in keyed}
            xml = getattr(dom, "xml", False)
            for node in dom.walk():
                if xml and node.has_script_ancestor():
                    continue
                for key, fn, handler in by_tag.get(node.tag, ()):
                    if fn(node):
                        matches_by_key[key].append((node, handler))
                for key, fn, handler in universal:
                    if fn(node):
                        matches_by_key[key].append((node, handler))

        for key in sorted(matches_by_key):
            for node, handler in matches_by_key[key]:
                out = handler(node)
                if out is None:
                    out = []
                elif isinstance(out, (str, tuple)):
                    out = [out]  # user handlers may return a bare value
                for result in out:
                    if isinstance(result, tuple):
                        _, action, method, pairs = result
                        items.append(
                            dict(
                                emit_idx=emit_idx,
                                literal_uri=action,
                                method=method,
                                params=serialize_params(pairs),
                                tag=node.tag,
                                context=serialize_node(node),
                                context_kind="dom",
                                base=base,
                            )
                        )
                        emit_idx += 1
                    elif _perl_truthy(result):  # Perl-truthy: '0' is dropped
                        # (Mojo.pm emits `push ... if $_` — Perl falsy '0')
                        items.append(
                            dict(
                                emit_idx=emit_idx,
                                literal_uri=result,
                                method=None,
                                params=None,
                                tag=node.tag,
                                context=serialize_node(node),
                                context_kind="dom",
                                base=base,
                            )
                        )
                        emit_idx += 1

    if content_type and _CSS_CT.search(content_type):
        text = decode_body(content_type, body)
        for u in collect_urls_css(text):
            items.append(
                dict(
                    emit_idx=emit_idx,
                    literal_uri=u,
                    method=None,
                    params=None,
                    tag=None,
                    context=url,
                    context_kind="url",
                    base=base,
                )
            )
            emit_idx += 1

    return items
