"""Scalar crawl-loop kernel + pure-Python reference simulator.

``make_child`` is the resolve/filter/project stage (R1-R5 in SURVEY.md §2.5,
reference: lib/WWW/Crawler/Mojo.pm:169-188) shared between the Spark UDF
batch layer and the simulator.

``CrawlSimulator`` replays the reference's whole fetch-parse-enqueue loop
(lib/WWW/Crawler/Mojo.pm:54-111 with max_conn=1 ⇒ strict FIFO BFS,
lib/WWW/Crawler/Mojo/Queue/Memory.pm:37-46 dedup-at-enqueue semantics)
against an in-memory corpus. It is the *oracle* the distributed engine's
visit order and URL-seen set are asserted against — ordering parity is the
north-rule contract.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .htmlkit import extract_links
from .urlkit import SCHEME_ALLOW, append_query, job_digest, resolve_href, url_scheme

__all__ = ["make_child", "CrawlSimulator", "CorpusPage"]


def make_child(
    literal_uri: str,
    base: str,
    method: str | None = None,
    params: str | None = None,
    redundancy=None,
):
    """Resolve one extracted link into a child-job tuple or None.

    Returns (url, method, tx_params, digest):
    - resolve against the page base (R1)
    - scheme allowlist http/https/ftp/ws/wss (R2, Mojo.pm:177)
    - GET forms append params to the action's query (R3, Mojo.pm:179)
    - POST forms carry params as the tx body (R4, Mojo.pm:184-185)
    - digest = md5(url + method + tx_params) (D1, Job.pm:77-82)
    """
    resolved = resolve_href(base, literal_uri)
    scheme = url_scheme(resolved)
    if scheme not in SCHEME_ALLOW:
        return None
    tx_params = None
    if method == "GET" and params:
        resolved = append_query(resolved, params)
    elif method == "POST" and params:
        tx_params = params
    # D1 default: md5(url + method + tx_params) (Job.pm:77-82). A user
    # ``redundancy`` callable replaces the key function wholesale, like
    # $bot->queue->redundancy(sub {...}) (reference README.md:158-160) —
    # e.g. ignore query strings, or canonicalize tracking params away.
    if redundancy is not None:
        digest = str(redundancy(resolved, method, tx_params))
    else:
        digest = job_digest(resolved, method, tx_params)
    return resolved, method, tx_params, digest


@dataclass
class CorpusPage:
    url: str
    status: int | None = 200
    content_type: str | None = "text/html"
    content_length: int | None = None
    body: bytes | str | None = None
    redirect_to: str | None = None

    def __post_init__(self):
        if self.content_length is None and self.body is not None:
            self.content_length = len(self.body)


@dataclass
class CrawlSimulator:
    """Single-threaded replay of the reference loop over a static corpus.

    max_conn=1 politeness (the reference default, Mojo.pm:15-16) makes the
    tick loop equivalent to a strict FIFO drain; the queue's
    dedup-at-enqueue, requeue-marks-anyway and cap-drops-newcomer semantics
    are replicated exactly (Queue/Memory.pm:37-46, t/queue.t:33-54).
    """

    corpus: dict[str, CorpusPage]
    cap: int | None = None
    max_redirects: int = 5
    max_depth: int | None = None
    robots: object | None = None  # RobotsCache; None = reference behavior

    visit_order: list[str] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    errors: list[str] = field(default_factory=list)
    queue: list = field(default_factory=list)

    def enqueue(self, url: str, method=None, tx_params=None, depth=0, requeue=False) -> bool:
        if self.robots is not None:
            from .urlkit import host_key

            if not self.robots.allowed(host_key(url), url):
                return False  # disallowed candidates never get marked
        digest = job_digest(url, method, tx_params)
        if not requeue and digest in self.seen:
            return False
        if self.cap is not None and self.cap < len(self.queue):
            return False  # dropped job is NOT marked seen (Queue/Memory.pm:42-44)
        self.queue.append((url, method, tx_params, depth))
        self.seen.add(digest)
        return True

    def _fetch(self, url: str):
        """Follow redirect_to chains up to max_redirects (Mojo.pm:50)."""
        hops = 0
        cur = self.corpus.get(url)
        while cur is not None and cur.redirect_to and hops < self.max_redirects:
            nxt = self.corpus.get(cur.redirect_to)
            if nxt is None:
                return cur.redirect_to, None
            cur = nxt
            hops += 1
        return (cur.url if cur else url), cur

    def crawl(self):
        while self.queue:
            url, method, tx_params, depth = self.queue.pop(0)
            final_url, page = self._fetch(url)
            if page is None or page.status is None:
                self.errors.append(url)
                continue
            self.visit_order.append(final_url)
            if self.max_depth is not None and depth >= self.max_depth:
                continue
            items = extract_links(
                final_url, page.content_type, page.content_length, page.body
            )
            for item in items:
                child = make_child(
                    item["literal_uri"], item["base"], item["method"], item["params"]
                )
                if child is None:
                    continue
                curl, cmethod, cparams, _ = child
                self.enqueue(curl, cmethod, cparams, depth + 1)
        return self
