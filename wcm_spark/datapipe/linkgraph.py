"""Crawl link graph: engine-derived page graph + DuckDB graph oracles.

Chains the engine's own extraction pipeline into graph analytics: the
fixture corpus → `scrape_edges` (P1-P9) → `resolve_children` (R1-R5) →
5-hop redirect closure (F9) → the distinct page-to-page link graph,
restricted to HTML/XML page nodes. `operators/graph.py` then computes
PageRank, components and degrees over it.

The oracles rebuild the SAME graph independently in DuckDB — reusing
fixtures._edges_sql's regex extraction over the shared pyarrow parquet,
the crawl oracle's resolution CASE and redirect closure — and unroll
the fixed-iteration algorithms as SQL CTE chains. All graph arithmetic
is integral (see operators/graph.py), so the driver's value-hash
compare is exact.
"""

from __future__ import annotations

from .fixtures import (
    _edges_sql,
    fixture_corpus_path,
    redirect_closure_sql,
    resolve_case_sql,
)

__all__ = [
    "GRAPH_FIXTURE",
    "graph_nodes_edges",
    "pagerank_oracle_sql",
    "components_oracle_sql",
    "degree_oracle_sql",
    "hits_oracle_sql",
    "triangles_oracle_sql",
    "HITS_ITERS",
    "PR_ITERS",
    "COMP_ITERS",
]

# (n_sites, pages_per_site, with_images) — 3 sites x 10 pages, no image
# payloads: ~33 nodes with per-site nav structure, cross-site links,
# redirect chains and sitemap fan-out.
GRAPH_FIXTURE = (3, 10, False)
PR_ITERS = 5
COMP_ITERS = 8

_HTML_RE = "^(text|application)/(html|xml|xhtml)"


def graph_nodes_edges(spark):
    """(nodes, edges) DataFrames of the fixture link graph, engine-built.

    nodes: every corpus page DuckDB's ``htmlsrc`` admits (markup content
    type, non-empty body). edges: distinct (src, dst) where src is a
    node, dst is the redirect-closed resolution of a non-form extracted
    link, and dst is also a node. The edge frame is the per-iteration
    probe side of the graph loops — persist() so scrape+resolve run
    once, not once per iteration.
    """
    from pyspark.sql import functions as F

    from ..operators.scrape import resolve_children, scrape_edges

    corpus = spark.read.parquet(fixture_corpus_path(*GRAPH_FIXTURE))
    html = corpus.filter(
        F.col("content_type").rlike(_HTML_RE)
        & (F.col("content_length") > 0)
        & F.col("body").isNotNull()
        & (F.length("body") > 0)
    ).cache()
    nodes = html.select("url")

    links = resolve_children(
        scrape_edges(html).filter(F.col("method").isNull())
    ).select(F.col("referrer_url").alias("src"), F.col("url").alias("ru"))

    red = corpus.filter(F.col("redirect_to").isNotNull()).select(
        F.col("url").alias("rsrc"), F.col("redirect_to").alias("final")
    )
    clos = red
    for _ in range(4):  # 5 hops total, matching the scheduler's cap (F9)
        clos = (
            clos.alias("c")
            .join(
                red.select(
                    F.col("rsrc").alias("nsrc"), F.col("final").alias("nfin")
                ),
                F.col("c.final") == F.col("nsrc"),
                "left",
            )
            .select(
                F.col("c.rsrc").alias("rsrc"),
                F.coalesce("nfin", F.col("c.final")).alias("final"),
            )
        )

    edges = (
        links.join(clos, links["ru"] == clos["rsrc"], "left")
        .select("src", F.coalesce("final", "ru").alias("dst"))
        .join(nodes.select(F.col("url").alias("dst")), "dst", "leftsemi")
        .distinct()
    )
    return nodes, edges


# ---------------------------------------------------------------------------
# DuckDB oracles: same graph, same fixed-point iterations, unrolled SQL
# ---------------------------------------------------------------------------


def _graph_sql_prefix() -> str:
    """CTE chain ending in gnodes(url) / gedges(src, dst)."""
    path = fixture_corpus_path(*GRAPH_FIXTURE)
    return f"""WITH {_edges_sql(path)},
{redirect_closure_sql()},
gnodes AS MATERIALIZED (SELECT page_url AS url FROM htmlsrc),
rawlinks AS (
  SELECT page_url AS src,
         {resolve_case_sql()} AS ru
  FROM (SELECT page_url, trim(lit) AS t FROM edges WHERE method IS NULL)
),
gedges AS MATERIALIZED (
  SELECT DISTINCT l.src, coalesce(cl.final, l.ru) AS dst
  FROM rawlinks l
  JOIN gnodes ns ON l.src = ns.url
  LEFT JOIN clos cl ON l.ru = cl.src
  JOIN gnodes nd ON coalesce(cl.final, l.ru) = nd.url
  WHERE l.ru IS NOT NULL
)"""


def pagerank_oracle_sql(iters: int = PR_ITERS) -> str:
    from ..operators.graph import BASE_MICRO, DAMP_PCT, INIT_MICRO

    parts = [
        _graph_sql_prefix(),
        ",\noutdeg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM gedges GROUP BY src)",
        f",\npr_0 AS (SELECT url, CAST({INIT_MICRO} AS BIGINT) AS rank_micro FROM gnodes)",
    ]
    for k in range(1, iters + 1):
        parts.append(f""",
pr_{k} AS MATERIALIZED (
  SELECT n.url,
         CAST({BASE_MICRO} + ({DAMP_PCT} * coalesce(s.s, 0)) // 100 AS BIGINT) AS rank_micro
  FROM gnodes n LEFT JOIN (
    SELECT e.dst AS url, sum(p.rank_micro // d.outdeg) AS s
    FROM gedges e
    JOIN pr_{k - 1} p ON p.url = e.src
    JOIN outdeg d ON d.src = e.src
    GROUP BY e.dst
  ) s ON s.url = n.url
)""")
    parts.append(f"\nSELECT url, rank_micro FROM pr_{iters}")
    return "".join(parts)


def components_oracle_sql(iters: int = COMP_ITERS) -> str:
    parts = [
        _graph_sql_prefix(),
        """,
und AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM gedges
  UNION
  SELECT dst, src FROM gedges
)""",
        ",\nlbl_0 AS (SELECT url, url AS component FROM gnodes)",
    ]
    for k in range(1, iters + 1):
        parts.append(f""",
lbl_{k} AS MATERIALIZED (
  SELECT n.url, least(n.component, coalesce(m.ml, n.component)) AS component
  FROM lbl_{k - 1} n LEFT JOIN (
    SELECT u.a AS url, min(l.component) AS ml
    FROM und u JOIN lbl_{k - 1} l ON l.url = u.b
    GROUP BY u.a
  ) m ON m.url = n.url
)""")
    parts.append(f"\nSELECT url, component FROM lbl_{iters}")
    return "".join(parts)


def degree_oracle_sql() -> str:
    return f"""{_graph_sql_prefix()}
SELECT n.url,
       CAST(coalesce(o.c, 0) AS BIGINT) AS out_deg,
       CAST(coalesce(i.c, 0) AS BIGINT) AS in_deg
FROM gnodes n
LEFT JOIN (SELECT src, count(*) AS c FROM gedges GROUP BY src) o ON o.src = n.url
LEFT JOIN (SELECT dst, count(*) AS c FROM gedges GROUP BY dst) i ON i.dst = n.url"""


HITS_ITERS = 5


def hits_oracle_sql(iters: int = HITS_ITERS) -> str:
    """Unrolled integerized HITS (operators/graph.py::hits): per
    iteration authorities from current hubs then hubs from the NEW
    authorities, each L-infinity-rescaled in integer micro-units
    ``(raw * 10^6) // max(raw)`` — max/sum are order-independent, so
    the value-hash compare against the Spark operator is exact."""
    from ..operators.graph import INIT_MICRO

    parts = [
        _graph_sql_prefix(),
        f",\nhub_0 AS (SELECT url, CAST({INIT_MICRO} AS BIGINT) AS hub_micro FROM gnodes)",
    ]
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(f""",
araw_{k} AS MATERIALIZED (
  SELECT e.dst AS url, sum(h.hub_micro) AS raw
  FROM gedges e JOIN hub_{p} h ON h.url = e.src GROUP BY e.dst
),
auth_{k} AS MATERIALIZED (
  SELECT n.url,
         CAST((coalesce(a.raw, 0) * {INIT_MICRO})
              // (SELECT greatest(max(raw), 1) FROM araw_{k}) AS BIGINT) AS auth_micro
  FROM gnodes n LEFT JOIN araw_{k} a ON a.url = n.url
),
hraw_{k} AS MATERIALIZED (
  SELECT e.src AS url, sum(a.auth_micro) AS raw
  FROM gedges e JOIN auth_{k} a ON a.url = e.dst GROUP BY e.src
),
hub_{k} AS MATERIALIZED (
  SELECT n.url,
         CAST((coalesce(h.raw, 0) * {INIT_MICRO})
              // (SELECT greatest(max(raw), 1) FROM hraw_{k}) AS BIGINT) AS hub_micro
  FROM gnodes n LEFT JOIN hraw_{k} h ON h.url = n.url
)""")
    parts.append(
        f"\nSELECT a.url, a.auth_micro, h.hub_micro"
        f"\nFROM auth_{iters} a JOIN hub_{iters} h ON h.url = a.url"
    )
    return "".join(parts)


def triangles_oracle_sql() -> str:
    """Per-node triangle counts (operators/graph.py::triangles): the same
    canonical a < b edge list, ordered wedge join, closure against the
    edge list, and 3-corner credit — rebuilt from the fixture parquet."""
    return f"""{_graph_sql_prefix()},
canon AS MATERIALIZED (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b
  FROM gedges WHERE src <> dst
  GROUP BY 1, 2
),
tri AS MATERIALIZED (
  SELECT ab.a AS ta, ab.b AS tb, bc.b AS tc
  FROM canon ab
  JOIN canon bc ON bc.a = ab.b
  JOIN canon ac ON ac.a = ab.a AND ac.b = bc.b
),
corners AS (
  SELECT ta AS url FROM tri
  UNION ALL SELECT tb FROM tri
  UNION ALL SELECT tc FROM tri
)
SELECT n.url, CAST(coalesce(c.t, 0) AS BIGINT) AS triangles
FROM gnodes n
LEFT JOIN (SELECT url, count(*) AS t FROM corners GROUP BY url) c
  ON c.url = n.url"""
