"""Fixture-oracle self-checks: the DuckDB oracle programs must agree with
the pure-Python simulator / direct kernel calls, independently of Spark.

These are the fast halves of the three-way agreement the driver gate
completes: engine == oracle is pinned in test_oracle_parity (Spark);
oracle == simulator is pinned HERE (pure CPU) — so an oracle bug and an
engine bug can never cancel each other out.
"""

import duckdb

from wcm_spark.datapipe import fixtures as fx


def test_crawl_bfs_oracle_matches_simulator():
    _, visits, _ = fx.simulate_crawl_waves(*fx.CRAWL_FIXTURE)
    rows = duckdb.connect().execute(fx.crawl_bfs_oracle_sql()).fetchall()
    expected = [(i, u, s, d) for i, (u, s, d) in enumerate(visits)]
    assert rows == expected


def test_scrape_oracle_matches_extract_links():
    from wcm_spark.corpus import corpus_rows
    from wcm_spark.htmlkit import extract_links

    got = sorted(
        duckdb.connect().execute(fx.scrape_edges_oracle_sql()).fetchall()
    )
    expected = sorted(
        (r["url"], it["emit_idx"], it["literal_uri"], it["tag"], it["context_kind"])
        for r in corpus_rows(*fx.SCRAPE_FIXTURE)
        for it in extract_links(
            r["url"], r["content_type"], r["content_length"], r["body"]
        )
    )
    assert got == expected


def test_fixture_parquet_roundtrip_and_content_addressing():
    import pyarrow.parquet as pq

    from wcm_spark.corpus import corpus_rows

    path = fx.fixture_corpus_path(*fx.SCRAPE_FIXTURE)
    assert path == fx.fixture_corpus_path(*fx.SCRAPE_FIXTURE)  # stable
    table = pq.read_table(path)
    rows = corpus_rows(*fx.SCRAPE_FIXTURE)
    assert table.num_rows == len(rows)
    urls = table.column("url").to_pylist()
    assert urls == [r["url"] for r in rows]
    bodies = table.column("body").to_pylist()
    assert bodies[0] == rows[0]["body"]


def test_multimodal_oracles_are_wellformed_sql():
    con = duckdb.connect()
    # image/resize oracles are self-contained VALUES selects
    assert len(con.execute(fx.multimodal_image_meta_oracle_sql()).fetchall()) > 0
    assert len(con.execute(fx.multimodal_resize_oracle_sql()).fetchall()) > 0
    assert len(con.execute(fx.image_pipeline_oracle_sql()).fetchall()) > 0
