"""Column-level building blocks: JVM-side where possible, Arrow UDFs else.

Design rule (SURVEY.md §4.3): everything expressible with built-in
``pyspark.sql.functions`` stays JVM-side inside whole-stage codegen — the
MD5 digest (D1), host-salt partitioning, scheme extraction. Only genuinely
Pythonic kernels (RFC-3986-with-quirks resolution, IDNA host keys) run as
vectorized pandas UDFs over Arrow batches, never per-row Python.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType, StructField, StructType

from ..urlkit import SCHEME_ALLOW, host_key, resolve_href

__all__ = [
    "digest_col",
    "host_key_udf",
    "resolve_href_udf",
    "decode_body_udf",
    "host_salt_col",
    "scheme_col",
    "scheme_filter",
]


def digest_col(url: Column, method: Column | None = None, params: Column | None = None) -> Column:
    """MD5 over url+method+params — byte parity with Job.pm:77-82, computed
    entirely JVM-side (F.md5 hashes the UTF-8 bytes, same as Perl md5_sum)."""
    method = method if method is not None else F.lit(None).cast("string")
    params = params if params is not None else F.lit(None).cast("string")
    return F.md5(
        F.concat(url, F.coalesce(method, F.lit("")), F.coalesce(params, F.lit("")))
    )


@pandas_udf(StringType())
def host_key_udf(urls: pd.Series) -> pd.Series:
    """Vectorized politeness key (UserAgent.pm:65-74): scheme://ihost[:port],
    IDNA-normalized, well-known ports elided, NULL for non-http(s)."""
    return urls.map(lambda u: host_key(u) if u is not None else None)


@pandas_udf(StringType())
def resolve_href_udf(bases: pd.Series, hrefs: pd.Series) -> pd.Series:
    """Vectorized resolve_href (ScraperUtil.pm:147-156 semantics)."""
    return pd.Series(
        [
            resolve_href(b, h) if (b is not None and h is not None) else None
            for b, h in zip(bases, hrefs)
        ]
    )


# DataType objects, not a DDL string: module-level @pandas_udf("ddl")
# needs an active session to parse the DDL in pyspark 4.1.2 and would
# crash plain `import wcm_spark.functions.core`
@pandas_udf(
    StructType(
        [StructField("encoding", StringType()), StructField("text", StringType())]
    )
)
def decode_body_udf(content_types: pd.Series, bodies: pd.Series) -> pd.DataFrame:
    """Vectorized P1 charset guess + decode (ScraperUtil.pm:17-38).

    Returns (encoding, text): ``encoding`` is the charset as DECLARED —
    Content-Type param, else <meta http-equiv> inside <head>, else CSS
    @charset — NULL when nothing declares one; ``text`` is the body
    decoded with that charset, falling back to utf-8 when undeclared or
    unknown to the codec registry (ScraperUtil.pm:22-28 ``encoder``)."""
    from ..urlkit import decode_body, guess_encoding

    encs, texts = [], []
    for ct, b in zip(content_types, bodies):
        if b is None:
            encs.append(None)
            texts.append(None)
            continue
        encs.append(guess_encoding(ct, b))
        texts.append(decode_body(ct, b))
    return pd.DataFrame({"encoding": encs, "text": texts})


def host_salt_col(host_key_c: Column, salts: int = 64) -> Column:
    """Skew-aware partitioning salt: pmod(xxhash64(host_key), salts).

    A mega-host never concentrates more than 1/salts of a stage because the
    frontier is hash-distributed on (host_key, salt) — the per-host
    politeness cap bounds per-wave work for the same host anyway (F1)."""
    return F.pmod(F.xxhash64(F.coalesce(host_key_c, F.lit(""))), F.lit(salts)).cast("int")


def scheme_col(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1))


def scheme_filter(url: Column) -> Column:
    """R2 scheme allowlist (Mojo.pm:177) as a JVM-side predicate."""
    return scheme_col(url).isin(*sorted(SCHEME_ALLOW))
