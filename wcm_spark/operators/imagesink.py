"""S7: image+caption payload sink (north rule, BASELINE.json:14-15).

The reference has no image pipeline — the north rule adds one: fetched
image bodies persist to an Iceberg-shaped table
``(image_id, bytes, w, h, fmt, caption, phash)`` with decoded-pixel
fidelity guarantees (PSNR >= 40 dB lossy / bit-exact lossless) and caption
equality, tested in tests/test_images.py.

Captions ride the crawl lineage: the scraping stage recorded the serialized
``<img alt=...>`` element as the child's context (Job._context analog,
Job.pm:21-31); this operator parses the alt back out — no side channel.
Decode + phash run in one Arrow-batched mapInPandas so image bytes cross
the Python boundary exactly once.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..htmlkit import parse_html
from ..images import decode_image, phash64

__all__ = ["extract_image_rows", "IMAGE_SCHEMA", "write_images"]

IMAGE_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)


def _caption_from_context(context: str | None) -> str | None:
    if not context:
        return None
    try:
        dom = parse_html(context)
        for node in dom.iter():
            if node.tag is not None and "alt" in node.attrs:
                return node.attrs.get("alt")
    except Exception:
        return None
    return None


def extract_image_rows(fetched: DataFrame) -> DataFrame:
    """Fetched wave rows with image bodies → typed image table rows."""
    imgs = fetched.filter(
        F.col("status").isNotNull()
        & F.col("content_type").startswith("image/")
        & F.col("body").isNotNull()
    ).select("url", "body", "context")

    def decode_batch(batches):
        for pdf in batches:
            rows = []
            for url, body, context in zip(pdf["url"], pdf["body"], pdf["context"]):
                try:
                    arr, fmt = decode_image(body)
                except NotImplementedError:
                    # real-codec payload without an image lib: keep the
                    # bytes, leave decode-derived columns NULL (plumbing
                    # stays real; see wcm_spark/images.py)
                    rows.append((url, bytes(body), None, None, None,
                                 _caption_from_context(context), None))
                    continue
                rows.append(
                    (
                        url, bytes(body), int(arr.shape[1]), int(arr.shape[0]), fmt,
                        _caption_from_context(context), phash64(arr),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )

    return imgs.mapInPandas(decode_batch, schema=IMAGE_SCHEMA)


def write_images(images: DataFrame, store, table: str = "images") -> int:
    """Append image rows to the snapshot store (Iceberg writeTo analog)."""
    return store.commit(table, images, mode="append")
