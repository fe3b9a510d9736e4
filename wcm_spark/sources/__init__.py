"""Fetch sources: where page bytes come from.

- ``httpfetch`` — live network fetch (S3 real mode), batched + threaded
  inside mapInPandas. Reference: lib/WWW/Crawler/Mojo.pm:83-111.
- corpus-join test/bench fetch lives on the Crawler itself
  (scheduler._fetch_wave) since it is entangled with the redirect closure.
"""

from .httpfetch import FETCHED_SCHEMA, http_fetch_wave

__all__ = ["http_fetch_wave", "FETCHED_SCHEMA"]
