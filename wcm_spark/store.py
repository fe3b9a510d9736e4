"""Snapshot table store: atomic append/overwrite over parquet + manifest.

Plays the role Iceberg tables play in the north rule (BASELINE.json:14):
ACID commits, snapshot ids, time travel — the frontier/seen/visits/images
tables commit once per wave so a crawl is resumable from the last committed
wave. The interface is deliberately Iceberg-shaped (``append``/
``overwrite``/``read(version=)``/snapshot metadata): on a cluster with the
Iceberg runtime the implementation swaps to ``writeTo(...).append()`` and
``VERSION AS OF`` with no caller changes. This container has no Iceberg
jars, so commits are parquet directories + an atomically-replaced JSON
manifest (write-temp + ``os.replace``), which gives the same
reader-isolation guarantee on a posix filesystem.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["TableStore"]


class TableStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _table_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self._table_dir(name), "manifest.json")

    def _load_manifest(self, name: str) -> dict:
        path = self._manifest_path(name)
        if not os.path.exists(path):
            return {"current": 0, "snapshots": []}
        with open(path) as f:
            return json.load(f)

    def _commit_manifest(self, name: str, manifest: dict) -> None:
        path = self._manifest_path(name)
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, path)  # atomic snapshot swap

    def commit(self, name: str, df: DataFrame, mode: str = "append", meta: dict | None = None) -> int:
        """Write ``df`` as a new snapshot; returns the snapshot version."""
        assert mode in ("append", "overwrite")
        manifest = self._load_manifest(name)
        version = manifest["current"] + 1
        data_dir = os.path.join(self._table_dir(name), f"v{version:06d}")
        df.write.mode("overwrite").parquet(data_dir)

        prev_dirs = []
        if mode == "append" and manifest["snapshots"]:
            prev_dirs = manifest["snapshots"][-1]["dirs"]
        snapshot = {
            "version": version,
            "mode": mode,
            "dirs": prev_dirs + [data_dir] if mode == "append" else [data_dir],
            "ts": time.time(),
            "meta": meta or {},
        }
        manifest["snapshots"].append(snapshot)
        manifest["current"] = version
        self._commit_manifest(name, manifest)
        return version

    def read(self, spark: SparkSession, name: str, version: int | None = None) -> DataFrame | None:
        manifest = self._load_manifest(name)
        if not manifest["snapshots"]:
            return None
        snap = manifest["snapshots"][-1]
        if version is not None:
            matches = [s for s in manifest["snapshots"] if s["version"] == version]
            if not matches:
                raise ValueError(f"no snapshot v{version} for table {name!r}")
            snap = matches[0]
        if not snap["dirs"]:
            return None
        return spark.read.parquet(*snap["dirs"])

    def snapshots(self, name: str) -> list[dict]:
        return self._load_manifest(name)["snapshots"]

    def current_version(self, name: str) -> int:
        return self._load_manifest(name)["current"]

    def latest_meta(self, name: str) -> dict | None:
        snaps = self.snapshots(name)
        return snaps[-1]["meta"] if snaps else None
