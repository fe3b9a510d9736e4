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

__all__ = ["TableStore", "IcebergTableStore", "for_session"]


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

    def _dir_bytes(self, dirs: list[str]) -> int:
        total = 0
        for d in dirs:
            for root, _, files in os.walk(d):
                total += sum(
                    os.path.getsize(os.path.join(root, f))
                    for f in files
                    if f.endswith(".parquet")
                )
        return total

    def compact(
        self,
        spark: SparkSession,
        name: str,
        target_file_bytes: int = 96 << 20,
        meta: dict | None = None,
    ) -> int | None:
        """Rewrite the CURRENT snapshot's accumulated dirs into one dir of
        ~``target_file_bytes`` files — the Iceberg ``rewrite_data_files``
        maintenance action. A per-wave append store grows one directory
        (with one file per task) per wave; after 100k waves every reader
        unions 100k directories of tiny files and the scan is
        metadata-bound. Compaction coalesces (narrow — no shuffle; each
        output file concatenates whole input files) and commits the
        result as a new snapshot, so readers atomically flip to it while
        every historical snapshot stays time-travelable until
        ``expire_snapshots`` reclaims it. Returns the new version, or
        None if the table has nothing to compact (0/1 dirs and no more
        files than the target implies)."""
        manifest = self._load_manifest(name)
        if not manifest["snapshots"]:
            return None
        cur = manifest["snapshots"][-1]
        # INCREMENTAL (Iceberg rewrite_data_files semantics): rewrite only
        # the dirs smaller than one target file — the per-commit append
        # dirs — and CARRY large dirs (earlier compaction outputs) into
        # the new snapshot untouched. Rewriting the whole snapshot every
        # cycle would re-copy the full crawl history per maintenance run:
        # O(W^2/N) total write I/O over W waves instead of O(W).
        # one os.walk per dir, collecting (bytes, files) together — the
        # maintenance run touches each small dir's metadata once, not 3x
        stats: dict[str, tuple[int, int]] = {}
        for d in cur["dirs"]:
            b = n = 0
            for root, _, files in os.walk(d):
                for f in files:
                    if f.endswith(".parquet"):
                        b += os.path.getsize(os.path.join(root, f))
                        n += 1
            stats[d] = (b, n)
        small = [d for d in cur["dirs"] if stats[d][0] < target_file_bytes]
        small_set = set(small)
        keep = [d for d in cur["dirs"] if d not in small_set]
        n_files = sum(stats[d][1] for d in small)
        total = sum(stats[d][0] for d in small)
        want = max(1, -(-total // target_file_bytes))  # ceil
        if len(small) <= 1 and n_files <= want:
            return None
        df = spark.read.parquet(*small).coalesce(want)
        version = manifest["current"] + 1
        data_dir = os.path.join(self._table_dir(name), f"v{version:06d}")
        df.write.mode("overwrite").parquet(data_dir)
        snapshot = {
            "version": version,
            "mode": "compact",
            "dirs": keep + [data_dir],
            "ts": time.time(),
            "meta": {
                **(meta or (cur["meta"] or {})),
                "compacted_from": cur["version"],
                "files_before": n_files,
                "dirs_before": len(small),
                "dirs_carried": len(keep),
            },
        }
        manifest["snapshots"].append(snapshot)
        manifest["current"] = version
        self._commit_manifest(name, manifest)
        return version

    def expire_snapshots(self, name: str, keep_last: int = 1) -> list[str]:
        """Drop all but the last ``keep_last`` snapshots and DELETE data
        dirs no kept snapshot references — the Iceberg
        ``expire_snapshots`` action, and the half of compaction that
        actually reclaims space (compact alone leaves the old files for
        time travel). Manifest is swapped atomically BEFORE any rmtree,
        so a reader never observes a manifest pointing at deleted data.
        Returns the removed directories."""
        import shutil

        assert keep_last >= 1
        manifest = self._load_manifest(name)
        snaps = manifest["snapshots"]
        if len(snaps) <= keep_last:
            return []
        kept = snaps[-keep_last:]
        live = {d for s in kept for d in s["dirs"]}
        dead = [
            d
            for s in snaps[:-keep_last]
            for d in s["dirs"]
            if d not in live
        ]
        manifest["snapshots"] = kept
        self._commit_manifest(name, manifest)
        for d in dict.fromkeys(dead):  # preserve order, dedupe
            shutil.rmtree(d, ignore_errors=True)
        return list(dict.fromkeys(dead))


class IcebergTableStore(TableStore):
    """The same store contract over real Iceberg tables.

    Instantiated when a Spark Iceberg catalog is configured (e.g.
    spark-submit with the iceberg-spark-runtime jar and
    ``spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog``).
    Versions are Iceberg snapshot ids; ``meta`` rides as snapshot summary
    properties via commit-time table properties. This sandbox has no
    Iceberg jars, so the class is exercised only by the catalog-gated test
    (tests/test_components.py::test_iceberg_store_when_catalog_present) —
    on a real cluster the Crawler picks it via ``for_session``.
    """

    def __init__(self, spark: SparkSession, catalog: str, namespace: str = "crawl"):
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {catalog}.{namespace}")

    def _ident(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    def _exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(self._ident(name))

    def commit(self, name: str, df: DataFrame, mode: str = "append", meta: dict | None = None) -> int:
        assert mode in ("append", "overwrite")
        ident = self._ident(name)
        writer = df.writeTo(ident)
        # meta rides in the Iceberg snapshot summary (snapshot-property.*
        # write options), so each historical snapshot keeps ITS meta and no
        # value ever touches SQL text — no quoting/injection surface
        for k, v in (meta or {}).items():
            writer = writer.option(f"snapshot-property.wcm.{k}", str(v))
        if not self._exists(name):
            writer.create()
        elif mode == "append":
            writer.append()
        else:
            writer.replace()
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {ident}.snapshots ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        return int(row[0][0]) if row else 0

    def read(self, spark: SparkSession, name: str, version: int | None = None) -> DataFrame | None:
        if not self._exists(name):
            return None
        ident = self._ident(name)
        if version is None:
            return spark.table(ident)
        return spark.sql(f"SELECT * FROM {ident} VERSION AS OF {version}")

    @staticmethod
    def _meta_from_summary(summary: dict | None) -> dict:
        out = {
            k[len("wcm."):]: v
            for k, v in (summary or {}).items()
            if k.startswith("wcm.")
        }
        # numeric meta round-trips as strings through the summary map
        for k, v in list(out.items()):
            if isinstance(v, str) and v.lstrip("-").isdigit():
                out[k] = int(v)
        return out

    def snapshots(self, name: str) -> list[dict]:
        if not self._exists(name):
            return []
        rows = self.spark.sql(
            f"SELECT snapshot_id, committed_at, summary "
            f"FROM {self._ident(name)}.snapshots ORDER BY committed_at"
        ).collect()
        return [
            {
                "version": int(r["snapshot_id"]),
                "ts": str(r["committed_at"]),
                "meta": self._meta_from_summary(r["summary"]),
            }
            for r in rows
        ]

    def current_version(self, name: str) -> int:
        snaps = self.snapshots(name)
        return snaps[-1]["version"] if snaps else 0

    def compact(
        self,
        spark: SparkSession,
        name: str,
        target_file_bytes: int = 96 << 20,
        meta: dict | None = None,
    ) -> int | None:
        """Iceberg-native compaction via the rewrite_data_files stored
        procedure (same catalog-gated status as the rest of this class —
        no runtime jar in this sandbox, exercised on a real cluster).

        rewrite_data_files commits its own snapshot with NO wcm.*
        summary properties, so the meta carry-forward the filesystem
        store guarantees is re-established through TBLPROPERTIES — the
        exact fallback latest_meta() already reads when the newest
        snapshot's summary is bare."""
        if not self._exists(name):
            return None
        carry = meta or self.latest_meta(name) or {}
        self.spark.sql(
            f"CALL {self.catalog}.system.rewrite_data_files("
            f"table => '{self.namespace}.{name}', "
            f"options => map('target-file-size-bytes', '{int(target_file_bytes)}'))"
        )
        if carry:
            props = ", ".join(
                "'wcm.{}'='{}'".format(
                    str(k).replace("'", "''"), str(v).replace("'", "''")
                )
                for k, v in carry.items()
            )
            self.spark.sql(
                f"ALTER TABLE {self._ident(name)} SET TBLPROPERTIES ({props})"
            )
        return self.current_version(name)

    def expire_snapshots(self, name: str, keep_last: int = 1) -> list[str]:
        """Iceberg-native snapshot expiry (retain_last); returns [] —
        Iceberg reports reclaimed file counts, not paths."""
        if self._exists(name):
            self.spark.sql(
                f"CALL {self.catalog}.system.expire_snapshots("
                f"table => '{self.namespace}.{name}', "
                f"retain_last => {int(keep_last)})"
            )
        return []

    def latest_meta(self, name: str) -> dict | None:
        snaps = self.snapshots(name)
        if not snaps:
            return None
        if snaps[-1]["meta"]:
            return snaps[-1]["meta"]
        # backward compatibility: checkpoints committed by the previous
        # scheme carried meta in TBLPROPERTIES, not snapshot summaries —
        # without this fallback a resume of such a table would silently
        # restart next_seq/wave at 0 over a non-empty frontier
        props = {
            r["key"]: r["value"]
            for r in self.spark.sql(
                f"SHOW TBLPROPERTIES {self._ident(name)}"
            ).collect()
        }
        out = self._meta_from_summary(props)
        return out or None


def for_session(spark: SparkSession, root_or_catalog: str) -> TableStore:
    """Pick the store backend: an ``iceberg://catalog[/namespace]`` URI
    selects IcebergTableStore (requires the runtime jars + catalog conf);
    anything else is a filesystem root for the parquet+manifest store."""
    if root_or_catalog.startswith("iceberg://"):
        rest = root_or_catalog[len("iceberg://"):]
        catalog, _, ns = rest.partition("/")
        return IcebergTableStore(spark, catalog, ns or "crawl")
    return TableStore(root_or_catalog)
