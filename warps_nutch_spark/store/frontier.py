"""Frontier storage: a single mutable keyed table (url_hash -> row),
the Spark analog of the reference's Gora/HBase web table
(``storage/StorageUtils.java``, upserts via GoraOutputFormat
``mapreduce/InjectJob.java:152-155``).

Two implementations behind one interface:

- :class:`ParquetFrontierStore` — versioned parquet snapshots with an
  atomic version pointer and a lineage log per snapshot. ``merge`` is
  copy-on-write: untouched rows are carried by a left-anti join (the
  ground-truth URL-seen membership check, replacing the reference's
  per-row HBase point-get at ``DbUpdateReducer.java:98``), updated/new
  rows appended. Snapshots are partitioned by ``host_bucket`` =
  pmod(xxhash64(host), K) so host-range scans prune partitions (the
  analog of the reversed-key range scan, ``CrawlFilters.java:147-175``).
  This is what runs in the sandbox, and it doubles as the
  checkpoint/resume mechanism: every snapshot is a resume point.

- :class:`IcebergFrontierStore` — issues real ``MERGE INTO`` SQL
  against an Iceberg catalog (merge-on-read), for a production cluster
  where rewriting 100 TB per round is not acceptable. Requires the
  iceberg-spark-runtime jar on the cluster; import/use is config-gated
  so the sandbox never touches it.

Scale note (100 TB / 10^10 rows): the copy-on-write form shuffles the
full table per merge — acceptable up to ~10^8 rows per bucket-job, not
at 10^10. The Iceberg form turns the same logical MERGE into MOR
deletes + appends, and the left-anti/anti-join is pre-screened by the
partitioned Bloom filter (``store/urlseen.py``) so the shuffle only
carries candidate keys, not the frontier.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class FrontierStore:
    """Interface: read() -> DataFrame, merge(updates) -> new version."""

    def read(self) -> DataFrame:
        raise NotImplementedError

    def merge(self, updates: DataFrame, lineage: dict | None = None) -> int:
        raise NotImplementedError


class ParquetFrontierStore(FrontierStore):
    def __init__(self, spark: SparkSession, path: str, host_buckets: int = 64):
        self.spark = spark
        self.path = path
        self.host_buckets = host_buckets
        os.makedirs(path, exist_ok=True)

    # -- version bookkeeping ------------------------------------------
    @property
    def _version_file(self) -> str:
        return os.path.join(self.path, "_VERSION")

    def current_version(self) -> int:
        try:
            with open(self._version_file) as f:
                return int(json.load(f)["version"])
        except FileNotFoundError:
            return -1

    def _snapshot_dir(self, version: int) -> str:
        return os.path.join(self.path, f"v{version:06d}")

    def lineage(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        with open(os.path.join(self._snapshot_dir(v), "_LINEAGE.json")) as f:
            return json.load(f)

    def _commit_version(self, version: int, lineage: dict) -> None:
        with open(os.path.join(self._snapshot_dir(version), "_LINEAGE.json"), "w") as f:
            json.dump(lineage, f, indent=2)
        tmp = self._version_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version, "committed_at": time.time()}, f)
        os.replace(tmp, self._version_file)  # atomic pointer swap

    # -- operations ------------------------------------------------------
    def with_bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "host_bucket",
            F.pmod(F.xxhash64(F.col("host")), F.lit(self.host_buckets)).cast("int"),
        )

    def read(self) -> DataFrame:
        v = self.current_version()
        if v < 0:
            raise FileNotFoundError(f"frontier not initialized at {self.path}")
        return self.spark.read.parquet(os.path.join(self._snapshot_dir(v), "data"))

    def init(self, df: DataFrame, lineage: dict | None = None) -> int:
        return self._write_snapshot(self.with_bucket(df), lineage or {"op": "init"})

    def _write_snapshot(self, df: DataFrame, lineage: dict) -> int:
        v = self.current_version() + 1
        out = os.path.join(self._snapshot_dir(v), "data")
        (
            df.repartition(F.col("host_bucket"))
            .write.mode("overwrite")
            .partitionBy("host_bucket")
            .parquet(out)
        )
        lineage = dict(lineage)
        lineage.setdefault("version", v)
        self._commit_version(v, lineage)
        return v

    def merge(self, updates: DataFrame, lineage: dict | None = None) -> int:
        """Upsert full rows keyed by url_hash (WHEN MATCHED -> replace,
        WHEN NOT MATCHED -> insert). ``updates`` must carry complete
        frontier-schema rows; the merge itself is mechanical so update
        logic stays in the operators (one place to audit semantics)."""
        current = self.read()
        updates = self.with_bucket(updates.drop("host_bucket"))
        kept = current.join(
            updates.select("url_hash"), on="url_hash", how="left_anti"
        )
        merged = kept.unionByName(updates.select(*current.columns))
        return self._write_snapshot(merged, lineage or {"op": "merge"})


class IcebergFrontierStore(FrontierStore):
    """MERGE INTO against an Iceberg table (production path).

    The SQL below is the exact logical statement the parquet store
    emulates; on a cluster run
    ``spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-...``
    with a configured catalog, and pass ``table`` like
    ``catalog.db.frontier``.
    """

    def __init__(self, spark: SparkSession, table: str):
        self.spark = spark
        self.table = table

    def read(self) -> DataFrame:
        return self.spark.read.format("iceberg").load(self.table)

    def merge(self, updates: DataFrame, lineage: dict | None = None) -> int:
        updates.createOrReplaceTempView("_frontier_updates")
        cols = updates.columns
        set_clause = ", ".join(f"t.{c} = s.{c}" for c in cols)
        insert_cols = ", ".join(cols)
        insert_vals = ", ".join(f"s.{c}" for c in cols)
        self.spark.sql(
            f"""
            MERGE INTO {self.table} t
            USING _frontier_updates s
            ON t.url_hash = s.url_hash
            WHEN MATCHED THEN UPDATE SET {set_clause}
            WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals})
            """
        )
        return -1  # Iceberg snapshots tracked by the catalog
