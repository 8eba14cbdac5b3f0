"""Frontier storage: a single mutable keyed table (url_hash -> row),
the Spark analog of the reference's Gora/HBase web table
(``storage/StorageUtils.java``, upserts via GoraOutputFormat
``mapreduce/InjectJob.java:152-155``).

Two implementations behind one interface:

- :class:`ParquetFrontierStore` — **merge-on-read** over versioned
  parquet snapshots with an atomic version pointer and a lineage log
  per version. ``merge`` appends the update rows as a *delta*
  snapshot (cost O(updates), never O(frontier) — the r1 copy-on-write
  form rewrote the full table every round, the measured scale-killer);
  ``read`` reconstructs the current table as

      base  ⟕anti  delta-keys   ∪   latest-version delta rows

  i.e. exactly Iceberg's equality-delete MOR scan: the anti-join
  against the (small) delta key set is a broadcast hash join while
  deltas are small, and AQE falls back to a shuffle join when they
  grow. When total delta rows exceed ``compact_ratio`` × base rows,
  ``compact()`` materializes the merged view as a new base — amortized
  O(frontier) every ~1/ratio rounds instead of every round.
  Snapshots are partitioned by ``host_bucket`` = pmod(xxhash64(host),
  K) so host-range scans prune partitions (the analog of the
  reversed-key range scan, ``CrawlFilters.java:147-175``). Every
  version is a resume point, and lineage records (op, batch_id) so a
  resumed round can skip an already-committed merge (idempotent
  updatedb).

- :class:`IcebergFrontierStore` — issues real ``MERGE INTO`` SQL
  against an Iceberg catalog (merge-on-read natively), for a
  production cluster. Requires the iceberg-spark-runtime jar; the
  parquet store above emulates its MOR semantics exactly, and a pytest
  asserts merge-output equality between the MOR read and a reference
  copy-on-write merge.

Scale note (100 TB / 10^10 rows): per-round write cost is O(updates);
per-read overhead is one anti-join whose build side is the delta key
set (≤ compact_ratio × base). At the reference's sizing (10^7 new
URLs/round against 10^10 stored) the delta keys broadcast and the MOR
read is within noise of a plain scan.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class FrontierStore:
    """Interface: read() -> DataFrame, merge(updates) -> new version."""

    def read(self) -> DataFrame:
        raise NotImplementedError

    def merge(self, updates: DataFrame, lineage: dict | None = None) -> int:
        raise NotImplementedError


class ParquetFrontierStore(FrontierStore):
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        host_buckets: int = 64,
        compact_ratio: float = 4.0,
        max_delta_snapshots: int = 8,
    ):
        self.spark = spark
        self.path = path
        self.host_buckets = host_buckets
        self.compact_ratio = compact_ratio
        # bound on delta snapshots between compactions, independent of
        # the row ratio: every delta adds a scan + union branch to the
        # MOR read plan, so a lax row ratio must not let the plan's
        # delta fan-in grow without limit
        self.max_delta_snapshots = max_delta_snapshots
        os.makedirs(path, exist_ok=True)
        # the bucket count is part of the on-disk layout: reopening an
        # existing store with a different host_buckets would make
        # bucket-pruned reads and incremental compaction resolve against
        # the wrong partitions (silently dropping rows with bucket ids
        # >= the new count). Persist it on first open and hard-fail on
        # mismatch ever after.
        meta_file = os.path.join(path, "_STORE_META.json")
        if os.path.exists(meta_file):
            with open(meta_file) as f:
                meta = json.load(f)
            disk_buckets = int(meta.get("host_buckets", -1))
            if disk_buckets != host_buckets:
                raise ValueError(
                    f"frontier store at {path} was created with "
                    f"host_buckets={disk_buckets}; reopening with "
                    f"host_buckets={host_buckets} would corrupt bucket-"
                    f"pruned reads and compaction. Pass the original value."
                )
        else:
            with open(meta_file, "w") as f:
                json.dump(
                    {
                        "host_buckets": host_buckets,
                        "bucket_scheme": "pmod(xxhash64(host), host_buckets)",
                    },
                    f,
                )

    @classmethod
    def open(cls, spark: SparkSession, path: str, compact_ratio: float = 4.0):
        """Open an existing store adopting its recorded on-disk layout
        (pure readers — e.g. the REST /db endpoint — must not need to
        know the writer's host_buckets)."""
        meta_file = os.path.join(path, "_STORE_META.json")
        if not os.path.exists(meta_file):
            raise FileNotFoundError(f"no frontier store at {path}")
        with open(meta_file) as f:
            meta = json.load(f)
        return cls(spark, path, int(meta["host_buckets"]), compact_ratio)

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

    def _data_dir(self, version: int) -> str:
        return os.path.join(self._snapshot_dir(version), "data")

    def lineage(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        with open(os.path.join(self._snapshot_dir(v), "_LINEAGE.json")) as f:
            return json.load(f)

    def lineage_chain(self) -> list[dict]:
        """All committed lineages, oldest first."""
        return [self.lineage(v) for v in range(self.current_version() + 1)]

    def committed_ops(self) -> set[tuple[str, str | None]]:
        """(op, batch_id) pairs already committed — the idempotency
        check a resumed round uses to skip a re-merge."""
        return {(ln.get("op"), ln.get("batch_id")) for ln in self.lineage_chain()}

    def _commit_version(self, version: int, lineage: dict) -> None:
        with open(os.path.join(self._snapshot_dir(version), "_LINEAGE.json"), "w") as f:
            json.dump(lineage, f, indent=2)
        tmp = self._version_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": version, "committed_at": time.time()}, f)
        os.replace(tmp, self._version_file)  # atomic pointer swap

    def _layout(self) -> tuple[int, list[int]]:
        """(base_version, delta_versions since it). The base is the
        most recent snapshot with kind == 'base'."""
        chain = self.lineage_chain()
        base_v = 0
        for ln in chain:
            if ln.get("kind", "base") == "base":
                base_v = ln["version"]
        deltas = [
            ln["version"]
            for ln in chain
            if ln["version"] > base_v and ln.get("kind") == "delta"
        ]
        return base_v, deltas

    # -- operations ------------------------------------------------------
    def with_bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "host_bucket",
            F.pmod(F.xxhash64(F.col("host")), F.lit(self.host_buckets)).cast("int"),
        )

    #: broadcast the delta key set into the base anti-join while it is
    #: small enough (keys are 8-byte hashes; 4M keys ~ tens of MB of
    #: build-side hash table). Above this, leave the strategy to AQE.
    BROADCAST_DELTA_KEYS_MAX = 4_000_000

    def _delta_rows(self, deltas: list[int]) -> int:
        """Total delta rows since the base, from lineage metadata only
        (no Spark job)."""
        return sum(self.lineage(dv).get("rows", 0) for dv in deltas)

    def has_deltas(self) -> bool:
        """True when read() must resolve delta snapshots (window +
        anti-join) on top of the base scan. Callers use this to decide
        whether caching the MOR view is worth anything: a base-only
        read is a plain columnar parquet scan, and re-scanning it is
        CHEAPER than building + reading a block cache (measured: the
        unconditional per-round persist cost ~1.5x per-shard slowdown
        under 4-way executor concurrency on the scaling bench)."""
        return bool(self._layout()[1])

    def read(self) -> DataFrame:
        """MOR scan: base rows not shadowed by a delta key, plus the
        newest delta row per key; tombstoned keys (equality deletes)
        drop out entirely."""
        v = self.current_version()
        if v < 0:
            raise FileNotFoundError(f"frontier not initialized at {self.path}")
        base_v, deltas = self._layout()
        base = self.spark.read.parquet(self._data_dir(base_v))
        if "_tombstone" in base.columns:  # never true after compaction
            base = base.filter(~F.col("_tombstone")).drop("_tombstone")
        if not deltas:
            return base
        dl = None
        for dv in deltas:
            d = self.spark.read.parquet(self._data_dir(dv)).withColumn(
                "_delta_v", F.lit(dv)
            )
            if "_tombstone" not in d.columns:
                d = d.withColumn("_tombstone", F.lit(False))
            dl = d if dl is None else dl.unionByName(d)
        # newest delta wins per key; the delta set is O(updates since
        # last compaction), so this window shuffles deltas, not the base
        win = Window.partitionBy("url_hash").orderBy(F.desc("_delta_v"))
        latest = (
            dl.withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_delta_v")
        )
        delta_keys = latest.select("url_hash")
        # the delta key count is known from lineage (O(updates) by
        # construction): hint the broadcast explicitly so the base side
        # NEVER shuffles at 10^10 rows, AQE present or not (the hint is
        # what Iceberg MOR relies on AQE for; here we know the count)
        if self._delta_rows(deltas) <= self.BROADCAST_DELTA_KEYS_MAX:
            delta_keys = F.broadcast(delta_keys)
        kept = base.join(delta_keys, on="url_hash", how="left_anti")
        live = latest.filter(~F.col("_tombstone")).drop("_tombstone")
        return kept.unionByName(live.select(*base.columns))

    def read_host(self, host: str) -> DataFrame:
        """Host-scoped MOR read that touches ONLY the host's bucket:
        the base scan is partition-pruned to ``host_bucket=N`` (the S4
        reversed-key range-scan analog, CrawlFilters.java:147-175) and
        delta resolution filters to the same bucket. Falls back to the
        full read when any delta carries a host-less tombstone (those
        bucket by key and could sit outside the pruned bucket)."""
        bucket_row = (
            self.spark.range(1)
            .select(
                F.pmod(F.xxhash64(F.lit(host)), F.lit(self.host_buckets))
                .cast("int")
                .alias("b")
            )
            .collect()
        )
        b = bucket_row[0]["b"]
        base_v, deltas = self._layout()
        base = self.spark.read.parquet(self._data_dir(base_v)).filter(
            F.col("host_bucket") == b
        )
        if "_tombstone" in base.columns:
            base = base.filter(~F.col("_tombstone")).drop("_tombstone")
        if not deltas:
            return base.filter(F.col("host") == host)
        dl = None
        for dv in deltas:
            d = self.spark.read.parquet(self._data_dir(dv)).withColumn(
                "_delta_v", F.lit(dv)
            )
            if "_tombstone" not in d.columns:
                d = d.withColumn("_tombstone", F.lit(False))
            dl = d if dl is None else dl.unionByName(d)
        stray = (
            dl.filter(F.col("_tombstone") & F.col("host").isNull()).limit(1).count()
            > 0
        )
        if stray:
            return self.read().filter(F.col("host") == host)
        dl = dl.filter(F.col("host_bucket") == b)
        win = Window.partitionBy("url_hash").orderBy(F.desc("_delta_v"))
        latest = (
            dl.withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_delta_v")
        )
        delta_keys = latest.select("url_hash")
        if self._delta_rows(deltas) <= self.BROADCAST_DELTA_KEYS_MAX:
            delta_keys = F.broadcast(delta_keys)
        kept = base.join(delta_keys, on="url_hash", how="left_anti")
        live = latest.filter(~F.col("_tombstone")).drop("_tombstone")
        return kept.unionByName(live.select(*base.columns)).filter(
            F.col("host") == host
        )

    def init(self, df: DataFrame, lineage: dict | None = None) -> int:
        return self._write_snapshot(
            self.with_bucket(df), dict(lineage or {"op": "init"}), kind="base"
        )

    def _write_snapshot(self, df: DataFrame, lineage: dict, kind: str) -> int:
        v = self.current_version() + 1
        out = self._data_dir(v)
        (
            df.repartition(F.col("host_bucket"))
            .write.mode("overwrite")
            .partitionBy("host_bucket")
            .parquet(out)
        )
        # parquet-metadata count (no data scan)
        rows = self.spark.read.parquet(out).count()
        lineage = dict(lineage)
        lineage["version"] = v
        lineage["kind"] = kind
        lineage["rows"] = rows
        self._commit_version(v, lineage)
        return v

    def merge(self, updates: DataFrame, lineage: dict | None = None) -> int:
        """Upsert full rows keyed by url_hash (WHEN MATCHED -> replace,
        WHEN NOT MATCHED -> insert) as an O(updates) delta append; the
        shadowing happens at read (MOR). ``updates`` must carry
        complete frontier-schema rows; the merge itself is mechanical
        so update logic stays in the operators."""
        base_v, deltas = self._layout()
        cols = self.spark.read.parquet(self._data_dir(base_v)).columns
        updates = self.with_bucket(updates.drop("host_bucket")).select(*cols)
        v = self._write_snapshot(updates, dict(lineage or {"op": "merge"}), kind="delta")
        base_rows = self.lineage(base_v).get("rows", 0)
        delta_rows = sum(self.lineage(dv).get("rows", 0) for dv in deltas)
        delta_rows += self.lineage(v).get("rows", 0)
        if (
            delta_rows > self.compact_ratio * max(base_rows, 1)
            or len(deltas) + 1 > self.max_delta_snapshots
            # keep the MOR read on the broadcast anti-join path: once
            # accumulated delta keys outgrow the broadcast gate, every
            # read would shuffle the full base 2-3x per round (ADVICE r5)
            or delta_rows > self.BROADCAST_DELTA_KEYS_MAX
        ):
            self.compact()
        return self.current_version()

    def merge_linked(self, data_dir: str, lineage: dict | None = None) -> int:
        """Zero-copy merge: adopt an ALREADY-MATERIALIZED parquet
        directory (e.g. the round's resume artifact) as the next delta
        snapshot by hard-linking its part files — no second shuffle,
        no second write of the same rows. Iceberg's add_files analog.

        Requirements: the directory's schema must carry every store
        column including a ``host_bucket`` computed with THIS store's
        bucket count (callers use :meth:`with_bucket` before writing
        the artifact). Falls back with ValueError otherwise so callers
        can use the regular :meth:`merge`.

        Scale note: this is the difference between writing the round's
        updates once vs twice; at 10^10 rows the delta write is pure
        I/O, so halving it halves the updatedb tail."""
        import shutil

        base_v, deltas = self._layout()
        cols = set(self.spark.read.parquet(self._data_dir(base_v)).columns)
        src = self.spark.read.parquet(data_dir)
        if not cols <= set(src.columns):
            missing = cols - set(src.columns)
            raise ValueError(f"merge_linked: artifact missing columns {missing}")
        # the artifact's host_bucket values must have been computed with
        # THIS store's bucket count — a stale resume artifact with a
        # different bucketing would pass the column check but poison
        # bucket-pruned reads and incremental compaction. Writers stamp
        # the count via stamp_bucketing(); unstamped artifacts get a
        # bounded sample recheck instead of blind trust.
        stamp = os.path.join(data_dir, "_WNS_BUCKETING.json")
        if os.path.exists(stamp):
            with open(stamp) as f:
                artifact_buckets = int(json.load(f).get("host_buckets", -1))
            if artifact_buckets != self.host_buckets:
                raise ValueError(
                    f"merge_linked: artifact bucketed with host_buckets="
                    f"{artifact_buckets}, store uses {self.host_buckets}; "
                    f"use merge() to rebucket"
                )
        else:
            mismatch = (
                src.filter(F.col("host").isNotNull())
                .limit(1024)
                .withColumn(
                    "_expected",
                    F.pmod(F.xxhash64("host"), F.lit(self.host_buckets)).cast("int"),
                )
                .filter(F.col("host_bucket") != F.col("_expected"))
                .limit(1)
                .count()
            )
            if mismatch:
                raise ValueError(
                    "merge_linked: artifact host_bucket values do not match "
                    f"this store's bucketing (host_buckets={self.host_buckets}); "
                    "use merge() to rebucket"
                )
        v = self.current_version() + 1
        out = self._data_dir(v)
        os.makedirs(out, exist_ok=True)
        linked = 0
        for fn in os.listdir(data_dir):
            if not (fn.startswith("part-") and fn.endswith(".parquet")):
                continue
            dst = os.path.join(out, fn)
            try:
                os.link(os.path.join(data_dir, fn), dst)
            except OSError:
                shutil.copy2(os.path.join(data_dir, fn), dst)
            linked += 1
        if not linked:
            raise ValueError(f"merge_linked: no part files in {data_dir}")
        rows = self.spark.read.parquet(out).count()  # footer-only
        meta = dict(lineage or {"op": "merge"})
        meta["version"] = v
        meta["kind"] = "delta"
        meta["rows"] = rows
        meta["linked_from"] = data_dir
        self._commit_version(v, meta)
        base_rows = self.lineage(base_v).get("rows", 0)
        delta_rows = sum(self.lineage(dv).get("rows", 0) for dv in deltas) + rows
        if (
            delta_rows > self.compact_ratio * max(base_rows, 1)
            or len(deltas) + 1 > self.max_delta_snapshots
            # broadcast-path guard — see merge()
            or delta_rows > self.BROADCAST_DELTA_KEYS_MAX
        ):
            self.compact()
        return self.current_version()

    def stamp_bucketing(self, data_dir: str) -> None:
        """Record this store's bucket count inside a stage-artifact
        directory so a later :meth:`merge_linked` can verify the
        artifact's ``host_bucket`` column matches the store layout."""
        with open(os.path.join(data_dir, "_WNS_BUCKETING.json"), "w") as f:
            json.dump({"host_buckets": self.host_buckets}, f)

    def delete(self, keys: DataFrame, lineage: dict | None = None) -> int:
        """Equality delete (Iceberg MERGE ... WHEN MATCHED THEN DELETE
        analog): append a tombstone delta carrying only the keys —
        O(deletes), the rows vanish at read and physically at the next
        compaction. ``keys`` must have url_hash; pass host too when
        available so tombstones land in the SAME bucket as the live
        rows they kill — a future host_bucket-pruned MOR read would
        otherwise miss them and resurrect deleted rows (today read()
        scans all buckets, so the url_hash fallback is merely
        non-colocated, not wrong).

        URL-seen interplay: the Bloom backend cannot unset bits, so a
        deleted URL still probes maybe_seen=True — which routes it to
        the exact frontier anti-join, where it correctly shows as new
        and can be re-discovered. No invariant breaks (this is the
        same path as any Bloom false positive). The cuckoo backend
        (``store/cuckoo.py``, cfg.urlseen_backend="cuckoo") supports
        true deletion — call its ``delete_round`` with the same keys
        so the pre-screen's selectivity recovers too."""
        base_v, _ = self._layout()
        schema = self.spark.read.parquet(self._data_dir(base_v)).schema
        has_host = "host" in keys.columns
        tomb = keys.select("url_hash", *(["host"] if has_host else []))
        for field in schema.fields:
            if field.name in ("url_hash", "host_bucket") or field.name in tomb.columns:
                continue
            tomb = tomb.withColumn(field.name, F.lit(None).cast(field.dataType))
        if has_host:
            # bucket identically to live rows (with_bucket) so a
            # bucket-pruned read sees tombstone and victim together
            tomb = self.with_bucket(tomb)
        else:
            # no host available: spread by key (correct for full scans
            # only — see docstring)
            tomb = tomb.withColumn(
                "host_bucket",
                F.pmod(F.xxhash64("url_hash"), F.lit(self.host_buckets)).cast("int"),
            )
        tomb = tomb.withColumn("_tombstone", F.lit(True))
        return self._write_snapshot(
            tomb, dict(lineage or {"op": "delete"}), kind="delta"
        )

    def compact(self, lineage: dict | None = None) -> int:
        """Materialize the MOR view as a new base snapshot (Iceberg's
        rewrite_data_files analog); tombstoned rows are physically
        removed here.

        INCREMENTAL: only host_buckets that appear in a delta are
        resolved and rewritten; every untouched bucket's partition
        directory is hard-linked from the old base. Compaction cost is
        therefore O(touched frontier), not O(frontier) — at 10^10 rows
        with thousands of buckets a round's updates touch a subset, so
        the periodic compaction spike shrinks with update locality
        instead of scaling with the table. Falls back to the full
        rewrite when every bucket is touched."""
        import shutil

        base_v, deltas = self._layout()
        if not deltas:
            return self.current_version()
        meta = dict(lineage or {"op": "compact"})
        # touched buckets = buckets present in any delta (linked deltas
        # carry host_bucket as a data column; partitioned ones as a
        # partition column — both read back as a column)
        dl = None
        for dv in deltas:
            d = self.spark.read.parquet(self._data_dir(dv)).withColumn(
                "_delta_v", F.lit(dv)
            )
            if "_tombstone" not in d.columns:
                d = d.withColumn("_tombstone", F.lit(False))
            dl = d if dl is None else dl.unionByName(d)
        # a host-less tombstone buckets by url_hash, NOT by its
        # victim's host bucket — bucket-scoped resolution would then
        # miss the victim and resurrect it. Those deltas force the
        # full rewrite (delete() with host is colocated and safe).
        stray_tombs = (
            dl.filter(F.col("_tombstone") & F.col("host").isNull()).limit(1).count()
            > 0
        )
        if stray_tombs:
            return self._write_snapshot(self.read(), meta, kind="base")
        touched = sorted(
            r["host_bucket"]
            for r in dl.select("host_bucket").distinct().collect()
        )
        base_dir = self._data_dir(base_v)
        base = self.spark.read.parquet(base_dir)
        if "_tombstone" in base.columns:
            base = base.filter(~F.col("_tombstone")).drop("_tombstone")
        # derive untouched buckets from the base directory listing, not
        # range(host_buckets): the listing is ground truth for what the
        # base actually holds, so even a bucket-count drift that slipped
        # past the _STORE_META guard cannot silently drop partitions
        base_listed = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(base_dir)
            if d.startswith("host_bucket=") and os.path.isdir(os.path.join(base_dir, d))
        )
        untouched = [b for b in base_listed if b not in set(touched)]
        # resolve MOR only for the touched buckets (partition-pruned
        # base scan). When EVERY bucket is touched this is the full
        # rewrite — still resolved from the dl union built above (one
        # delta read + one window), never a second self.read() pass.
        win = Window.partitionBy("url_hash").orderBy(F.desc("_delta_v"))
        latest = (
            dl.withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_delta_v")
        )
        tb = base if not untouched else base.filter(F.col("host_bucket").isin(touched))
        delta_keys = latest.select("url_hash")
        if self._delta_rows(deltas) <= self.BROADCAST_DELTA_KEYS_MAX:
            delta_keys = F.broadcast(delta_keys)
        kept = tb.join(delta_keys, on="url_hash", how="left_anti")
        live = latest.filter(~F.col("_tombstone")).drop("_tombstone")
        resolved = kept.unionByName(live.select(*tb.columns))
        v = self.current_version() + 1
        out = self._data_dir(v)
        (
            resolved.repartition(F.col("host_bucket"))
            .write.mode("overwrite")
            .partitionBy("host_bucket")
            .parquet(out)
        )
        # link every untouched bucket's partition dir from the old base
        for b in untouched:
            src = os.path.join(base_dir, f"host_bucket={b}")
            if not os.path.isdir(src):
                continue  # bucket empty in base
            dst = os.path.join(out, f"host_bucket={b}")
            os.makedirs(dst, exist_ok=True)
            for fn in os.listdir(src):
                if not fn.endswith(".parquet"):
                    continue
                try:
                    os.link(os.path.join(src, fn), os.path.join(dst, fn))
                except OSError:
                    shutil.copy2(os.path.join(src, fn), os.path.join(dst, fn))
        rows = self.spark.read.parquet(out).count()
        meta["version"] = v
        meta["kind"] = "base"
        meta["rows"] = rows
        meta["compacted_buckets"] = len(touched)
        self._commit_version(v, meta)
        return v


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
