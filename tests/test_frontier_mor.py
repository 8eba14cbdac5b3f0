"""Merge-on-read frontier store semantics, updatedb resume
idempotency, and budget-drop GENERATE_MARK retention.

The MOR store (store/frontier.py) must behave exactly like a logical
upsert (the Iceberg MERGE INTO it emulates): newest delta row wins per
url_hash, untouched base rows survive, and compaction changes nothing
observable. A resumed round must never double-apply inlink
contributions regardless of kill point.
"""

import os

import pytest
from pyspark.sql import functions as F

from tests.crawl_oracle import CrawlOracle
from warps_nutch_spark.config import make_test_config
from warps_nutch_spark.plans.round import RoundDriver
from warps_nutch_spark.simweb import SimWeb
from warps_nutch_spark.store.frontier import ParquetFrontierStore

START = 1_700_000_000_000
WEB = (6, 80, 42)


def _rows(spark, items):
    return spark.createDataFrame(
        [(u, f"h{u}", f"host{h}.test", s) for u, h, s in items],
        ["url_hash", "url", "host", "score"],
    )


def _store(spark, tmp, **kw):
    return ParquetFrontierStore(spark, os.path.join(str(tmp), "fr"), host_buckets=4, **kw)


def test_mor_merge_equals_logical_upsert(spark, tmp_path):
    st = _store(spark, tmp_path, compact_ratio=100.0)  # never compact
    st.init(_rows(spark, [("a", 1, 1.0), ("b", 2, 2.0), ("c", 1, 3.0)]))
    st.merge(_rows(spark, [("b", 2, 20.0), ("d", 3, 4.0)]))  # update b, insert d
    st.merge(_rows(spark, [("b", 2, 30.0), ("e", 1, 5.0)]))  # newest delta wins

    got = {r["url_hash"]: r["score"] for r in st.read().collect()}
    assert got == {"a": 1.0, "b": 30.0, "c": 3.0, "d": 4.0, "e": 5.0}
    # all merges were deltas: base untouched (O(updates) writes)
    kinds = [ln["kind"] for ln in st.lineage_chain()]
    assert kinds == ["base", "delta", "delta"]


def test_mor_compaction_triggers_and_preserves_content(spark, tmp_path):
    st = _store(spark, tmp_path, compact_ratio=0.5)
    st.init(_rows(spark, [(f"u{i}", i % 3, float(i)) for i in range(10)]))
    before = {r["url_hash"]: r["score"] for r in st.read().collect()}
    # 6 delta rows > 0.5 * 10 base rows -> compaction runs
    st.merge(_rows(spark, [(f"u{i}", i % 3, 100.0 + i) for i in range(3)] +
                          [(f"n{i}", i % 3, float(i)) for i in range(3)]))
    kinds = [ln["kind"] for ln in st.lineage_chain()]
    assert kinds == ["base", "delta", "base"], kinds  # compacted
    got = {r["url_hash"]: r["score"] for r in st.read().collect()}
    expect = dict(before)
    expect.update({f"u{i}": 100.0 + i for i in range(3)})
    expect.update({f"n{i}": float(i) for i in range(3)})
    assert got == expect
    # committed_ops carries (op, batch) lineage for idempotent resume
    st.merge(_rows(spark, [("x", 0, 1.0)]), {"op": "updatedb", "batch_id": "b9"})
    assert ("updatedb", "b9") in st.committed_ops()


def _cfg(**kw):
    base = dict(
        top_n=300,
        max_per_host=60,
        crawl_delay_ms=1000,
        round_time_limit_ms=600_000,
        host_buckets=4,
        bloom_partitions=4,
    )
    base.update(kw)
    return make_test_config(**base)


def _seeds_df(spark, web, per_host=3):
    return spark.createDataFrame([(u,) for u in web.seeds(per_host)], ["value"])


def _frontier_pdf(drv):
    return (
        drv.store.read()
        .select("url", "status", "score", "cash", "distance", "generated_batch")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )


def test_resume_after_merge_before_done_is_idempotent(spark, tmp_path_factory):
    """Kill point: updatedb artifact written AND frontier merged, but
    _DONE not yet marked (the r1 crash window where contributions were
    double-applied). The resume must reuse the artifact and skip the
    already-committed merge."""
    web = SimWeb(*WEB)
    cfg = _cfg()

    wd_a = str(tmp_path_factory.mktemp("uninterrupted"))
    drv_a = RoundDriver(spark, wd_a, cfg, WEB, START)
    drv_a.run(_seeds_df(spark, web), rounds=2)

    wd_b = str(tmp_path_factory.mktemp("killed"))
    drv_b = RoundDriver(spark, wd_b, cfg, WEB, START)
    drv_b.inject(_seeds_df(spark, web))
    drv_b.run_round(0)
    drv_b.run_round(1)
    # simulate the kill: everything in round 1's updatedb completed
    # except the _DONE marker
    done = os.path.join(wd_b, "rounds", "batch-0001", "updatedb", "_DONE")
    os.remove(done)
    drv_c = RoundDriver(spark, wd_b, cfg, WEB, START)
    drv_c.run_round(1)  # resume

    a, b = _frontier_pdf(drv_a), _frontier_pdf(drv_c)
    assert list(a.url) == list(b.url)
    assert (a.status == b.status).all()
    assert ((a.score - b.score).abs() < 1e-3).all(), "scores double-applied on resume"
    assert ((a.cash - b.cash).abs() < 1e-3).all()


def test_budget_dropped_rows_keep_generate_mark(spark, tmp_path_factory):
    """Round budget exhaustion (FeederThread drain): fetchlist rows the
    virtual clock never reached keep their GENERATE_MARK in the merged
    frontier — including rows that received inlink contributions in the
    same round — and the whole state still matches the oracle."""
    web = SimWeb(*WEB)
    # ~5 fetch slots per host per round (5000ms budget / 1000ms delay),
    # fetchlist up to 60/host -> plenty of dropped rows
    cfg = _cfg(round_time_limit_ms=5_000)

    wd = str(tmp_path_factory.mktemp("budget"))
    drv = RoundDriver(spark, wd, cfg, WEB, START)
    oracle = CrawlOracle(cfg, WEB, START)
    oracle.inject(web.seeds(3))
    drv.inject(_seeds_df(spark, web))
    for r in range(2):
        drv.run_round(r)
        oracle.run_round(r)

    fr = drv.store.read().select("url", "generated_batch", "status").toPandas()
    got_marks = {
        row.url: row.generated_batch
        for row in fr.itertuples()
        if row.generated_batch is not None
    }
    exp_marks = {
        u: r.generated_batch
        for u, r in oracle.frontier.items()
        if r.generated_batch is not None
    }
    assert got_marks, "budget config produced no dropped rows — test is vacuous"
    assert got_marks == exp_marks
    # URL-seen set equality still holds under budget exhaustion
    assert {r.url for r in fr.itertuples()} == oracle.seen()


def test_mor_equality_deletes(spark, tmp_path):
    """Tombstone deltas (Iceberg equality-delete analog): deleted keys
    vanish at read, O(deletes) write cost; compaction removes them
    physically; a later merge can re-insert the key."""
    st = _store(spark, tmp_path, compact_ratio=100.0)
    st.init(_rows(spark, [("a", 1, 1.0), ("b", 2, 2.0), ("c", 1, 3.0)]))
    st.merge(_rows(spark, [("d", 3, 4.0)]))
    st.delete(spark.createDataFrame([("b",), ("d",)], ["url_hash"]))
    got = {r["url_hash"] for r in st.read().collect()}
    assert got == {"a", "c"}
    kinds = [ln["kind"] for ln in st.lineage_chain()]
    assert kinds == ["base", "delta", "delta"]  # delete was O(deletes)
    # compaction drops tombstones physically and preserves the view
    st.compact()
    got2 = {r["url_hash"]: r["score"] for r in st.read().collect()}
    assert got2 == {"a": 1.0, "c": 3.0}
    assert "_tombstone" not in st.read().columns
    # re-insert a deleted key
    st.merge(_rows(spark, [("b", 2, 9.0)]))
    assert {r["url_hash"]: r["score"] for r in st.read().collect()}["b"] == 9.0


def test_mor_delete_with_host_colocates_tombstone(spark, tmp_path):
    """A delete key carrying host must bucket its tombstone exactly like
    the live row (with_bucket), so a bucket-pruned MOR read would see
    tombstone and victim together."""
    st = _store(spark, tmp_path, compact_ratio=100.0)
    st.init(_rows(spark, [("a", 1, 1.0), ("b", 2, 2.0), ("c", 1, 3.0)]))
    st.delete(
        spark.createDataFrame([("b", "host2.test")], ["url_hash", "host"])
    )
    assert {r["url_hash"] for r in st.read().collect()} == {"a", "c"}
    # tombstone landed in the victim's bucket
    base = spark.read.parquet(os.path.join(str(tmp_path), "fr", "v000000", "data"))
    victim_bucket = base.filter(F.col("url_hash") == "b").collect()[0]["host_bucket"]
    tomb = spark.read.parquet(os.path.join(str(tmp_path), "fr", "v000001", "data"))
    tb = tomb.filter(F.col("_tombstone")).collect()
    assert len(tb) == 1 and tb[0]["host_bucket"] == victim_bucket


def test_round_updatedb_uses_linked_merge(spark, tmp_path):
    """The round's delta snapshot must be hard-linked from the stage
    artifact (one write of the round's updates, not two) — guard
    against silent fallback to the shuffling merge."""
    from warps_nutch_spark.config import make_test_config
    from warps_nutch_spark.plans.round import RoundDriver
    from warps_nutch_spark.simweb import SimWeb

    wd = str(tmp_path / "crawl")
    web_params = (4, 30, 3)
    cfg = make_test_config(top_n=100, max_per_host=30, round_time_limit_ms=600_000)
    drv = RoundDriver(spark, wd, cfg, web_params)
    web = SimWeb(*web_params)
    drv.inject(spark.createDataFrame([(u,) for u in web.seeds(2)], ["value"]))
    drv.run_round(0)
    chain = drv.store.lineage_chain()
    upd = [ln for ln in chain if ln.get("op") == "updatedb"]
    assert upd, "no updatedb merge committed"
    assert all("linked_from" in ln for ln in upd), (
        "updatedb merge fell back to the shuffling path: "
        + str([{k: ln.get(k) for k in ('op', 'kind', 'linked_from')} for ln in upd])
    )
    # and the linked snapshot reads back consistently
    fr = drv.store.read()
    assert fr.count() == fr.select("url_hash").distinct().count()


def test_incremental_compaction_links_untouched_buckets(spark, tmp_path):
    """Compaction rewrites only delta-touched buckets; untouched bucket
    partitions are hard-linked from the old base, and the view is
    unchanged."""
    import os

    st = _store(spark, tmp_path, compact_ratio=100.0)
    rows = [(f"u{i}", (i % 6) + 1, float(i)) for i in range(24)]
    st.init(_rows(spark, rows))
    before = {r["url_hash"]: r["score"] for r in st.read().collect()}
    # touch only host1's rows (one bucket, typically)
    st.merge(_rows(spark, [("u0", 1, 100.0), ("u6", 1, 106.0)]))
    before["u0"], before["u6"] = 100.0, 106.0
    v = st.compact()
    ln = st.lineage(v)
    assert ln["kind"] == "base"
    assert 0 < ln["compacted_buckets"] < st.host_buckets
    # linked dirs exist for untouched buckets (hard links share inode)
    out = st._data_dir(v)
    bucket_dirs = [d for d in os.listdir(out) if d.startswith("host_bucket=")]
    assert len(bucket_dirs) >= ln["compacted_buckets"]
    after = {r["url_hash"]: r["score"] for r in st.read().collect()}
    assert after == before


def test_incremental_compaction_stray_tombstone_falls_back(spark, tmp_path):
    """A host-less tombstone (bucketed by url_hash, maybe away from its
    victim) must force the full rewrite, never resurrect the key."""
    st = _store(spark, tmp_path, compact_ratio=100.0)
    st.init(_rows(spark, [(f"u{i}", (i % 6) + 1, float(i)) for i in range(12)]))
    st.delete(spark.createDataFrame([("u3",)], ["url_hash"]))
    v = st.compact()
    assert "compacted_buckets" not in st.lineage(v)  # full rewrite path
    got = {r["url_hash"] for r in st.read().collect()}
    assert "u3" not in got and len(got) == 11


def test_read_host_pruned_equals_full_read(spark, tmp_path):
    """read_host must equal read().filter(host) in every delta state,
    including colocated tombstones, and scan only one bucket."""
    from pyspark.sql import functions as F

    st = _store(spark, tmp_path, compact_ratio=100.0)
    rows = [(f"u{i}", (i % 6) + 1, float(i)) for i in range(24)]
    st.init(_rows(spark, rows))
    st.merge(_rows(spark, [("u1", 2, 100.0), ("u30", 2, 30.0)]))
    st.delete(
        spark.createDataFrame([("u7", "host2.test")], ["url_hash", "host"])
    )
    for host in ["host2.test", "host5.test"]:
        want = {
            r["url_hash"]: r["score"]
            for r in st.read().filter(F.col("host") == host).collect()
        }
        got = {r["url_hash"]: r["score"] for r in st.read_host(host).collect()}
        assert got == want, host
    # base scan is partition-pruned: the bucket-filtered base relation
    # reads exactly one host_bucket dir (input_file_name on the single
    # source; read_host builds exactly this scan)
    b = (
        spark.range(1)
        .select(F.pmod(F.xxhash64(F.lit("host2.test")), F.lit(4)).cast("int").alias("b"))
        .collect()[0]["b"]
    )
    base_scan = spark.read.parquet(st._data_dir(0)).filter(F.col("host_bucket") == b)
    files = {r[0] for r in base_scan.select(F.input_file_name()).distinct().collect()}
    base_buckets = {f.split("host_bucket=")[1].split("/")[0] for f in files}
    assert base_buckets == {str(b)}

    # host-less tombstone -> falls back, still equal
    st.delete(spark.createDataFrame([("u2",)], ["url_hash"]))
    for host in ["host3.test"]:
        want = {
            r["url_hash"] for r in st.read().filter(F.col("host") == host).collect()
        }
        got = {r["url_hash"] for r in st.read_host(host).collect()}
        assert got == want


def test_reopen_with_wrong_bucket_count_refused(spark, tmp_path):
    st = _store(spark, tmp_path)
    st.init(_rows(spark, [("a", 1, 1.0)]))
    with pytest.raises(ValueError, match="host_buckets"):
        ParquetFrontierStore(spark, st.path, host_buckets=8)
    # same count reopens fine
    st2 = ParquetFrontierStore(spark, st.path, host_buckets=4)
    assert st2.read().count() == 1


def test_merge_linked_rejects_mismatched_bucketing(spark, tmp_path):
    """A stale resume artifact bucketed with a different host_buckets
    must not be adopted as a delta (bucket-pruned reads and incremental
    compaction would resolve it against the wrong partitions)."""
    st = _store(spark, tmp_path, compact_ratio=100.0)
    st.init(_rows(spark, [("a", 1, 1.0), ("b", 2, 2.0)]))
    other = ParquetFrontierStore(
        spark, os.path.join(str(tmp_path), "other"), host_buckets=16
    )
    art = os.path.join(str(tmp_path), "artifact")
    other.with_bucket(_rows(spark, [("b", 2, 20.0)])).write.parquet(art)
    # stamped mismatch -> refused before any data check
    other.stamp_bucketing(art)
    with pytest.raises(ValueError, match="host_buckets"):
        st.merge_linked(art)
    # unstamped mismatch -> caught by the sample recheck (bucket value
    # forced out of this store's range so the mismatch is deterministic)
    art_bad = os.path.join(str(tmp_path), "artifact_bad")
    st.with_bucket(_rows(spark, [("b", 2, 20.0)])).withColumn(
        "host_bucket", F.lit(99)
    ).write.parquet(art_bad)
    with pytest.raises(ValueError, match="bucketing"):
        st.merge_linked(art_bad)
    # correctly bucketed + stamped artifact is adopted
    art2 = os.path.join(str(tmp_path), "artifact2")
    st.with_bucket(_rows(spark, [("b", 2, 20.0)])).write.parquet(art2)
    st.stamp_bucketing(art2)
    st.merge_linked(art2)
    got = {r["url_hash"]: r["score"] for r in st.read().collect()}
    assert got == {"a": 1.0, "b": 20.0}
