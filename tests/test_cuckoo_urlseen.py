"""Partitioned cuckoo-filter URL-seen (store/cuckoo.py): no false
negatives, bounded false positives, TRUE DELETION (the capability
Bloom lacks), batch-idempotent resume, and a crawl round running on
the cuckoo backend producing the identical frontier as Bloom."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from warps_nutch_spark.store.cuckoo import CuckooUrlSeen


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path)


def _df(spark, keys):
    return spark.createDataFrame(pd.DataFrame({"k": list(keys)}))


def test_cuckoo_no_false_negatives_and_fp_bounded(spark, workdir):
    cf = CuckooUrlSeen(f"{workdir}/cf", partitions=4, capacity_per_partition=10_000)
    keys = [f"hash-{i:05d}" for i in range(2000)]
    cf.merge_round(_df(spark, keys), "k", "r0")
    probe = _df(spark, [f"hash-{i:05d}" for i in range(1500, 3000)])
    out = cf.maybe_seen(probe, "k").toPandas().set_index("k")
    known = [f"hash-{i:05d}" for i in range(1500, 2000)]
    unknown = [f"hash-{i:05d}" for i in range(2000, 3000)]
    assert out.loc[known, "maybe_seen"].all()
    # 16-bit fingerprints: per-lookup FP ~ 2*4/65535 ≈ 0.012%
    assert out.loc[unknown, "maybe_seen"].mean() < 0.01
    man = cf.manifest()
    assert man["items"] == 2000 and man["rounds"][0]["batch_id"] == "r0"


def test_cuckoo_true_deletion(spark, workdir):
    """The Bloom limitation this backend exists to remove: after
    delete_round, the deleted keys probe unseen again while the
    surviving keys keep answering seen."""
    cf = CuckooUrlSeen(f"{workdir}/cf", partitions=2, capacity_per_partition=5_000)
    keys = [f"u-{i:04d}" for i in range(1000)]
    cf.merge_round(_df(spark, keys), "k", "r0")
    dead = keys[::3]
    cf.delete_round(_df(spark, dead), "k", "d0")
    out = cf.maybe_seen(_df(spark, keys), "k").toPandas().set_index("k")
    alive = [k for k in keys if k not in set(dead)]
    assert out.loc[alive, "maybe_seen"].all()
    # deleted keys answer unseen (up to fingerprint-collision noise)
    assert out.loc[dead, "maybe_seen"].mean() < 0.01
    assert cf.manifest()["items"] == 1000 - len(dead)


def test_cuckoo_resume_replay_is_idempotent(spark, workdir):
    cf = CuckooUrlSeen(f"{workdir}/cf", partitions=2, capacity_per_partition=1_000)
    cf.merge_round(_df(spark, ["a", "b", "c"]), "k", "r0")
    # a resumed round replays the same batch: must be a no-op, or a
    # later single delete could not clear membership
    cf.merge_round(_df(spark, ["a", "b", "c"]), "k", "r0")
    assert cf.manifest()["items"] == 3
    cf.delete_round(_df(spark, ["a"]), "k", "d0")
    cf.delete_round(_df(spark, ["a"]), "k", "d0")  # replayed delete too
    out = cf.maybe_seen(_df(spark, ["a", "b"]), "k").toPandas().set_index("k")
    assert not out.loc["a", "maybe_seen"]
    assert out.loc["b", "maybe_seen"]


def test_cuckoo_high_load_insert_still_exact(spark, workdir):
    """Fill to ~84% of sized capacity: the eviction path engages and
    every inserted key still answers seen (no silent loss under the
    designed load)."""
    cf = CuckooUrlSeen(f"{workdir}/cf", partitions=1, capacity_per_partition=1_000)
    n = int(cf.n_buckets * 4 * 0.8)
    keys = [f"x-{i:05d}" for i in range(n)]
    cf.merge_round(_df(spark, keys), "k", "r0")
    out = cf.maybe_seen(_df(spark, keys), "k").toPandas()
    assert out["maybe_seen"].all()


def test_crawl_round_on_cuckoo_backend_matches_bloom(spark, tmp_path_factory):
    """The URL-seen filter is a pre-screen; swapping backends must not
    change ANY crawl state (ground truth is the exact anti-join)."""
    from warps_nutch_spark import simweb
    from warps_nutch_spark.config import make_test_config
    from warps_nutch_spark.plans.round import RoundDriver

    WEB = (5, 60, 7)
    web = simweb.SimWeb(*WEB)
    seeds = spark.createDataFrame([(u,) for u in web.seeds(2)], ["value"])

    def crawl(backend, wd):
        cfg = make_test_config(
            top_n=200, max_per_host=50, round_time_limit_ms=600_000,
            host_buckets=4, bloom_partitions=4, urlseen_backend=backend,
        )
        drv = RoundDriver(spark, str(wd), cfg, WEB, 1_700_000_000_000)
        drv.run(seeds, rounds=2)
        return (
            drv.store.read()
            .select("url", "status", "score", "distance")
            .toPandas()
            .sort_values("url")
            .reset_index(drop=True)
        )

    a = crawl("bloom", tmp_path_factory.mktemp("ub"))
    b = crawl("cuckoo", tmp_path_factory.mktemp("uc"))
    assert list(a.url) == list(b.url)
    assert (a.status == b.status).all()
    assert (a.distance == b.distance).all()
    assert ((a.score - b.score).abs() < 1e-6).all()
