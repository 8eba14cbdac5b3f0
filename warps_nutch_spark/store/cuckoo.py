"""Partitioned cuckoo filter over SHA1(canonical URL) — the
delete-capable URL-seen pre-screen (north_rule names "Bloom/cuckoo";
``store/urlseen.py`` is the Bloom sibling).

Why cuckoo: a Bloom filter cannot unset bits, so a frontier equality
delete (``store/frontier.py`` delete()) leaves the URL probing
``maybe_seen=True`` forever (harmless — it falls through to the exact
anti-join — but the pre-screen never recovers its selectivity). The
cuckoo filter (Fan, Andersen, Kaminsky, Mitzenmacher: "Cuckoo Filter:
Practically Better Than Bloom", CoNEXT'14) supports true deletion:
``delete_round`` removes one fingerprint copy per deleted key, so a
deleted URL probes unseen again and re-enters the crawl as new.

Layout mirrors the Bloom store: P partitions by
pmod(xxhash64(url_hash), P); one ``pid=N.npy`` uint16 table of
``n_buckets x bucket_size`` fingerprint slots per partition (0 =
empty) + a JSON manifest with per-round lineage. Inserts/deletes run
executor-side via ``applyInPandas`` (one group = one table);
membership via ``mapInPandas`` with lazy per-task table loads.

Partial-key cuckoo hashing: fp = 16-bit fingerprint (never 0),
i1 = h1 mod n_buckets, i2 = i1 XOR H(fp) — n_buckets is a power of
two so the XOR stays in range and i1 = i2 XOR H(fp) (deletes and
lookups need no knowledge of which bucket holds the copy).

Insert is two vectorized placement rounds (bucket i1 then i2; slot
assignment by per-bucket cumulative count, numpy) with the classic
random-walk eviction loop only for the residue — under the sized
load factor (<= 0.84 for bucket_size=4) the residue is a tiny
fraction, so the per-partition cost stays effectively vectorized.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BUCKET_SIZE = 4
MAX_EVICTIONS = 500
_FP_SEED = np.uint64(0x5BD1E9955BD1E995)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def _fp_and_buckets(
    h1: np.ndarray, h2: np.ndarray, n_buckets: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """fingerprint (uint16, never 0), i1, i2 = i1 ^ H(fp)."""
    fp = (h2.astype(np.uint64) % np.uint64(65535) + np.uint64(1)).astype(np.uint16)
    mask = np.uint64(n_buckets - 1)
    i1 = (h1.astype(np.uint64) & mask).astype(np.int64)
    with np.errstate(over="ignore"):
        hfp = (fp.astype(np.uint64) * _FP_SEED) >> np.uint64(32)
    i2 = (i1.astype(np.uint64) ^ (hfp & mask)).astype(np.int64)
    return fp, i1, i2


def _alt_bucket(bucket: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    mask = np.uint64(n_buckets - 1)
    with np.errstate(over="ignore"):
        hfp = (fp.astype(np.uint64) * _FP_SEED) >> np.uint64(32)
    return (bucket.astype(np.uint64) ^ (hfp & mask)).astype(np.int64)


def _place_round(table: np.ndarray, buckets: np.ndarray, fps: np.ndarray) -> np.ndarray:
    """Vectorized placement attempt: for each item try its bucket's
    free slots; per-bucket arrival order decided by a stable sort +
    cumulative count. Returns the boolean placed mask."""
    if len(buckets) == 0:
        return np.zeros(0, dtype=bool)
    order = np.argsort(buckets, kind="stable")
    sb = buckets[order]
    # cumcount within each bucket group
    first = np.ones(len(sb), dtype=bool)
    first[1:] = sb[1:] != sb[:-1]
    grp_start = np.flatnonzero(first)
    cum = np.arange(len(sb)) - np.repeat(grp_start, np.diff(np.append(grp_start, len(sb))))
    free = (table[sb] == 0).sum(axis=1)  # free slots per item's bucket
    fits = cum < free
    placed = np.zeros(len(buckets), dtype=bool)
    placed[order[fits]] = True
    # write the placed fingerprints: for each placed item, target slot =
    # (index of its nth free slot). Do it group-wise with a python loop
    # over AFFECTED BUCKETS only (bounded by distinct buckets, and each
    # write is O(bucket_size)).
    for b in np.unique(sb[fits]):
        sel = (buckets == b) & placed
        free_slots = np.flatnonzero(table[b] == 0)
        table[b, free_slots[: sel.sum()]] = fps[sel][: len(free_slots)]
    return placed


class CuckooUrlSeen:
    """Same interface as ``BloomUrlSeen`` (merge_round / maybe_seen /
    manifest) plus ``delete_round``."""

    def __init__(
        self,
        path: str,
        partitions: int = 32,
        capacity_per_partition: int = 1_000_000,
        fp_rate: float = 0.01,  # accepted for interface parity; the
        # 16-bit fingerprint gives ~2*b/2^16 ≈ 0.012% per-lookup FP,
        # far below any practical Bloom sizing
    ):
        self.path = path
        self.partitions = partitions
        # size for load factor <= ~0.84 (bucket_size=4 threshold ~0.95;
        # headroom keeps the eviction residue negligible)
        self.n_buckets = _next_pow2(
            max(16, int(capacity_per_partition / (BUCKET_SIZE * 0.84)) + 1)
        )
        os.makedirs(path, exist_ok=True)

    # -- manifest / lineage -------------------------------------------
    @property
    def manifest_file(self) -> str:
        return os.path.join(self.path, "_MANIFEST.json")

    def manifest(self) -> dict:
        try:
            with open(self.manifest_file) as f:
                return json.load(f)
        except FileNotFoundError:
            return {
                "kind": "cuckoo",
                "partitions": self.partitions,
                "n_buckets": self.n_buckets,
                "bucket_size": BUCKET_SIZE,
                "rounds": [],
                "items": 0,
            }

    def _commit_manifest(self, batch_id: str, op: str, n: int) -> None:
        man = self.manifest()
        man["rounds"].append({"batch_id": batch_id, "op": op, "n": n})
        man["items"] = man.get("items", 0) + (n if op == "insert" else -n)
        tmp = self.manifest_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=2)
        os.replace(tmp, self.manifest_file)

    def _probe_cols(self, df: DataFrame, key: str) -> DataFrame:
        return (
            df.withColumn(
                "pid",
                F.pmod(F.xxhash64(F.col(key)), F.lit(self.partitions)).cast("int"),
            )
            .withColumn("h1", F.xxhash64(F.col(key), F.lit("c1")))
            .withColumn("h2", F.xxhash64(F.col(key), F.lit("c2")))
        )

    # -- build / merge ---------------------------------------------------
    def merge_round(self, df: DataFrame, key: str, batch_id: str) -> None:
        """Insert the keys of ``df`` into the per-partition tables.
        Re-inserting the same key would add a second fingerprint copy
        (still correct, just fuller), so unlike the Bloom OR — which is
        naturally idempotent — a resumed round must not replay: the
        manifest lineage makes merge_round a no-op for a batch_id it
        has already applied."""
        if any(
            r.get("batch_id") == batch_id and r.get("op") == "insert"
            for r in self.manifest()["rounds"]
        ):
            return  # resume replay: already applied
        path, n_buckets = self.path, self.n_buckets

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            pid = int(pdf["pid"].iloc[0])
            f = os.path.join(path, f"pid={pid}.npy")
            table = (
                np.load(f)
                if os.path.exists(f)
                else np.zeros((n_buckets, BUCKET_SIZE), dtype=np.uint16)
            )
            fp, i1, i2 = _fp_and_buckets(
                pdf["h1"].to_numpy(), pdf["h2"].to_numpy(), n_buckets
            )
            placed = _place_round(table, i1, fp)
            rest = ~placed
            if rest.any():
                placed2 = np.zeros_like(placed)
                placed2[rest] = _place_round(table, i2[rest], fp[rest])
                rest &= ~placed2
            overflow = 0
            rng = np.random.default_rng(np.uint64(pid) + np.uint64(1))
            for j in np.flatnonzero(rest):
                cur_fp, b = fp[j], int(i1[j])
                ok = False
                for _ in range(MAX_EVICTIONS):
                    slots = np.flatnonzero(table[b] == 0)
                    if len(slots):
                        table[b, slots[0]] = cur_fp
                        ok = True
                        break
                    s = int(rng.integers(BUCKET_SIZE))
                    cur_fp, table[b, s] = table[b, s], cur_fp
                    b = int(_alt_bucket(np.array([b]), np.array([cur_fp], dtype=np.uint16), n_buckets)[0])
                if not ok:
                    overflow += 1  # over capacity: drop (pre-screen only
                    # — a dropped fingerprint means maybe_seen=False for
                    # that key, and the exact anti-join still catches it)
            tmp = f"{f}.{os.getpid()}.tmp.npy"
            np.save(tmp, table)
            os.replace(tmp, f)
            return pd.DataFrame(
                {"pid": [pid], "n": [len(pdf)], "overflow": [overflow]}
            )

        probes = self._probe_cols(df.select(key), key)
        counts = (
            probes.select("pid", "h1", "h2")
            .groupBy("pid")
            .applyInPandas(build, schema="pid int, n long, overflow long")
            .collect()
        )
        self._commit_manifest(batch_id, "insert", sum(r["n"] for r in counts))

    def delete_round(self, df: DataFrame, key: str, batch_id: str) -> None:
        """Remove ONE fingerprint copy per key — the operation Bloom
        cannot do. After deletion the key probes unseen again (up to
        fingerprint-collision noise, same as lookup FP). Idempotent
        per batch_id like merge_round."""
        if any(
            r.get("batch_id") == batch_id and r.get("op") == "delete"
            for r in self.manifest()["rounds"]
        ):
            return
        path, n_buckets = self.path, self.n_buckets

        def drop(pdf: pd.DataFrame) -> pd.DataFrame:
            pid = int(pdf["pid"].iloc[0])
            f = os.path.join(path, f"pid={pid}.npy")
            if not os.path.exists(f):
                return pd.DataFrame({"pid": [pid], "n": [0]})
            table = np.load(f)
            fp, i1, i2 = _fp_and_buckets(
                pdf["h1"].to_numpy(), pdf["h2"].to_numpy(), n_buckets
            )
            removed = 0
            for j in range(len(fp)):
                for b in (int(i1[j]), int(i2[j])):
                    hit = np.flatnonzero(table[b] == fp[j])
                    if len(hit):
                        table[b, hit[0]] = 0
                        removed += 1
                        break
            tmp = f"{f}.{os.getpid()}.tmp.npy"
            np.save(tmp, table)
            os.replace(tmp, f)
            return pd.DataFrame({"pid": [pid], "n": [removed]})

        probes = self._probe_cols(df.select(key), key)
        counts = (
            probes.select("pid", "h1", "h2")
            .groupBy("pid")
            .applyInPandas(drop, schema="pid int, n long")
            .collect()
        )
        self._commit_manifest(batch_id, "delete", sum(r["n"] for r in counts))

    # -- membership pre-screen --------------------------------------------
    def maybe_seen(self, df: DataFrame, key: str) -> DataFrame:
        """Adds boolean ``maybe_seen`` exactly like the Bloom variant:
        False -> definitely new, True -> needs the exact anti-join."""
        path, n_buckets, parts = self.path, self.n_buckets, self.partitions

        def lookup(batches):
            cache: dict[int, np.ndarray | None] = {}
            for pdf in batches:
                if len(pdf) == 0:
                    yield pdf.assign(maybe_seen=pd.Series([], dtype=bool))
                    continue
                out = np.zeros(len(pdf), dtype=bool)
                pids = pdf["pid"].to_numpy()
                fp, i1, i2 = _fp_and_buckets(
                    pdf["h1"].to_numpy(), pdf["h2"].to_numpy(), n_buckets
                )
                for pid in np.unique(pids):
                    p = int(pid)
                    if p not in cache:
                        f = os.path.join(path, f"pid={p}.npy")
                        cache[p] = np.load(f) if os.path.exists(f) else None
                    table = cache[p]
                    if table is None:
                        continue
                    sel = pids == pid
                    hit1 = (table[i1[sel]] == fp[sel][:, None]).any(axis=1)
                    hit2 = (table[i2[sel]] == fp[sel][:, None]).any(axis=1)
                    out[sel] = hit1 | hit2
                yield pdf.assign(maybe_seen=out)

        probed = self._probe_cols(df, key)
        probed = probed.repartition(parts, F.col("pid"))
        schema = T.StructType(
            probed.schema.fields + [T.StructField("maybe_seen", T.BooleanType())]
        )
        return probed.mapInPandas(lookup, schema=schema).drop("pid", "h1", "h2")
