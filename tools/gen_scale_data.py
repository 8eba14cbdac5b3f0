"""Generate a LOCAL sf1-scale replica of the driver's synthetic tables.

The driver's round-end bench runs at a driver-generated scale factor
(BENCH_r05.json: sf=1.0) that is not present under /root/testdata (which
tops out at sf0.1, read-only). For optimization work we need numbers at
the scale the driver actually measures, so this script synthesizes
tables with the SAME schemas and the same distribution family as the
sf0.1 data (31-word vocab, 10-100 token docs, 20 sources, unit-norm
64-dim embeddings in 10 label clusters, TPC-H-ish lineitem/orders),
scaled 10x.  Values are freshly random (NOT copies of sf0.1 rows —
replicating rows would plant artificial exact-duplicate documents and
distort every dedup query's candidate-pair counts).

Usage:  python tools/gen_scale_data.py [sf] [outdir]
Default: sf=1.0 -> /root/testdata_local/sf1
This data is for local measurement only; correctness always runs
against /root/testdata via the DuckDB oracles.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "fr", "es", "zh", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]


def gen_documents(rng, n):
    lens = rng.integers(10, 101, size=n)
    texts = []
    vocab = np.array(VOCAB)
    for L in lens:
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), size=L)]))
    src = rng.integers(0, 20, size=n)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                [LANGS[i] for i in rng.choice(len(LANGS), size=n, p=LANG_W)],
                pa.string(),
            ),
            "source": pa.array([f"src{s}" for s in src], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(rng, n, dim=64, labels=10):
    centers = rng.standard_normal((labels, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    lab = rng.integers(0, labels, size=n)
    vecs = centers[lab] + 0.35 * rng.standard_normal((n, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(lab.astype(np.int32), pa.int32()),
        }
    )


def gen_events(rng, n, users):
    ts0 = np.datetime64("2024-01-01T00:00:00.000000")
    span = np.timedelta64(30 * 24 * 3600 * 1_000_000, "us")
    offs = np.sort(rng.integers(0, int(span / np.timedelta64(1, "us")), size=n))
    types = np.array(["signup", "purchase", "view", "click", "error"])
    return pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "ts": pa.array(ts0 + offs.astype("timedelta64[us]")),
            "user_id": pa.array(rng.integers(0, users, size=n), pa.int64()),
            "event_type": pa.array(types[rng.integers(0, 5, size=n)], pa.string()),
            "value": pa.array(np.round(rng.uniform(0, 150, size=n), 2), pa.float64()),
            "props": pa.array(
                [f'{{"k": {k}}}' for k in rng.integers(0, 100, size=n)], pa.string()
            ),
        }
    )


def gen_tpch(rng, sf, out):
    n_orders = int(150_000 * sf * 10) if sf < 1 else int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    # orders
    totalprice = np.round(rng.uniform(1000, 500_000, size=n_orders), 2)
    odate = np.datetime64("1995-01-01") + rng.integers(
        0, 2500, size=n_orders
    ).astype("timedelta64[D]")
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
                "o_custkey": pa.array(rng.integers(0, n_cust, n_orders), pa.int64()),
                "o_orderstatus": pa.array(
                    np.array(["O", "F", "P"])[rng.integers(0, 3, n_orders)]
                ),
                "o_totalprice": pa.array(totalprice, pa.float64()),
                "o_orderdate": pa.array(odate.astype("datetime64[us]")),
                "o_orderpriority": pa.array(
                    np.array(
                        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
                    )[rng.integers(0, 5, n_orders)]
                ),
            }
        ),
        os.path.join(out, "orders.parquet"),
    )
    # lineitem: ~4 lines/order
    nl = rng.integers(1, 8, size=n_orders)
    okeys = np.repeat(np.arange(n_orders), nl)
    n_li = len(okeys)
    linenum = np.concatenate([np.arange(1, k + 1) for k in nl])
    ship = np.datetime64("1995-01-01") + rng.integers(0, 2500, n_li).astype(
        "timedelta64[D]"
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(okeys, pa.int64()),
                "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
                "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
                "l_linenumber": pa.array(linenum, pa.int64()),
                "l_quantity": pa.array(
                    rng.integers(1, 51, n_li).astype(np.float64), pa.float64()
                ),
                "l_extendedprice": pa.array(
                    np.round(rng.uniform(1000, 100_000, n_li), 2), pa.float64()
                ),
                "l_discount": pa.array(
                    np.round(rng.uniform(0, 0.1, n_li), 2), pa.float64()
                ),
                "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n_li), 2), pa.float64()),
                "l_returnflag": pa.array(
                    np.array(["N", "A", "R"])[rng.integers(0, 3, n_li)]
                ),
                "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
                "l_shipdate": pa.array(ship.astype("datetime64[us]")),
            }
        ),
        os.path.join(out, "lineitem.parquet"),
    )
    # customer / part / supplier / nation / region
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
                "c_name": pa.array([f"Customer#{i}" for i in range(n_cust)]),
                "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int64()),
                "c_acctbal": pa.array(
                    np.round(rng.uniform(-999, 9999, n_cust), 2), pa.float64()
                ),
                "c_mktsegment": pa.array(
                    np.array(
                        ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
                    )[rng.integers(0, 5, n_cust)]
                ),
            }
        ),
        os.path.join(out, "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part), pa.int64()),
                "p_name": pa.array([f"part {i}" for i in range(n_part)]),
                "p_brand": pa.array([f"Brand#{i % 25}" for i in range(n_part)]),
                "p_type": pa.array([f"TYPE {i % 150}" for i in range(n_part)]),
                "p_size": pa.array(rng.integers(1, 51, n_part), pa.int64()),
                "p_retailprice": pa.array(
                    np.round(rng.uniform(900, 2000, n_part), 2), pa.float64()
                ),
            }
        ),
        os.path.join(out, "part.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
                "s_name": pa.array([f"Supplier#{i}" for i in range(n_supp)]),
                "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int64()),
                "s_acctbal": pa.array(
                    np.round(rng.uniform(-999, 9999, n_supp), 2), pa.float64()
                ),
            }
        ),
        os.path.join(out, "supplier.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(np.arange(25), pa.int64()),
                "n_name": pa.array([f"NATION{i}" for i in range(25)]),
                "n_regionkey": pa.array(np.arange(25) % 5, pa.int64()),
            }
        ),
        os.path.join(out, "region.parquet" if False else "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(np.arange(5), pa.int64()),
                "r_name": pa.array([f"REGION{i}" for i in range(5)]),
            }
        ),
        os.path.join(out, "region.parquet"),
    )


def main():
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/root/testdata_local/sf{sf:g}"
    )
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(20260821)
    n_docs = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_ev = int(1_000_000 * sf)
    pq.write_table(gen_documents(rng, n_docs), os.path.join(out, "documents.parquet"))
    pq.write_table(gen_embeddings(rng, n_emb), os.path.join(out, "embeddings.parquet"))
    pq.write_table(
        gen_events(rng, n_ev, users=int(15_000 * sf)), os.path.join(out, "events.parquet")
    )
    gen_tpch(rng, sf, out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
