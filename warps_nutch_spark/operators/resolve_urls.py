"""ResolveUrls: bulk DNS-resolution check over a URL list.

Reference: ``tools/ResolveUrls.java`` — a thread pool resolving each
URL's host via ``InetAddress.getByName``, counting
total/resolved/errored and total latency.

Spark shape: the URL list is a DataFrame; resolution fans out as an
Arrow-batched ``mapInPandas`` over its partitions (the thread pool the
reference builds by hand is the executor pool here), one resolver
session per partition. Returns one row per URL: (url, host, resolved,
millis). The sandbox has no DNS, so the resolver is injectable
(``resolver=`` callable) — production uses the default
``socket.gethostbyname``; tests pass a deterministic fake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

RESOLVE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("resolved", T.BooleanType()),
        T.StructField("millis", T.LongType()),
    ]
)


def resolve_urls(
    df: DataFrame,
    url_col: str = "url",
    resolver=None,
) -> DataFrame:
    """(url, host, resolved, millis) per input row
    (``ResolveUrls.ResolverThread.run``: resolve the hostname, success
    = no exception, wall-time recorded)."""

    def _batches(it):
        import socket
        import time

        import pandas as pd

        from ..functions.urls import host_of

        res = resolver or socket.gethostbyname
        for pdf in it:
            rows = []
            for u in pdf[url_col]:
                host = host_of(u)
                t0 = time.time()
                ok = False
                if host:
                    try:
                        res(host)
                        ok = True
                    except Exception:
                        ok = False
                rows.append(
                    {
                        "url": u,
                        "host": host,
                        "resolved": ok,
                        "millis": int((time.time() - t0) * 1000),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESOLVE_SCHEMA])

    return df.select(url_col).mapInPandas(_batches, RESOLVE_SCHEMA)


def resolve_summary(resolved: DataFrame) -> dict:
    """The reference's end-of-run log line: total / resolved / errored
    / average millis (``ResolveUrls.java:66-69``)."""
    from pyspark.sql import functions as F

    row = resolved.agg(
        F.count("*").alias("total"),
        F.sum(F.col("resolved").cast("int")).alias("ok"),
        F.sum("millis").alias("ms"),
    ).first()
    total = row["total"] or 0
    return {
        "total": total,
        "resolved": int(row["ok"] or 0),
        "errored": total - int(row["ok"] or 0),
        "avg_millis": (int(row["ms"] or 0) // total) if total else 0,
    }
