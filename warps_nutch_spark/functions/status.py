"""Crawl/protocol status codes and the fetch-status dispatch.

Codes mirror the reference:
- CrawlStatus (``crawl/CrawlStatus.java:22-48``)
- ProtocolStatusCodes (``protocol/ProtocolStatusCodes.java:22-63``)
- dispatch ProtocolStatus -> CrawlStatus
  (``fetch/TaskScheduler.java:665-729``)

The dispatch is exposed both as a plain dict (for the vectorized fetch
UDF — a pandas ``Series.map`` over int codes) and as a Spark Column
``CASE WHEN`` builder so counters can be recomputed declaratively.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


class CrawlStatus:
    UNFETCHED = 0x01
    FETCHED = 0x02
    GONE = 0x03
    REDIR_TEMP = 0x04
    REDIR_PERM = 0x05
    RETRY = 0x22
    NOTMODIFIED = 0x26

    NAMES = {
        0x01: "unfetched",
        0x02: "fetched",
        0x03: "gone",
        0x04: "redir_temp",
        0x05: "redir_perm",
        0x22: "retry",
        0x26: "notmodified",
    }


class ProtocolStatus:
    SUCCESS = 1
    FAILED = 2
    PROTO_NOT_FOUND = 10
    GONE = 11
    MOVED = 12
    TEMP_MOVED = 13
    NOTFOUND = 14
    RETRY = 15
    EXCEPTION = 16
    ACCESS_DENIED = 17
    ROBOTS_DENIED = 18
    REDIR_EXCEEDED = 19
    NOTFETCHING = 20
    NOTMODIFIED = 21
    WOULDBLOCK = 22
    BLOCKED = 23
    UNKNOWN_HOST = 24  # -> GONE + unreachable-host accounting
    TIMEOUT = 25  # (reference routes THREAD_TIMEOUT via RETRY/GONE paths)


# ProtocolStatus -> CrawlStatus (TaskScheduler.java:665-729)
PROTOCOL_TO_CRAWL: dict[int, int] = {
    ProtocolStatus.SUCCESS: CrawlStatus.FETCHED,
    ProtocolStatus.MOVED: CrawlStatus.REDIR_PERM,
    ProtocolStatus.TEMP_MOVED: CrawlStatus.REDIR_TEMP,
    ProtocolStatus.TIMEOUT: CrawlStatus.GONE,
    ProtocolStatus.UNKNOWN_HOST: CrawlStatus.GONE,
    ProtocolStatus.FAILED: CrawlStatus.RETRY,
    ProtocolStatus.EXCEPTION: CrawlStatus.RETRY,
    ProtocolStatus.RETRY: CrawlStatus.RETRY,
    ProtocolStatus.BLOCKED: CrawlStatus.RETRY,
    ProtocolStatus.WOULDBLOCK: CrawlStatus.RETRY,
    ProtocolStatus.GONE: CrawlStatus.GONE,
    ProtocolStatus.NOTFOUND: CrawlStatus.GONE,
    ProtocolStatus.ACCESS_DENIED: CrawlStatus.GONE,
    ProtocolStatus.ROBOTS_DENIED: CrawlStatus.GONE,
    ProtocolStatus.REDIR_EXCEEDED: CrawlStatus.GONE,
    ProtocolStatus.NOTMODIFIED: CrawlStatus.NOTMODIFIED,
}

# HTTP status -> ProtocolStatus (lib-http HttpBase.java:233-380 mapping)
HTTP_TO_PROTOCOL: dict[int, int] = {
    200: ProtocolStatus.SUCCESS,
    301: ProtocolStatus.MOVED,
    302: ProtocolStatus.TEMP_MOVED,
    303: ProtocolStatus.TEMP_MOVED,
    304: ProtocolStatus.NOTMODIFIED,
    307: ProtocolStatus.TEMP_MOVED,
    401: ProtocolStatus.ACCESS_DENIED,
    403: ProtocolStatus.ACCESS_DENIED,
    404: ProtocolStatus.NOTFOUND,
    410: ProtocolStatus.GONE,
    500: ProtocolStatus.EXCEPTION,
    503: ProtocolStatus.RETRY,
}


def protocol_to_crawl_col(code: Column) -> Column:
    """CASE WHEN form of the dispatch (for declarative counters)."""
    expr = F.lit(CrawlStatus.RETRY)
    for proto, crawl in PROTOCOL_TO_CRAWL.items():
        expr = F.when(code == proto, F.lit(crawl)).otherwise(expr)
    return expr


def status_name_col(status: Column) -> Column:
    expr = F.lit("unknown")
    for code, name in CrawlStatus.NAMES.items():
        expr = F.when(status == code, F.lit(name)).otherwise(expr)
    return expr


# Counter families mirroring NutchCounter (mapreduce/NutchCounter.java:49-71)
COUNTER_FOR_STATUS = {
    CrawlStatus.FETCHED: "stFetched",
    CrawlStatus.REDIR_TEMP: "stRedirTemp",
    CrawlStatus.REDIR_PERM: "stRedirPerm",
    CrawlStatus.NOTMODIFIED: "stNotModified",
    CrawlStatus.RETRY: "stRetry",
    CrawlStatus.UNFETCHED: "stUnfetched",
    CrawlStatus.GONE: "stGone",
}
