"""Rotating proxy pool for the HTTP fetcher.

Reference: ``net/proxy/ProxyPool.java`` + ``ProxyEntry.java`` — a FIFO
pool of proxy servers loaded from a ``host:port``-per-line list file
(``/tmp/nutch-proxy-servers.txt``, hash comments — ``util/
FiledLines.java``); ``poll()`` hands out the next entry, re-testing
entries whose freshness TTL expired and retiring the dead ones;
``reviewRetired()`` periodically re-tests retired entries and returns
the recovered ones to the pool; an exhausted pool raises
(``NoProxyException.java``). ``HttpBase.java:147-151`` turns the pool
on via ``fetch.mode = PROXY``.

Engine shape: the pool is PER-PARTITION state inside the
``fetch_http_urls`` mapInPandas batch (each executor slot rotates its
own pool — the analog of one fetch thread's ProxyPool), built from the
same literal proxy list on every partition. The clock and the
availability tester are injectable so politeness/recovery semantics
are unit-testable without sleeping.
"""

from __future__ import annotations

import time


class NoProxyError(RuntimeError):
    """NoProxyException.java: the pool is exhausted."""


def parse_proxy_list(text: str) -> list[tuple[str, int]]:
    """``host:port`` per line, ``#`` comments (FiledLines contract)."""
    out = []
    for ln in text.splitlines():
        ln = ln.strip()
        if not ln or ln.startswith("#"):
            continue
        host, _, port = ln.rpartition(":")
        out.append((host, int(port)))
    return out


class ProxyEntry:
    """ProxyEntry.java: address + freshness TTL + retire count."""

    def __init__(self, host: str, port: int, ttl_s: float = 120.0,
                 clock=time.monotonic):
        self.host = host
        self.port = port
        self.ttl_s = ttl_s
        self._clock = clock
        self._fresh_at = clock()
        self.retired = 0

    @property
    def address(self) -> tuple[str, int]:
        return (self.host, self.port)

    def expired(self) -> bool:
        return self._clock() - self._fresh_at > self.ttl_s

    def refresh(self) -> None:
        self._fresh_at = self._clock()


def _tcp_test(host: str, port: int, timeout_s: float = 2.0) -> bool:
    import socket

    try:
        with socket.create_connection((host, port), timeout=timeout_s):
            return True
    except OSError:
        return False


class ProxyPool:
    """FIFO rotation with retire + periodic retired review."""

    def __init__(
        self,
        proxies: list[tuple[str, int]],
        tester=_tcp_test,
        clock=time.monotonic,
        ttl_s: float = 120.0,
        review_retired_s: float = 60.0,  # ProxyPool.reviewRetiredPeriod
    ):
        self._clock = clock
        self._tester = tester
        self._review_s = review_retired_s
        self._last_review = clock() - review_retired_s  # review allowed at t0
        self._live = [ProxyEntry(h, p, ttl_s, clock) for h, p in proxies]
        self._retired: list[ProxyEntry] = []

    @classmethod
    def from_file(cls, path: str, **kw) -> "ProxyPool":
        with open(path) as f:
            return cls(parse_proxy_list(f.read()), **kw)

    def size(self) -> int:
        return len(self._live)

    def exhausted(self) -> bool:
        return not self._live

    def retired_size(self) -> int:
        return len(self._retired)

    def poll(self) -> ProxyEntry:
        """Next live proxy (FIFO, the entry goes to the back — the
        ProxyPool poll/put cycle); expired entries are re-tested and
        dead ones retired. Every poll also gives retired entries their
        rate-limited recovery review (the ProxyUpdateThread's role —
        without it a burst of retirements would collapse the pool
        permanently even after the proxies recover). Raises
        NoProxyError when exhausted after the review."""
        self.review_retired(force=False)
        while True:
            if not self._live:
                self.review_retired(force=True)
            if not self._live:
                raise NoProxyError("proxy pool exhausted")
            e = self._live.pop(0)
            if e.expired():
                if self._tester(e.host, e.port):
                    e.refresh()
                else:
                    self._retire_entry(e)
                    continue
            self._live.append(e)  # rotate to the back
            return e

    def retire(self, entry: ProxyEntry) -> None:
        """Report a proxy dead (transport failure through it)."""
        if entry in self._live:
            self._live.remove(entry)
        self._retire_entry(entry)

    def _retire_entry(self, entry: ProxyEntry) -> None:
        entry.retired += 1
        if entry not in self._retired:
            self._retired.append(entry)

    def review_retired(self, force: bool = True) -> int:
        """Re-test retired proxies, return recovered count
        (ProxyPool.reviewRetired — rate-limited unless forced)."""
        now = self._clock()
        if not force and now - self._last_review < self._review_s:
            return 0
        self._last_review = now
        recovered = 0
        still_dead = []
        for e in self._retired:
            if self._tester(e.host, e.port):
                e.refresh()
                self._live.append(e)
                recovered += 1
            else:
                still_dead.append(e)
        self._retired = still_dead
        return recovered
