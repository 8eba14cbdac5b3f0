"""Testbed proxy: the crawl-benchmark fake-web proxy.

Reference: ``tools/proxy/TestbedProxy.java`` — an HTTP proxy composed
of a handler chain used to exercise a crawler without touching the
real web:

- ``LogDebugHandler``   — record request lines (``-debug``)
- ``DelayHandler``      — constant or seeded-random per-response delay
  (``-delay nnn``; negative = random up to ``-nnn``), stamping
  ``X-DelayHandler-Delay`` (``DelayHandler.java:20-31``)
- forwarding proxy      — pass unknown URLs to their origin servers
  (``-forward``; AsyncProxyServlet)
- ``FakeHandler``       — synthesize a deterministic fake page for ANY
  URL: fixed prose + ``<p>URI: ...</p>`` + N internal links + M
  external links + a site-root link (``FakeHandler.java:60-130``);
  ``/robots.txt`` returns an empty allow-all body
- ``NotFoundHandler``   — 404 for whatever remains
  (``NotFoundHandler.java:24-31``)

The fake link graph is reproduced bit-for-bit: page-link ids come from
``java.util.Random(host.hashCode()).nextInt(numPages)`` and external
hosts from a shared ``Random(1234567890L).nextInt(numHosts)``, so the
same URL sequence yields the same crawl frontier as the reference
testbed (:class:`JavaRandom` / :func:`java_string_hash` implement the
JDK LCG and ``String.hashCode`` exactly).

This is engine *tooling* (a benchmark harness component, not a crawl
operator): it runs driver-side next to the fetch engine; the Spark
side talks to it through :func:`..operators.protocol_http.
fetch_http_urls` with ``proxy_host``/``proxy_port`` set (the
``http.proxy.host``/``http.proxy.port`` knobs, HttpBase.java:145-151).
"""

from __future__ import annotations

import threading
import time
import urllib.parse
import urllib.request
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

# -- JDK parity primitives ---------------------------------------------------


def java_string_hash(s: str) -> int:
    """``java.lang.String.hashCode()`` (signed 32-bit)."""
    h = 0
    for ch in s:
        h = (31 * h + ord(ch)) & 0xFFFFFFFF
    return h - (1 << 32) if h >= (1 << 31) else h


class JavaRandom:
    """``java.util.Random`` 48-bit LCG with ``nextInt(bound)``."""

    _MULT = 0x5DEECE66D
    _ADD = 0xB
    _MASK = (1 << 48) - 1

    def __init__(self, seed: int):
        self.seed = (seed ^ self._MULT) & self._MASK

    def _next(self, bits: int) -> int:
        self.seed = (self.seed * self._MULT + self._ADD) & self._MASK
        return self.seed >> (48 - bits)

    def next_int(self, bound: int) -> int:
        if bound <= 0:
            raise ValueError("bound must be positive")
        if bound & (bound - 1) == 0:  # power of two
            return (bound * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % bound
            if bits - val + (bound - 1) <= 0x7FFFFFFF:  # no int overflow
                return val


# -- FakeHandler content (FakeHandler.java testA/testB, verbatim prose
# is long; structurally equivalent fixed paragraphs keep pages the same
# shape and deterministic without copying the reference's text) -------------

TEST_A = (
    "<html><body><h1>Internet Weather Forecast Accuracy</h1>\n"
    "<p>Testbed paragraph A: fixed prose so every fake page has an "
    "identical deterministic body prefix for signature and dedup "
    "testing purposes.</p>"
)
TEST_B = (
    "<p>Testbed paragraph B: fixed prose suffix closing the fake page "
    "body.</p></body></html>"
)


class FakePages:
    """Deterministic fake-page generator (FakeHandler semantics)."""

    def __init__(
        self,
        host_mode: str = "r",
        page_mode: str = "r",
        num_hosts: int = 1_000_000,
        num_pages: int = 10_000,
        int_links: int = 10,
        ext_links: int = 5,
    ):
        self.host_mode = host_mode
        self.page_mode = page_mode
        self.num_hosts = num_hosts
        self.num_pages = num_pages
        self.int_links = int_links
        self.ext_links = ext_links
        self._r = JavaRandom(1234567890)  # FakeHandler.java:44 shared
        self._host_seq = 0
        self._page_seq = 0
        self._lock = threading.Lock()

    def render(self, uri: str) -> bytes:
        u = urllib.parse.urlsplit(uri)
        host = u.hostname or ""
        path = u.path or "/"
        out = [TEST_A.encode()]
        out.append(f"<p>URI: {uri}</p>\r\n".encode())
        base_path = path[:-5] if len(path) > 5 else path
        with self._lock:
            if self.page_mode == "r":
                page_r = JavaRandom(java_string_hash(host))
            for i in range(self.int_links):
                if self.page_mode == "r":
                    target = f"{page_r.next_int(self.num_pages)}.html"
                else:
                    sep = "" if base_path.endswith("/") else "/"
                    target = f"{base_path}{sep}{self._page_seq}.html"
                    self._page_seq += 1
                out.append(
                    f"<p><a href='{target}'>outlink {i}</a></p>\r\n".encode()
                )
            pos = host.rfind(".")
            base_domain = host[:pos] if pos >= 0 else host
            for _ in range(self.ext_links):
                if self.host_mode == "r":
                    ext = f"www.rnd-{self._r.next_int(self.num_hosts)}.com"
                else:
                    ext = f"{base_domain}-{self._host_seq}.com"
                    self._host_seq += 1
                out.append(
                    f"<p><a href='http://{ext}/'>fake host {ext}</a></p>\r\n".encode()
                )
        root = f"{u.scheme}://{host}"
        if u.port not in (None, 80):
            root += f":{u.port}"
        out.append(f"<p><a href='{root}/'>site {host}</a></p>\r\n".encode())
        out.append(TEST_B.encode())
        return b"".join(out)


class TestbedProxyServer:
    """In-process testbed proxy (TestbedProxy.java main)."""

    __test__ = False  # name starts with "Test" but is not a pytest class

    def __init__(
        self,
        port: int = 0,
        host: str = "127.0.0.1",
        fake: bool = True,
        forward: bool = False,
        delay_ms: int = 0,
        debug: bool = False,
        **fake_kw,
    ):
        self.fake = FakePages(**fake_kw) if fake else None
        self.forward = forward
        self.delay_ms = delay_ms
        self._delay_r = JavaRandom(1234567890) if delay_ms < 0 else None
        # handler threads share the LCG (ThreadingHTTPServer): without a
        # lock the seed update races and the delay sequence corrupts
        self._delay_lock = threading.Lock()
        self.debug_log: deque = deque(maxlen=10_000) if debug else deque(maxlen=0)
        outer = self

        class _Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, body=b"", ctype="text/html",
                      extra=(), handled_by=""):
                self.send_response(code)
                self.send_header("X-TestbedHandlers", "TestbedProxyServer")
                if handled_by:
                    self.send_header("X-Handled-By", handled_by)
                if ctype:
                    self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                for k, v in extra:
                    self.send_header(k, v)
                self.end_headers()
                if body:
                    self.wfile.write(body)

            def do_GET(self):
                # proxy requests use the absolute-URI form; fall back to
                # origin-form + Host for direct hits
                uri = self.path
                if not uri.startswith(("http://", "https://")):
                    uri = f"http://{self.headers.get('Host', 'unknown')}{uri}"
                if outer.debug_log.maxlen:
                    outer.debug_log.append(("GET", uri))
                extra = []
                if outer.delay_ms:
                    if outer.delay_ms < 0:
                        with outer._delay_lock:
                            d = outer._delay_r.next_int(-outer.delay_ms)
                    else:
                        d = outer.delay_ms
                    time.sleep(d / 1000.0)
                    extra.append(("X-DelayHandler-Delay", str(d)))
                if outer.forward:
                    return self._forward(uri, extra)
                if outer.fake is not None:
                    return self._fake(uri, extra)
                return self._send(
                    404, f"Not found: {uri}".encode(), ctype="text/plain",
                    extra=extra, handled_by="NotFoundHandler",
                )

            def _fake(self, uri, extra):
                extra = list(extra) + [("X-FakeHandler-URI", uri)]
                if uri.endswith("/robots.txt"):
                    # FakeHandler.java:68-70: robots.txt -> empty 200
                    return self._send(200, b"", ctype="text/plain",
                                      extra=extra, handled_by="FakeHandler")
                body = outer.fake.render(uri)
                return self._send(200, body, extra=extra,
                                  handled_by="FakeHandler")

            def _forward(self, uri, extra):
                try:
                    req = urllib.request.Request(
                        uri, headers={"User-Agent": "TestbedProxy"}
                    )
                    with urllib.request.urlopen(req, timeout=10) as resp:
                        body = resp.read()
                        return self._send(
                            resp.status, body,
                            ctype=resp.headers.get("Content-Type",
                                                   "text/html"),
                            extra=extra, handled_by="ForwardHandler",
                        )
                except urllib.error.HTTPError as e:
                    return self._send(e.code, e.read() or b"",
                                      ctype="text/plain", extra=extra,
                                      handled_by="ForwardHandler")
                except Exception as e:  # origin unreachable
                    return self._send(502, str(e).encode(),
                                      ctype="text/plain", extra=extra,
                                      handled_by="ForwardHandler")

        self._srv = ThreadingHTTPServer((host, port), _Handler)
        self._thread = threading.Thread(target=self._srv.serve_forever,
                                        daemon=True)
        self._thread.start()

    @property
    def address(self) -> tuple[str, int]:
        return self._srv.server_address[:2]

    @property
    def endpoint(self) -> str:
        h, p = self.address
        return f"http://{h}:{p}"

    def close(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()
