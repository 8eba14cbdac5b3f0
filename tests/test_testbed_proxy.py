"""Testbed proxy (tools/proxy/TestbedProxy.java) + proxied protocol-http.

JDK-parity golden vectors below were generated with the container's
real JVM (java.util.Random / String.hashCode) so the fake link graph
is pinned bit-for-bit to what the reference's FakeHandler would emit.
"""

import re
import time
import urllib.request

import pandas as pd
import pytest

from warps_nutch_spark.operators.protocol_http import fetch_http_urls
from warps_nutch_spark.operators.testbed_proxy import (
    FakePages,
    JavaRandom,
    TestbedProxyServer,
    java_string_hash,
)

# -- JDK golden vectors (generated via javac/java in this container) --------

GOLDEN_SHARED = [370677, 364242, 414821, 515922, 923365,
                 404816, 380399, 545232, 123979, 538571]
GOLDEN_HOST3 = [174, 1005, 6795, 5612, 4566, 4, 156, 93, 5881, 3943]


def test_java_random_and_hash_parity():
    assert java_string_hash("host3.test") == -2084455147
    assert java_string_hash("www.example.com") == -1878290138
    r = JavaRandom(1234567890)
    assert [r.next_int(1_000_000) for _ in range(10)] == GOLDEN_SHARED
    p = JavaRandom(java_string_hash("host3.test"))
    assert [p.next_int(10_000) for _ in range(10)] == GOLDEN_HOST3
    q = JavaRandom(42)
    assert [q.next_int(7), q.next_int(7), q.next_int(1 << 16)] == [1, 5, 44775]


def test_fake_page_structure_and_determinism():
    fp = FakePages(int_links=10, ext_links=5)
    page = fp.render("http://host3.test/page/17.html").decode()
    # internal links come from Random(host.hashCode()).nextInt(numPages)
    internal = re.findall(r"href='(\d+)\.html'", page)
    assert [int(x) for x in internal] == GOLDEN_HOST3
    # external links come from the SHARED Random(1234567890)
    external = re.findall(r"href='http://www\.rnd-(\d+)\.com/'", page)
    assert [int(x) for x in external] == GOLDEN_SHARED[:5]
    assert "<p><a href='http://host3.test/'>site host3.test</a></p>" in page
    assert f"<p>URI: http://host3.test/page/17.html</p>" in page
    # same host, new renderer: internal links identical (host-seeded);
    # external links continue the shared sequence in a fresh instance
    page2 = FakePages(int_links=10, ext_links=5).render(
        "http://host3.test/other/3.html"
    ).decode()
    assert re.findall(r"href='(\d+)\.html'", page2) == internal


def test_unique_modes_and_basepath():
    fp = FakePages(host_mode="u", page_mode="u", int_links=2, ext_links=2)
    page = fp.render("http://sub.example.com/dir/page.html").decode()
    # basePath chops the trailing 5 chars (".html"); unique page seq
    assert "href='/dir/page/0.html'" in page
    assert "href='/dir/page/1.html'" in page
    # unique hosts: baseDomain minus TLD + seq
    assert "href='http://sub.example-0.com/'" in page
    assert "href='http://sub.example-1.com/'" in page


@pytest.fixture()
def proxy():
    srv = TestbedProxyServer(debug=True)
    yield srv
    srv.close()


def _proxied_get(proxy_endpoint: str, url: str):
    h, p = proxy_endpoint.removeprefix("http://").split(":")
    opener = urllib.request.build_opener(
        urllib.request.ProxyHandler({"http": f"http://{h}:{p}"})
    )
    return opener.open(url, timeout=10)


def test_proxy_fake_robots_and_headers(proxy):
    resp = _proxied_get(proxy.endpoint, "http://anyhost.test/robots.txt")
    assert resp.status == 200 and resp.read() == b""
    assert resp.headers["X-Handled-By"] == "FakeHandler"
    resp = _proxied_get(proxy.endpoint, "http://anyhost.test/some/page.html")
    body = resp.read().decode()
    assert "URI: http://anyhost.test/some/page.html" in body
    assert resp.headers["X-TestbedHandlers"] == "TestbedProxyServer"
    assert ("GET", "http://anyhost.test/robots.txt") in proxy.debug_log


def test_proxy_notfound_when_fake_off():
    srv = TestbedProxyServer(fake=False)
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _proxied_get(srv.endpoint, "http://nowhere.test/x")
        assert ei.value.code == 404
        assert ei.value.headers["X-Handled-By"] == "NotFoundHandler"
    finally:
        srv.close()


def test_proxy_delay_handler():
    srv = TestbedProxyServer(delay_ms=300)
    try:
        t0 = time.time()
        resp = _proxied_get(srv.endpoint, "http://slow.test/a.html")
        assert time.time() - t0 >= 0.28
        assert resp.headers["X-DelayHandler-Delay"] == "300"
    finally:
        srv.close()


def test_proxy_forward_mode():
    """-forward relays to the origin server (AsyncProxyServlet role)."""
    import http.server
    import threading

    class _Origin(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            body = f"origin:{self.path}".encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    origin = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Origin)
    threading.Thread(target=origin.serve_forever, daemon=True).start()
    oh, op = origin.server_address[:2]
    srv = TestbedProxyServer(forward=True, fake=False)
    try:
        resp = _proxied_get(srv.endpoint, f"http://{oh}:{op}/hello")
        assert resp.read() == b"origin:/hello"
        assert resp.headers["X-Handled-By"] == "ForwardHandler"
        # unreachable origin -> 502
        with pytest.raises(urllib.error.HTTPError) as ei:
            _proxied_get(srv.endpoint, "http://127.0.0.1:1/dead")
        assert ei.value.code == 502
    finally:
        srv.close()
        origin.shutdown()


def test_spark_fetch_through_proxy(spark, proxy):
    """fetch_http_urls(proxy_host=...) crawls the fake web: every URL
    succeeds with the deterministic fake page regardless of host."""
    h, p = proxy.address
    urls = [
        "http://host3.test/page/17.html",
        "http://host9.test/index.html",
        "http://elsewhere.example.com/deep/dir/doc.html",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    out = fetch_http_urls(df, proxy_host=h, proxy_port=p).toPandas()
    assert (out["code"] == 200).all()
    by_url = {r["url"]: r for _, r in out.iterrows()}
    body3 = bytes(by_url["http://host3.test/page/17.html"]["content"]).decode()
    internal = [int(x) for x in re.findall(r"href='(\d+)\.html'", body3)]
    assert internal == GOLDEN_HOST3  # same graph the reference would fake
    for u in urls:
        assert f"URI: {u}" in bytes(by_url[u]["content"]).decode()


# -- ProxyPool (net/proxy/ProxyPool.java) ------------------------------------


def test_proxy_pool_rotation_retire_and_recovery():
    from warps_nutch_spark.operators.proxy_pool import (
        NoProxyError,
        ProxyPool,
        parse_proxy_list,
    )

    assert parse_proxy_list("# c\na:1\n\nb.example:8080\n") == [
        ("a", 1), ("b.example", 8080),
    ]
    clock = [0.0]
    alive = {("a", 1): True, ("b", 2): True}
    pool = ProxyPool(
        [("a", 1), ("b", 2)],
        tester=lambda h, p: alive[(h, p)],
        clock=lambda: clock[0],
        ttl_s=10.0,
        review_retired_s=60.0,
    )
    # FIFO rotation
    assert pool.poll().address == ("a", 1)
    assert pool.poll().address == ("b", 2)
    assert pool.poll().address == ("a", 1)
    # expiry triggers a re-test; dead entries retire
    alive[("b", 2)] = False
    clock[0] = 11.0
    assert pool.poll().address == ("a", 1)  # b tested dead, retired
    assert pool.size() == 1 and pool.retired_size() == 1
    # transport-failure retire (and the tester agrees it is down, so
    # the exhausted-pool review can't immediately resurrect it)
    e = pool.poll()
    alive[("a", 1)] = False
    pool.retire(e)
    assert pool.exhausted()
    # exhausted + nothing recovers -> NoProxyError
    with pytest.raises(NoProxyError):
        pool.poll()
    # recovery: b comes back, review returns it to the pool
    alive[("b", 2)] = True
    assert pool.review_retired(force=True) == 1
    assert pool.poll().address == ("b", 2)


def test_spark_fetch_through_proxy_pool(spark):
    """fetch.mode=PROXY: a pool with a dead proxy first still fetches
    everything — the dead entry is retired per partition and traffic
    flows through the live testbed proxy."""
    live = TestbedProxyServer()
    try:
        h, p = live.address
        urls = [f"http://pool{i}.test/page/{i}.html" for i in range(6)]
        df = spark.createDataFrame([(u,) for u in urls], ["url"]).repartition(2)
        out = fetch_http_urls(
            df, proxy_pool=[("127.0.0.1", 1), (h, p)], timeout_s=3.0
        ).toPandas()
        assert (out["code"] == 200).all()
        for u in urls:
            row = out[out["url"] == u].iloc[0]
            assert f"URI: {u}" in bytes(row["content"]).decode()
    finally:
        live.close()
