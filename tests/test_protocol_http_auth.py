"""protocol-httpclient parity vs a live in-process server: Basic and
Digest 401 challenge handshakes (server-side digest verification),
AuthScope credential matching (host/realm specificity, default rule,
no-match stays 401/ACCESS_DENIED), and the per-(host, port) cookie
jar (path scoping, Max-Age=0 deletion, cross-request persistence)."""

import base64
import hashlib
import http.server
import threading

from warps_nutch_spark.functions.status import ProtocolStatus
from warps_nutch_spark.operators.protocol_http import (
    _match_credentials,
    _parse_challenge,
    fetch_http_urls,
)

REALM_A, REALM_B = "wallace", "gromit"
NONCE = "abc123nonce"
OPAQUE = "op9876"


def _digest_expected(username, password, realm, uri):
    def h(s):
        return hashlib.md5(s.encode("iso-8859-1")).hexdigest()

    cnonce = h(uri + NONCE)[:16]
    ha1 = h(f"{username}:{realm}:{password}")
    ha2 = h(f"GET:{uri}")
    return h(f"{ha1}:{NONCE}:00000001:{cnonce}:auth:{ha2}")


class _Handler(http.server.BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, *a):
        pass

    def _send(self, code, body=b"", extra=()):
        self.send_response(code)
        self.send_header("Content-Type", "text/plain")
        self.send_header("Content-Length", str(len(body)))
        for k, v in extra:
            self.send_header(k, v)
        self.end_headers()
        if body:
            self.wfile.write(body)

    def do_GET(self):
        p = self.path
        auth = self.headers.get("Authorization", "")
        if p.startswith("/basic/"):
            realm = REALM_A if "/a/" in p else REALM_B
            want = p.rsplit("/", 1)[-1]  # expected user:pass
            tok = base64.b64encode(want.encode()).decode()
            if auth == f"Basic {tok}":
                self._send(200, b"basic ok " + want.encode())
            else:
                self._send(
                    401,
                    b"need auth",
                    extra=[("WWW-Authenticate", f'Basic realm="{realm}"')],
                )
        elif p == "/digest":
            if auth.startswith("Digest "):
                _, params = _parse_challenge(auth)
                want = _digest_expected("duser", "dpass", REALM_A, p)
                if (
                    params.get("response") == want
                    and params.get("nonce") == NONCE
                    and params.get("opaque") == OPAQUE
                    and params.get("qop") == "auth"
                ):
                    self._send(200, b"digest ok")
                    return
            self._send(
                401,
                b"need digest",
                extra=[(
                    "WWW-Authenticate",
                    f'Digest realm="{REALM_A}", nonce="{NONCE}", '
                    f'opaque="{OPAQUE}", qop="auth", algorithm=MD5',
                )],
            )
        elif p == "/cookie/set":
            self._send(
                200,
                b"set",
                extra=[
                    ("Set-Cookie", "sid=s1; Path=/"),
                    ("Set-Cookie", "scoped=deep; Path=/cookie"),
                ],
            )
        elif p == "/cookie/check":
            self._send(200, (self.headers.get("Cookie") or "-").encode())
        elif p == "/othercheck":
            # outside Path=/cookie: only sid should arrive
            self._send(200, (self.headers.get("Cookie") or "-").encode())
        elif p == "/cookie/del":
            self._send(200, b"del", extra=[("Set-Cookie", "sid=x; Max-Age=0")])
        else:
            self._send(404)


class _Srv:
    def __enter__(self):
        self.srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        threading.Thread(target=self.srv.serve_forever, daemon=True).start()
        return f"http://127.0.0.1:{self.srv.server_address[1]}"

    def __exit__(self, *a):
        self.srv.shutdown()
        self.srv.server_close()


def _fetch(spark, base, paths, rules=None, **kw):
    df = spark.createDataFrame([(f"{base}{p}",) for p in paths], ["url"])
    # one partition so the cookie jar and keep-alive sessions persist
    # across the request sequence, and rows stay in input order
    rows = (
        fetch_http_urls(df.coalesce(1), auth_rules=rules, **kw)
        .collect()
    )
    return {r.url[len(base):]: r for r in rows}


def test_basic_auth_retry(spark):
    with _Srv() as base:
        rules = [{"username": "u1", "password": "p1"}]
        out = _fetch(spark, base, ["/basic/a/u1:p1"], rules=rules)
        r = out["/basic/a/u1:p1"]
        assert r.code == 200
        assert bytes(r.content) == b"basic ok u1:p1"
        assert r.protocol_status == ProtocolStatus.SUCCESS


def test_basic_auth_retry_with_single_attempt_budget(spark):
    """The authenticated retry rides OUTSIDE the transport-retry budget
    (ADVICE r5): with max_retry=1 the 401 challenge used to consume the
    only attempt and the URL came back code 0 / EXCEPTION."""
    with _Srv() as base:
        rules = [{"username": "u1", "password": "p1"}]
        out = _fetch(spark, base, ["/basic/a/u1:p1"], rules=rules, max_retry=1)
        r = out["/basic/a/u1:p1"]
        assert r.code == 200
        assert bytes(r.content) == b"basic ok u1:p1"
        assert r.protocol_status == ProtocolStatus.SUCCESS


def test_basic_auth_no_rules_stays_401(spark):
    with _Srv() as base:
        out = _fetch(spark, base, ["/basic/a/u1:p1"])
        r = out["/basic/a/u1:p1"]
        assert r.code == 401
        assert r.protocol_status == ProtocolStatus.ACCESS_DENIED


def test_credential_scoping_realm_and_host(spark):
    with _Srv() as base:
        rules = [
            # realm-scoped credential wins over the default for wallace
            {"username": "u1", "password": "p1", "realm": REALM_A},
            # default credential (the <default> block)
            {"username": "u2", "password": "p2"},
            # different-host credential must never be chosen
            {"username": "ux", "password": "px", "host": "other.example"},
        ]
        out = _fetch(
            spark, base, ["/basic/a/u1:p1", "/basic/b/u2:p2"], rules=rules
        )
        assert out["/basic/a/u1:p1"].code == 200  # realm wallace -> u1
        assert out["/basic/b/u2:p2"].code == 200  # realm gromit -> default u2


def test_credential_wrong_host_not_used(spark):
    with _Srv() as base:
        rules = [{"username": "u1", "password": "p1", "host": "other.example"}]
        out = _fetch(spark, base, ["/basic/a/u1:p1"], rules=rules)
        assert out["/basic/a/u1:p1"].code == 401


def test_digest_auth_verified_by_server(spark):
    with _Srv() as base:
        rules = [{"username": "duser", "password": "dpass", "scheme": "digest"}]
        out = _fetch(spark, base, ["/digest"], rules=rules)
        r = out["/digest"]
        assert r.code == 200 and bytes(r.content) == b"digest ok"


def test_cookie_jar_roundtrip_and_scoping(spark):
    with _Srv() as base:
        out = _fetch(
            spark, base, ["/cookie/set", "/cookie/check", "/othercheck"]
        )
        got = bytes(out["/cookie/check"].content).decode()
        # longest path first (RFC 6265 5.4)
        assert got == "scoped=deep; sid=s1"
        assert bytes(out["/othercheck"].content).decode() == "sid=s1"


def test_cookie_deletion_max_age_zero(spark):
    with _Srv() as base:
        out = _fetch(
            spark, base,
            ["/cookie/set", "/cookie/del", "/othercheck"],
        )
        assert bytes(out["/othercheck"].content).decode() == "-"


def test_cookies_disabled(spark):
    with _Srv() as base:
        out = _fetch(
            spark, base, ["/cookie/set", "/cookie/check"], use_cookies=False
        )
        assert bytes(out["/cookie/check"].content).decode() == "-"


def test_match_credentials_specificity():
    rules = [
        {"username": "default", "password": "d"},
        {"username": "bystealth", "password": "s", "realm": "r1"},
        {"username": "byhost", "password": "h", "host": "h1", "realm": "r1"},
    ]
    assert _match_credentials(rules, "h1", 80, "r1", "basic")["username"] == "byhost"
    assert _match_credentials(rules, "h2", 80, "r1", "basic")["username"] == "bystealth"
    assert _match_credentials(rules, "h2", 80, "r9", "basic")["username"] == "default"
    assert _match_credentials([], "h", 80, None, None) is None
