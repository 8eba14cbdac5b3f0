"""URL canonicalization, reversal, hashing, host/domain extraction.

Semantics mirror the reference's normalizer chain:

- basic normalizer rules (lowercase scheme/host, drop default port,
  strip fragment, resolve ``/./`` ``/../``, collapse ``//``, empty path
  -> ``/``): reference
  ``src/plugin/urlnormalizer-basic/.../BasicURLNormalizer.java:95-201``
- regex normalizer default rules (session-id strip, ``?&`` -> ``?``,
  ``&&`` -> ``&``, trailing ``?``/``&``/``.`` strip): reference
  ``src/plugin/urlnormalizer-regex/sample/regex-normalize-default.xml``
- reversed-URL row key: reference
  ``src/java/org/apache/nutch/util/TableUtil.java:51-117``

Three forms are provided for each operation:

1. a pure-Python scalar function (unit-testable semantic truth),
2. a vectorized pandas form (used inside Arrow-batched UDFs — never
   row-at-a-time Python in the hot path),
3. where expressible, a native Spark Column expression (JVM-side,
   whole-stage-codegen friendly) — this is the one used in the
   DataFrame plans so Catalyst sees through it.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# regex rule table (ordered; first field is the Python/Java/RE2-safe pattern,
# second the replacement). Mirrors regex-normalize-default.xml semantics.
# Patterns deliberately avoid lookaround so the same rules run identically in
# Spark (Java regex), pandas (Python re) and DuckDB (RE2) oracles.
# --------------------------------------------------------------------------
REGEX_NORMALIZE_RULES: list[tuple[str, str]] = [
    # strip session ids in path: ;jsessionid=... up to next / or ? or end
    (r";jsessionid=[0-9a-zA-Z!+-]+", ""),
    # strip common session-id query params (sid, PHPSESSID, sessionid, ...)
    (
        r"([;_&?])(sid|phpsessid|sessionid|jsessionid|bv_sessionid|cfid|cftoken)"
        r"=[0-9a-zA-Z_!.+-]*",
        r"\1",
    ),
    # ?& -> ?
    (r"\?&", "?"),
    # && -> &  (repeatedly collapsed below)
    (r"&+", "&"),
    # remove trailing ? & or ;
    (r"[?&;]+$", ""),
]

DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21}

_URL_RE = re.compile(
    r"^(?P<scheme>[a-zA-Z][a-zA-Z0-9+.-]*)://"
    r"(?P<host>[^/:?#]+)"
    r"(?::(?P<port>\d+))?"
    r"(?P<path>/[^?#]*)?"
    r"(?:\?(?P<query>[^#]*))?"
    r"(?:#.*)?$"
)

_DOT_SEG_RE = re.compile(r"/[^/]+/\.\./")
_CUR_SEG_RE = re.compile(r"/\./")
_DUP_SLASH_RE = re.compile(r"//+")


def _normalize_path(path: str) -> str:
    if not path:
        return "/"
    path = _DUP_SLASH_RE.sub("/", path)
    while True:
        new = _CUR_SEG_RE.sub("/", path)
        if new == path:
            break
        path = new
    while True:
        new = _DOT_SEG_RE.sub("/", path, count=1)
        if new == path:
            break
        path = new
    return path or "/"


def canonicalize(url: str | None) -> str | None:
    """Pure-Python canonical form; returns None for unparseable URLs
    (the normalizer-chain 'reject' outcome)."""
    if url is None:
        return None
    url = url.strip()
    m = _URL_RE.match(url)
    if not m:
        return None
    scheme = m.group("scheme").lower()
    host = m.group("host").lower().rstrip(".")
    port = m.group("port")
    path = _normalize_path(m.group("path") or "/")
    query = m.group("query")

    out = f"{scheme}://{host}"
    if port is not None and int(port) != DEFAULT_PORTS.get(scheme, -1):
        out += f":{int(port)}"
    out += path
    if query:
        out += f"?{query}"
    for pat, repl in REGEX_NORMALIZE_RULES:
        out = re.sub(pat, repl, out)
    return out


def canonicalize_series(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalization for Arrow-batched UDFs."""
    s = urls.astype("string").str.strip()
    ext = s.str.extract(_URL_RE.pattern)
    ok = ext["scheme"].notna()
    scheme = ext["scheme"].str.lower()
    host = ext["host"].str.lower().str.rstrip(".")
    port = ext["port"]
    path = ext["path"].fillna("/")
    # vectorized path cleanup (regex passes; loop count bounded by depth)
    path = path.str.replace(_DUP_SLASH_RE, "/", regex=True)
    for _ in range(8):
        path = path.str.replace(_CUR_SEG_RE, "/", regex=True)
        path = path.str.replace(_DOT_SEG_RE, "/", regex=True)
    query = ext["query"]

    port_num = pd.to_numeric(port, errors="coerce")
    default_port = pd.to_numeric(scheme.map(DEFAULT_PORTS), errors="coerce")
    keep_port = port.notna() & (port_num != default_port)
    port_str = port_num.astype("Int64").astype("string")
    out = (
        scheme
        + "://"
        + host
        + (":" + port_str).where(keep_port, "")
        + path
        + ("?" + query).where(query.notna() & (query != ""), "")
    )
    for pat, repl in REGEX_NORMALIZE_RULES:
        out = out.str.replace(pat, repl.replace("\\1", r"\1"), regex=True)
    return out.where(ok, None)


def canonicalize_col(url: Column) -> Column:
    """Native-Spark canonicalization (JVM regexp_replace chain).

    Covers the regex-normalizer rules + scheme/host lowercasing +
    default-port drop + fragment strip. Path dot-segment resolution is
    bounded to a few passes (crawl URLs are shallow); the pandas form is
    the full-fidelity fallback. Used in plans so Catalyst can fold it.
    """
    c = F.trim(url)
    # lowercase the scheme://host[:port] prefix only (path/query keep case)
    auth = F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)", 1)
    rest = c.substr(F.length(auth) + F.lit(1), F.length(c))
    c = F.when(auth == "", c).otherwise(F.concat(F.lower(auth), rest))
    c = F.regexp_replace(c, r"#.*$", "")  # strip fragment
    c = F.regexp_replace(c, r"^(http)://([^/:?#]+):80(/|$)", r"$1://$2$3")
    c = F.regexp_replace(c, r"^(https)://([^/:?#]+):443(/|$)", r"$1://$2$3")
    for _ in range(4):  # bounded dot-segment resolution
        c = F.regexp_replace(c, r"/\./", "/")
        c = F.regexp_replace(c, r"/[^/]+/\.\./", "/")
    c = F.regexp_replace(c, r"(://[^/]+)$", r"$1/")  # empty path -> /
    c = F.regexp_replace(c, r"([^:/])//+", r"$1/")  # collapse dup slashes
    c = F.regexp_replace(c, r";jsessionid=[0-9a-zA-Z!+-]+", "")
    c = F.regexp_replace(
        c,
        r"([;_&?])(sid|phpsessid|sessionid|jsessionid|bv_sessionid|cfid|cftoken)"
        r"=[0-9a-zA-Z_!.+-]*",
        r"$1",
    )
    c = F.regexp_replace(c, r"\?&", "?")
    c = F.regexp_replace(c, r"&+", "&")
    c = F.regexp_replace(c, r"[?&;]+$", "")
    # reject non-URLs (the normalizer-chain 'reject' outcome -> NULL)
    return F.when(c.rlike(r"^[a-z][a-z0-9+.-]*://[^/?#]+"), c).otherwise(
        F.lit(None).cast("string")
    )


# --------------------------------------------------------------------------
# host / domain extraction
# --------------------------------------------------------------------------
_HOST_PATTERN = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)"


def host_of(url: str | None) -> str | None:
    if url is None:
        return None
    m = re.match(_HOST_PATTERN, url)
    return m.group(1).lower() if m else None


def host_col(url: Column) -> Column:
    """Host extraction as a native expression (regexp_extract is
    whole-stage-codegen'd; also expressible verbatim in the DuckDB
    oracle)."""
    h = F.lower(F.regexp_extract(url, _HOST_PATTERN, 1))
    return F.when(h == "", None).otherwise(h)


def domain_of(host: str | None) -> str | None:
    """Registered-domain heuristic: last two labels (reference
    ``util/URLUtil.getDomainName``; without the public-suffix list the
    two-label rule is the documented fallback)."""
    if not host:
        return None
    parts = host.split(".")
    return ".".join(parts[-2:]) if len(parts) >= 2 else host


def domain_col(host: Column) -> Column:
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1)),
    ).otherwise(host)


# --------------------------------------------------------------------------
# reversed-URL row key (TableUtil.reverseUrl semantics):
# "http://bar.foo.com:8983/to/index.html?a=b"
#   -> "com.foo.bar:http:8983/to/index.html?a=b"
# --------------------------------------------------------------------------
def reverse_url(url: str | None) -> str | None:
    if url is None:
        return None
    m = _URL_RE.match(url)
    if not m:
        return None
    host = m.group("host")
    rev_host = ".".join(reversed(host.split(".")))
    scheme = m.group("scheme")
    port = m.group("port")
    path = m.group("path") or ""
    query = m.group("query")
    out = f"{rev_host}:{scheme}"
    if port is not None:
        out += f":{int(port)}"
    out += path
    if query is not None:
        out += f"?{query}"
    return out


def unreverse_url(key: str | None) -> str | None:
    """Inverse of :func:`reverse_url` (TableUtil.unreverseUrl)."""
    if key is None:
        return None
    m = re.match(
        r"^(?P<rhost>[^:/?#]+):(?P<scheme>[a-zA-Z][a-zA-Z0-9+.-]*)"
        r"(?::(?P<port>\d+))?(?P<rest>.*)$",
        key,
    )
    if not m:
        return None
    host = ".".join(reversed(m.group("rhost").split(".")))
    out = f"{m.group('scheme')}://{host}"
    if m.group("port"):
        out += f":{m.group('port')}"
    return out + m.group("rest")


def reverse_url_col(url: Column) -> Column:
    """Native reversed-key: reverse(split(host,'.')) joined, plus
    scheme[:port]path?query — pure built-ins, codegen-friendly."""
    host = F.regexp_extract(url, _HOST_PATTERN, 1)
    rev_host = F.concat_ws(".", F.reverse(F.split(host, r"\.")))
    scheme = F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)
    port = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/:?#]+:(\d+)", 1)
    rest = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([/?].*)?$", 1)
    return F.concat(
        rev_host,
        F.lit(":"),
        scheme,
        F.when(port == "", F.lit("")).otherwise(F.concat(F.lit(":"), port)),
        rest,
    )


# --------------------------------------------------------------------------
# representative URL on redirect (util/URLUtil.chooseRepr, the Yahoo!
# Slurp rule; applied at TaskScheduler.java:731-774; golden vectors in
# src/test/org/apache/nutch/util/TestURLUtil.java)
# --------------------------------------------------------------------------
def _file_part_col(url: Column) -> Column:
    """Java URL.getFile(): path + query ('' when neither)."""
    return F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+", "")


def _java_split_size(s: Column, sep: str) -> Column:
    """Java String.split drops TRAILING empty strings; Spark keeps
    them — strip trailing separators first."""
    trimmed = F.regexp_replace(s, f"[{sep}]+$", "")
    return F.size(F.split(trimmed, f"[{sep}]"))


def choose_repr_col(src: Column, dst: Column, temp: Column) -> Column:
    """chooseRepr as a pure column expression.

    Rules (URLUtil.java chooseRepr):
    1. different registered domains -> dst;
    2. permanent: src root -> src, else dst;
    3. temp, src root and dst not -> src; dst root and src not -> dst;
    4. temp, neither root, same host -> fewer path segments wins, tie
       broken by shorter file; dst only on STRICT inequality;
    5. otherwise (both root, or neither root on different hosts) ->
       fewer subdomain labels wins (strictly), else src.
    """
    src_host = host_col(src)
    dst_host = host_col(dst)
    src_file = _file_part_col(src)
    dst_file = _file_part_col(dst)
    src_root = (src_file == "") | (src_file == "/")
    dst_root = (dst_file == "") | (dst_file == "/")
    src_paths = _java_split_size(src_file, "/")
    dst_paths = _java_split_size(dst_file, "/")
    same_host_pick = (
        F.when(dst_paths < src_paths, dst)
        .when(dst_paths > src_paths, src)
        .when(F.length(dst_file) < F.length(src_file), dst)
        .otherwise(src)
    )
    sub_pick = F.when(
        F.size(F.split(dst_host, r"\.")) < F.size(F.split(src_host, r"\.")), dst
    ).otherwise(src)
    return (
        F.when(src_host.isNull() | dst_host.isNull(), dst)
        .when(domain_col(src_host) != domain_col(dst_host), dst)
        .when(~temp, F.when(src_root, src).otherwise(dst))
        .when(src_root & ~dst_root, src)
        .when(~src_root & dst_root, dst)
        .when(~src_root & ~dst_root & (src_host == dst_host), same_host_pick)
        .otherwise(sub_pick)
    )


def choose_repr(src: str, dst: str, temp: bool) -> str:
    """Scalar twin of :func:`choose_repr_col` (semantic truth for the
    golden-vector tests)."""
    src_host, dst_host = host_of(src), host_of(dst)
    if src_host is None or dst_host is None:
        return dst
    if domain_of(src_host) != domain_of(dst_host):
        return dst
    src_file = re.sub(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+", "", src)
    dst_file = re.sub(r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+", "", dst)
    src_root = src_file in ("", "/")
    dst_root = dst_file in ("", "/")
    if not temp:
        return src if src_root else dst
    if src_root and not dst_root:
        return src
    if not src_root and dst_root:
        return dst
    if not src_root and not dst_root and src_host == dst_host:
        nsrc = len(re.sub(r"/+$", "", src_file).split("/"))
        ndst = len(re.sub(r"/+$", "", dst_file).split("/"))
        if nsrc != ndst:
            return dst if ndst < nsrc else src
        return dst if len(dst_file) < len(src_file) else src
    return dst if len(dst_host.split(".")) < len(src_host.split(".")) else src


# --------------------------------------------------------------------------
# url hash (dedup/merge key): SHA1 hex of the canonical URL
# (north_rule: URL-seen set over SHA1(canonicalized URL))
# --------------------------------------------------------------------------
def url_hash(url: str) -> str:
    return hashlib.sha1(url.encode("utf-8")).hexdigest()


def url_hash_series(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: hashlib.sha1(u.encode("utf-8")).hexdigest())


def url_hash_col(url: Column) -> Column:
    return F.sha1(url)
