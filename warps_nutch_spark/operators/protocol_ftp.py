"""protocol-ftp: fetch ``ftp://`` URLs via stdlib ``ftplib``.

Reference: ``plugin/protocol-ftp/.../FtpResponse.java`` — "follow
http's way for headers, response codes as well as exceptions":

- connect failure -> 500 (:181), login failure -> 401 (:199);
- file path: attributes first (Content-Length from the true size,
  Last-Modified from the server timestamp), 304 when unchanged since
  the page's modifiedTime (:332), else RETR truncated at
  maxContentLength with Content-Length still reporting the TRUE size
  (:327-346);
- a non-file path that CWDs -> 300 redirect to ``path + "/"``
  (:394-401), else 404;
- directory path (trailing slash): CWD failure -> 404 (:426), else a
  ``list2html`` synthetic listing (text/html) built from the LIST
  reply so the regular outlink extractor crawls the tree (:417-446) —
  same listing shape as protocol-file, directories get a trailing
  slash.

Spark shape: ``mapInPandas`` over the URL batch, one control
connection per (host, port, credentials) per batch — the ftplib
session is reused across a partition's URLs exactly like the
reference's ``ftp.keepConnection`` client reuse. I/O-bound per-row
work is the legitimate pandas-UDF case (no JVM builtin FTP).
"""

from __future__ import annotations

from urllib.parse import unquote, urlparse

import pandas as pd
from pyspark.sql import DataFrame

from .protocol_file import FILE_RESPONSE_SCHEMA, _mime_for


def _list2html_ftp(entries: list[tuple[str, bool]], path: str, include_parent: bool) -> bytes:
    import html as _html

    items = []
    if include_parent:
        items.append('<a href="../">../</a>')
    for name, is_dir in sorted(entries):
        ref = name + "/" if is_dir else name
        items.append(
            f'<a href="{_html.escape(ref, quote=True)}">{_html.escape(ref)}</a>'
        )
    body = "\n".join(f"<li>{i}</li>" for i in items)
    doc = (
        f"<html><head><title>Index of {_html.escape(path)}</title></head>"
        f"<body><h1>Index of {_html.escape(path)}</h1><ul>\n{body}\n</ul></body></html>"
    )
    return doc.encode("utf-8")


def _mdtm_to_ms(reply: str) -> int | None:
    """'213 YYYYMMDDHHMMSS' -> epoch ms (UTC)."""
    import calendar
    import time as _time

    try:
        ts = reply.split()[-1][:14]
        st = _time.strptime(ts, "%Y%m%d%H%M%S")
        return calendar.timegm(st) * 1000
    except Exception:
        return None


def _list_dir(ftp_conn) -> list[tuple[str, bool]]:
    """LIST reply -> [(name, is_dir)], unix-style 'drwxr-xr-x ... name'."""
    lines: list[str] = []
    ftp_conn.retrlines("LIST", lines.append)
    out = []
    for ln in lines:
        parts = ln.split(None, 8)
        if not parts:
            continue
        name = parts[-1]
        if name in (".", ".."):
            continue
        out.append((name, ln.startswith("d")))
    return out


def _retr_truncated(ftp_conn, path: str, cap: int) -> bytes:
    """RETR reading at most ``cap`` bytes, then force-close the data
    connection (the reference's retrieveFile(maxContentLength) forced
    close, FtpExceptionControlClosedByForcedDataClose tolerated)."""
    conn = ftp_conn.transfercmd(f"RETR {path}")
    chunks: list[bytes] = []
    got = 0
    try:
        while got < cap:
            b = conn.recv(min(65536, cap - got))
            if not b:
                break
            chunks.append(b)
            got += len(b)
    finally:
        conn.close()
    try:
        ftp_conn.voidresp()
    except Exception:
        pass  # forced data-channel close after truncation
    return b"".join(chunks)


def _fetch_one_ftp(
    url: str,
    modified_ms: int | None,
    max_content_length: int,
    user: str,
    password: str,
    timeout_s: float,
    sessions: dict,
) -> dict:
    import ftplib

    out = {
        "url": url,
        "code": 500,
        "content": None,
        "content_type": None,
        "content_length": None,
        "last_modified_ms": None,
        "location": None,
    }
    p = urlparse(url)
    if p.scheme != "ftp":
        out["code"] = 400
        return out
    # embedded credentials win over the configured ones (ftp://u:p@host)
    u = unquote(p.username) if p.username else user
    pw = unquote(p.password) if p.password else password
    key = (p.hostname, p.port or 21, u)
    ftp_conn = sessions.get(key)
    if ftp_conn is None:
        ftp_conn = ftplib.FTP()
        try:
            ftp_conn.connect(p.hostname, p.port or 21, timeout=timeout_s)
        except OSError:
            out["code"] = 500  # FtpResponse.java:181 connect failure
            return out
        try:
            ftp_conn.login(u, pw)
        except ftplib.error_perm:
            out["code"] = 401  # FtpResponse.java:199 login failure
            try:
                ftp_conn.close()
            except Exception:
                pass
            return out
        sessions[key] = ftp_conn
    path = unquote(p.path) or "/"
    try:
        if path.endswith("/"):
            # directory listing
            try:
                ftp_conn.cwd(path)
            except ftplib.error_perm:
                out["code"] = 404  # :426
                return out
            content = _list2html_ftp(_list_dir(ftp_conn), path, path != "/")
            out.update(
                code=200,
                content=content,
                content_type="text/html",
                content_length=len(content),
            )
            return out
        # file: attributes first
        try:
            size = ftp_conn.size(path)
        except ftplib.error_perm:
            size = None
        if size is None:
            # not RETR-able as a file: a dir redirects, else 404
            try:
                ftp_conn.cwd(path)
                out["code"] = 300  # :397 redirect as a dir
                out["location"] = path + "/"
            except ftplib.error_perm:
                out["code"] = 404  # :401
            return out
        out["content_length"] = int(size)  # TRUE size even if truncated
        try:
            mdtm = _mdtm_to_ms(ftp_conn.voidcmd(f"MDTM {path}"))
        except ftplib.error_perm:
            mdtm = None
        out["last_modified_ms"] = mdtm
        if modified_ms is not None and mdtm is not None and mdtm <= modified_ms:
            out["code"] = 304  # :332 unchanged
            return out
        cap = size if max_content_length < 0 else min(size, max_content_length)
        out["content"] = _retr_truncated(ftp_conn, path, cap)
        out["content_type"] = _mime_for(path)
        out["code"] = 200
        return out
    except (ftplib.all_errors, OSError):
        # control channel died mid-request: drop the session so the
        # next URL reconnects (FtpResponse client-renewal semantics)
        sessions.pop(key, None)
        try:
            ftp_conn.close()
        except Exception:
            pass
        out["code"] = 500
        return out


def fetch_ftp_urls(
    df: DataFrame,
    url_col: str = "url",
    modified_col: str | None = None,
    max_content_length: int = 65_536,
    user: str = "anonymous",
    password: str = "anonymous@",
    timeout_s: float = 10.0,
) -> DataFrame:
    """Fetch a DataFrame of ``ftp://`` URLs -> HTTP-shaped responses
    (same schema as :func:`.protocol_file.fetch_file_urls`, so the
    downstream parse/outlink pipeline is protocol-agnostic)."""

    def _batch(it):
        sessions: dict = {}
        try:
            for pdf in it:
                rows = []
                for i in range(len(pdf)):
                    mod = (
                        int(pdf[modified_col].iloc[i])
                        if modified_col is not None
                        and pd.notna(pdf[modified_col].iloc[i])
                        else None
                    )
                    rows.append(
                        _fetch_one_ftp(
                            pdf[url_col].iloc[i],
                            mod,
                            max_content_length,
                            user,
                            password,
                            timeout_s,
                            sessions,
                        )
                    )
                out = pd.DataFrame(rows)
                out["code"] = out["code"].astype("int32")
                out["content_length"] = out["content_length"].astype("Int64")
                out["last_modified_ms"] = out["last_modified_ms"].astype("Int64")
                yield out
        finally:
            for conn in sessions.values():
                try:
                    conn.quit()
                except Exception:
                    pass

    return df.select(
        url_col, *([modified_col] if modified_col else [])
    ).mapInPandas(_batch, FILE_RESPONSE_SCHEMA)
