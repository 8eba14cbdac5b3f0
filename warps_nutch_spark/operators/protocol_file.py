"""protocol-file: fetch ``file://`` URLs from executor-local storage.

Reference: ``plugin/protocol-file/.../FileResponse.java`` — mimics
file replies as HTTP responses:

- missing path -> 404 (:128-131), unreadable -> 401 (:133-136);
- non-canonical path (symlink / relative) -> 300 with Location header
  of the canonical target (:141-148);
- unchanged since the page's modifiedTime -> 304 (:149-154);
- directory -> synthetic HTML listing built from the children
  (getDirAsHttpResponse/list2html, :221-…), so the regular outlink
  extractor crawls the tree;
- regular file -> 200 with content truncated at maxContentLength but
  Content-Length reporting the TRUE size (:173-219), Last-Modified
  and a mime type from the extension.

Spark shape: one ``mapInPandas`` over the URL batch — each executor
reads the paths IT is given, so a crawl over a shared filesystem
(NFS/object-store fuse) parallelizes by URL partitioning exactly like
the HTTP fetcher. I/O-bound per-row work is the legitimate use of the
pandas-UDF escape hatch (there is no JVM builtin for local stat+read).
"""

from __future__ import annotations

import html
import os
from urllib.parse import unquote, urlparse

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_MIME = {
    ".html": "text/html",
    ".htm": "text/html",
    ".txt": "text/plain",
    ".json": "application/json",
    ".xml": "application/xml",
    ".png": "image/png",
    ".jpg": "image/jpeg",
    ".jpeg": "image/jpeg",
    ".pdf": "application/pdf",
    ".wnim": "image/x-wnim",
}

FILE_RESPONSE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("code", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("last_modified_ms", T.LongType()),
        T.StructField("location", T.StringType()),
    ]
)


def _mime_for(path: str) -> str:
    return _MIME.get(os.path.splitext(path)[1].lower(), "application/octet-stream")


def _list2html(path: str, include_parent: bool) -> bytes:
    """Deterministic directory listing (list2html): sorted children,
    directories with a trailing slash so the crawler recurses."""
    items = []
    if include_parent:
        items.append('<a href="../">../</a>')
    for name in sorted(os.listdir(path)):
        ref = name + "/" if os.path.isdir(os.path.join(path, name)) else name
        items.append(f'<a href="{html.escape(ref, quote=True)}">{html.escape(ref)}</a>')
    body = "\n".join(f"<li>{i}</li>" for i in items)
    doc = (
        f"<html><head><title>Index of {html.escape(path)}</title></head>"
        f"<body><h1>Index of {html.escape(path)}</h1><ul>\n{body}\n</ul></body></html>"
    )
    return doc.encode("utf-8")


def _confined(real_path: str, allowed_roots: tuple[str, ...]) -> bool:
    for root in allowed_roots:
        r = os.path.realpath(root).rstrip("/")
        if real_path == r or real_path.startswith(r + "/"):
            return True
    return False


def _fetch_one(
    url: str,
    modified_ms: int | None,
    max_content_length: int,
    crawl_parents: bool,
    allowed_roots: tuple[str, ...] | None,
) -> dict:
    out = {
        "url": url,
        "code": 500,
        "content": None,
        "content_type": None,
        "content_length": None,
        "last_modified_ms": None,
        "location": None,
    }
    parsed = urlparse(url)
    if parsed.scheme != "file":
        out["code"] = 400
        return out
    path = unquote(parsed.path) or "/"
    if allowed_roots is not None and not _confined(
        os.path.realpath(path), allowed_roots
    ):
        # confinement check runs FIRST (on the symlink-resolved path) so
        # hostile page content cannot steer the crawl into credential or
        # config files outside the configured roots, nor use a 300
        # redirect to leak the canonical target of an outside symlink
        out["code"] = 403
        return out
    if not os.path.exists(path):
        out["code"] = 404
        return out
    if not os.access(path, os.R_OK):
        out["code"] = 401
        return out
    real = os.path.realpath(path)
    trailing = path.rstrip("/") if path != "/" else path
    if real != os.path.normpath(trailing):
        # symlink / non-canonical path -> redirect to canonical target
        out["code"] = 300
        out["location"] = "file://" + real + ("/" if os.path.isdir(real) else "")
        return out
    mtime_ms = int(os.stat(path).st_mtime * 1000)
    out["last_modified_ms"] = mtime_ms
    if modified_ms is not None and mtime_ms <= modified_ms:
        out["code"] = 304
        return out
    if os.path.isdir(path):
        content = _list2html(path, crawl_parents and path != "/")
        out.update(
            code=200,
            content=content,
            content_type="text/html",
            content_length=len(content),
        )
        return out
    if os.path.isfile(path):
        size = os.path.getsize(path)
        take = size if max_content_length < 0 else min(size, max_content_length)
        with open(path, "rb") as f:
            data = f.read(take)
        out.update(
            code=200,
            content=data,
            content_type=_mime_for(path),
            content_length=size,  # true size even when truncated
        )
        return out
    return out  # special file -> 500


def fetch_file_urls(
    df: DataFrame,
    url_col: str = "url",
    modified_col: str | None = None,
    max_content_length: int = 65_536,
    crawl_parents: bool = False,
    allowed_roots: tuple[str, ...] | list[str] | None = None,
) -> DataFrame:
    """Fetch a DataFrame of ``file://`` URLs -> HTTP-shaped responses.

    ``allowed_roots`` confines reads: any URL whose symlink-resolved
    path falls outside the given directories gets a 403. Pass the crawl
    roots whenever the URL set contains crawled (untrusted) outlinks;
    ``None`` (unconfined) is for operator-supplied seed trees only.
    """
    roots = tuple(allowed_roots) if allowed_roots is not None else None

    def _batch(it):
        for pdf in it:
            rows = []
            for i in range(len(pdf)):
                mod = (
                    int(pdf[modified_col].iloc[i])
                    if modified_col is not None and pd.notna(pdf[modified_col].iloc[i])
                    else None
                )
                rows.append(
                    _fetch_one(
                        pdf[url_col].iloc[i],
                        mod,
                        max_content_length,
                        crawl_parents,
                        roots,
                    )
                )
            out = pd.DataFrame(rows)
            out["code"] = out["code"].astype("int32")
            out["content_length"] = out["content_length"].astype("Int64")
            out["last_modified_ms"] = out["last_modified_ms"].astype("Int64")
            yield out

    return df.select(url_col, *( [modified_col] if modified_col else [] )).mapInPandas(
        _batch, FILE_RESPONSE_SCHEMA
    )


def listing_outlinks(base_url: str, content: bytes) -> list[str]:
    """Resolve the hrefs of a directory-listing page against its base
    URL (the helper the crawl loop uses to walk a file tree)."""
    import re

    base = base_url if base_url.endswith("/") else base_url + "/"
    out = []
    for ref in re.findall(rb'href="([^"]+)"', content or b""):
        r = html.unescape(ref.decode("utf-8"))
        if r.startswith("../"):
            continue
        out.append(base + r)
    return out
