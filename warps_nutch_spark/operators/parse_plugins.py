"""Content parse plugins: parse-metatags and microformats-reltag as
pure Column expressions (JVM-side, codegen — no UDFs).

Reference semantics:

- ``plugin/parse-metatags/.../MetaTagsParser.java``: collect <meta>
  general + http-equiv tags, lowercase the names, keep only those in
  the configured ``metatags.names`` set ('*' keeps all), and join
  multiple values of one name with '\\t' (:85-96).
- ``plugin/microformats-reltag/.../RelTagParser.java``: every
  ``<a href=... rel="tag">`` contributes the URL-decoded last path
  segment of its href; tags are deduplicated and sorted (TreeSet,
  :60-105).

Both run entirely in the array domain per row (regexp_extract_all ->
transform/filter), so a 100 TB parse pass adds zero shuffles — the
extraction rides the existing per-row parse projection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_META_TAG_RE = r"(?i)<meta\s[^>]*>"
_A_TAG_RE = r"(?i)<a\s[^>]*>"


def _attr(tag: Column, name: str) -> Column:
    return F.regexp_extract(tag, f'(?i){name}\\s*=\\s*"([^"]*)"', 1)


def metatags_col(html_col: Column, names: list[str] | None = None) -> Column:
    """map<name, tab-joined values> of the page's meta tags.

    ``names``: lowercase allowlist (MetaTagsParser ``metatags.names``);
    None means '*' (keep everything). http-equiv tags are collected
    under their http-equiv name, like the reference's second loop.
    """
    tags = F.regexp_extract_all(html_col, F.lit(_META_TAG_RE), 0)
    # one (name, content) candidate per tag; name falls back to the
    # http-equiv attribute when no name= is present
    entries = F.transform(
        tags,
        lambda t: F.struct(
            F.lower(
                F.when(_attr(t, "name") != "", _attr(t, "name")).otherwise(
                    _attr(t, "http-equiv")
                )
            ).alias("name"),
            _attr(t, "content").alias("value"),
        ),
    )
    entries = F.filter(entries, lambda e: e.getField("name") != "")
    if names is not None:
        allowed = F.array(*[F.lit(n.lower()) for n in names])
        entries = F.filter(
            entries, lambda e: F.array_contains(allowed, e.getField("name"))
        )
    uniq = F.array_sort(
        F.array_distinct(F.transform(entries, lambda e: e.getField("name")))
    )
    return F.map_from_entries(
        F.transform(
            uniq,
            lambda nm: F.struct(
                nm.alias("key"),
                F.array_join(
                    F.transform(
                        F.filter(entries, lambda e: e.getField("name") == nm),
                        lambda e: e.getField("value"),
                    ),
                    "\t",
                ).alias("value"),
            ),
        )
    )


def reltags_col(html_col: Column) -> Column:
    """Sorted distinct rel=tag tags: URL-decoded last path segment of
    each ``<a href rel="tag">`` href (RelTagParser.parseTag)."""
    tags = F.regexp_extract_all(html_col, F.lit(_A_TAG_RE), 0)
    rel = F.filter(tags, lambda t: F.lower(_attr(t, "rel")) == "tag")
    hrefs = F.transform(rel, lambda t: _attr(t, "href"))
    hrefs = F.filter(hrefs, lambda h: h != "")
    segs = F.transform(
        hrefs,
        lambda h: F.coalesce(
            F.try_url_decode(
                F.element_at(F.split(F.split(h, "[?#]")[0], "/"), -1)
            ),
            F.element_at(F.split(F.split(h, "[?#]")[0], "/"), -1),
        ),
    )
    return F.array_sort(F.array_distinct(F.filter(segs, lambda s: s != "")))


def subcollections_col(
    url_col: Column, collections: list[tuple[str, list[str], list[str]]]
) -> Column:
    """Sorted array of subcollection names whose white/blacklists match
    the URL (``plugin/subcollection/.../Subcollection.java:144-162``:
    plain substring match, blacklist wins; the indexing filter then
    stamps the matching names on the document
    (SubcollectionIndexingFilter)."""

    def member(name: str, white: list[str], black: list[str]) -> Column:
        in_white = None
        for s in white:
            c = F.instr(url_col, s) > 0
            in_white = c if in_white is None else (in_white | c)
        in_black = F.lit(False)
        for s in black:
            in_black = in_black | (F.instr(url_col, s) > 0)
        cond = (in_white if in_white is not None else F.lit(False)) & ~in_black
        return F.when(cond, F.lit(name))

    names = F.array(*[member(n, w, b) for n, w, b in collections])
    return F.array_sort(F.filter(names, lambda x: x.isNotNull()))


def cc_license_col(html_col: Column) -> Column:
    """First ``rel="license"`` anchor href — the Creative Commons
    license URL (``plugin/creativecommons/.../CCParseFilter.java``
    anchor walk; the RDF-comment variant is the same field with a
    different carrier). NULL when the page declares no license."""
    tags = F.regexp_extract_all(html_col, F.lit(_A_TAG_RE), 0)
    lic = F.filter(tags, lambda t: F.lower(_attr(t, "rel")) == "license")
    hrefs = F.filter(
        F.transform(lic, lambda t: _attr(t, "href")), lambda h: h != ""
    )
    return F.get(hrefs, 0)  # NULL (not an ANSI error) when absent


# reference JSParseFilter.java:205-207 two-pass scheme: quoted-string
# scan, then a URI-shape gate on each candidate
_JS_DQ_RE = r'"([^\s"]+?)"'
_JS_SQ_RE = r"'([^\s']+?)'"
_JS_URI_GATE = r"^/?[^\s]+[/.][^\s]*$"


def js_outlinks_col(js_col: Column, base_url_col: Column) -> Column:
    """Distinct outlink candidates from JavaScript text
    (``plugin/parse-js/.../JSParseFilter.java:219-280``): every quoted
    string that looks URI-shaped, resolved against the base URL —
    ``www.`` hosts get ``http://``, absolute URLs pass through,
    ``/path`` joins the base origin, bare relatives join the base
    directory; ``&amp;`` unescapes. Dot-segment resolution is left to
    the downstream canonicalizer (F1-F3), same as the fetch path.

    DuckDB-twin note: the reference's single backreferenced pattern
    ``("|')...\\1`` is RE2-incompatible, so both engines run the
    double- and single-quote scans separately; output is DISTINCT so
    pass order cannot matter.
    """
    cands = F.concat(
        F.regexp_extract_all(js_col, F.lit(_JS_DQ_RE), 1),
        F.regexp_extract_all(js_col, F.lit(_JS_SQ_RE), 1),
    )
    cands = F.filter(cands, lambda s: s.rlike(_JS_URI_GATE))
    cands = F.transform(cands, lambda s: F.replace(s, F.lit("&amp;"), F.lit("&")))
    origin = F.regexp_extract(base_url_col, r"^(https?://[^/]+)", 1)
    basedir = F.regexp_replace(base_url_col, r"[^/]*$", "")
    resolved = F.transform(
        cands,
        lambda s: F.when(s.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"), s)
        .when(s.startswith("www."), F.concat(F.lit("http://"), s))
        .when(s.startswith("/"), F.concat(origin, s))
        .otherwise(F.concat(basedir, s)),
    )
    # admission gate: only http(s) outlinks enter the crawl — a hostile
    # page quoting file:// or other scheme-absolute strings must not be
    # able to steer the fetcher at local or exotic resources
    resolved = F.filter(resolved, lambda s: s.rlike("^https?://"))
    return F.array_sort(F.array_distinct(resolved))


# feed plugin (plugin/feed/.../FeedParser.java:124-140,217-260): one
# sub-parse per feed entry keyed by the entry link, with title and
# tag-stripped description text
_RSS_ITEM_RE = r"(?is)<item>.*?</item>"


def feed_items_col(xml_col: Column) -> Column:
    """array<struct<link,title,description>> of a feed's items.
    Per-item fields come from the standard RSS child tags; description
    text is tag-stripped like the reference's stripTags. Runs entirely
    in the array domain (regexp_extract_all + transform)."""
    items = F.regexp_extract_all(xml_col, F.lit(_RSS_ITEM_RE), 0)

    def field(item: Column, tag: str) -> Column:
        return F.regexp_extract(item, f"(?is)<{tag}>(.*?)</{tag}>", 1)

    return F.transform(
        items,
        lambda it: F.struct(
            field(it, "link").alias("link"),
            field(it, "title").alias("title"),
            F.trim(
                F.regexp_replace(field(it, "description"), r"<[^>]*>", "")
            ).alias("description"),
        ),
    )


# ---------------------------------------------------------------------------
# parse-swf (plugin/parse-swf/.../SWFParser.java): SWF movies -> text +
# outlinks. The reference walks the tag stream with javaswf
# (DefineText/getURL actions); this implementation is regex-level over
# the INFLATED movie body — the same fidelity tier as parse-js — with
# the container handling real: FWS (uncompressed) and CWS
# (zlib-compressed past the 8-byte header, stdlib inflate), the
# declared-length truncation check (SWFParser.java:72-77 returns
# FAILED_TRUNCATED on a length mismatch), and text/URL harvest
# (getParse text + ExtractText.getUrls + OutlinkExtractor over text).
# Binary decode is per-row Python by necessity -> mapInPandas.
# ---------------------------------------------------------------------------
SWF_TEXT_RUN_RE = rb"[\x20-\x7e]{4,}"
SWF_URL_RE = rb"https?://[^\s\"'<>]+"


def swf_extract(
    df,
    bytes_col: str = "bytes",
    id_col: str = "url_hash",
    max_inflated_bytes: int = 1 << 26,
    passthrough: tuple[str, ...] = (),
):
    """(id, swf_ok, text, urls) per SWF blob. ``text`` joins the
    printable runs of the movie body with '\\n' (the regex-level
    DefineText analog); ``urls`` are the http(s) URLs harvested from
    the body. Corrupt container / zlib error / truncated declared
    length -> ``swf_ok = false`` row (ParseStatus.FAILED analog).
    Inflation is capped at ``max_inflated_bytes`` (untrusted input —
    a compressed bomb fails the row, never the stage)."""
    import re
    import zlib

    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [T.StructField(id_col, T.StringType())]
        + [T.StructField(c, df.schema[c].dataType) for c in passthrough]
        + [
            T.StructField("swf_ok", T.BooleanType()),
            T.StructField("text", T.StringType()),
            T.StructField("urls", T.ArrayType(T.StringType())),
        ]
    )
    run_re = re.compile(SWF_TEXT_RUN_RE)
    url_re = re.compile(SWF_URL_RE)

    def _one(blob) -> tuple[bool, str | None, list | None]:
        if blob is None or len(blob) < 8:
            return False, None, None
        raw = bytes(blob)
        magic = raw[:3]
        declared = int.from_bytes(raw[4:8], "little")
        if magic == b"FWS":
            body = raw[8:]
        elif magic == b"CWS":
            try:
                d = zlib.decompressobj()
                body = d.decompress(raw[8:], max_inflated_bytes)
                if d.unconsumed_tail:  # inflates past the cap
                    return False, None, None
            except zlib.error:
                return False, None, None
        else:
            return False, None, None
        # declared length = uncompressed size INCLUDING the 8-byte header
        if declared != 8 + len(body):
            return False, None, None
        runs = [r.decode("ascii", "replace") for r in run_re.findall(body)]
        urls = sorted({u.decode("ascii", "replace") for u in url_re.findall(body)})
        return True, "\n".join(runs), urls

    cols = [f.name for f in out_schema.fields]

    def _batches(it):
        for pdf in it:
            rows = []
            for i in range(len(pdf)):
                ok, text, urls = _one(pdf[bytes_col].iat[i])
                rec = {
                    id_col: pdf[id_col].iat[i],
                    "swf_ok": ok,
                    "text": text,
                    "urls": urls,
                }
                for c in passthrough:
                    rec[c] = pdf[c].iat[i]
                rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, *passthrough, bytes_col).mapInPandas(
        _batches, out_schema
    )
