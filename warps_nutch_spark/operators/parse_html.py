"""parse-html: real DOM-walk HTML parsing over stdlib ``html.parser``.

Reference: ``plugin/parse-html/.../DOMContentUtils.java`` — the plugin
the reference uses for every text/html page:

- outlinks come from the linkParams tag map (:78-89): ``a@href``
  (anchor text = the link's text content), ``area@href``,
  ``form@action``, ``frame@src``, ``iframe@src``, ``script@src``,
  ``link@href``, ``img@src``; targets resolve against the page base
  URL (:432 URLUtil.resolveURL);
- ``<base href>`` overrides the resolution base (:273);
- text is the concatenation of DOM text nodes, skipping ``script``
  and ``style`` subtrees (:143-146), whitespace-collapsed;
- the title is the ``<title>`` element's text (:183);
- robots META directives (``HTMLMetaProcessor.java:183-188``):
  ``noindex`` / ``nofollow`` flags from ``<meta name="robots">``.

Spark shape: one ``mapInPandas`` over (id, html, base_url) — parsing
is inherently per-row Python (the legitimate pandas-UDF case: there
is no JVM builtin DOM), the batch never carries more than its own
rows, and the output outlinks feed the SAME normalize/dedup/limit
pipeline (X3) as every other parser. Downstream admission keeps only
http(s) targets, matching the js-outlink gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# tag -> (attribute, anchor-text?) — DOMContentUtils.java:78-89
LINK_PARAMS = {
    "a": ("href", True),
    "area": ("href", False),
    "form": ("action", False),
    "frame": ("src", False),
    "iframe": ("src", False),
    "script": ("src", False),
    "link": ("href", False),
    "img": ("src", False),
}

HTML_PARSE_SCHEMA_FIELDS = [
    T.StructField("title", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("base_url", T.StringType()),
    T.StructField("noindex", T.BooleanType()),
    T.StructField("nofollow", T.BooleanType()),
    T.StructField(
        "outlinks",
        T.ArrayType(
            T.StructType(
                [
                    T.StructField("url", T.StringType()),
                    T.StructField("anchor", T.StringType()),
                ]
            )
        ),
    ),
]


def _make_parser_cls():
    """Build the HTMLParser subclass lazily inside the UDF so the
    closure ships only stdlib references."""
    from html.parser import HTMLParser
    from urllib.parse import urljoin

    class _DOM(HTMLParser):
        def __init__(self, base_url: str):
            super().__init__(convert_charrefs=True)
            self.base = base_url
            self.title_parts: list[str] = []
            self.text_parts: list[str] = []
            self.links: list[tuple[str, list[str] | None]] = []
            self.noindex = False
            self.nofollow = False
            self._skip = 0  # script/style depth (getTextHelper:143-146)
            self._in_title = False
            self._anchor_stack: list[list[str]] = []

        def handle_starttag(self, tag, attrs):
            ad = dict(attrs)
            if tag in ("script", "style"):
                self._skip += 1
            if tag == "title":
                self._in_title = True
            if tag == "base" and ad.get("href"):
                # <base href> rewrites the resolution base (:273)
                self.base = ad["href"]
            if tag == "meta" and (ad.get("name") or "").lower() == "robots":
                directives = (ad.get("content") or "").lower()
                self.noindex |= "noindex" in directives or "none" in directives
                self.nofollow |= "nofollow" in directives or "none" in directives
            lp = LINK_PARAMS.get(tag)
            if lp is not None:
                target = ad.get(lp[0])
                if target:
                    anchor_parts: list[str] | None = [] if lp[1] else None
                    self.links.append((target, anchor_parts))
                    if lp[1]:
                        self._anchor_stack.append(anchor_parts)
                elif lp[1]:
                    # anchor without target still captures (and ends) a
                    # text span so nesting stays balanced
                    self._anchor_stack.append([])

        def handle_endtag(self, tag):
            if tag in ("script", "style") and self._skip:
                self._skip -= 1
            if tag == "title":
                self._in_title = False
            if tag == "a" and self._anchor_stack:
                self._anchor_stack.pop()

        def handle_data(self, data):
            if self._skip:
                return
            if self._in_title:
                self.title_parts.append(data)
                return
            if data.strip():
                self.text_parts.append(data)
                for parts in self._anchor_stack:
                    parts.append(data)

        def result(self) -> dict:
            def collapse(parts):
                return " ".join(" ".join(parts).split())

            outlinks = []
            for target, anchor_parts in self.links:
                try:
                    resolved = urljoin(self.base, target)
                except ValueError:
                    continue
                outlinks.append(
                    {
                        "url": resolved,
                        "anchor": collapse(anchor_parts)
                        if anchor_parts is not None
                        else "",
                    }
                )
            return {
                "title": collapse(self.title_parts),
                "text": collapse(self.text_parts),
                "base_url": self.base,
                "noindex": self.noindex,
                "nofollow": self.nofollow,
                "outlinks": outlinks,
            }

    return _DOM


def html_parse(
    df: DataFrame,
    html_col: str = "html",
    base_url_col: str = "url",
    id_col: str = "url_hash",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *passthrough, title, text, base_url, noindex, nofollow,
    outlinks) per page. A page that fails to parse yields empty text
    and no outlinks, never a failed stage (stdlib HTMLParser is
    non-raising on malformed markup by design, matching the
    reference's tolerant neko/tagsoup parse). ``passthrough`` columns
    ride through the Arrow batch so callers need no join back onto
    the input (one output row per input row, no shuffle)."""
    import pandas as pd

    extra = [c for c in passthrough if c != base_url_col]
    out_schema = T.StructType(
        [T.StructField(id_col, T.StringType())]
        + [T.StructField(c, df.schema[c].dataType) for c in passthrough]
        + HTML_PARSE_SCHEMA_FIELDS
    )

    def _batches(it):
        dom_cls = _make_parser_cls()
        cols = [f.name for f in out_schema.fields]
        for pdf in it:
            rows = []
            # positional column access — itertuples would mangle
            # names like "_html" (leading underscore) to _N fields
            for i in range(len(pdf)):
                base = pdf[base_url_col].iat[i]
                p = dom_cls(base or "")
                try:
                    p.feed(pdf[html_col].iat[i] or "")
                    p.close()
                except Exception:
                    pass
                rec = {id_col: pdf[id_col].iat[i], **p.result()}
                for c in passthrough:
                    rec[c] = pdf[c].iat[i]
                rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, *extra, html_col, base_url_col).mapInPandas(
        _batches, out_schema
    )
