"""Parser dispatch: route each fetched row to its content-type parser.

Reference: ``parse/ParserFactory.java`` + ``parse/ParseUtil.java`` +
``conf/configsets/default/parse-plugins.xml``:

- parse-plugins.xml maps a mimeType to an ORDERED list of parser
  plugins, with ``*`` as the fallback entry (default parse-tika);
- ParseUtil.parse (:108-133) asks the factory for the chain and tries
  each parser in order, returning the FIRST successful parse; if all
  fail it returns an empty failed parse ("Unable to parse content");
- an unmapped content type with no ``*`` entry raises ParserNotFound
  (ParserFactory.getParsers:112-114).

Spark shape: the dispatch is declarative — one filter per mimeType
group over the input, each parser applied to its slice (column-level
parsers stay in whole-stage codegen; html/zip/swf/pdf/office decode
drops to mapInPandas over its slice ONLY, with url/content_type
riding through the Arrow batch so no arm joins back onto its slice —
every single-parser chain is exchange-free). Results normalize to one
PARSE_RESULT schema and union. Chain fallback (multi-parser chains
like [parse-tika, feed]) joins the failed ids of parser N into parser
N+1's input slice, mirroring the first-success loop — the one place a
shuffle is inherent to the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .parse_ext import URL_PATTERN

OUTLINKS_T = "array<struct<url:string,anchor:string>>"

_OUTLINKS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("anchor", T.StringType()),
        ]
    )
)

PARSE_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("parsed_by", T.StringType()),
        T.StructField("parse_ok", T.BooleanType()),
        T.StructField("parse_status", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("outlinks", _OUTLINKS_TYPE),
        # parser-contributed page metadata (e.g. image width/height —
        # TestImageMetadata.java); empty for parsers that emit none
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

# parse-plugins.xml (conf/configsets/default/parse-plugins.xml): the
# subset of the reference's mapping this engine implements natively.
# Each value is the ordered parser chain; "*" is the fallback row.
DEFAULT_PARSE_PLUGINS: dict[str, list[str]] = {
    "text/html": ["parse-html"],
    "application/xhtml+xml": ["parse-html"],
    "text/aspdotnet": ["parse-html"],  # :39-41
    "application/rss+xml": ["parse-tika", "feed"],  # :43-46
    "application/atom+xml": ["parse-tika", "feed"],
    "application/zip": ["parse-zip"],
    "application/x-gzip": ["parse-zip"],  # :53-56
    "application/x-bzip2": ["parse-zip"],  # :48-51
    "application/x-javascript": ["parse-js"],  # :58-60
    "text/javascript": ["parse-js"],
    "application/x-shockwave-flash": ["parse-swf"],  # :62-64
    "*": ["parse-tika"],  # :27-29
}


def _decoded(col):
    """Bytes -> text, UTF-8 with replacement (the tika/neko charset
    sniffing tier collapsed to the deterministic common case)."""
    return F.decode(col, "UTF-8")


def _norm(df: DataFrame, parsed_by: str, ok, status, title, text, outlinks, meta=None):
    if meta is None:
        meta = F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<string>")
        )
    return df.select(
        "url_hash",
        "url",
        "content_type",
        F.lit(parsed_by).alias("parsed_by"),
        ok.alias("parse_ok"),
        status.alias("parse_status"),
        title.alias("title"),
        text.alias("text"),
        outlinks.cast(OUTLINKS_T).alias("outlinks"),
        meta.cast("map<string,string>").alias("meta"),
    )


def _run_html(slice_df: DataFrame) -> DataFrame:
    from .parse_html import html_parse

    src = slice_df.withColumn("_html", _decoded(F.col("bytes")))
    parsed = html_parse(
        src,
        html_col="_html",
        base_url_col="url",
        passthrough=("url", "content_type"),
    )
    return _norm(
        parsed,
        "parse-html",
        F.lit(True),
        F.lit("success"),
        F.coalesce("title", F.lit("")),
        F.coalesce("text", F.lit("")),
        # meta robots nofollow suppresses the page's outlinks
        # (ParseUtil.processSuccess stores outlinks only when followable)
        F.when(F.col("nofollow"), F.array().cast(OUTLINKS_T)).otherwise(
            F.coalesce(F.col("outlinks"), F.array().cast(OUTLINKS_T))
        ),
    )


def _run_js(slice_df: DataFrame) -> DataFrame:
    from .parse_plugins import js_outlinks_col

    src = slice_df.withColumn("_js", _decoded(F.col("bytes")))
    links = F.transform(
        js_outlinks_col(F.col("_js"), F.col("url")),
        lambda u: F.struct(u.alias("url"), F.lit("").alias("anchor")),
    )
    return _norm(
        src,
        "parse-js",
        F.col("_js").isNotNull(),
        F.when(F.col("_js").isNotNull(), F.lit("success")).otherwise(
            F.lit("failed: undecodable script")
        ),
        F.lit(""),
        F.coalesce("_js", F.lit("")),
        links,
    )


def _run_feed(slice_df: DataFrame) -> DataFrame:
    from .parse_plugins import feed_items_col

    src = slice_df.withColumn("_items", feed_items_col(_decoded(F.col("bytes"))))
    ok = F.size("_items") > 0
    links = F.transform(
        F.col("_items"),
        lambda it: F.struct(
            it.getField("link").alias("url"),
            it.getField("title").alias("anchor"),
        ),
    )
    text = F.array_join(
        F.transform(
            F.col("_items"),
            lambda it: F.concat_ws(
                " ", it.getField("title"), it.getField("description")
            ),
        ),
        "\n",
    )
    return _norm(
        src,
        "feed",
        ok,
        F.when(ok, F.lit("success")).otherwise(F.lit("failed: no feed items")),
        F.lit(""),
        text,
        F.when(ok, links).otherwise(F.array().cast(OUTLINKS_T)),
    )


def _run_zip(
    slice_df: DataFrame,
    max_entry_bytes: int = 1 << 20,
    max_declared_entry_bytes: int = 1 << 28,
) -> DataFrame:
    """One mapInPandas pass per archive: member text concatenated in
    ARCHIVE order (ZipTextExtractor.java:73-110 appends each entry's
    parsed text in iteration order — the former explode + groupBy +
    join-back shape both shuffled twice and name-sorted the members).
    Same zip-bomb hardening as multimodal.zip_entries: members are
    stream-truncated at ``max_entry_bytes``, entries with a declared
    size past ``max_declared_entry_bytes`` are skipped."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url_hash", T.StringType()),
            T.StructField("url", T.StringType()),
            T.StructField("content_type", T.StringType()),
            T.StructField("_ok", T.BooleanType()),
            T.StructField("_x", T.StringType()),
        ]
    )

    def _batches(it):
        import io
        import zipfile

        import pandas as pd

        for pdf in it:
            rows = []
            for i in range(len(pdf)):
                texts: list[str] = []
                ok = False
                try:
                    with zipfile.ZipFile(
                        io.BytesIO(bytes(pdf["bytes"].iat[i]))
                    ) as zf:
                        for info in zf.infolist():
                            if info.is_dir():
                                continue
                            if info.file_size > max_declared_entry_bytes:
                                continue
                            with zf.open(info) as member:
                                data = member.read(max_entry_bytes)
                            texts.append(data.decode("utf-8", "replace"))
                    ok = True
                except Exception:
                    ok = False
                rows.append(
                    (
                        pdf["url_hash"].iat[i],
                        pdf["url"].iat[i],
                        pdf["content_type"].iat[i],
                        ok,
                        "\n".join(texts) if ok else "",
                    )
                )
            yield pd.DataFrame(
                rows, columns=["url_hash", "url", "content_type", "_ok", "_x"]
            )

    parsed = slice_df.select(
        "url_hash", "url", "content_type", "bytes"
    ).mapInPandas(_batches, schema)
    ok = F.col("_ok")
    links = F.transform(
        F.regexp_extract_all(F.col("_x"), F.lit("(?i)" + URL_PATTERN), 0),
        lambda u: F.struct(u.alias("url"), F.lit("").alias("anchor")),
    )
    return _norm(
        parsed,
        "parse-zip",
        ok,
        F.when(ok, F.lit("success")).otherwise(F.lit("failed: corrupt archive")),
        F.lit(""),
        F.col("_x"),
        F.when(ok, links).otherwise(F.array().cast(OUTLINKS_T)),
    )


def _run_swf(slice_df: DataFrame) -> DataFrame:
    from .parse_plugins import swf_extract

    joined = swf_extract(
        slice_df, id_col="url_hash", passthrough=("url", "content_type")
    ).withColumnsRenamed({"swf_ok": "_ok", "text": "_x", "urls": "_u"})
    ok = F.coalesce("_ok", F.lit(False))
    links = F.transform(
        F.coalesce("_u", F.array().cast("array<string>")),
        lambda u: F.struct(u.alias("url"), F.lit("").alias("anchor")),
    )
    return _norm(
        joined,
        "parse-swf",
        ok,
        F.when(ok, F.lit("success")).otherwise(F.lit("failed: corrupt movie")),
        F.lit(""),
        F.coalesce("_x", F.lit("")),
        F.when(ok, links).otherwise(F.array().cast(OUTLINKS_T)),
    )


def _run_tika(slice_df: DataFrame) -> DataFrame:
    """The generic-fallback tier. Real Tika is a JVM library outside
    this sandbox; the deterministic equivalent implemented here
    handles the text/* family (decode + URL_PATTERN outlinks) and
    application/pdf (parse_pdf — the mapInPandas drop happens on the
    pdf slice ONLY), and DECLINES other binary types, so a chain
    configured [parse-tika, feed] falls through exactly like a
    failing first parser."""
    from .parse_msoffice import OLE2_TYPES
    from .parse_office import IMAGE_TYPES, ODF_TYPES, RTF_TYPES

    is_pdf = F.col("content_type").isin("application/pdf", "application/x-pdf")
    is_office = F.col("content_type").isin(
        *ODF_TYPES, *RTF_TYPES, *IMAGE_TYPES
    )
    is_ole2 = F.col("content_type").isin(*OLE2_TYPES)

    gen = slice_df.filter(~is_pdf & ~is_office & ~is_ole2)
    is_text = F.col("content_type").startswith("text/")
    text = F.when(is_text, _decoded(F.col("bytes")))
    ok = is_text & text.isNotNull()
    links = F.transform(
        F.regexp_extract_all(
            F.coalesce(text, F.lit("")), F.lit("(?i)" + URL_PATTERN), 0
        ),
        lambda u: F.struct(u.alias("url"), F.lit("").alias("anchor")),
    )
    out = _norm(
        gen,
        "parse-tika",
        ok,
        F.when(ok, F.lit("success")).otherwise(
            F.lit("failed: unsupported content type")
        ),
        F.lit(""),
        F.coalesce(text, F.lit("")),
        F.when(ok, links).otherwise(F.array().cast(OUTLINKS_T)),
    )

    # pdf/office arms: url + content_type ride THROUGH the pandas
    # batch (passthrough), so each arm is filter -> mapInPandas ->
    # project — one output row per input row, no join back onto the
    # slice, no Exchange anywhere in the tika tier.
    from .parse_office import office_parse_rows
    from .parse_pdf import pdf_parse_rows

    parsed = pdf_parse_rows(
        slice_df.filter(is_pdf),
        id_col="url_hash",
        passthrough=("url", "content_type"),
    )
    plinks = F.transform(
        F.col("uris"),
        lambda u: F.struct(u.alias("url"), F.lit("").alias("anchor")),
    )
    pdf_out = _norm(
        parsed,
        "parse-tika",
        F.col("pdf_ok"),
        F.col("pdf_status"),
        F.col("title"),
        F.col("text"),
        plinks,
    )

    oparsed = office_parse_rows(
        slice_df.filter(is_office),
        id_col="url_hash",
        passthrough=("url", "content_type"),
    )
    office_out = _norm(
        oparsed,
        "parse-tika",
        F.col("office_ok"),
        F.col("office_status"),
        F.col("title"),
        F.col("text"),
        F.array().cast(OUTLINKS_T),
        meta=F.col("meta"),
    )

    # legacy OLE2 office (DOC/XLS): the parse-tika POI path
    from .parse_msoffice import msoffice_parse_rows

    mparsed = msoffice_parse_rows(
        slice_df.filter(is_ole2),
        id_col="url_hash",
        passthrough=("url", "content_type"),
    )
    ms_out = _norm(
        mparsed,
        "parse-tika",
        F.col("msoffice_ok"),
        F.col("msoffice_status"),
        F.col("title"),
        F.col("text"),
        F.array().cast(OUTLINKS_T),
    )
    return (
        out.unionByName(pdf_out)
        .unionByName(office_out)
        .unionByName(ms_out)
    )


_BACKENDS = {
    "parse-html": _run_html,
    "parse-js": _run_js,
    "feed": _run_feed,
    "parse-zip": _run_zip,
    "parse-swf": _run_swf,
    "parse-tika": _run_tika,
}


def parse_dispatch(
    df: DataFrame,
    plugins: dict[str, list[str]] | None = None,
    url_col: str = "url",
    id_col: str = "url_hash",
    bytes_col: str = "bytes",
    content_type_col: str = "content_type",
) -> DataFrame:
    """One PARSE_RESULT row per input row, parsed by the first
    succeeding parser of its content type's configured chain. Unmapped
    types use the ``"*"`` chain; with no ``"*"`` entry they fail as
    ``parser not found`` (ParserFactory.getParsers:112-114)."""
    plugins = DEFAULT_PARSE_PLUGINS if plugins is None else plugins
    src = df.select(
        F.col(id_col).alias("url_hash"),
        F.col(url_col).alias("url"),
        F.col(content_type_col).alias("content_type"),
        F.col(bytes_col).alias("bytes"),
    )

    # group mimeTypes by identical chain so each chain runs once over
    # one filtered slice (fewer, wider slices -> fewer union branches)
    chain_groups: dict[tuple[str, ...], list[str]] = {}
    for mt, chain in plugins.items():
        if mt != "*":
            chain_groups.setdefault(tuple(chain), []).append(mt)

    mapped_types = [mt for mts in chain_groups.values() for mt in mts]
    results: list[DataFrame] = []

    def _run_chain(slice_df: DataFrame, chain: tuple[str, ...]) -> DataFrame:
        remaining = slice_df
        out: list[DataFrame] = []
        for i, name in enumerate(chain):
            backend = _BACKENDS.get(name)
            if backend is None:
                continue
            parsed = backend(remaining)
            if i + 1 < len(chain):
                ok_rows = parsed.filter(F.col("parse_ok"))
                out.append(ok_rows)
                remaining = remaining.join(
                    parsed.filter(~F.col("parse_ok")).select("url_hash"),
                    on="url_hash",
                    how="inner",
                )
            else:
                # last parser of the chain reports its own failures
                # (ParseUtil's "Unable to parse content" empty parse)
                out.append(parsed)
        res = out[0]
        for df_ in out[1:]:
            res = res.unionByName(df_)
        return res

    for chain, mts in chain_groups.items():
        results.append(_run_chain(src.filter(F.col("content_type").isin(mts)), chain))

    fallback = src.filter(
        ~F.coalesce(F.col("content_type"), F.lit("")).isin(mapped_types)
    )
    if "*" in plugins:
        results.append(_run_chain(fallback, tuple(plugins["*"])))
    else:
        results.append(
            _norm(
                fallback,
                "none",
                F.lit(False),
                F.concat(
                    F.lit("failed: parser not found for contentType: "),
                    F.coalesce("content_type", F.lit("null")),
                ),
                F.lit(""),
                F.lit(""),
                F.array().cast(OUTLINKS_T),
            )
        )

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
