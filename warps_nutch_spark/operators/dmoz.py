"""DMOZ RDF seed-list ingestion (``tools/DmozParser.java``).

Reference semantics (RDFProcessor, :115-258):

- ``Topic r:id`` sets the current section; ``ExternalPage about=``
  claims a URL under it;
- adult filter: sections starting ``Top/Adult`` are skipped unless
  ``include_adult`` (:157-159);
- topic filter: a regex the section must fully match (:161-163);
- subset sampling: a URL is emitted with chance 1/``subset_denom``
  by hashing the URL, XOR-ing a skew, and testing ``% denom == 0``
  (:166-172). The hash here is the first 4 bytes of MD5(url) as a
  signed int (the reference reads Hadoop MD5Hash.hashCode(); same
  keyed-uniform sampling contract, different mixing constants —
  documented deviation, the subset is a sample by design);
- ``d:Title`` / ``d:Description`` text is captured for the claimed
  URL (:176-196); non-snippet mode prints the URL list for inject
  (:238).

Spark shape: parallelism is per RDF FILE (binaryFile + mapInPandas,
one streaming ``iterparse`` per file) — DMOZ dumps ship as a handful
of multi-GB files, and the section state machine is inherently
sequential WITHIN a file; everything downstream (inject, dedup,
generate) is fully distributed. Splitting giant dumps into per-topic
parts is the documented scale path.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DMOZ_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("topic", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
    ]
)


def _url_hash_int(url: str) -> int:
    import hashlib
    import struct

    return struct.unpack(">i", hashlib.md5(url.encode()).digest()[:4])[0]


def iter_dmoz_pages(
    data: bytes,
    subset_denom: int = 1,
    include_adult: bool = False,
    topic_pattern: str | None = None,
    skew: int = 0,
):
    """Yield (url, topic, title, description) from one RDF dump."""
    import io
    import xml.etree.ElementTree as ET

    topic_re = re.compile(topic_pattern) if topic_pattern else None

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    section = ""
    cur = None  # (url, {"Title": ..., "Description": ...})
    for event, elem in ET.iterparse(io.BytesIO(data), events=("start", "end")):
        name = local(elem.tag)
        if event == "start":
            if name == "Topic":
                for k, v in elem.attrib.items():
                    if local(k) == "id":
                        section = v
            elif name == "ExternalPage":
                if not include_adult and section.startswith("Top/Adult"):
                    continue
                if topic_re is not None and not topic_re.fullmatch(section):
                    continue
                url = next(
                    (v for k, v in elem.attrib.items() if local(k) == "about"),
                    None,
                )
                if url is None:
                    continue
                if abs(_url_hash_int(url) ^ skew) % subset_denom != 0:
                    continue
                cur = (url, section, {})
        elif event == "end":
            if cur is not None and name in ("Title", "Description"):
                cur[2][name] = (elem.text or "").strip()
            elif name == "ExternalPage":
                if cur is not None:
                    url, topic, fields = cur
                    yield (
                        url,
                        topic,
                        fields.get("Title", ""),
                        fields.get("Description", ""),
                    )
                    cur = None
                elem.clear()  # streaming: drop the subtree
            elif name == "Topic":
                elem.clear()


def dmoz_pages_from_blobs(
    blobs: DataFrame,
    subset_denom: int = 1,
    include_adult: bool = False,
    topic_pattern: str | None = None,
    skew: int = 0,
) -> DataFrame:
    """(url, topic, title, description) rows from a ``(content:
    binary)`` DataFrame of whole RDF dump blobs — the shared core of
    ``dmoz_seeds`` (binaryFile input) and the in-memory oracle query
    (synthesized dumps); one streaming iterparse per blob."""
    import pandas as pd

    def _batches(it):
        cols = [f.name for f in DMOZ_SCHEMA.fields]
        for pdf in it:
            rows = []
            for blob in pdf["content"]:
                rows.extend(
                    iter_dmoz_pages(
                        bytes(blob),
                        subset_denom=subset_denom,
                        include_adult=include_adult,
                        topic_pattern=topic_pattern,
                        skew=skew,
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return blobs.select("content").mapInPandas(_batches, DMOZ_SCHEMA)


def dmoz_seeds(
    spark: SparkSession,
    path: str,
    subset_denom: int = 1,
    include_adult: bool = False,
    topic_pattern: str | None = None,
    skew: int = 0,
) -> DataFrame:
    """(url, topic, title, description) rows from RDF dumps under
    ``path`` — the inject-ready seed table (DmozParser's printed URL
    list plus the snippet fields)."""
    files = spark.read.format("binaryFile").load(path)
    return dmoz_pages_from_blobs(
        files,
        subset_denom=subset_denom,
        include_adult=include_adult,
        topic_pattern=topic_pattern,
        skew=skew,
    )
