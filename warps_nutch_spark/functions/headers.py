"""Spell-checked HTTP header names.

Reference: ``metadata/SpellCheckedMetadata.java`` — crawled servers
misspell header names ("Last-Modifed", "content_typ"); the reference
re-keys them to the canonical ``metadata/HttpHeaders.java`` constants:
normalize (letters only, lowercased), exact lookup first, then a
Levenshtein pass accepting distance < len(normalized)/3
(TRESHOLD_DIVIDER=3), unmatched names pass through.

Deviation pinned (same rationale as TextProfileSignature's tie-break):
the reference scans candidates in ``HashMap.keySet()`` order — JVM-
unspecified, so two runs could re-key an ambiguous name differently.
Here the (distance, canonical-name) MINIMUM wins, deterministically.

Spark shape: one Column expression — the candidate table is a literal
struct array, ``array_min`` picks the (d, name) minimum (an exact
match is (0, name) and always wins), whole-stage codegen, no UDF.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

#: metadata/HttpHeaders.java public static final String fields — the exact
#: set SpellCheckedMetadata reflects over (SpellCheckedMetadata.java:55
#: spellthese = { HttpHeaders.class }), including the warps-satellite Q-*
#: constants (HttpHeaders.java:50-69)
HTTP_HEADERS = [
    "Content-Disposition",
    "Content-Encoding",
    "Content-Language",
    "Content-Length",
    "Content-Location",
    "Content-MD5",
    "Content-Type",
    "Last-Modified",
    "Location",
    "Q-Checksum",
    "Q-Item-Id",
    "Q-Job-Id",
    "Q-Password",
    "Q-Queue-Id",
    "Q-Response-Time",
    "Q-Status-Code",
    "Q-Url",
    "Q-Username",
    "Q-Version",
    "Transfer-Encoding",
]


def _norm(s: str) -> str:
    """SpellCheckedMetadata.normalize: letters only, lowercased."""
    return re.sub(r"[^a-zA-Z]", "", s).lower()


def spellchecked_header_col(name: Column, canonical: list[str] | None = None) -> Column:
    """Canonical header name for a possibly-misspelled one."""
    names = canonical or HTTP_HEADERS
    searched = F.lower(F.regexp_replace(name, "[^a-zA-Z]", ""))
    threshold = F.floor(F.length(searched) / 3).cast("int")
    entries = F.array(
        *[
            F.struct(
                F.levenshtein(searched, F.lit(_norm(c))).alias("d"),
                F.lit(c).alias("v"),
            )
            for c in names
        ]
    )
    # exact match (d == 0) is accepted unconditionally; fuzzy matches
    # need d < threshold (getNormalizedName's two-phase lookup)
    cands = F.filter(
        entries,
        lambda e: (e.getField("d") == 0) | (e.getField("d") < threshold),
    )
    return F.when(
        F.size(cands) > 0, F.array_min(cands).getField("v")
    ).otherwise(name)
