"""Character-trigram language identification (Cavnar & Trenkle style,
"N-Gram-Based Text Categorization", 1994 — the same family of n-gram
profile matching the reference ships as
``src/plugin/language-identifier`` (Nutch's LanguageIdentifier plugin
wraps an n-gram profile matcher; no model download needed here).

Method: explode the text into lowercase char trigrams, join against a
small BUILT-IN profile table of distinctive trigrams per language
(broadcast — a few hundred rows), count hits per (doc, lang), take the
argmax with a deterministic tie-break. Pure column math: the DuckDB
oracle replays it exactly.

Scale shape: the explode is O(chars) rows but the join is broadcast
and the only shuffle is the (doc_id, lang) count aggregate — hit rows
only, far smaller than the corpus. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Distinctive trigrams per language (space-padded forms carry word
# boundary signal, as in the classic profiles). Public linguistic
# knowledge; deliberately small — parameters, not a model.
LANG_TRIGRAMS: dict[str, list[str]] = {
    "en": [
        "the", " th", "he ", "ing", "ng ", "and", "nd ", " an",
        " of", "of ", "ion", "tio", "ati", " to", "to ", "ent",
        " in", "is ", " is", "ed ",
    ],
    "de": [
        "der", "die", "und", " un", "ein", " ei", "ich", "sch",
        "ch ", "cht", "ung", "gen", "nde", "ber", "ten", " ge",
        "ie ", "en ", "er ", "das",
    ],
    "fr": [
        " le", "le ", "les", " la", "la ", "que", " qu", "ue ",
        "ent", "ont", "ait", "eur", "our", " et", "et ", "des",
        " de", "de ", "es ", "ais",
    ],
    "es": [
        " el", "el ", "los", " lo", "las", "ión", "cio", "ado",
        "ada", " un", "una", "par", " pa", "ara", " es", "es ",
        "que", " qu", "de ", " de",
    ],
}


def lang_profiles_df(spark: SparkSession) -> DataFrame:
    rows = [(lang, tg) for lang, tgs in LANG_TRIGRAMS.items() for tg in tgs]
    return spark.createDataFrame(rows, ["lang", "tg"])


def langid_trigram(
    docs: DataFrame,
    profiles: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, lang_guess, trigram_hits): best-matching language by
    profile-trigram hit count; 'unknown' (0 hits) when nothing matches.
    Ties break on lang asc so both engines agree.

    Implementation is entirely in the row's array domain: one trigram
    array build, one aggregate() fold counting all profiles in a
    single pass — no Generate of O(chars) rows, no join, no shuffle
    (the r2 explode+broadcast-join form shuffled hit rows and was the
    suite's slowest non-crawl query at 6.2 s / sf0.1; this form is a
    pure projection). ``profiles`` is accepted for the pytest that
    swaps profile tables; when given, falls back to the relational
    form."""
    if profiles is not None:
        return _langid_trigram_join(docs, profiles, text_col, id_col)
    langs = sorted(LANG_TRIGRAMS)
    low = F.lower(F.col(text_col))
    tgs = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(low) - 2, F.lit(0))),
        lambda i: low.substr(i, F.lit(3)),
    )
    zero = F.struct(*[F.lit(0).cast("long").alias(f"c_{l}") for l in langs])
    profile_arrs = {
        l: F.array(*[F.lit(t) for t in LANG_TRIGRAMS[l]]) for l in langs
    }
    counts = F.aggregate(
        tgs,
        zero,
        lambda acc, t: F.struct(
            *[
                (
                    acc.getField(f"c_{l}")
                    + F.array_contains(profile_arrs[l], t).cast("long")
                ).alias(f"c_{l}")
                for l in langs
            ]
        ),
    )
    out = docs.select(F.col(id_col), counts.alias("_c"))
    cs = [F.col(f"_c.c_{l}") for l in langs]
    m = F.greatest(*cs)
    guess = F.when(m == 0, F.lit("unknown"))
    for l in langs:  # asc-lang tie-break: first match wins
        guess = guess.when(F.col(f"_c.c_{l}") == m, F.lit(l))
    return out.select(
        F.col(id_col),
        guess.alias("lang_guess"),
        m.cast("bigint").alias("trigram_hits"),
    )


def _langid_trigram_join(
    docs: DataFrame, profiles: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Relational form (explode + broadcast profile join) for
    caller-supplied profile tables."""
    low = F.lower(F.col(text_col))
    tgs = docs.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(low) - 2, F.lit(0))),
                lambda i: low.substr(i, F.lit(3)),
            )
        ).alias("tg"),
    )
    hits = (
        tgs.join(F.broadcast(profiles), on="tg")
        .groupBy(id_col, "lang")
        .agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("c"), F.asc("lang"))
    best = hits.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return docs.select(id_col).join(best, on=id_col, how="left").select(
        F.col(id_col),
        F.coalesce(F.col("lang"), F.lit("unknown")).alias("lang_guess"),
        F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("trigram_hits"),
    )


def langid_trigram_sql(
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB mirror of :func:`langid_trigram` (same profiles, same
    tie-break)."""
    vals = ", ".join(
        f"('{lang}', '{tg}')"
        for lang, tgs in LANG_TRIGRAMS.items()
        for tg in tgs
    )
    return f"""
WITH prof(lang, tg) AS (VALUES {vals}),
tg AS (
  SELECT {id_col}, unnest(list_transform(
      generate_series(1, greatest(len({text_col}) - 2, 0)),
      i -> substr(lower({text_col}), CAST(i AS INTEGER), 3))) AS tg
  FROM {table}
),
hits AS (
  SELECT {id_col}, lang, count(*) AS c
  FROM tg JOIN prof USING (tg) GROUP BY 1, 2
),
best AS (
  SELECT {id_col}, lang, c,
         row_number() OVER (PARTITION BY {id_col} ORDER BY c DESC, lang ASC) AS rn
  FROM hits
)
SELECT d.{id_col},
       coalesce(b.lang, 'unknown') AS lang_guess,
       CAST(coalesce(b.c, 0) AS BIGINT) AS trigram_hits
FROM {table} d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING ({id_col})
"""
