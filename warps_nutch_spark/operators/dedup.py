"""Deduplication operators for the training-data pipeline.

All operators are pure DataFrame compositions (no UDFs) so Catalyst
sees through them and the DuckDB oracles can mirror them exactly:

- exact: md5(text) hash-groupBy (the reference's signature dedup,
  ``crawl/TextMD5Signature.java:42-49`` generalized);
- minhash-LSH: shingle -> minhash -> band -> bucket-join (implemented
  in queries.py::q_dedup_minhash_lsh);
- simhash: 64-bit sign-vote over md5 bits of tokens — expressed as 64
  generated column expressions (4 bits per md5 hex char), aggregated
  with sums; returns a 64-char '0'/'1' string so both engines agree
  without signed-int pitfalls;
- n-gram Jaccard verify: true Jaccard similarity over 3-gram shingles
  for LSH candidate pairs (intersection via shingle join);
- embedding-cosine near-dup: queries.py::q_embedding_cosine_dedup.

Scale shapes: simhash is explode + one wide groupBy (a single
shuffle); jaccard verification joins only LSH-candidate pairs, never
the full cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .skew import scan_is_narrow, spread_narrow_scan

HEX = "0123456789abcdef"


def simhash_bits(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash_bits): 64-bit simhash as a '0'/'1' string.

    bit b (0..63) lives in hex char b//4 (high nibble first); each
    token votes +1/-1 per bit; majority (sum > 0) sets the bit.

    The expensive part is the map-side partial aggregation (md5 + 64
    bit-expressions per token row). When the input scan has fewer
    partitions than cores (one small parquet file -> 1 partition) that
    runs single-threaded, so spread the docs first; at real scale the
    scan already has >= cores partitions and this is a no-op.
    """
    docs = spread_narrow_scan(docs)
    toks = docs.select(
        F.col(id_col), F.explode(F.split(text_col, " ")).alias("tok")
    ).filter(F.col("tok") != "")
    # bits extracted from two conv()'d 32-bit integer halves of the md5
    # hex instead of 64 substring+instr string probes per token: bit b
    # of the big-endian hex string == bit (31-b) of the first-8-chars
    # value (same for the low half) — identical values, ~3x cheaper
    # per token (the vote aggregate dominates the signature pass)
    h = toks.withColumn(
        "hi", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
    ).withColumn(
        "lo", F.conv(F.substring(F.md5("tok"), 9, 8), 16, 10).cast("long")
    )
    votes = []
    for b in range(64):
        if b < 32:
            bit = F.shiftright(F.col("hi"), 31 - b).bitwiseAND(F.lit(1))
        else:
            bit = F.shiftright(F.col("lo"), 63 - b).bitwiseAND(F.lit(1))
        votes.append(F.sum(bit * 2 - 1).alias(f"v{b}"))
    agg = h.groupBy(id_col).agg(*votes)
    bits = F.concat(
        *[F.when(F.col(f"v{b}") > 0, F.lit("1")).otherwise(F.lit("0")) for b in range(64)]
    )
    return agg.select(F.col(id_col), bits.alias("simhash_bits"))


def simhash_sql(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    """The exact DuckDB mirror of :func:`simhash_bits`, generated from
    the same bit layout."""
    votes = []
    for b in range(64):
        char_pos = b // 4 + 1
        k = b % 4
        votes.append(
            f"sum((CAST(floor((strpos('{HEX}', substr(md5(tok), {char_pos}, 1)) - 1)"
            f" / {2 ** (3 - k)}) AS INTEGER) % 2) * 2 - 1) AS v{b}"
        )
    concat = " || ".join(
        f"(CASE WHEN v{b} > 0 THEN '1' ELSE '0' END)" for b in range(64)
    )
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS tok FROM {table}
),
filtered AS (SELECT * FROM toks WHERE tok <> ''),
agg AS (
  SELECT {id_col}, {', '.join(votes)} FROM filtered GROUP BY {id_col}
)
SELECT {id_col}, {concat} AS simhash_bits FROM agg
"""


def text_profile_signature(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_token_len: int = 2,
    quant_rate: float = 0.01,
) -> DataFrame:
    """TextProfileSignature (``crawl/TextProfileSignature.java``):
    alnum-run tokens lowercased, length > min_token_len, frequency
    counts quantized to QUANT = round(maxFreq * quant_rate) (min 2 when
    maxFreq > 1), sub-QUANT tokens dropped, profile lines
    ``token cnt`` sorted by cnt desc then md5'd.

    Deviation from the reference: ties in cnt are broken by token asc
    (the Java version inherits HashMap iteration order, which is not
    deterministic across JVMs — a bug for a *signature*; we pin it).
    """
    # r6: computed entirely in the ARRAY DOMAIN inside each document's
    # row — ZERO shuffles. The r1-r5 form exploded ~50 token rows per
    # doc and ran groupBy(id, tok) -> window max(id) -> groupBy(id),
    # i.e. three exchanges of the full token table. Here the sorted
    # token array's run-lengths give the same (tok, cnt) multiset; the
    # quantization math, the (qcnt desc, tok asc) profile ordering via
    # array_sort over (neg, tok) structs, and md5 are the exact same
    # expressions as before (oracle unchanged, byte-identical output).
    # Each derived array is bound once via transform(array(..))[0] so
    # CollapseProject cannot re-inline it per reference.
    toks = F.filter(
        F.split(F.lower(F.regexp_replace(text_col, r"[^a-zA-Z0-9]+", " ")), " "),
        lambda t: F.length(t) > min_token_len,
    )

    def _lines(pairs):
        # pairs: array<struct<tok,cnt>> (distinct tokens + run counts).
        # quant is itself bound once (it aggregates over pairs and is
        # referenced per element in the quantize + threshold lambdas)
        maxfreq = F.array_max(F.transform(pairs, lambda p: p.getField("cnt")))
        quant_expr = F.greatest(
            F.when(maxfreq > 1, F.lit(2)).otherwise(F.lit(1)),
            # Java Math.round == floor(x + 0.5), spelled out as before
            F.floor(maxfreq * F.lit(float(quant_rate)) + F.lit(0.5)).cast("int"),
        )

        def _with_quant(quant):
            quantized = F.filter(
                F.transform(
                    pairs,
                    lambda p: F.struct(
                        (
                            -(
                                (p.getField("cnt") / quant).cast("long") * quant
                            )
                        ).alias("neg"),
                        p.getField("tok").alias("tok"),
                    ),
                ),
                lambda s: -s.getField("neg") >= quant,
            )
            return F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(quantized),
                    lambda s: F.concat(
                        s.getField("tok"),
                        F.lit(" "),
                        (-s.getField("neg")).cast("string"),
                    ),
                ),
            )

        return F.transform(F.array(quant_expr), _with_quant)[0]

    def _pairs(st, starts):
        # run-length encode the sorted token array: starts holds the
        # 1-based index of each run's first element
        return F.transform(
            F.sequence(F.lit(1), F.size(starts)),
            lambda j: F.struct(
                F.element_at(st, F.element_at(starts, j)).alias("tok"),
                (
                    F.coalesce(
                        F.try_element_at(starts, (j + 1).cast("int")),
                        F.size(st) + 1,
                    )
                    - F.element_at(starts, j)
                )
                .cast("long")
                .alias("cnt"),
            ),
        )

    profile = F.transform(
        F.array(F.array_sort(toks)),
        lambda st: F.transform(
            F.array(
                F.filter(
                    F.sequence(F.lit(1), F.size(st)),
                    # try_element_at: ANSI element_at rejects index 0 /
                    # overruns even on the short-circuited i == 1 branch
                    lambda i: (i == 1)
                    | ~F.element_at(st, i).eqNullSafe(
                        F.try_element_at(st, (i - 1).cast("int"))
                    ),
                )
            ),
            lambda starts: _lines(_pairs(st, starts)),
        )[0],
    )[0]
    out = spread_narrow_scan(docs).select(
        F.col(id_col), F.size(toks).alias("_n_toks"), profile.alias("_profile")
    )
    # docs with no qualifying tokens had no exploded rows before and
    # were absent from the grouped profile — keep that contract
    return out.filter(F.col("_n_toks") > 0).select(
        F.col(id_col), F.md5("_profile").alias("text_profile_sig")
    )


def rolling_fingerprints(
    docs: DataFrame,
    k: int = 5,
    window: int = 4,
    base: int = 257,
    mod: int = 1_000_003,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowed rolling-hash document fingerprints (the MOSS scheme):
    polynomial Rabin-Karp hash over character k-grams, then the min
    hash of every window of ``window`` consecutive k-grams; the
    distinct set of selected hashes is the document's fingerprint.

    Pure integer column math (identical in Spark and the DuckDB
    oracle), computed entirely in the array domain inside each doc's
    row: k-gram hashes -> per-window minima -> array_distinct -> explode
    only the selected fingerprints. ZERO shuffles (no window, no
    distinct) — the r2 version posexploded one row per character and
    ran the winnow min as a doc_id window, a full O(total-chars)
    shuffle. The classic rolling O(1)-per-position update is an
    imperative optimization; declaratively each k-gram hash is a
    k-term fold the engine vectorizes, same values.

    The hash array is bound to a higher-order-function lambda variable
    (``transform(array(hash_arr), arr -> ...)``) so it is evaluated
    once per row; referencing the raw expression inside the per-window
    lambda would re-evaluate all n_pos k-gram folds for every window."""
    n_pos = F.length(text_col) - k + 1

    # split text to a char-code array ONCE and index into it: the naive
    # per-position substr() fold re-slices the string n_pos*k times and
    # measured 9x slower (9.8s vs 1.1s at sf0.1) than element_at over a
    # bound codes array
    codes = F.transform(F.split(F.col(text_col), ""), lambda c: F.ascii(c))

    def gram_hash(cs, start):
        # unrolled k-term Horner fold: same left-to-right integer math
        # as the previous F.aggregate form, minus the per-position
        # accumulator/lambda machinery (measured ~2x on the winnow path)
        acc = F.lit(0).cast("long")
        for j in range(k):
            acc = (acc * base + F.element_at(cs, (start + j).cast("int"))) % mod
        return acc

    # hash every k-gram ONCE into an array (one row per doc — the text
    # never rides an explode), winnow in-place, emit distinct mins.
    # per-window min via least() over direct indexing — the previous
    # slice()+array_min allocated a fresh window array per position
    fps = F.transform(
        F.array(codes),  # single-element wrapper = evaluate-once binding
        lambda cs: F.transform(
            F.array(
                F.transform(
                    F.sequence(F.lit(1), F.size(cs) - k + 1),
                    lambda i: gram_hash(cs, i),
                )
            ),
            lambda arr: F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(arr) - window + 1),
                    lambda w: F.least(
                        *[
                            F.element_at(arr, (w + i).cast("int"))
                            for i in range(window)
                        ]
                    ),
                )
            ),
        )[0],
    )[0]
    return spread_narrow_scan(docs).filter(n_pos >= window).select(
        F.col(id_col), F.explode(fps).alias("fingerprint")
    )


def rolling_fingerprints_sql(
    k: int = 5,
    window: int = 4,
    base: int = 257,
    mod: int = 1_000_003,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of :func:`rolling_fingerprints` (same integer
    math; list_reduce seeded with a prepended 0)."""
    gram = (
        f"list_reduce([CAST(0 AS BIGINT)] || "
        f"list_transform(generate_series(0, {k - 1}), "
        f"j -> CAST(ord(substr({text_col}, CAST(p + j AS INTEGER), 1)) AS BIGINT)), "
        f"(acc, x) -> (acc * {base} + x) % {mod})"
    )
    return f"""
WITH pos AS (
  SELECT {id_col}, {text_col},
         length({text_col}) - {k} + 1 AS n_pos,
         unnest(generate_series(1, length({text_col}) - {k} + 1)) AS p
  FROM {table}
  WHERE length({text_col}) - {k} + 1 >= {window}
),
g AS (SELECT {id_col}, n_pos, p, {gram} AS h FROM pos),
w AS (
  SELECT {id_col}, n_pos, p,
         min(h) OVER (PARTITION BY {id_col} ORDER BY p
             ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS fingerprint
  FROM g
)
SELECT DISTINCT {id_col}, fingerprint FROM w
WHERE p <= n_pos - {window - 1}
"""


def shingles(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    dedup: bool = True,
) -> DataFrame:
    """(id, shingle) rows of word n-grams. ``dedup=False`` skips the
    distinct (one shuffle) for consumers like a min-aggregate that are
    duplicate-insensitive."""
    t = spread_narrow_scan(docs).select(
        F.col(id_col), F.split(text_col, " ").alias("t")
    ).filter(F.size("t") >= n)
    sh = t.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t)-{n - 1}),"
                f" i -> array_join(slice(t, i, {n}), ' '))"
            )
        ).alias("shingle"),
    )
    return sh.distinct() if dedup else sh


def minhash_band_table(
    docs: DataFrame,
    n_hashes: int = 4,
    n_bands: int = 2,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, band, key) LSH band-bucket rows — the PERSISTED corpus
    state for incremental dedup. At 100 TB this table is written once
    per corpus (bucketed by (band, key)) and each new crawl batch joins
    against it without re-shingling or re-hashing the corpus; the
    batch pipeline (`minhash_incremental_dedup`) only ever shuffles
    the new batch."""
    if n_hashes % n_bands != 0:
        raise ValueError(f"n_hashes={n_hashes} not divisible by n_bands={n_bands}")
    r = n_hashes // n_bands
    sh = shingles(docs, n=shingle_n, text_col=text_col, id_col=id_col, dedup=False)
    # min over md5(shingle || ':i') is an order-free, engine-agnostic
    # stand-in for the classic universal-hash family.
    #
    # Shape note (A/B-measured at sf0.1, warm: 2.6 s vs 3.8 s for the
    # full pairs pipeline): explode + groupBy BEATS the zero-shuffle
    # array-domain form (array_min over a transform of the shingle
    # array) here, for two reasons — the min partially aggregates
    # map-side so the shuffle carries O(docs) rows, not O(shingles);
    # and the banded SELF-join reuses this aggregate's exchange
    # (ReusedExchange — the signatures compute ONCE), whereas the
    # array-domain plan recomputes every md5 on BOTH join sides. The
    # array-domain trick wins only for single-consumer plans (langid,
    # rolling_fingerprint).
    mh = sh.groupBy(id_col).agg(
        *[
            F.min(F.md5(F.concat(F.col("shingle"), F.lit(f":{i}")))).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    )
    # one generator instead of n_bands unioned scans (single pass)
    return mh.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.concat(*[F.col(f"h{b * r + j}") for j in range(r)])
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "key"),
    )


def minhash_incremental_dedup(
    new_bands: DataFrame,
    corpus_bands: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental near-dup admission: dedup a NEW batch against a
    persisted corpus band table (``minhash_band_table`` output) without
    touching the corpus documents.

    Returns (doc_id, dup_of) for every new doc that collides in any
    LSH band with (a) a corpus doc — ``dup_of`` = the smallest such
    corpus id (the already-admitted copy wins) — or, failing that,
    (b) an earlier doc of the same new batch (smallest smaller id).
    Non-colliding new docs are absent (they are the admitted set).
    The min-neighbor rule is deliberately non-transitive — full
    transitive clustering is the connected-components operator's job
    (E9); this is the per-batch admission gate a rolling 100 TB
    training-data pipeline runs every ingest cycle.

    Scale shape: two equi-joins keyed on (band, key), both sized by
    the NEW batch's bucket collisions; the corpus rides in as a
    pre-bucketed table (no corpus-side shuffle with matching
    bucketing), and nothing is ever all-pairs.
    """
    n = new_bands.alias("n")
    c = corpus_bands.alias("c")
    on = (F.col("n.band") == F.col("c.band")) & (F.col("n.key") == F.col("c.key"))
    vs_corpus = (
        n.join(c, on)
        .groupBy(F.col(f"n.{id_col}").alias(id_col))
        .agg(F.min(F.col(f"c.{id_col}")).alias("_dup_corpus"))
    )
    m = new_bands.alias("m")
    on_new = (
        (F.col("n.band") == F.col("m.band"))
        & (F.col("n.key") == F.col("m.key"))
        & (F.col(f"m.{id_col}") < F.col(f"n.{id_col}"))
    )
    vs_new = (
        n.join(m, on_new)
        .groupBy(F.col(f"n.{id_col}").alias(id_col))
        .agg(F.min(F.col(f"m.{id_col}")).alias("_dup_new"))
    )
    return (
        vs_corpus.join(vs_new, on=id_col, how="full")
        .select(
            id_col,
            F.coalesce(F.col("_dup_corpus"), F.col("_dup_new")).alias("dup_of"),
        )
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n_hashes: int = 4,
    n_bands: int = 2,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Parameterized MinHash-LSH candidate pairs: shingle -> minhash ->
    band -> bucket-join (never all-pairs).

    Band-threshold math: with r = n_hashes/n_bands rows per band and b
    = n_bands bands, a pair with true shingle-Jaccard s collides in a
    given band with probability s^r and becomes a candidate with
    probability 1 - (1 - s^r)^b; the S-curve threshold sits near
    (1/b)^(1/r). The sandbox default (4 hashes, 2 bands -> r=2, b=2)
    thresholds near 0.71; a 100 TB near-dup sweep wants e.g. 128
    hashes / 32 bands (r=4 -> threshold ~0.42) — parameters, not code.

    Refinement monotonicity (pinned by tests): for fixed n_hashes,
    splitting into more bands only ADDS candidates (a match on a
    concatenated band key implies a match on each of its sub-keys).
    """
    bands = minhash_band_table(
        docs, n_hashes=n_hashes, n_bands=n_bands, shingle_n=shingle_n,
        text_col=text_col, id_col=id_col,
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .distinct()
    )


def jaccard_pairs(docs: DataFrame, candidates: DataFrame, threshold: float = 0.0) -> DataFrame:
    """True n-gram Jaccard for candidate pairs (doc_a, doc_b):
    |A ∩ B| / |A ∪ B| over distinct 3-gram shingles. Joins only the
    candidate pairs — the LSH pre-screen keeps this linear-ish.

    Shape (guide §2.3/§3.3): each doc's distinct shingle set rides as
    ONE array row (built in the scan projection, no explode, no
    distinct shuffle), the candidate pairs join those arrays by id,
    and |A ∩ B| is a per-pair ``array_intersect`` in codegen. The r2-r5
    form exploded the shingles and joined candidates ON (doc, shingle),
    shuffling |candidates| x ~n_shingles rows twice (87 s at 50k docs
    under the simhash candidate load); the array form shuffles one
    ~400-byte array per pair side. n_inter/n_a/n_b are identical
    (both sides deduped, intersection of sets)."""
    narrow = scan_is_narrow(docs)
    t = spread_narrow_scan(docs).select(
        F.col("doc_id"), F.split("text", " ").alias("t")
    ).filter(F.size("t") >= 3)
    arr = t.select(
        "doc_id",
        F.array_distinct(
            F.expr(
                "transform(sequence(1, size(t)-2),"
                " i -> array_join(slice(t, i, 3), ' '))"
            )
        ).alias("sh"),
    )
    # the verify projection (array_intersect per pair) is compute-dense
    # over 16-byte pair rows: AQE's byte-based coalescing would pack
    # millions of candidates onto 1-2 tasks. An explicit spread of the
    # candidate stream is a negligible exchange (two longs per row) and
    # pins the verify's parallelism to the core count.
    from .skew import spread

    candidates = spread(candidates)
    arr_a = arr.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    arr_b = arr.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    if narrow:
        # batch-bounded doc table: broadcast the array side so the
        # (possibly huge — simhash feeds 7.7M pairs at sf1) candidate
        # stream is never shuffled with ~800-byte arrays attached (a
        # 2 x multi-GB sort-merge exchange measured 34 s); at corpus
        # scale the shuffle join stands
        arr_a, arr_b = F.broadcast(arr_a), F.broadcast(arr_b)
    joined = candidates.join(arr_a, on="doc_a").join(arr_b, on="doc_b")
    # bind |A ∩ B| to a lambda variable and apply the threshold INSIDE
    # the array domain, emitting via explode: a generator evaluates its
    # child exactly once, so the (non-codegen, per-pair) array_intersect
    # runs ONCE — as a plain projected column it was re-inlined into
    # both the value projection and the pushed-down filter (2 evals/pair)
    jac_arr = F.filter(
        F.transform(
            F.array(F.size(F.array_intersect("sh_a", "sh_b"))),
            lambda ni: F.round(ni / (F.size("sh_a") + F.size("sh_b") - ni), 6),
        ),
        lambda j: j > threshold,
    )
    return joined.select("doc_a", "doc_b", F.explode(jac_arr).alias("jaccard"))


def hamming_pairs_int64(
    sigs: DataFrame,
    sig_col: str = "phash",
    id_col: str = "image_id",
    n_bands: int = 8,
    max_hamming: int = 6,
) -> DataFrame:
    """Near-duplicate pairs over a 64-bit integer signature (image
    pHash, ``crawl/PhashSignature`` semantics: DCT perceptual hash,
    near-dup iff Hamming(a, b) <= t) — banded bucket join, never
    all-pairs.

    Pigeonhole guarantee: splitting 64 bits into ``n_bands`` equal
    bands, any pair within Hamming distance < n_bands must agree
    exactly on at least one band: a pair at distance d can disagree on
    at most d bands, hence collides whenever d < n_bands. The default
    n_bands=8 therefore guarantees full recall for every d <= 7, which
    covers the default max_hamming=6 with margin; callers lowering
    n_bands below max_hamming+1 accept banded (partial) recall and
    must document it. The verify step is exact (bit_count of xor), so
    banding only affects recall, never precision.

    Scale shape: one generator per row (n_bands band rows), one
    shuffle for the self-join on (band, key), exact verify on
    candidates only. At 10^10 images this is the same plan — band
    buckets are ~uniform because pHash bits are decorrelated by the
    DCT.
    """
    if 64 % n_bands != 0:
        raise ValueError(f"n_bands={n_bands} must divide 64")
    width = 64 // n_bands
    mask = (1 << width) - 1
    # one small input file = one task for the ENTIRE bucket-join probe
    # (the quadratic candidate enumeration ran single-threaded: 38 s ->
    # 3 s at 50k sigs on local[32]); no-op when the scan is already wide
    sigs = spread_narrow_scan(sigs)
    bands = sigs.select(
        F.col(id_col),
        F.col(sig_col),
        F.posexplode(
            F.array(
                *[
                    (F.shiftright(F.col(sig_col), b * width).bitwiseAND(F.lit(mask)))
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "key"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    # Hamming verify BEFORE the distinct (guide §2.3 "shuffle fewer
    # bytes"): with only 2^width distinct keys per band the bucket join
    # emits O(n^2 / 2^width) collision rows, and dedup'ing them first
    # shuffled the whole quadratic candidate set (36 s at 50k images).
    # hamming is a pure function of (id_a, id_b), so
    # distinct(filter(x)) == filter(distinct(x)) — the verify runs in
    # the join stage (cheap codegen bit_count) and the distinct only
    # ever sees true near-dup pairs.
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col(f"a.{sig_col}").bitwiseXOR(F.col(f"b.{sig_col}"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def paragraph_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_para: int = 8,
) -> DataFrame:
    """(id, para_idx, para): the document split into fixed-width word
    chunks — the deterministic stand-in for paragraph boundaries on
    corpora without newline structure. Real corpora pass
    ``split(text, '\\n\\n')`` instead; every downstream op only sees
    (id, para_idx, para)."""
    k = words_per_para
    paras = F.expr(
        f"transform(sequence(0, (size(split({text_col}, ' ')) - 1) div {k}),"
        f" i -> array_join(slice(split({text_col}, ' '), i * {k} + 1, {k}), ' '))"
    )
    return spread_narrow_scan(docs).select(
        F.col(id_col), F.posexplode(paras).alias("para_idx", "para")
    )


def paragraph_dedup_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_para: int = 8,
) -> DataFrame:
    """Cross-document paragraph-level dedup metrics (the
    RefinedWeb/C4-style line-dedup pass: paragraphs repeated across
    the corpus are boilerplate and get stripped before training).

    Per document: number of paragraphs, number whose md5 appears in
    MORE THAN ONE distinct document corpus-wide, and the duplicate
    fraction.

    Scale shape: explode -> md5 -> groupBy(hash) (ONE shuffle over
    paragraphs, map-side combinable: distinct-doc counts aggregate per
    hash) -> broadcast-joinable duplicate-hash set back onto the
    paragraph table -> per-doc aggregate (second shuffle, keyed by
    id). No step holds a document's full text after the explode, so a
    100 TB corpus streams through as paragraph rows.
    """
    paras = paragraph_chunks(docs, text_col, id_col, words_per_para).select(
        F.col(id_col), F.md5(F.col("para")).alias("para_hash")
    )
    # corpus-wide: hashes appearing in >1 distinct document
    dup_hashes = (
        paras.groupBy("para_hash")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
        .select("para_hash")
    )
    flagged = paras.join(
        dup_hashes.withColumn("_dup", F.lit(1)), on="para_hash", how="left"
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count("*").alias("n_paras"),
            F.sum(F.coalesce(F.col("_dup"), F.lit(0))).alias("n_dup_paras"),
        )
        .select(
            F.col(id_col),
            "n_paras",
            "n_dup_paras",
            F.round(F.col("n_dup_paras") / F.col("n_paras"), 6).alias(
                "dup_para_frac"
            ),
        )
    )
