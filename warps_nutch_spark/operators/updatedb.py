"""Updatedb: outlink explode + OPIC aggregation + frontier MERGE.

Reference dataflow (``mapreduce/DbUpdateJob``, SURVEY.md §3.4):

- R1 explode: each fetched page emits one datum per surviving outlink
  (cap db.max.outlinks=1000) with positional score n-i
  (``dbupdate/MapDatumBuilder.java:151-206``) -> ``posexplode``;
- R2 OPIC distribution: contribution += (cash/n) * internal|external
  factor by same-host test; source cash resets to 0
  (``plugin/scoring-opic/.../OPICScoringFilter.java:140-176``);
- R3/R5 group-by-URL merge: score += sum(inlink contributions), cash
  likewise (``DbUpdateReducer.java:76-105``,
  ``OPICScoringFilter.java:106-137``) -> groupBy(url_hash).agg(sum);
- R4 inlink cap + distance: only the top db.update.max.inlinks=10000
  contributions count; distance = min(inlink distance)+1 if smaller
  (``ReduceDatumBuilder.java:114,162-184``) -> window rank + min agg;
- R6 new-row creation: unseen URL -> UNFETCHED row, initial score 0
  (+contributions), priority FROM_SEED if the linking page was a seed
  (``ReduceDatumBuilder.java:76-96,134-153``) -> the MERGE anti-join
  IS the URL-seen dedup, pre-screened by the Bloom filter;
- R7-R9 fetch schedule by status (adaptive), retry/gone backoff
  (``ReduceDatumBuilder.java:215-276``) -> CASE WHEN columns;
- R10 mark cleanup (``ReduceDatumBuilder.java:195-213``);
- R11 status counters (``NutchCounter.java:49-71``) -> groupBy/count.

Scale shape: ONE shuffle for the contribution aggregation (groupBy
url_hash), one join of aggregated contributions (small: <= distinct
discovered URLs) against the frontier, then the MERGE. The Bloom
pre-screen drops already-seen URLs from the *insert* path before the
join so the candidate side stays proportional to newly discovered
URLs, not total outlinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..functions import scoring, urls
from ..functions.schedules import (
    STATE_UNKNOWN,
    adaptive_schedule_cols,
    gone_backoff_interval,
    modified_state_col,
)
from ..functions.status import CrawlStatus
from ..store.urlseen import BloomUrlSeen
from .rows import complete_rows


def explode_contributions(parsed: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """R1+R2: (to_url_hash, contribution, distance, from_seed)."""
    src = parsed.select(
        F.col("url").alias("from_url"),
        F.col("host").alias("from_host"),
        F.col("cash").alias("from_cash"),
        F.col("distance").alias("from_distance"),
        F.col("is_seed").alias("from_is_seed"),
        F.slice(F.coalesce("outlinks", F.array()), 1, cfg.max_outlinks_exploded).alias(
            "links"
        ),
    ).filter(F.size("links") > 0)
    exploded = src.select(
        "from_url",
        "from_host",
        "from_cash",
        "from_distance",
        "from_is_seed",
        F.size("links").alias("n_links"),
        F.posexplode("links").alias("pos", "link"),
    )
    to_url = F.col("link.url")
    contrib = scoring.outlink_contribution(
        F.col("from_cash"),
        F.col("n_links"),
        F.col("pos"),
        F.col("from_host"),
        urls.host_col(to_url),
        cfg,
    )
    return exploded.select(
        to_url.alias("to_url"),
        urls.url_hash_col(to_url).alias("to_url_hash"),
        urls.host_col(to_url).alias("to_host"),
        contrib.alias("contribution"),
        (F.col("from_distance") + 1).alias("inlink_distance"),
        F.col("from_is_seed").alias("from_seed"),
        F.col("from_url"),
        F.coalesce(F.col("link.anchor"), F.lit("")).alias("from_anchor"),
    )


def aggregate_contributions(contribs: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """R3-R5: per-URL inlink aggregation with the max-inlinks cap
    (top contributions first, mirroring the score-desc secondary sort
    ``crawl/UrlWithScore.java:118-188``)."""
    win = Window.partitionBy("to_url_hash").orderBy(
        F.desc("contribution"), F.asc("from_url")
    )
    capped = contribs.withColumn("rk", F.row_number().over(win)).filter(
        F.col("rk") <= cfg.max_inlinks
    )
    # capped inlink (url, anchor) state, best-contribution-first
    # (webpage.avsc inlinks map; ReduceDatumBuilder keeps the map of
    # the round's inlinks). Storage cap separate from the scoring cap:
    # at 10^10 rows you cannot persist 10^4 inlinks per URL.
    inlink_structs = F.slice(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("contribution")).alias("neg"),
                        F.col("from_url").alias("url"),
                        F.col("from_anchor").alias("anchor"),
                    )
                )
            ),
            lambda s: F.struct(
                s.getField("url").alias("url"), s.getField("anchor").alias("anchor")
            ),
        ),
        1,
        cfg.max_stored_inlinks,
    )
    return capped.groupBy("to_url_hash").agg(
        F.first("to_url").alias("to_url"),
        F.first("to_host").alias("to_host"),
        F.sum("contribution").cast("float").alias("inlink_sum"),
        F.min("inlink_distance").alias("min_inlink_distance"),
        F.max(F.col("from_seed").cast("int")).cast("boolean").alias("any_from_seed"),
        inlink_structs.alias("inlinks"),
    )


def updated_fetched_rows(
    parsed: DataFrame, cfg: CrawlConfig, now_ms: int, batch_id: str
) -> DataFrame:
    """R7-R10 for the fetched pages themselves: schedule by status,
    signature rotation, cash reset (OPIC distribute), mark cleanup."""
    # `signature` is the OLD frontier value; parse computed the new one
    # into `new_signature` (SignatureComparator semantics: prev missing
    # -> UNKNOWN, equal -> NOTMODIFIED, different -> MODIFIED)
    df = parsed.withColumn(
        "mod_state",
        F.when(
            F.col("new_status").isin(
                CrawlStatus.FETCHED, CrawlStatus.REDIR_PERM, CrawlStatus.REDIR_TEMP
            )
            & F.col("new_signature").isNotNull(),
            modified_state_col(F.col("new_signature"), F.col("signature")),
        ).otherwise(F.lit(STATE_UNKNOWN)),
    )
    new_fetch_time, new_interval = adaptive_schedule_cols(
        F.col("fetch_ts"),
        F.col("fetch_ts"),  # modified_time unknown in simulation -> fetch time
        F.col("fetch_interval"),
        F.col("mod_state"),
        cfg,
    )
    is_fetch_like = F.col("new_status").isin(
        CrawlStatus.FETCHED,
        CrawlStatus.REDIR_PERM,
        CrawlStatus.REDIR_TEMP,
        CrawlStatus.NOTMODIFIED,
    )
    is_retry = F.col("new_status") == CrawlStatus.RETRY
    retry_exhausted = is_retry & (
        F.col("retries_since_fetch") + 1 >= F.lit(cfg.max_retries)
    )
    is_gone = (F.col("new_status") == CrawlStatus.GONE) | retry_exhausted

    out = (
        df.withColumn(
            "status",
            F.when(is_gone, F.lit(CrawlStatus.GONE)).otherwise(F.col("new_status")),
        )
        .withColumn("prev_fetch_time", F.col("fetch_time"))
        .withColumn(
            "fetch_time",
            F.when(is_fetch_like, new_fetch_time)
            .when(is_retry & ~retry_exhausted, F.lit(now_ms) + F.col("fetch_interval").cast("long") * 1000)
            .otherwise(F.lit(now_ms) + F.col("fetch_interval").cast("long") * 1000),
        )
        .withColumn(
            "fetch_interval",
            F.when(is_fetch_like, new_interval)
            .when(is_gone, gone_backoff_interval(F.col("fetch_interval"), cfg))
            .otherwise(F.col("fetch_interval")),
        )
        .withColumn(
            "retries_since_fetch",
            F.when(is_retry, F.col("retries_since_fetch") + 1).otherwise(F.lit(0)),
        )
        .withColumn("prev_signature", F.col("signature"))
        .withColumn("signature", F.coalesce(F.col("new_signature"), F.col("signature")))
        .withColumn("cash", F.lit(0.0).cast("float"))  # OPIC distribute reset
        .withColumn(
            "protocol_status",
            F.struct(
                F.col("proto_code").alias("code"),
                F.array().cast("array<string>").alias("args"),
                F.col("fetch_ts").alias("last_modified"),
            ),
        )
        .withColumn("modified_time", F.col("fetch_ts"))
        .withColumn("fetched_batch", F.lit(batch_id))
        .withColumn("parsed_batch", F.lit(batch_id))
        .withColumn("updated_batch", F.lit(batch_id))
        .withColumn("generated_batch", F.lit(None).cast("string"))  # R10 clear marks
    )
    return out


def updatedb(
    frontier: DataFrame,
    parsed: DataFrame,
    cfg: CrawlConfig,
    now_ms: int,
    batch_id: str,
    urlseen: BloomUrlSeen | None = None,
    cached_out: list | None = None,
    prev_state: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (merge_rows, counters). ``merge_rows`` are full
    frontier-schema rows: updated fetched pages + updated existing
    link targets + newly discovered rows. Persisted intermediates are
    appended to ``cached_out`` (if given) so the caller can unpersist
    them once the merge plan is materialized — a long-running driver
    (many rounds per session) must not accumulate cached blocks."""
    contribs = explode_contributions(parsed, cfg)
    # agg feeds three consumers (existing-row update, new-row insert,
    # fetched-row inlink fold) — persist so the explode+groupBy shuffle
    # runs once, not per branch
    agg = aggregate_contributions(contribs, cfg).persist()
    if cached_out is not None:
        cached_out.append(agg)

    fetched_updates = updated_fetched_rows(parsed, cfg, now_ms, batch_id)
    # inlinks / repr_url state does not ride through the fetch UDF
    # (arrays through Arrow would dominate the politeness stage); the
    # caller supplies the fetchlist's prior state instead — a
    # small x small join, never a frontier point-lookup.
    if prev_state is not None:
        ps = prev_state.select(
            "url_hash",
            F.col("inlinks").alias("_prev_inlinks"),
            F.col("repr_url").alias("_prev_repr"),
        )
        fetched_updates = fetched_updates.join(ps, on="url_hash", how="left")
    else:
        fetched_updates = fetched_updates.withColumn(
            "_prev_inlinks", F.lit(None).cast("array<struct<url:string,anchor:string>>")
        ).withColumn("_prev_repr", F.lit(None).cast("string"))
    # reprUrl on redirect (URLUtil.chooseRepr, TaskScheduler.java:731-774)
    redirected = F.col("new_status").isin(
        CrawlStatus.REDIR_PERM, CrawlStatus.REDIR_TEMP
    ) & (F.size(F.coalesce("outlinks", F.array())) > 0)
    fetched_updates = fetched_updates.withColumn(
        "repr_url",
        F.when(
            redirected,
            urls.choose_repr_col(
                F.col("url"),
                F.element_at("outlinks", 1).getField("url"),
                F.col("new_status") == CrawlStatus.REDIR_TEMP,
            ),
        ).otherwise(F.col("_prev_repr")),
    ).drop("_prev_repr")

    # score updates for pages receiving inlinks that already exist
    existing = frontier.join(
        agg.select(
            F.col("to_url_hash").alias("url_hash"),
            "inlink_sum",
            "min_inlink_distance",
            F.col("inlinks").alias("_new_inlinks"),
        ),
        on="url_hash",
        how="inner",
    )
    # fetched pages may also receive inlinks: fold their update in later
    existing = (
        existing.withColumn("score", scoring.updated_score(F.col("score"), F.col("inlink_sum")))
        .withColumn("cash", scoring.updated_cash(F.col("cash"), F.col("inlink_sum")))
        .withColumn(
            "distance",
            F.least(F.col("distance"), F.col("min_inlink_distance")),
        )
        .withColumn("inlinks", F.col("_new_inlinks"))
        .withColumn("updated_batch", F.lit(batch_id))
        .drop("inlink_sum", "min_inlink_distance", "_new_inlinks")
    )

    # new rows: discovered URLs not in the frontier (R6). Bloom
    # pre-screen keeps known URLs out of the anti-join; membership
    # ground truth remains the anti-join itself.
    if cfg.additions_allowed:
        cand = agg
        if urlseen is not None:
            # persisted: both union branches below read it
            screened = urlseen.maybe_seen(
                agg.withColumnRenamed("to_url_hash", "url_hash"), "url_hash"
            ).persist()
            if cached_out is not None:
                cached_out.append(screened)
            cand = screened.filter(~F.col("maybe_seen")).drop("maybe_seen").unionByName(
                screened.filter(F.col("maybe_seen"))
                .drop("maybe_seen")
                .join(frontier.select("url_hash"), on="url_hash", how="left_anti")
            ).withColumnRenamed("url_hash", "to_url_hash")
        else:
            cand = agg.join(
                frontier.select(F.col("url_hash").alias("to_url_hash")),
                on="to_url_hash",
                how="left_anti",
            )
        # also not among the just-fetched rows
        cand = cand.join(
            fetched_updates.select(F.col("url_hash").alias("to_url_hash")),
            on="to_url_hash",
            how="left_anti",
        )
        new_rows = complete_rows(
            cand.select(
                F.col("to_url").alias("url"),
                F.col("to_url_hash").alias("url_hash"),
                F.col("to_host").alias("host"),
                F.col("inlink_sum").cast("float").alias("score"),
                F.col("inlink_sum").cast("float").alias("cash"),
                F.col("min_inlink_distance").alias("distance"),
                F.col("inlinks"),
                F.when(F.col("any_from_seed"), F.lit(cfg.priority_from_seed))
                .otherwise(F.lit(cfg.priority_default))
                .alias("priority"),
                F.lit(batch_id).alias("updated_batch"),
            ),
            cfg,
            now_ms,
        )
    else:
        new_rows = None

    # fetched rows can also receive inlink contributions this round
    fetched_updates = (
        fetched_updates.join(
            agg.select(
                F.col("to_url_hash").alias("url_hash"),
                "inlink_sum",
                "min_inlink_distance",
                F.col("inlinks").alias("_new_inlinks"),
            ),
            on="url_hash",
            how="left",
        )
        .withColumn("score", scoring.updated_score(F.col("score"), F.col("inlink_sum")))
        .withColumn("cash", scoring.updated_cash(F.col("cash"), F.col("inlink_sum")))
        .withColumn(
            "distance",
            F.least(F.col("distance"), F.coalesce("min_inlink_distance", F.col("distance"))),
        )
        .withColumn("inlinks", F.coalesce(F.col("_new_inlinks"), F.col("_prev_inlinks")))
        .drop("inlink_sum", "min_inlink_distance", "_new_inlinks", "_prev_inlinks")
    )

    frontier_cols = frontier.columns
    fetched_full = complete_rows(fetched_updates, cfg, now_ms).select(*frontier_cols)
    # a URL may be both a fetched page and a link target; fetched wins
    existing = existing.join(
        fetched_full.select("url_hash"), on="url_hash", how="left_anti"
    ).select(*frontier_cols)
    merge_rows = fetched_full.unionByName(existing)
    if new_rows is not None:
        merge_rows = merge_rows.unionByName(new_rows.select(*frontier_cols))

    counters = (
        merge_rows.filter(F.col("updated_batch") == batch_id)
        .groupBy("status")
        .agg(F.count("*").alias("value"))
        .select(
            F.lit(batch_id).alias("batch_id"),
            F.lit("updatedb").alias("stage"),
            F.col("status").cast("string").alias("counter"),
            F.col("value"),
        )
    )
    return merge_rows, counters
