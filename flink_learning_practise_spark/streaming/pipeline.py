"""Streaming ETL pipeline builders — Spark analog of the reference's
``flink_kafka_to_mysql_utils.py`` (create_etl_pipeline_datastream:71,
create_etl_pipeline_table_api:169, create_etl_pipeline_with_transform:261)
and the stage2 windowed-statistics job (order_statistics.py).

The pipeline is source-agnostic: any streaming DataFrame in, windowed
aggregation with event-time watermarks, any sink writer out. The same
transformation functions run on batch frames (test path) and unbounded
frames (production path) — Structured Streaming's core win over the
reference's split DataStream/Table code paths.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Watermark strategy (ref flink_window_utils.py:399
    create_watermark_strategy — bounded out-of-orderness). ``delay`` is
    the lateness bound, e.g. '10 minutes'; it also bounds state size:
    windows older than the watermark are finalized and evicted."""
    return df.withWatermark(ts_col, delay)


def windowed_stats(
    df: DataFrame,
    ts_col: str,
    window_size: str,
    keys: Sequence[str],
    aggs: Sequence[Column],
    watermark_delay: str = "10 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Event-time windowed aggregation (stage2 order_statistics core):
    watermark → window groupBy → flattened window bounds. Works on both
    streaming and batch frames (watermark is a no-op in batch)."""
    src = with_watermark(df, ts_col, watermark_delay)
    window = (
        F.window(ts_col, window_size, slide) if slide else F.window(ts_col, window_size)
    )
    grouped = src.groupBy(window.alias("window"), *keys).agg(*aggs)
    return grouped.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in grouped.columns if c != "window"],
    ).drop("window")


def stream_session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str],
    aggs: Sequence,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Built-in streaming session window (ref session_window:186 made
    continuous): gap-merged sessions per key via ``F.session_window``,
    closed and emitted once the watermark passes session end (append
    mode). Note the built-in's window end is ``last event + gap`` —
    ``gap`` longer than the batch gaps-and-islands end (= last event
    ts); the custom ``streaming/stateful.sessionize`` exists for
    semantics this built-in can't express (per-event accumulators,
    early snapshots)."""
    src = with_watermark(df, ts_col, watermark_delay)
    grouped = src.groupBy(
        F.session_window(F.col(ts_col), gap).alias("window"), *keys
    ).agg(*aggs)
    return grouped.select(
        F.col("window.start").alias("session_start"),
        F.col("window.end").alias("session_end"),
        *[c for c in grouped.columns if c != "window"],
    )


def stream_window_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    size: str,
    on: Sequence[tuple[str, str]],
    watermark_delay: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream window join (ref flink_transform_utils.py:377
    join_streams, the streaming original of operators/joins.window_join):
    rows join iff their event times fall in the same epoch-aligned
    tumbling window and their keys match.

    Both sides carry watermarks and the join includes the window-bucket
    equality, so Spark bounds join state: buckets older than
    watermark - delay are finalized and evicted — the Structured
    Streaming twin of Flink's window-join state cleanup. ``on`` is a
    list of (left_col, right_col) pairs; right join columns and ts are
    suffixed ``_r`` in the output.

    ``how`` extends to ``left_outer``/``right_outer``/``full_outer``
    (Flink's CoGroup-style outer window join): unmatched rows emit with
    NULL partner columns — but only once the watermark passes their
    window (the row is provably unmatchable, exactly Flink's
    window-fire semantics), so outer results trail the watermark by
    up to window + delay."""
    # join on the WINDOW STRUCT, not its .start: the struct column
    # produced by F.window over a watermarked ts carries the watermark
    # tag Spark requires in the join keys — that's what licenses state
    # eviction AND the outer-join null emission (an extracted .start
    # field loses the tag and outer joins are rejected outright).
    lw = with_watermark(left, left_ts, watermark_delay).withColumn(
        "_lwin", F.window(left_ts, size)
    )
    r_renamed = right.select(
        *[F.col(c).alias(f"{c}_r") for c in right.columns]
    )
    rw = with_watermark(r_renamed, f"{right_ts}_r", watermark_delay).withColumn(
        "_rwin", F.window(f"{right_ts}_r", size)
    )
    cond = lw["_lwin"] == rw["_rwin"]
    for lc, rc in on:
        cond = cond & (lw[lc] == rw[f"{rc}_r"])
    return (
        lw.join(rw, cond, how)
        .withColumn(
            "window_start",
            F.coalesce(F.col("_lwin.start"), F.col("_rwin.start")),
        )
        .drop("_lwin", "_rwin")
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Stream-static join — the streaming form of the lookup/dim join
    (ref flink_transform_utils.py lookup join `FOR SYSTEM_TIME AS OF`,
    and the Flink broadcast-state pattern: a small rules/dim table
    visible in full on every stream task).

    Structured Streaming re-executes the static side's plan on every
    micro-batch: sources that re-scan at execution time (JDBC queries,
    Delta tables) surface dim updates between batches — Flink's
    broadcast-state refresh minus the custom state plumbing. Plain
    file sources snapshot their file LISTING when the DataFrame is
    created, so new dim files need a re-created frame (do it inside
    ``foreachBatch`` if refresh matters). The broadcast hint keeps the
    stream side shuffle-free (no Exchange on the unbounded side);
    stateless, so no watermark is needed."""
    d = F.broadcast(dim) if broadcast else dim
    return stream.join(d, on=list(on), how=how)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    on: Sequence[tuple[str, str]],
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Stream-stream interval join (the streaming original of
    operators/joins.interval_join — Flink's intervalJoin): left row L
    joins right row R iff keys match and
    ``R.ts ∈ [L.ts - lower, L.ts + upper]``.

    Both sides carry watermarks and the join condition bounds the two
    event times against each other, which is exactly what Structured
    Streaming needs to size and EVICT join state (rows older than
    watermark − delay − interval can never match again). Right columns
    are suffixed ``_r`` in the output."""
    lw = with_watermark(left, left_ts, watermark_delay)
    r_renamed = right.select(
        *[F.col(c).alias(f"{c}_r") for c in right.columns]
    )
    rw = with_watermark(r_renamed, f"{right_ts}_r", watermark_delay)
    rts = F.col(f"{right_ts}_r")
    cond = (
        rts >= F.col(left_ts) - F.expr(f"INTERVAL {lower}")
    ) & (rts <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    for lc, rc in on:
        cond = cond & (lw[lc] == rw[f"{rc}_r"])
    return lw.join(rw, cond)


def etl_pipeline_with_dlq(
    source: DataFrame,
    validity: Column,
    transform: Callable[[DataFrame], DataFrame],
    main_writer: Callable[[DataFrame], None],
    error_writer: Callable[[DataFrame], None],
    checkpoint: str,
) -> StreamingQuery:
    """Streaming ETL with a dead-letter queue — the streaming twin of the
    batch error side-output (ref flink_transform_utils.py
    handle_errors_with_side_output): every micro-batch is tagged once by
    ``validity``, valid rows go through ``transform`` to the main
    writer, invalid rows land (untransformed, for replay/forensics) in
    the DLQ writer. One scan per batch (persisted tagged frame, not two
    source reads); both writes happen inside the same foreachBatch, so
    checkpointed batch ids give exactly-once per sink as long as the
    writers are idempotent."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        # coalesce once: under three-valued logic filter(validity) and
        # filter(~validity) BOTH drop NULL-validity rows (exactly the
        # malformed ones a DLQ exists for), so NULL must mean invalid.
        ok = F.coalesce(validity, F.lit(False))
        tagged = batch_df.persist()
        try:
            main_writer(transform(tagged.filter(ok)))
            error_writer(tagged.filter(~ok))
        finally:
            tagged.unpersist()

    return (
        source.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def etl_pipeline(
    source: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    sink: Callable[[DataFrame], "DataStreamWriter"],
) -> StreamingQuery:
    """source → transform → sink, started (ref
    create_etl_pipeline_with_transform:261). Returns the running query;
    callers own awaitTermination/stop."""
    return sink(transform(source)).start()


def stream_semantic_dedup(
    stream: DataFrame,
    snapshot: DataFrame,
    tau: float = 0.85,
    nlist: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = 64,
    centroids=None,
    broadcast_snapshot: bool = True,
) -> DataFrame:
    """Streaming half of ``similarity.semantic_dedup``: drop incoming
    embeddings that are semantic duplicates (cosine ≥ τ) of the corpus
    SNAPSHOT, continuously — the SemDeDup analog of
    :func:`stream_incremental_dedup`'s digest tier.

    Fully STATELESS on the unbounded side: cluster assignment is a
    map-only expression against inlined centroids (the shared
    ``assign_to_centroids`` rule), and the duplicate check is a
    stream-static LEFT ANTI join on (cluster id, cosine ≥ τ) — each
    stream row is scored only against its own cluster's snapshot
    vectors (candidates bounded by cluster size, the SemDeDup
    property), no watermark, no state. Stream-internal duplicates are
    deliberately NOT handled here (cosine isn't an equality, so
    there's no digest to dropDuplicates on): re-run the batch
    ``semantic_dedup`` over ingested data for that, or chain the exact
    digest tier first.

    SNAPSHOT SIZE BOUND: ``broadcast_snapshot=True`` (default) ships
    the whole ASSIGNED snapshot (embedding + cluster id + norm per doc)
    to every executor each micro-batch — requires it to fit in executor
    memory (~260 B/doc at dim=64; NOT viable at a 100 TB corpus).  At
    scale pass ``broadcast_snapshot=False`` to pin a SHUFFLED
    stream-static hash join keyed on the cluster id: per-task memory is
    one cluster's snapshot vectors, the SemDeDup bound.  Parity of the
    two variants is pytest-proven.

    Returns the surviving (novel) stream rows with their original
    columns."""
    from ..operators.similarity import (
        assign_to_centroids,
        dot_expr,
        ivf_centroids,
    )

    vecs, norms = centroids or ivf_centroids(snapshot, nlist, id_col, emb_col)
    snap = assign_to_centroids(
        snapshot, vecs, norms, emb_col=emb_col, dim=dim, keep_norm=True
    ).select(
        F.col(emb_col).alias("_semb"),
        F.col("list_id").alias("_slist"),
        F.col("norm").alias("_snorm"),
    )
    # keep_norm: the assignment already computed each row's L2 norm —
    # reuse it in the cosine instead of a second O(dim) fold per row.
    # All original stream columns ride through the assignment.
    strm = assign_to_centroids(
        stream, vecs, norms, emb_col=emb_col, dim=dim, keep_norm=True
    )
    cos = F.round(
        F.expr(dot_expr(emb_col, "_semb")) / (F.col("norm") * F.col("_snorm")),
        6,
    )
    side = F.broadcast(snap) if broadcast_snapshot else snap.hint("shuffle_hash")
    survivors = strm.join(
        side,
        (F.col("list_id") == F.col("_slist")) & (cos >= F.lit(tau)),
        "left_anti",
    )
    return survivors.drop("list_id", "cos_cent", "norm")


def stream_semantic_decontaminate(
    stream: DataFrame,
    benchmark: DataFrame,
    tau: float = 0.4,
    nlist: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = 64,
    centroids=None,
) -> DataFrame:
    """Streaming twin of #232 ``plans/llm_pipeline.decontaminate_
    semantic`` (VERDICT r10 ask #5): flag incoming corpus documents
    whose embedding is within cosine ≥ τ of any held-out BENCHMARK
    vector, continuously — so eval-set leaks are caught at ingest
    time, not at the next batch decontamination sweep.

    Same stream-static shape as :func:`stream_semantic_dedup`, with
    the static side the BENCHMARK suite: fully stateless on the
    unbounded side (cluster assignment is a map-only expression
    against inlined centroids; the leak check is a stream-static INNER
    join on cluster id + the cosine threshold — candidates bounded by
    cluster size, no watermark, no state). The benchmark side always
    broadcasts: an eval suite is bounded by construction, never
    corpus-proportional (the batch query's broadcast-policy
    exemption). Pass the corpus-derived ``centroids`` to mirror a
    batch assignment exactly; the default derives them from the
    benchmark side alone (self-contained, but a different quantizer).

    Both sides filter to full-``dim`` embeddings before the join —
    the ragged-array guard the batch twin applies (advice r10).

    Returns one row per (stream doc, leaked-against benchmark doc):
    the stream row's id, ``bench_id``, shared ``list_id``, and the
    rounded ``cosine`` — the batch query's output shape."""
    from ..operators.similarity import (
        assign_to_centroids,
        dot_expr,
        ivf_centroids,
    )

    full_dim = F.size(emb_col) == dim
    vecs, norms = centroids or ivf_centroids(
        benchmark, nlist, id_col, emb_col
    )
    bench = assign_to_centroids(
        benchmark.filter(full_dim), vecs, norms, emb_col=emb_col, dim=dim,
        keep_norm=True,
    ).select(
        F.col(id_col).alias("bench_id"),
        F.col("list_id").alias("_blist"),
        F.col(emb_col).alias("_bemb"),
        F.col("norm").alias("_bnorm"),
    )
    strm = assign_to_centroids(
        stream.filter(full_dim), vecs, norms, emb_col=emb_col, dim=dim,
        keep_norm=True,
    )
    cos = F.round(
        F.expr(dot_expr(emb_col, "_bemb")) / (F.col("norm") * F.col("_bnorm")),
        6,
    )
    return (
        strm.join(
            # broadcast-policy-exempt: benchmark suites are bounded by
            # construction (the batch twin's rule)
            F.broadcast(bench),
            F.col("list_id") == F.col("_blist"),
        )
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= F.lit(tau))
        .select(F.col(id_col), "bench_id", F.col("list_id"), "cosine")
    )


def stream_bpe_encode(
    stream: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Streaming twin of #235 ``plans/llm_pipeline.bpe_encode``:
    tokenize documents at INGEST time under a trained BPE merge table
    — the apply step of the tokenizer loop run continuously, so token
    counts/budgets are known the moment a document lands instead of at
    the next batch audit.

    Fully stateless and map-only: the merge table (≤ BPE_ROUNDS rows,
    bounded by training) is inlined as the same literal anchored-
    replace chain the batch plan uses — each word is spelled
    two-space-separated and every merge applies as ONE left-to-right
    replace in training order (property-tested ≡ the canonical
    priority encoder in tests/test_round11.py). Adds ``n_words`` and
    ``n_bpe_tokens`` per document; all original columns ride through.
    At any scale this is a pure map over the stream — no watermark,
    no state, no shuffle. Aggregation-free formulation: the per-word
    encode runs INSIDE an array transform (explode + groupBy would
    need streaming state) — one row in, one row out."""
    spelled = (
        "transform(filter(split(lower(trim(regexp_replace("
        f"{text_col}, '\\\\s+', ' '))), ' '), x -> x != ''), "
        "w -> concat(' ', regexp_replace(w, '(.)', '$1  ')))"
    )
    chain = spelled
    for ls, rs in merges:
        # symbols come from corpus words and may contain quotes or
        # backslashes — escape BOTH for the inline SQL literals, and
        # backslashes FIRST so the quote escape's own chars aren't
        # re-escaped (the batch twin uses F.lit, which parameterizes;
        # advice r12: backslash-bearing symbols were mangled by Spark
        # SQL literal escaping before this)
        lq, rq = (
            s.replace("\\", "\\\\").replace("'", "''") for s in (ls, rs)
        )
        chain = (
            f"transform({chain}, s -> replace(s, ' {lq}  {rq} ', ' {lq}{rq} '))"
        )
    counts = (
        f"transform({chain}, "
        "s -> size(filter(split(trim(s), ' '), x -> x != '')))"
    )
    return stream.withColumn(
        "n_words",
        F.expr(
            f"CAST(size(filter(split(lower(trim(regexp_replace({text_col}, "
            "'\\\\s+', ' '))), ' '), x -> x != '')) AS LONG)"
        ),
    ).withColumn(
        "n_bpe_tokens",
        F.expr(
            f"CAST(aggregate({counts}, 0L, (a, v) -> a + v) AS LONG)"
        ),
    )


def run_until_drained(query: StreamingQuery) -> None:
    """Deterministic test helper: process everything currently
    available, then stop (bounded sources only)."""
    try:
        query.processAllAvailable()
    finally:
        query.stop()


def trending_tokens(
    events: DataFrame,
    ts_col: str,
    text_col: str,
    window: str = "1 minute",
    watermark_delay: str = "30 seconds",
) -> DataFrame:
    """Streaming windowed token counts — the unbounded half of
    ``text.vocab_topk`` (trending-terms analytics over an event
    stream).

    Returns the per-(window, token) APPEND-mode aggregate (emitted once
    the watermark closes the window). Ranking to top-k is not
    stream-expressible (window functions don't run on unbounded
    relations), so the standard pattern applies: rank each CLOSED
    window's counts in the sink — compose with
    :func:`rank_topk_batch` inside ``foreachBatch`` (each micro-batch
    then holds complete windows only, so the per-batch ranking is
    exact). State is bounded by (windows in flight × vocabulary).
    """
    from ..operators.text import normalize

    toks = events.withWatermark(ts_col, watermark_delay).select(
        F.col(ts_col),
        F.explode_outer(F.split(normalize(F.col(text_col)), " ")).alias("token"),
    ).filter(F.col("token") != "")
    return (
        toks.groupBy(F.window(ts_col, window).alias("w"), "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "token",
            "n",
        )
    )


def rank_topk_batch(batch: DataFrame, k: int = 5) -> DataFrame:
    """Rank a closed-window count batch to top-k per window (the
    foreachBatch companion of :func:`trending_tokens`); deterministic
    lexicographic tie-break."""
    from pyspark.sql import Window as W

    win = W.partitionBy("window_start").orderBy(F.desc("n"), F.asc("token"))
    return (
        batch.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
    )


def stream_incremental_dedup(
    stream: DataFrame,
    snapshot: DataFrame,
    id_col: str,
    text_col: str,
    ts_col: str,
    watermark_delay: str = "1 minute",
    broadcast_snapshot: bool = True,
    bloom_bits: int | None = None,
) -> DataFrame:
    """Streaming half of ``curation.incremental_dedup``: dedup a live
    ingest stream against yesterday's corpus snapshot AND against
    itself — the continuous form of the daily snapshot-delta ingest.

    Two stages, both bounded-state:

    1. stream-static LEFT ANTI join on the content digest;
    2. ``dropDuplicatesWithinWatermark`` on the digest for
       stream-internal copies — state evicts once the watermark passes
       (bounded by rate × delay), unlike an unbounded dropDuplicates.

    SNAPSHOT SIZE BOUND: with ``broadcast_snapshot=True`` (default) the
    digest set is broadcast — stateless, no Exchange on the unbounded
    side, re-planned per micro-batch — which requires the digest set to
    FIT IN EXECUTOR MEMORY (16 bytes/doc: fine up to ~10⁸ docs, NOT at
    a 100 TB corpus where digests alone are TB-sized).  At that scale
    pass ``broadcast_snapshot=False``: the anti-join is pinned to a
    SHUFFLED stream-static hash join (``hint("shuffle_hash")``) — each
    micro-batch and the static side exchange on the digest, per-task
    memory bounded by one partition of the snapshot.  The static-side
    scan repeats per micro-batch either way (stream-static contract);
    at scale, persist the snapshot bucketed on the digest so that scan
    is pruned.  ``bloom_bits`` (with ``broadcast_snapshot=False``)
    additionally builds an m-bit Bloom filter over the snapshot digests
    ONCE at plan time (operators/bloom.py — no false negatives, so the
    composition stays exact) and routes definite-novel rows around the
    per-micro-batch join: the shuffled volume drops to the
    bloom-positive slice at a fixed m/8-byte footprint.
    Parity of all variants is pytest-proven.

    First-arrival wins within the stream (arrival order, not min-id:
    a stream can't know a smaller id arrives later — the batch op
    remains the authority for reproducible reprocessing).
    """
    from ..operators.text import normalize

    snap_h = snapshot.select(
        F.md5(normalize(F.col(text_col))).alias("_h")
    ).distinct()
    hashed = stream.withWatermark(ts_col, watermark_delay).withColumn(
        "_h", F.md5(normalize(F.col(text_col)))
    )
    if not broadcast_snapshot and bloom_bits:
        from ..operators import bloom

        fresh = bloom.bloom_prefiltered_anti_join(
            hashed, snap_h, "_h", m_bits=bloom_bits
        )
    else:
        side = (
            F.broadcast(snap_h)
            if broadcast_snapshot
            else snap_h.hint("shuffle_hash")
        )
        fresh = hashed.join(side, "_h", "left_anti")
    return fresh.dropDuplicatesWithinWatermark(["_h"]).drop("_h")


# ---------------------------------------------------------------------------
# Streaming distribution-drift monitor (the unbounded companion of the
# batch drift tier — #97 KL, #135 KS): per closed event-time window,
# the Population Stability Index of the value distribution against a
# fixed reference histogram. The standard "is production input
# drifting from what the model was trained on" alarm.


def windowed_value_histogram(
    stream: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "10 minutes",
    watermark_delay: str = "1 minute",
    lo: float = 0.0,
    hi: float = 100.0,
    n_bins: int = 10,
) -> DataFrame:
    """APPEND-mode per-(window, bucket) value counts: equal-width bins
    over [lo, hi), edge-clamped (outliers land in the end bins — a
    drift monitor must SEE out-of-range mass, not drop it); null
    values are dropped. State is bounded by windows-in-flight x
    n_bins. Emits only when the watermark closes the window, so each
    micro-batch delivers COMPLETE windows — exactly what the PSI
    companion below needs to be exact (the trending_tokens pattern).
    """
    width = (hi - lo) / n_bins
    bucket = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((F.col(value_col) - lo) / width)),
    ).cast("int")
    return (
        stream.withWatermark(ts_col, watermark_delay)
        # NaN would pass isNotNull and floor() it to bucket 0 (verified:
        # floor(NaN) casts to long 0) — fake low-end mass; drop it like
        # null (review r5)
        .filter(F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col)))
        .groupBy(F.window(ts_col, window).alias("w"), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "bucket",
            "n",
        )
    )


def psi_batch(
    batch: DataFrame, ref_shares: dict[int, float], eps: float = 1e-6
) -> DataFrame:
    """foreachBatch companion of :func:`windowed_value_histogram`:
    PSI per closed window vs the fixed reference shares —
    psi = sum_b (p_b - r_b) * ln((p_b + eps) / (r_b + eps)), every
    reference bucket contributing (a bucket the window never saw
    enters with p=0 — vanished mass IS drift). The batch holds only
    closed windows x n_bins rows, so the join/window math is
    negligible; ref rides a broadcast literal frame. PSI reading:
    < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 major shift.
    """
    spark = batch.sparkSession
    ref = spark.createDataFrame(
        [(int(b), float(s)) for b, s in sorted(ref_shares.items())],
        "bucket int, ref_share double",
    )
    wins = batch.select("window_start", "window_end").distinct()
    # grid buckets = ref ∪ OBSERVED: a bucket the reference never had
    # (ref_share -> 0) is APPEARED mass — the strongest drift signal; a
    # ref-keys-only grid would silently drop those batch rows and
    # report "stable" during real drift (review r5)
    buckets = (
        ref.select("bucket")
        .unionByName(batch.select("bucket"))
        .distinct()
        .join(ref, "bucket", "left")
        .withColumn("ref_share", F.coalesce("ref_share", F.lit(0.0)))
    )
    grid = wins.crossJoin(F.broadcast(buckets))
    tot = batch.groupBy("window_start", "window_end").agg(
        F.sum("n").alias("n_events")
    )
    joined = (
        grid.join(batch, ["window_start", "window_end", "bucket"], "left")
        .join(tot, ["window_start", "window_end"])
        .withColumn("p", F.coalesce(F.col("n"), F.lit(0)) / F.col("n_events"))
    )
    term = (F.col("p") - F.col("ref_share")) * F.log(
        (F.col("p") + eps) / (F.col("ref_share") + eps)
    )
    return (
        joined.groupBy("window_start", "window_end", "n_events")
        .agg(F.round(F.sum(term), 9).alias("psi"))
        .select("window_start", "window_end", "n_events", "psi")
    )


def stream_ann_probe(
    stream: DataFrame,
    index: DataFrame,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = 64,
    centroids=None,
    broadcast_index: bool = True,
) -> DataFrame:
    """Continuous ANN serving: each incoming query vector probes the
    ``nprobe`` nearest IVF lists of the STATIC index and emits scored
    candidates — the streaming half of ``similarity.knn_ivf`` (the
    batch operator builds the same quantizer; an online feature store
    runs exactly this shape: queries stream in, the index is a
    snapshot).

    Fully STATELESS: list selection is a map-only expression against
    inlined centroids (sort the per-row score array by (−score, list)
    and slice nprobe — same argmax/tie rule as the batch assignment),
    candidates come from a stream-static equi-join keyed on the list
    id (per-task candidates bounded by list size, never the index).
    Top-k per query is a per-micro-batch RANK, not stream state — run
    :func:`ann_topk_batch` inside ``foreachBatch`` (the
    trending_tokens / rank_topk_batch pattern).

    INDEX SIZE BOUND: ``broadcast_index=True`` ships the assigned
    index to every executor each micro-batch — fine for serving tiers
    that fit in executor memory; at corpus scale pass ``False`` to pin
    a SHUFFLED stream-static hash join on the list id (per-task memory
    = one list, the IVF bound).

    Output: all original stream columns plus ``match_id``, ``list_id``
    and ``cosine`` (rounded to the module's 6 digits), one row per
    probed candidate."""
    from ..operators.dedup import widen
    from ..operators.similarity import (
        _ivf_scores_expr,
        assign_to_centroids,
        dot_expr,
        ivf_centroids,
        with_norm,
    )

    vecs, norms = centroids or ivf_centroids(index, nlist, id_col, emb_col)
    idx = assign_to_centroids(
        index, vecs, norms, emb_col=emb_col, dim=dim, keep_norm=True
    ).select(
        F.col(id_col).alias("match_id"),
        F.col(emb_col).alias("_iemb"),
        F.col("list_id").alias("_ilist"),
        F.col("norm").alias("_inorm"),
    )
    scores = _ivf_scores_expr(emb_col, vecs, norms)
    in_cols = stream.columns
    strm = (
        with_norm(widen(stream), emb_col, dim)
        .withColumn("_s", F.expr(scores))
        # (−score, list) struct sort ≡ score DESC, list ASC — the batch
        # assignment's first-max tie rule, extended to nprobe lists
        .withColumn(
            "_probe",
            F.expr(
                f"transform(slice(array_sort(transform(_s, "
                f"(x, i) -> struct(-x AS s, i AS i))), 1, {nprobe}), "
                f"p -> p.i + 1)"
            ),
        )
        .withColumn("list_id", F.explode("_probe"))
        .drop("_s", "_probe")
    )
    side = F.broadcast(idx) if broadcast_index else idx.hint("shuffle_hash")
    cos = F.round(
        F.expr(dot_expr(emb_col, "_iemb")) / (F.col("norm") * F.col("_inorm")),
        6,
    )
    return (
        strm.join(side, F.col("list_id") == F.col("_ilist"))
        .select(*in_cols, "match_id", "list_id", cos.alias("cosine"))
    )


def ann_topk_batch(batch: DataFrame, k: int = 5, query_id: str = "vec_id") -> DataFrame:
    """foreachBatch companion of :func:`stream_ann_probe`: keep each
    query's top-k candidates by (cosine DESC, match_id ASC) — the
    deterministic tie rule the batch KNN tiers share."""
    from pyspark.sql import Window as W

    win = W.partitionBy(query_id).orderBy(
        F.desc("cosine"), F.asc("match_id")
    )
    return (
        batch.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
    )


def seasonal_baseline(
    history: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Per-(event_type, hour-of-day) mean/σ baseline for the seasonal
    anomaly screen, built from a STATIC history frame — the
    batch-trains/stream-scores split every production anomaly monitor
    uses. Same moment discipline as the batch twin (#172,
    plans/events_analytics.py:seasonal_anomaly): exact DECIMAL sums
    below 2⁵³, σ from the closed form. Output is BOUNDED
    (event types × 24) — broadcastable by policy."""
    ev = history.filter(
        F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col))
    ).select("event_type", F.hour(ts_col).alias("hour"), F.col(value_col))
    base = ev.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).alias("_sx"),
        F.sum((F.col(value_col) * F.col(value_col)).cast("decimal(18,6)")).alias(
            "_sxx"
        ),
    )
    mu = F.col("_sx").cast("double") / F.col("_n")
    var = F.col("_sxx").cast("double") / F.col("_n") - mu * mu
    return base.select(
        "event_type",
        "hour",
        mu.alias("_mu"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("_sd"),
    )


def seasonal_anomaly_stream(
    stream: DataFrame,
    baseline: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "10 minutes",
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Streaming twin of the batch seasonal anomaly screen (#172):
    score live events against the batch-built per-(type, hour)
    baseline and count μ+3σ breaches per (window, event_type) —
    APPEND mode, complete windows only (trending_tokens discipline).

    The baseline joins as a stream-static BROADCAST (bounded tier —
    types × 24; stream-static joins re-read the static side per
    micro-batch, so small-and-broadcast is the right shape); an event
    whose (type, hour) cell never appeared in history scores as
    non-anomalous by the inner join — unseen cells are a coverage
    question for the baseline builder, not silent NaN math. NaN/null
    values drop like the drift monitor's (floor(NaN) fake-mass rule).
    """
    enriched = (
        stream.withWatermark(ts_col, watermark_delay)
        .filter(F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col)))
        .withColumn("hour", F.hour(ts_col))
        .join(F.broadcast(baseline), ["event_type", "hour"])
    )
    flagged = enriched.filter(
        F.col(value_col) > F.col("_mu") + 3 * F.col("_sd")
    )
    return (
        flagged.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_anomalies"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_anomalies",
        )
    )


def burst_alert_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    window: str = "60 seconds",
    slide: str = "15 seconds",
    threshold: int = 10,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Streaming twin of the batch burst-rate screen (#183): sliding
    event-time window counts per key, emitting ALERT rows only for
    windows at/over the threshold — the rate-limit / bot-burst monitor
    as a live stream. APPEND mode delivers complete windows
    (trending_tokens discipline), so an alert is exact, not a partial
    count; state is bounded by keys-in-flight × windows-per-slide. The
    threshold filter sits ABOVE the aggregate, so suppressed windows
    still complete normally and late data inside the watermark lands in
    the right window before emission.
    """
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.window(ts_col, window, slide).alias("w"), F.col(key_col)
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("n_events") >= threshold)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# streaming hybrid retrieval serving (#210s): queries stream in, the
# sparse (BM25 postings) and dense (embedding) indexes are STATIC
# snapshots, RRF-fused top-k streams out — the serving half of the
# batch hybrid_rrf (plans/llm_pipeline.py #210), same shape as
# stream_ann_probe + ann_topk_batch.


class HybridIndexes:
    """Static serving indexes, built ONCE from snapshot frames.

    ``postings`` (token, doc_id, tf) is corpus-scale — it joins the
    query stream per micro-batch as a stream-static join keyed on the
    token (per-task candidates bounded by posting-list length, the
    BM25 analog of the IVF list bound). ``df_t`` / ``n_avg`` are
    vocabulary-/single-row-scale; ``dense`` carries precomputed norms
    so every batch reuses them. Eager localCheckpoints play the role a
    landed index table would in production serving."""

    def __init__(self, docs: DataFrame, emb: DataFrame,
                 id_col: str = "doc_id", text_col: str = "text",
                 vec_id_col: str = "vec_id", emb_col: str = "embedding"):
        from ..operators.dedup import widen
        from ..operators.similarity import with_norm
        from ..operators.text import normalize

        toks = (
            widen(docs)
            .select(
                F.col(id_col).alias("doc_id"),
                F.explode(
                    F.split(normalize(F.col(text_col)), " ")
                ).alias("token"),
            )
            .filter(F.col("token") != "")
        )
        self.postings = (
            toks.groupBy("token", "doc_id")
            .agg(F.count(F.lit(1)).alias("tf"))
            .localCheckpoint(eager=True)
        )
        self.dl = (
            toks.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("dl"))
            .localCheckpoint(eager=True)
        )
        self.df_t = (
            self.postings.groupBy("token")
            .agg(F.count(F.lit(1)).alias("df"))
            .localCheckpoint(eager=True)
        )
        self.n_avg = (
            self.dl.agg(
                F.count(F.lit(1)).alias("_N"),
                (
                    F.sum(F.col("dl").cast("decimal(18,6)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("_avgdl"),
            ).localCheckpoint(eager=True)
        )
        self.dense = (
            with_norm(emb, emb_col)
            .select(
                F.col(vec_id_col).alias("match_id"),
                F.col(emb_col).alias("_iemb"),
                F.col("norm").alias("_inorm"),
            )
            .localCheckpoint(eager=True)
        )


def hybrid_topk_batch(
    batch: DataFrame,
    indexes: HybridIndexes,
    k: int = 20,
    rrf_k: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
    query_id: str = "query_id",
    terms_col: str = "terms",
    emb_col: str = "embedding",
) -> DataFrame:
    """foreachBatch companion: RRF-fused top-k per query in the batch.

    Mirrors the batch #210 numerics EXACTLY (idf round@9,
    contribution round@9 → decimal(18,9) sums → round@6, cosine
    round@6, rank ties by id, fusion floor-quantized @1e9), so a
    single-query stream reproduces q_hybrid_rrf bit-for-bit. A corpus
    doc with vec_id == the query's id is excluded from the dense
    branch (self-exclusion, the kNN rule)."""
    from pyspark.sql import Window as W

    from ..operators.similarity import cosine_col, with_norm

    # ---- sparse branch: query terms join the static postings ----
    # distinct: BM25 sums per UNIQUE term (the batch #210 semantics) —
    # a repeated term in the query array must not double its postings
    qt = batch.select(query_id, F.explode(terms_col).alias("token")).distinct()
    tf_q = qt.join(indexes.postings, "token")
    # df stats restricted to the batch's terms BEFORE the broadcast —
    # df_t is vocabulary-scale (grows with the corpus); only the
    # ≤|batch terms|-row slice is bounded enough to hint
    batch_df_t = indexes.df_t.join(
        qt.select("token").distinct(), "token", "left_semi"
    )
    scored = (
        tf_q.join(indexes.dl, "doc_id")
        .join(F.broadcast(batch_df_t), "token")  # broadcast-policy-exempt: ≤|batch terms| rows
        .crossJoin(F.broadcast(indexes.n_avg))  # single-row scalars
        .withColumn(
            "_idf",
            F.round(
                F.log(
                    1.0
                    + (F.col("_N") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                ),
                9,
            ),
        )
        .withColumn(
            "_c",
            F.round(
                F.col("_idf")
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("_avgdl"))
                ),
                9,
            ).cast("decimal(18,9)"),
        )
        .groupBy(query_id, "doc_id")
        .agg(F.round(F.sum("_c").cast("double"), 6).alias("bm25"))
    )
    sw = W.partitionBy(query_id).orderBy(F.desc("bm25"), F.asc("doc_id"))
    sparse = (
        scored.withColumn("sparse_rank", F.row_number().over(sw))
        .filter(F.col("sparse_rank") <= k)
        .select(query_id, "doc_id", "sparse_rank")
    )
    # ---- dense branch: batch queries scan the static norms ----
    q = with_norm(batch.select(query_id, emb_col), emb_col).select(
        F.col(query_id),
        F.col(emb_col).alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    dscored = indexes.dense.join(
        F.broadcast(q),  # broadcast-policy-exempt: one micro-batch of queries
        F.col(query_id) != F.col("match_id"),  # self-exclusion by id
    ).withColumn(
        "cosine", cosine_col("q_emb", "_iemb", "q_norm", "_inorm")
    )
    dw = W.partitionBy(query_id).orderBy(F.desc("cosine"), F.asc("match_id"))
    dense = (
        dscored.withColumn("dense_rank", F.row_number().over(dw))
        .filter(F.col("dense_rank") <= k)
        # both branches share the batch's lineage — alias the join keys
        # so the full-outer condition isn't an ambiguous self-join
        .select(
            F.col(query_id).alias("_dq"),
            F.col("match_id").alias("d_id"),
            "dense_rank",
        )
    )
    # ---- RRF fusion, the #210 expression verbatim ----
    fused = sparse.join(
        dense,
        (sparse[query_id] == dense["_dq"])
        & (sparse["doc_id"] == dense["d_id"]),
        "full_outer",
    ).select(
        F.coalesce(sparse[query_id], F.col("_dq")).alias(query_id),
        F.coalesce(F.col("doc_id"), F.col("d_id")).alias("doc_id"),
        "sparse_rank",
        "dense_rank",
        (
            F.floor(
                (
                    F.coalesce(
                        F.lit(1.0) / (F.lit(rrf_k) + F.col("sparse_rank")),
                        F.lit(0.0),
                    )
                    + F.coalesce(
                        F.lit(1.0) / (F.lit(rrf_k) + F.col("dense_rank")),
                        F.lit(0.0),
                    )
                )
                * 1e9
                + F.lit(0.5)
            )
            / 1e9
        ).alias("rrf_score"),
    )
    fw = W.partitionBy(query_id).orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(fw))
        .filter(F.col("fused_rank") <= k)
    )


def stream_hybrid_rrf(
    queries_stream: DataFrame,
    indexes: HybridIndexes,
    sink_fn: Callable[[DataFrame, int], None],
    checkpoint: str,
    k: int = 20,
    rrf_k: int = 60,
):
    """Continuous hybrid-retrieval serving: wire a query stream
    (query_id, terms array<string>, embedding array<float>) through
    :func:`hybrid_topk_batch` per micro-batch and hand the fused
    top-k to ``sink_fn``. Stateless — all per-query work completes
    inside its micro-batch (a query's terms arrive in its own row),
    so there is no watermark or state store; the indexes are
    checkpointed snapshots exactly like stream_ann_probe's IVF index."""
    def fuse(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sink_fn(
            hybrid_topk_batch(batch, indexes, k=k, rrf_k=rrf_k), batch_id
        )

    return (
        queries_stream.writeStream.foreachBatch(fuse)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


# ---------------------------------------------------------------------------
# Streaming inference-reranked retrieval serving (the unbounded twin
# of #234 plans/llm_pipeline.rerank_inference): the live two-stage
# serving stack — per micro-batch of queries, the fused hybrid top-k
# (#210s above) is join-pruned against the corpus text and re-scored
# by the Arrow-batched cross-encoder (#85's scorer), so the model only
# ever sees |batch queries| · k rows, never the corpus.


def rerank_topk_batch(
    batch: DataFrame,
    indexes: HybridIndexes,
    texts: DataFrame,
    k: int = 20,
    rrf_k: int = 60,
    query_id: str = "query_id",
) -> DataFrame:
    """foreachBatch companion: re-ranked top-k per query in the batch.

    ``texts`` is the (doc_id, text) corpus frame — passed lazily (the
    join prunes it to the fused pool; no checkpoint needed, Catalyst
    pushes the column pruning to the scan). The cross-encoder score is
    a pure function of the text, so docs shared by several queries'
    lists are scored ONCE (distinct doc_id before inference) and the
    scores fan back out through the join. Mirrors the batch #234
    numerics exactly (fused_rank IS rrf_rank: both are row_number over
    (rrf_score DESC, doc_id)), so a single-query stream reproduces
    q_rerank_inference bit-for-bit."""
    from pyspark.sql import Window as W

    from ..operators import inference

    fused = hybrid_topk_batch(
        batch, indexes, k=k, rrf_k=rrf_k, query_id=query_id
    )
    pool_docs = fused.select("doc_id").distinct().join(texts, "doc_id")
    ce = inference.score_documents(pool_docs).select(
        "doc_id", F.col("score").alias("ce_score")
    )
    both = fused.join(ce, "doc_id")
    cw = W.partitionBy(query_id).orderBy(F.desc("ce_score"), F.asc("doc_id"))
    return (
        both.withColumn("ce_rank", F.row_number().over(cw))
        .select(
            query_id,
            "doc_id",
            F.col("fused_rank").alias("rrf_rank"),
            "ce_rank",
            (F.col("fused_rank") - F.col("ce_rank")).alias("rank_shift"),
            "ce_score",
        )
    )


def stream_rerank_serving(
    queries_stream: DataFrame,
    indexes: HybridIndexes,
    texts: DataFrame,
    sink_fn: Callable[[DataFrame, int], None],
    checkpoint: str,
    k: int = 20,
    rrf_k: int = 60,
):
    """Continuous re-ranked retrieval serving: #210s's stream wiring
    with the cross-encoder stage composed per micro-batch. Stateless —
    every query completes inside its micro-batch; the retrieval
    indexes are checkpointed snapshots and the text corpus joins
    lazily (pruned to the fused pool)."""

    def rerank(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sink_fn(
            rerank_topk_batch(batch, indexes, texts, k=k, rrf_k=rrf_k),
            batch_id,
        )

    return (
        queries_stream.writeStream.foreachBatch(rerank)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )


# ---------------------------------------------------------------------------
# Streaming open-order backlog (the unbounded twin of #231
# plans/order_stats.order_backlog): a live order-lifecycle stream
# (placed / final-shipment events) folded into the same sweep-line
# step function the batch plan computes from order spans.


def stream_daily_order_deltas(
    stream: DataFrame,
    ts_col: str = "ts",
    kind_col: str = "kind",
    watermark_delay: str = "1 day",
) -> DataFrame:
    """Finalized daily net backlog deltas from a lifecycle stream.

    Batch-parity semantics (#231): an order opens on its placement day
    (+1) and still counts as open ON its final-shipment day, so the −1
    lands on the day AFTER — exactly the batch sweep's ``end_d + 1``.
    The shifted column carries the watermark (withWatermark AFTER the
    shift, so append-mode finalization tracks the effective day), and
    the per-day state is one long per open window — bounded by the
    watermark horizon regardless of order rate."""
    eff = F.when(
        F.col(kind_col) == "shipped_final",
        F.col(ts_col) + F.expr("INTERVAL 1 DAY"),
    ).otherwise(F.col(ts_col))
    delta = F.when(F.col(kind_col) == "shipped_final", F.lit(-1)).otherwise(
        F.lit(1)
    )
    return (
        stream.select(eff.alias("eff_ts"), delta.alias("delta"))
        .withWatermark("eff_ts", watermark_delay)
        .groupBy(F.window("eff_ts", "1 day").alias("w"))
        .agg(F.sum("delta").cast("long").alias("net"))
        .select(F.to_date(F.col("w.start")).alias("day"), "net")
    )


def _next_month(m):
    """First day of the month after ``m`` (a date on day 1)."""
    return (m.replace(year=m.year + 1, month=1) if m.month == 12
            else m.replace(month=m.month + 1))


class BacklogSink:
    """foreachBatch fold of finalized daily deltas into the cumulative
    backlog step function — the streaming stand-in for the batch plan's
    ordered cumulative window. Append mode + a monotone watermark mean
    windows finalize in event-time order ACROSS batches (a later batch
    can only add later days), so a single running total is sufficient
    state; within a batch days are sorted before folding. The collect
    is the finalized-day tier — calendar-bounded (≤ days-per-batch
    rows), the same boundedness class as the batch query's date tier."""

    def __init__(self) -> None:
        self.total = 0
        self.rows: list[tuple] = []  # (day, net, backlog)

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        for r in sorted(
            batch.select("day", "net").collect(), key=lambda r: r.day
        ):
            self.total += int(r.net)
            self.rows.append((r.day, int(r.net), self.total))

    def monthly(self) -> dict:
        """(month-first-day → (peak, end-of-month backlog)) rollup of
        the step function — the batch plan's output shape. The peak
        seeds from the CARRY-IN level (the running total before the
        month's first delta), matching the batch plan's lag-based
        carry_in: a month whose first delta is negative peaks at the
        carried level, not at any in-month row. Months with a carried
        backlog but no deltas at all are DENSIFIED with
        peak = eom = carry, matching the batch plan's month
        densification (advice r10)."""
        out: dict = {}
        prev = 0
        last_m = None
        for day, _net, backlog in self.rows:
            m = day.replace(day=1)
            while last_m is not None and _next_month(last_m) < m:
                last_m = _next_month(last_m)
                out[last_m] = (prev, prev)  # delta-free month: flat level
            if m in out:
                peak, _ = out[m]
                out[m] = (max(peak, backlog), backlog)
            else:
                out[m] = (max(prev, backlog), backlog)
            prev = backlog
            last_m = m
        return out


# ---------------------------------------------------------------------------
# Streaming token-distribution drift (the TEXT companion of the PSI
# value-drift monitor above, and the unbounded twin of #225's pairwise
# JS divergence): per closed event-time window, the Jensen-Shannon
# divergence of the window's token distribution against a fixed
# reference corpus — "is the incoming feed still the language we
# trained on", in nats, bounded [0, ln 2].

_LN2 = 0.6931471805599453  # double(ln 2), the batch op's constant


def token_reference(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Reference token probabilities from a batch snapshot corpus
    (#225's tokenization: normalized whitespace split). Checkpointed so
    the per-micro-batch join doesn't re-scan the corpus."""
    from ..operators.text import words

    toks = df.select(
        F.explode(words(F.col(text_col))).alias("token")
    ).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.agg(F.sum("c").alias("t"))  # single row
    return (
        counts.crossJoin(F.broadcast(tot))
        .select("token", (F.col("c") / F.col("t")).alias("p_ref"))
        .localCheckpoint(eager=False)
    )


def windowed_token_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    window: str = "10 minutes",
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """APPEND-mode per-(window, token) counts — emits only complete
    windows (the histogram/trending pattern), which is what makes the
    JS companion exact. State is windows-in-flight × window vocabulary;
    at feed scale cap the vocabulary upstream (hash-bucket rare tokens)
    if window vocab outgrows executor state."""
    from ..operators.text import words

    return (
        stream.withWatermark(ts_col, watermark_delay)
        .select(
            F.col(ts_col), F.explode(words(F.col(text_col))).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy(F.window(ts_col, window).alias("w"), "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "token",
            "n",
        )
    )


def token_js_batch(batch: DataFrame, ref_probs: DataFrame) -> DataFrame:
    """foreachBatch companion of :func:`windowed_token_counts`: JS
    divergence per closed window vs the reference, by the batch op's
    closed form (#225) — inner join over SHARED tokens plus p·ln2 for
    each side's unshared mass, so the vocabulary never outer-joins. A
    window sharing NO tokens with the reference emits exactly ln 2."""
    tot = batch.groupBy("window_start", "window_end").agg(
        F.sum("n").alias("n_tokens")
    )
    p = batch.join(tot, ["window_start", "window_end"]).withColumn(
        "p", F.col("n").cast("double") / F.col("n_tokens")
    )
    shared = p.join(ref_probs, "token")
    agg = shared.groupBy("window_start", "window_end").agg(
        F.count(F.lit(1)).alias("n_shared_tokens"),
        F.sum(
            F.col("p")
            * F.log(F.lit(2.0) * F.col("p") / (F.col("p") + F.col("p_ref")))
        ).alias("_ja"),
        F.sum(
            F.col("p_ref")
            * F.log(
                F.lit(2.0) * F.col("p_ref") / (F.col("p") + F.col("p_ref"))
            )
        ).alias("_jb"),
        F.sum("p").alias("_sa"),
        F.sum("p_ref").alias("_sb"),
    )
    joined = tot.join(agg, ["window_start", "window_end"], "left")
    z = F.lit(0.0)
    js = F.lit(0.5) * (
        F.coalesce(F.col("_ja"), z)
        + (F.lit(1.0) - F.coalesce(F.col("_sa"), z)) * _LN2
    ) + F.lit(0.5) * (
        F.coalesce(F.col("_jb"), z)
        + (F.lit(1.0) - F.coalesce(F.col("_sb"), z)) * _LN2
    )
    return joined.select(
        "window_start",
        "window_end",
        "n_tokens",
        F.coalesce(F.col("n_shared_tokens"), F.lit(0)).alias(
            "n_shared_tokens"
        ),
        F.round(js, 9).alias("js_nats"),
    )


# ---------------------------------------------------------------------------
# Streaming embedding-dimension drift (the EMBEDDING companion of the
# PSI value monitor and the token-JS text monitor — the unbounded twin
# of #223's dimension health screen): per closed window and coordinate,
# the mean shift in reference-sigma units. An upstream encoder change
# or a corrupted feature column shows up as specific dims drifting
# while the rest hold — exactly what a whole-vector norm check misses.


def windowed_dim_stats(
    stream: DataFrame,
    ts_col: str = "ts",
    emb_col: str = "embedding",
    window: str = "10 minutes",
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """APPEND-mode per-(window, dim) moment tier: components quantize
    to integer micros first (#223's discipline — exact, associative
    sums), so the foreachBatch companion computes means from exact
    integers. State is windows-in-flight × EMB dims — bounded."""
    comp = (
        stream.withWatermark(ts_col, watermark_delay)
        .select(
            F.col(ts_col),
            F.posexplode(emb_col).alias("_i", "_x"),
        )
        .select(
            F.col(ts_col),
            (F.col("_i") + 1).alias("dim"),
            F.floor(F.col("_x").cast("double") * 1e6 + F.lit(0.5))
            .cast("long")
            .alias("micros"),
        )
    )
    return (
        comp.groupBy(F.window(ts_col, window).alias("w"), "dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("micros").cast("decimal(38,0)")).alias("s1"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "dim",
            "n",
            "s1",
        )
    )


def dim_drift_batch(
    batch: DataFrame, ref_stats: DataFrame, z_flag: float = 3.0
) -> DataFrame:
    """foreachBatch companion of :func:`windowed_dim_stats`: per closed
    window, each dim's mean shift vs the reference in reference-sigma
    units (z = |mean_w − mean_ref| / sqrt(var_ref + eps)), rolled up to
    the window's max-z dim and the count of dims over ``z_flag``.
    ``ref_stats`` is the #223 batch output shape
    (dim, mean_val, var_val) — build it offline from the training
    snapshot. eps guards a dead reference dim (var 0)."""
    eps = 1e-12
    joined = (
        batch.withColumn(
            "mean_w", F.col("s1").cast("double") / F.col("n") / 1e6
        )
        .join(F.broadcast(ref_stats.select("dim", "mean_val", "var_val")), "dim")
        .withColumn(
            "z",
            F.abs(F.col("mean_w") - F.col("mean_val"))
            / F.sqrt(F.col("var_val") + eps),
        )
    )
    return (
        joined.groupBy("window_start", "window_end")
        .agg(
            F.count(F.lit(1)).alias("n_dims"),
            F.max_by("dim", "z").alias("worst_dim"),
            F.round(F.max("z"), 6).alias("max_z"),
            F.sum(F.when(F.col("z") > z_flag, 1).otherwise(0))
            .cast("long")
            .alias("n_flagged"),
        )
        .orderBy("window_start")
    )
