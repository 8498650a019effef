"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

All pure built-in expressions (regexp/array functions — whole-stage
codegen, no Python), so each operator is a single projection over the
scan: at 100 TB these run at I/O speed with zero shuffle.

The regex subset used (character classes, alternation, ``\\b``) behaves
identically in Java regex (Spark) and RE2 (DuckDB oracle).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Stopword profiles for the language-ID heuristic (tiny on purpose: the
# classifier is a deterministic density argmax, not a model).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es": ("el", "los", "las", "y", "es", "de", "que"),
    "fr": ("le", "les", "et", "est", "une", "dans", "que"),
    "zh": ("的", "是", "了", "在", "我", "有", "他"),
}
LANGS = tuple(LANG_STOPWORDS)  # priority order for argmax ties

# BPE-ish tokenizer: runs of letters, runs of digits, or single
# non-alphanumeric non-space characters (a crude byte-pair-style split).
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"

PUNCT_PATTERN = "[.,!?;:]"


def normalize(col: Column) -> Column:
    """Lowercase, trim, collapse whitespace — shared normalization for
    dedup hashing and fingerprints."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def words(col: Column) -> Column:
    return F.split(normalize(col), " ")


def stopword_regex(stopwords: tuple[str, ...]) -> str:
    return r"\b(" + "|".join(stopwords) + r")\b"


def stopword_count(col: Column, stopwords: tuple[str, ...]) -> Column:
    return F.regexp_count(normalize(col), F.lit(stopword_regex(stopwords)))


def lang_scores(df: DataFrame, text_col: str) -> DataFrame:
    """Per-language stopword density columns ``score_<lang>`` plus the
    argmax ``lang_pred`` (first language wins ties, in LANGS order)."""
    n_words = F.size(words(F.col(text_col)))
    out = df
    for lang in LANGS:
        density = (
            stopword_count(F.col(text_col), LANG_STOPWORDS[lang]).cast("double")
            / n_words
        )
        out = out.withColumn(f"score_{lang}", density)
    # Sequential-elimination CASE: branch i fires iff score_i >= every
    # later score — equivalent to argmax with first-index tie-break (and
    # mirrored verbatim in the SQL oracle).
    pred = None
    for i, lang in enumerate(LANGS):
        others = LANGS[i + 1 :]
        if not others:
            pred = pred.otherwise(F.lit(lang))
            break
        cond = reduce(
            lambda a, b: a & b,
            [F.col(f"score_{lang}") >= F.col(f"score_{o}") for o in others],
        )
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return out.withColumn("lang_pred", pred)


def sql_lang_scores(text_expr: str) -> dict[str, str]:
    """DuckDB expressions mirroring :func:`lang_scores` exactly."""
    norm = f"lower(trim(regexp_replace({text_expr}, '\\s+', ' ', 'g')))"
    n_words = f"len(string_split({norm}, ' '))"
    scores = {
        lang: (
            f"CAST(len(regexp_extract_all({norm}, "
            f"'{stopword_regex(LANG_STOPWORDS[lang])}')) AS DOUBLE) / {n_words}"
        )
        for lang in LANGS
    }
    cases = []
    for i, lang in enumerate(LANGS):
        conds = " AND ".join(
            f"score_{lang} >= score_{other}" for other in LANGS[i + 1 :]
        )
        if conds:
            cases.append(f"WHEN {conds} THEN '{lang}'")
        else:
            cases.append(f"ELSE '{lang}'")
    scores["lang_pred"] = "CASE " + " ".join(cases) + " END"
    return scores


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Length / punctuation / stopword / repetition features and a
    composite quality score in [0, 1]."""
    norm = normalize(F.col(text_col))
    w = words(F.col(text_col))
    n_chars = F.length(norm)
    n_words = F.size(w)
    n_distinct = F.size(F.array_distinct(w))
    stop = stopword_count(F.col(text_col), LANG_STOPWORDS["en"]).cast("double")
    punct = F.regexp_count(norm, F.lit(PUNCT_PATTERN)).cast("double")
    out = (
        df.withColumn("n_chars_norm", n_chars)
        .withColumn("n_words", n_words)
        .withColumn(
            "avg_word_len",
            (n_chars - (n_words - 1)).cast("double") / n_words,
        )
        .withColumn("punct_ratio", punct / n_chars)
        .withColumn("stopword_ratio", stop / n_words)
        .withColumn("distinct_ratio", n_distinct.cast("double") / n_words)
    )
    score = (
        0.4 * F.least(F.col("n_words").cast("double") / 100.0, F.lit(1.0))
        + 0.3 * F.col("distinct_ratio")
        + 0.3 * F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0))
    )
    return out.withColumn("quality_score", score)


def token_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens per document."""
    norm = normalize(F.col(text_col))
    return df.withColumn("n_ws_tokens", F.size(F.split(norm, " "))).withColumn(
        "n_bpe_tokens", F.regexp_count(norm, F.lit(BPE_PATTERN))
    )


def fingerprints(df: DataFrame, text_col: str, shingle_words: int = 3) -> DataFrame:
    """Document fingerprints: md5 of the normalized text (exact-dup key)
    plus the lexicographic-min md5 over word shingles (a winnowing-style
    rolling fingerprint robust to local edits)."""
    from .dedup import shingle_array, widen

    norm = normalize(F.col(text_col))
    sh = shingle_array(norm, shingle_words)
    return widen(df).withColumn("doc_md5", F.md5(norm)).withColumn(
        "min_shingle_md5",
        F.array_min(F.transform(sh, lambda s: F.md5(s))),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 50,
    stride: int = 40,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    standard context-window preprocessing step of a training-data /
    retrieval pipeline (size-token chunks every stride tokens, so
    consecutive chunks overlap by size-stride tokens).

    Pure map-side (no shuffle, no Python): windows come from one
    slice+join per chunk (~n_words/stride interpreted lambda calls per
    doc — the cheap per-row HOF regime). Output is one row per chunk:
    (id, chunk_id, chunk_text, n_tokens)."""
    # explode_outer: plain explode adds a size(..) > 0 pruning filter
    # that re-evaluates the whole chunk-building transform per row
    # (non-foldable expression); sequence(1, size(_w), stride) is never
    # empty since split yields at least [""], so rows are identical.
    per_doc = df.select(
        F.col(id_col), words(F.col(text_col)).alias("_w")
    ).select(
        id_col,
        F.explode_outer(
            F.expr(
                f"transform(sequence(1, size(_w), {stride}), i -> struct("
                f"CAST((i - 1) DIV {stride} AS INT) AS chunk_id, "
                f"array_join(slice(_w, i, {size}), ' ') AS chunk_text, "
                f"least({size}, size(_w) - i + 1) AS n_tokens))"
            )
        ).alias("_c"),
    )
    return per_doc.select(id_col, "_c.chunk_id", "_c.chunk_text", "_c.n_tokens")


def vocab_topk(
    df: DataFrame,
    group_col: str,
    text_col: str,
    k: int = 10,
) -> DataFrame:
    """Per-group top-k token frequencies — the corpus-statistics step
    of tokenizer/vocabulary induction (BPE training starts from exactly
    these counts).

    Token counts partial-aggregate map-side before the (group, token)
    shuffle, so the exchange carries vocabulary-sized data, not corpus-
    sized; the ranking window then runs over distinct (group, token)
    rows only — bounded by vocabulary size per group, no corpus-scale
    sort. Ties break lexicographically for determinism.
    """
    from .dedup import widen

    toks = widen(df).select(
        F.col(group_col),
        F.explode_outer(F.split(normalize(F.col(text_col)), " ")).alias("token"),
    ).filter(F.col("token") != "")
    counts = toks.groupBy(group_col, "token").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    win = Window.partitionBy(group_col).orderBy(F.desc("n"), F.asc("token"))
    return (
        counts.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(group_col, "token", "n", "rank")
    )


def tfidf_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
) -> DataFrame:
    """Per-document top-k TF-IDF keywords — the standard relevance /
    feature-extraction weighting (Salton & Buckley 1988; smooth-free
    ``tf * ln(N / df)`` since every counted token has df >= 1).

    Returns (id, token, tf, score, rank). Scale shape: term counts
    partial-aggregate map-side before ONE (doc, token) shuffle; the
    document frequency comes from a window over the same rows keyed by
    token (distinct (doc, token) pairs — vocabulary-bounded per token,
    and computed WITHOUT re-evaluating the token pipeline, which a
    self-join aggregate would: Catalyst does not CSE across join
    branches). The corpus size N is a one-row broadcast crossJoin.
    The score is rounded to 9 decimals BEFORE ranking so a last-ulp
    ``ln`` difference between engines cannot reorder near-ties — the
    remaining tie-break is the token itself (deterministic).
    """
    from pyspark.sql import Window

    from .dedup import widen

    toks = widen(df).select(
        F.col(id_col),
        F.explode_outer(F.split(normalize(F.col(text_col)), " ")).alias("token"),
    ).filter(F.col("token") != "")
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    n = df.agg(F.count(F.lit(1)).alias("n"))
    dfreq = F.count(F.lit(1)).over(Window.partitionBy("token"))
    scored = (
        tf.crossJoin(F.broadcast(n))
        .withColumn("score", F.round(F.col("tf") * F.log(F.col("n") / dfreq), 9))
    )
    win = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(id_col, "token", "tf", "score", "rank")
    )


def heavy_hitter_tokens(
    df: DataFrame,
    text_col: str,
    k: int = 64,
    topn: int = 20,
) -> DataFrame:
    """Frequent tokens via a Misra-Gries summary per partition — the
    MERGEABLE fixed-memory path beside :func:`vocab_topk`'s exact
    counts (the same exact/sketch pairing as the HLL++/GK profile in
    events_analytics): at 100 TB the exact path shuffles a
    vocabulary-sized aggregate, this one shuffles ≤ k rows PER
    PARTITION, each a (token, lower-bound count) pair — bandwidth
    independent of both corpus and vocabulary size.

    Guarantees (Misra-Gries 1982; merged-summary bounds per Agarwal et
    al., PODS'12): with n total tokens and P partitions, every token
    with true frequency > n/(k+1) survives in at least one partition
    summary (pigeonhole), and the summed estimate is a LOWER bound
    within Σ_p n_p/(k+1) ≤ n/(k+1) of truth — so ranking by estimate
    ranks true heavy hitters correctly up to that additive error.
    Output: (token, est, err_bound) for the topn estimates; the
    invariant test checks both bounds against exact counts.

    Plan: one mapInPandas pass (counters built across ALL Arrow batches
    of a partition, one summary yielded at iterator end — the streaming
    aggregation shape), one tiny groupBy over ≤ P·k rows.
    """
    from collections.abc import Iterator

    import pandas as pd

    from .dedup import widen

    def summarize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n_seen = 0
        for pdf in it:
            for text in pdf[text_col]:
                if not text:
                    continue
                for tok in text.lower().split():
                    n_seen += 1
                    if tok in counters:
                        counters[tok] += 1
                    elif len(counters) < k:
                        counters[tok] = 1
                    else:  # decrement-all: the MG step
                        dead = []
                        for t in counters:
                            counters[t] -= 1
                            if counters[t] == 0:
                                dead.append(t)
                        for t in dead:
                            del counters[t]
        # one NULL-token marker row carries this partition's token count
        # (a separate column + distinct would collapse partitions that
        # happen to see equal counts); counter rows carry the summary
        yield pd.DataFrame(
            {
                "token": [None] + list(counters),
                "est": [0] + list(counters.values()),
                "part_tokens": [n_seen] + [0] * len(counters),
            }
        )

    partials = widen(df).select(text_col).mapInPandas(
        summarize, "token string, est long, part_tokens long"
    )
    # ONE aggregation, ONE consumer tree: the marker group (NULL
    # token) carries the total; an unpartitioned window over the
    # aggregate output (≤ P·k+1 rows — same tiny-relation argument as
    # the ranking window below) broadcasts it onto every row as the
    # error bound. A filter-per-branch formulation looks cheaper but
    # is 3× slower: the token-IS-NULL filter pushes BELOW the groupBy,
    # splitting the subtrees so the corpus-wide mapInPandas pass runs
    # once per branch (no exchange reuse).
    from pyspark.sql import Window

    g = partials.groupBy("token").agg(
        F.sum("est").alias("est"), F.sum("part_tokens").alias("_pt")
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    merged = (
        g.withColumn(
            "err_bound",
            F.max(F.when(F.col("token").isNull(), F.col("_pt"))).over(w_all)
            / F.lit(k + 1),
        )
        .filter(F.col("token").isNotNull())
        .select("token", "est", "err_bound")
    )
    win = Window.orderBy(F.desc("est"), F.asc("token"))
    return (
        merged.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= topn)
        .select("token", "est", "err_bound", "rank")
    )
