"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting.

Extensions beyond the reference (SURVEY.md §2.2). Everything here is
native Column expressions — string ops, array higher-order functions,
md5 — so the hot path stays inside whole-stage codegen and the same
logic is expressible in the ANSI-SQL oracle. No Python UDFs.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker vocabularies for the n-gram/stopword
# heuristic language classifier. Deliberately small and public-domain:
# the top function words of each language.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "fr": ["le", "la", "les", "de", "et", "est", "un", "une"],
    "es": ["el", "la", "los", "de", "que", "es", "un", "una"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "nicht"],
}

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "is", "in", "on", "for"]


def tokens(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.lower(c), " ")


def token_count(text_col: str | Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text_col))


def bpe_ish_token_count(text_col: str | Column) -> Column:
    """BPE-ish token estimate without a tokenizer model: count word
    pieces after splitting on non-alphanumerics, plus ceil(chars/4)
    for long words (the classic ~4-chars-per-token heuristic)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.filter(F.split(F.lower(c), "[^a-z0-9]+"), lambda w: F.length(w) > 0)
    return F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("long"),
    )


def stopword_ratio(text_col: str | Column) -> Column:
    toks = tokens(text_col)
    stops = F.filter(toks, lambda t: t.isin(STOPWORDS))
    return F.size(stops) / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    stripped = F.regexp_replace(c, "[a-zA-Z0-9 ]", "")
    return F.length(stripped) / F.greatest(F.length(c), F.lit(1))


def mean_word_length(text_col: str | Column) -> Column:
    toks = tokens(text_col)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text_col: str | Column) -> Column:
    """Composite [0,1] quality score: length band + stopword presence +
    low punctuation + sane mean word length. The exact blend mirrors
    common pretraining-data heuristics (C4-style filters) in a form
    both Spark and the SQL oracle can evaluate identically."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n = F.length(c)
    len_ok = F.when((n >= 50) & (n <= 10000), 1.0).otherwise(0.0)
    stop_ok = F.when(stopword_ratio(c) >= 0.05, 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(c) <= 0.2, 1.0).otherwise(0.0)
    mwl = mean_word_length(c)
    mwl_ok = F.when((mwl >= 3) & (mwl <= 10), 1.0).otherwise(0.0)
    return (len_ok + stop_ok + punct_ok + mwl_ok) / 4.0


def _marker_count(toks: Column, markers: list[str]) -> Column:
    # NB: the lambda must be unary — PySpark treats a 2-arg lambda in a
    # higher-order function as (element, index), so capturing via a
    # default argument silently binds the index column instead.
    return F.size(F.filter(toks, lambda t: t.isin(markers)))


def lang_scores(text_col: str | Column) -> dict[str, Column]:
    toks = tokens(text_col)
    return {lang: _marker_count(toks, markers) for lang, markers in LANG_MARKERS.items()}


def lang_id(text_col: str | Column) -> Column:
    """Marker-word language classifier: argmax of per-language marker
    counts, 'und' (undetermined) when no marker hits; ties break in
    fixed lang order via strictly-greater comparison."""
    scores = lang_scores(text_col)
    langs = list(scores)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in langs:
        s = scores[lang]
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def fingerprint(text_col: str | Column) -> Column:
    """Canonical document fingerprint: md5 of the normalized token
    stream (lowercase, whitespace-collapsed). Identical function exists
    in the SQL oracle, so fingerprints are cross-engine comparable."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    normalized = F.concat_ws(" ", F.filter(F.split(F.lower(c), "\\s+"), lambda t: F.length(t) > 0))
    return F.md5(normalized)


def rolling_shingle_fingerprints(text_col: str | Column, n: int = 5) -> Column:
    """Winnowing-style fingerprint set: md5 of each word n-gram —
    the per-document shingle sketch used for containment detection
    (doc A quoted inside doc B), where one global fingerprint fails."""
    toks = tokens(text_col)
    # guard: Spark's sequence(1, 0) yields DESCENDING [1, 0], and
    # slice(_, 0, n) throws — short docs must map to an empty sketch
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(idx, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))))
    )


def truncated_shingle_fps(
    text_col: "str | Column", n: int = 5, hex_chars: int = 16
) -> Column:
    """The 64-bit fingerprint sketch: rolling_shingle_fingerprints
    truncated to ``hex_chars`` hex chars with dedup re-applied AFTER
    truncation. One definition for every posting pipeline (containment,
    novelty, contamination) because the ordering subtlety is a proven
    bug class: dedup BEFORE truncation leaves a within-doc 64-bit
    prefix collision double-counted on the Spark side only, silently
    diverging from an oracle that dedups the truncated values."""
    return F.array_distinct(
        F.transform(
            rolling_shingle_fingerprints(text_col, n),
            lambda x: F.substring(x, 1, hex_chars),
        )
    )


def text_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One-pass per-document stat sheet (the 'document profile' table a
    training-data pipeline materializes once and filters on many
    times)."""
    return df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        token_count(text_col).alias("n_tokens"),
        bpe_ish_token_count(text_col).alias("n_bpe_tokens"),
        F.round(mean_word_length(text_col), 4).alias("mean_word_len"),
        F.round(stopword_ratio(text_col), 4).alias("stopword_ratio"),
        F.round(punct_ratio(text_col), 4).alias("punct_ratio"),
        F.round(quality_score(text_col), 2).alias("quality"),
        lang_id(text_col).alias("lang_pred"),
        fingerprint(text_col).alias("fingerprint"),
    )


def cross_containment_pairs(
    probe: DataFrame,
    corpus: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
    min_containment: float = 0.3,
    hot_cap: int | None = None,
    fp_hex_chars: int | None = None,
) -> DataFrame:
    """Contamination check: (probe_id, corpus_id, n_shared, containment)
    for probe docs whose rolling n-gram fingerprints are covered >=
    ``min_containment`` by some corpus doc — the train/test-leakage
    scan every eval pipeline needs (did my benchmark doc leak into the
    training corpus, verbatim or quoted?).

    Shape: two-sided inverted index. Both posting lists shuffle once on
    the fingerprint; only (probe, corpus) doc pairs sharing a
    fingerprint ever meet, so cost scales with actual cross-corpus
    overlap, not |probe| x |corpus|. Containment denominators are the
    PROBE side's sketch size (the question is "how much of the probe
    doc is covered", not symmetric Jaccard). ``hot_cap`` drops
    fingerprints present in more than that many corpus docs — a
    boilerplate phrase shared by 1e5 training docs explodes the join
    and carries no leakage signal; always set it at scale.

    ``fp_hex_chars`` truncates the md5 fingerprints to that many hex
    chars before the shuffle (identity is all the posting join needs;
    16 chars = 64 bits halves the key bytes — measured ~15% on the
    within-corpus variant). Dedup re-applies AFTER truncation so a
    within-doc prefix collision cannot double-count (the
    text_ngram_novelty lesson); probe sketch sizes count the
    post-truncation distinct set, which is what the denominator
    means.
    """
    # explode_outer + post-explode null filter, NOT plain explode: the
    # inner Generate injects a `size(arr)>0 AND isnotnull(arr)` filter
    # below the projection, re-inlining the md5-shingle expression and
    # computing it a second time per row. With outer=true the array
    # materializes exactly once in the child projection; empty/null
    # sketches surface as one null-fp row and drop on the cheap
    # attribute filter. n_probe = size(fps) rides the same projection
    # (the Generate retains the attribute, so size() reuses it) — no
    # second scan, no count-window over the posting list.
    def fps_expr() -> Column:
        if fp_hex_chars is not None:
            return truncated_shingle_fps(text_col, n, fp_hex_chars)
        return rolling_shingle_fingerprints(text_col, n)

    from dat_archive_map_reduce_spark.operators._util import fan_out

    # fan_out (r15): the md5-shingle projections are the operator's
    # dominant compute; a single-split parquet input runs them on one
    # core (no-op when the scan already has >= parallelism splits)
    p = (
        fan_out(probe.select(id_col, text_col))
        .select(
            F.col(id_col).alias("probe_id"),
            fps_expr().alias("fps"),
        )
        .select(
            "probe_id",
            F.size("fps").alias("n_probe"),
            F.explode_outer("fps").alias("fp"),
        )
        .filter(F.col("fp").isNotNull())
    )
    c = (
        fan_out(corpus.select(id_col, text_col))
        .select(
            F.col(id_col).alias("corpus_id"),
            fps_expr().alias("fps"),
        )
        .select("corpus_id", F.explode_outer("fps").alias("fp"))
        .filter(F.col("fp").isNotNull())
    )
    released: list[DataFrame] = []
    if hot_cap is not None:
        # Hot-fp cap via partial-agg groupBy-count + broadcast ANTI
        # join over a PERSISTED posting list, not count-over-fp
        # window: HashAggregate's map-side partial pass means the
        # count shuffle carries at most one row per (partition,
        # distinct fp) and never buffers a posting list, whereas
        # WindowExec sort-buffers each fp group — and the groups that
        # buffer largest are exactly the boilerplate fps the cap
        # exists to drop (disk-spilling sort on the hottest keys at
        # scale). The persist keeps the corpus shingling at ONE pass
        # (count + join both read the cache; at 100 TB this is the
        # materialized postings table every inverted-index pipeline
        # keeps on storage anyway); eager_release drops it as soon as
        # the pair list materializes. The surviving hot set is USUALLY
        # tiny (fps in > hot_cap corpus docs — bounded by
        # postings/hot_cap), but a small cap on a large corpus can
        # make it big, and a FORCED broadcast hint would then OOM the
        # driver where a shuffled anti join merely degrades. So no
        # hint: the optimizer's size estimate (and AQE's runtime
        # re-plan) picks broadcast when the hot set is small — the
        # static plan contract pins that it does here — and falls
        # back to a shuffled anti join when it is not. (An exact
        # pre-count gate was tried and reverted: it forces an eager
        # materialization pass at CONSTRUCTION time, costing a full
        # extra postings scan per invocation.)
        c = c.persist()
        released.append(c)
        hot = (
            c.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("cdf"))
            .filter(F.col("cdf") > hot_cap)
            .select("fp")
        )
        c = c.join(hot, "fp", "left_anti")
    out = (
        p.join(c, "fp")
        .groupBy("probe_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("n_shared"), F.first("n_probe").alias("n_probe"))
        .withColumn("containment", F.round(F.col("n_shared") / F.col("n_probe"), 4))
        .filter(F.col("containment") >= min_containment)
        .select("probe_id", "corpus_id", "n_shared", "containment")
    )
    if released:
        from dat_archive_map_reduce_spark.operators._util import eager_release

        out = eager_release(out, *released)
    return out


def mg_heavy_hitters(
    tok_rows: DataFrame,
    support_frac: float,
    counters: int = 64,
    token_col: str = "token",
    doc_col: str = "doc_id",
) -> DataFrame:
    """EXACT heavy hitters without a full-vocabulary shuffle: two-pass
    Misra-Gries. Pass 1 runs an MG summary inside each partition
    (Arrow-batched; state spans the partition's batches) and emits only
    the surviving candidate tokens; pass 2 broadcast-semi-joins the
    token stream down to candidates and counts those exactly.

    PRECONDITION: ``tok_rows`` must hold at most one row per
    (``doc_col``, ``token_col``) pair — i.e. tokens deduplicated
    within each document — so that a row count IS a document
    frequency. The operator does not dedup internally (that would be
    exactly the full-vocabulary shuffle this operator exists to
    avoid); callers dedup inside the row (e.g. ``array_distinct``
    before ``explode``), which is shuffle-free.

    Exactness guard (data-aware): the MG survival bound is relative to
    the TOTAL (doc, token) row count N, while the support threshold is
    ``ceil(support_frac * n_docs)`` documents — off by the average
    distinct-tokens-per-doc factor. A fixed slot count can therefore
    silently evict a qualifying token (e.g. 64 slots, 100 docs x 64
    unique fillers each, one token in 15 docs at 10% support: the
    token is evicted while the naive ``counters+1 > 1/support_frac``
    check accepts). So this operator first computes N and n_docs in
    one cheap pass (map-side partial agg; the countDistinct shuffles
    doc ids, not tokens) and grows the per-partition slot budget to
    ``floor(N / threshold) + 1``, which makes survival provable: a
    token absent from every partition summary has per-partition count
    f_i <= N_i/(c+1), so globally f <= N/(c+1) < threshold.

    This is the 100 TB path the plain groupBy heavy hitter can't walk:
    the full-vocab aggregation shuffles one row per (partition, token)
    — fine until the vocabulary outgrows memory — while MG shuffles at
    most c tokens per partition in pass 1 (c = slot budget, bounded by
    1/effective-support, independent of vocabulary size) and only
    candidate-token rows in pass 2, with EXACT final counts (unlike
    count-min/SpaceSaving outputs, which are partition-order-dependent
    estimates and could never pass a hash gate).
    """
    if not 0 < support_frac <= 1:
        raise ValueError("support_frac must be in (0, 1]")
    import pandas as pd

    stats = tok_rows.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(doc_col).alias("n_docs"),
    ).first()
    n_rows, n_docs = int(stats["n_rows"]), int(stats["n_docs"])
    if n_docs == 0:
        return tok_rows.select(token_col).limit(0).withColumn(
            "doc_freq", F.lit(0).cast("long")
        )
    # same IEEE-double product the SQL oracle computes (ceil(frac * n))
    threshold = max(1, math.ceil(support_frac * n_docs))
    slots = max(counters, n_rows // threshold + 1)

    def _mg(batches):
        cnt: dict[str, int] = {}
        for pdf in batches:
            for t in pdf[token_col]:
                if t in cnt:
                    cnt[t] += 1
                elif len(cnt) < slots:
                    cnt[t] = 1
                else:
                    for k in list(cnt):
                        cnt[k] -= 1
                        if cnt[k] == 0:
                            del cnt[k]
        yield pd.DataFrame({token_col: list(cnt)})

    cands = (
        tok_rows.select(token_col)
        .mapInPandas(_mg, f"{token_col} string")
        .distinct()
    )
    return (
        tok_rows.join(F.broadcast(cands), token_col, "left_semi")
        .groupBy(token_col)
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= F.lit(threshold))
        .select(token_col, "doc_freq")
    )


def winnowing_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """True MOSS winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003):
    from each document's k-gram hash stream, every window of ``w``
    consecutive hashes selects its minimum (rightmost occurrence on
    ties); the distinct selected hashes are the fingerprint sketch.
    Guarantee: any shared token run of length >= w + k - 1 shares a
    fingerprint, with sketch density ~2/(w+1) instead of the dense
    every-gram sketch rolling_shingle_fingerprints keeps.

    The rightmost-min rule selects via an encoded key —
    md5(gram) || lpad(100000 - pos) — string-min gives (min hash,
    then max position), identically on Spark and the SQL oracle; no
    Python, no self-join. Documents with fewer than ``w`` grams
    winnow to their single overall min (the frame clips at the
    document end on both engines). Per-doc output: gram count,
    selected-fingerprint count, density, and the min/max selected
    fingerprint (pins the actual selection, not just its size).

    Scale shape (r15): ENTIRELY ROW-LOCAL — each document's k-gram
    keys, per-window minima (array_min over a slice; slice truncates
    at the array end, reproducing the frame clip) and distinct
    selection all assemble inside the row, so the whole operator is
    map-only with ZERO shuffle. The pre-r15 form ran the sliding min
    as a frame window + distinct + groupBy over span_postings' doc
    partitioning; with span_postings itself now row-local, that
    window would REINTRODUCE a full hash-partition-by-doc exchange
    of the gram stream. min_fp/max_fp come as substring(min/max full
    key): keys order by the 32-hex hash prefix first, so the extreme
    full key carries the extreme hash prefix. Same Catalyst guards
    as shingle_sets: ``ts``/``keys``/``sel`` stay multi-reference
    attributes, the short-doc prefilter tests the raw text's space
    count.
    """
    from dat_archive_map_reduce_spark.operators._util import fan_out

    spaces = F.length(F.col(text_col)) - F.length(
        F.replace(F.col(text_col), F.lit(" "), F.lit(""))
    )
    base = fan_out(df.select(id_col, text_col).filter(spaces >= k - 1)).select(
        F.col(id_col).alias("doc"),
        F.split(F.lower(F.col(text_col)), " ").alias("ts"),
    )
    # encoded selection keys, one per 0-based gram position
    keys = F.expr(
        f"transform(sequence(1, size(ts) - {k - 1}),"
        f" i -> concat(md5(concat_ws(' ', slice(ts, i, {k}))),"
        f"             lpad(cast(100000 - (i - 1) as string), 6, '0')))"
    )
    with_keys = base.select("doc", keys.alias("keys"))
    sel = F.expr(
        f"array_distinct(transform("
        f"  sequence(0, greatest(size(keys) - {w}, 0)),"
        f"  p -> array_min(slice(keys, p + 1, {w}))))"
    )
    with_sel = with_keys.select(
        "doc", F.size("keys").cast("long").alias("n_grams"), sel.alias("sel")
    )
    return with_sel.select(
        F.col("doc").alias(id_col),
        "n_grams",
        F.size("sel").cast("long").alias("n_selected"),
        F.round(F.size("sel") / F.col("n_grams"), 4).alias("density"),
        F.substring(F.array_min("sel"), 1, 32).alias("min_fp"),
        F.substring(F.array_max("sel"), 1, 32).alias("max_fp"),
    )


def gopher_rules(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021,
    arXiv:2112.11446 Table A1, adapted to the single-line test corpus):
    word-count band, mean-word-length band, alphabetic-word fraction,
    symbol-to-word ratio (# and ... marks), and minimum stopword hits.
    Emits every signal, each rule's verdict, and the conjunctive keep
    flag — pipelines filter on `keep` but log the per-rule bits to
    tune thresholds.

    Entirely native column expressions in one narrow projection: zero
    shuffle, map-only at any scale, and every signal replays exactly
    in the SQL oracle (counts and ratios are integer-derived, so the
    only rounding is the fixed 4-decimal display rounding)."""
    c = F.col(text_col)
    toks = tokens(text_col)
    n_words = F.size(toks)
    mean_wl = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    ) / F.greatest(n_words, F.lit(1))
    alpha_frac = F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / F.greatest(
        n_words, F.lit(1)
    )
    hash_marks = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    ellipses = (
        F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = (hash_marks + ellipses) / F.greatest(n_words, F.lit(1))
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))

    ok_words = (n_words >= 30) & (n_words <= 100000)
    ok_mwl = (mean_wl >= 3) & (mean_wl <= 10)
    ok_alpha = alpha_frac >= 0.8
    ok_symbol = symbol_ratio <= 0.1
    ok_stop = stop_hits >= 2
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_wl, 4).alias("mean_wl"),
        F.round(alpha_frac, 4).alias("alpha_frac"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
        stop_hits.alias("stop_hits"),
        ok_words.alias("ok_words"),
        ok_mwl.alias("ok_mwl"),
        ok_alpha.alias("ok_alpha"),
        ok_symbol.alias("ok_symbol"),
        ok_stop.alias("ok_stop"),
        (ok_words & ok_mwl & ok_alpha & ok_symbol & ok_stop).alias("keep"),
    )


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 ranking (Robertson/Sparck Jones probabilistic IDF) of the
    corpus against a bag of query terms — the classic retrieval score a
    training-data pipeline uses for quality-targeted selection and
    decontamination triage.

    Scale shape: tokens explode ONCE and are filtered to the query
    vocabulary immediately, so the shuffled postings are |docs x query
    terms| at most, never the full token stream. Corpus stats (N,
    avgdl) ride as a broadcast 1-row scalar join; per-term document
    frequencies broadcast too (|query| rows). Per-document scores sum
    in FIXED term order via conditional aggregation, so the float sum
    is bit-identical on Spark and the SQL oracle; top-k plans as
    TakeOrderedAndProject.
    """
    d = df.select(F.col(id_col).alias("doc"), tokens(text_col).alias("toks"))
    lens = d.select("doc", F.size("toks").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        d.select("doc", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(query_terms))
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count_distinct("doc").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(lens, "doc")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc",
            "term",
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * F.col("tf")
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    # fixed-order sum: one conditional-agg column per query term, added
    # in list order — groupBy(sum) would sum in partition order and the
    # oracle in its own, flipping last-ulp rank boundaries
    per_term = [
        F.sum(F.when(F.col("term") == t, F.col("s")).otherwise(0.0)).alias(f"_s{i}")
        for i, t in enumerate(query_terms)
    ]
    agg = scored.groupBy("doc").agg(*per_term)
    total = None
    for i in range(len(query_terms)):
        c = F.col(f"_s{i}")
        total = c if total is None else total + c
    return (
        agg.select(F.col("doc").alias(id_col), F.round(total, 4).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )


def tfidf_topk_terms(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
) -> DataFrame:
    """Per-document top-k TF-IDF terms over the FULL vocabulary — the
    keyword-extraction / topic-signature primitive (Salton & Buckley
    1988) a pipeline runs for per-document routing tags and
    deduplication-cluster naming. Complements bm25_topk, which ranks
    documents for a FIXED query bag; this ranks terms within each
    document with no vocabulary filter.

        tfidf(t, d) = (tf/dl) * ln((N + 1)/(df + 1))

    (add-1 smoothed IDF, so df = N never yields -0.0). Ranking uses
    the 6dp-ROUNDED score with the term string as tiebreak — the
    rounded grid is what both engines agree on; an unrounded ln()
    comparison would let a 1-ulp libm difference flip a rank.

    Scale shape — 4 static shuffles, the corpus tokenized ONCE:
    tokens explode into (doc, term) counts (partial-combined shuffle
    1); document frequencies re-aggregate those counts on the term
    grain (2 — the tf exchange under both consumers is an identical
    subtree, so ReuseExchange tokenizes once) and join back on term
    (3, fact-sized, no broadcast assumption — the vocabulary is
    corpus-sized); N rides as a 1-row broadcast scalar; document
    length and the top-k rank then compute as TWO WindowExecs over
    ONE doc-grain exchange (4) — dl via a doc-partition sum, rank
    over the score it feeds, no separate dl aggregate+join."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("term")
    ).filter(F.length("term") > 0)
    tf = toks.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    w_doc = Window.partitionBy("doc")
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("dl", F.sum("tf").over(w_doc))
        .select(
            "doc",
            "term",
            F.round(
                (F.col("tf") / F.col("dl"))
                * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                6,
            ).alias("tfidf"),
        )
    )
    w = w_doc.orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("doc").alias(id_col), "rank", "term", "tfidf")
    )


def bigram_lm_scores(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document bigram-LM cross-entropy — the CCNet-style
    perplexity filter (Wenzek et al. 2020, arXiv:1911.00359) with the
    LM trained on the corpus itself: score(doc) = -mean over bigram
    positions of ln P(w_i | w_{i-1}), with add-k smoothing
    P(b|a) = (C(a,b) + 0.5) / (C(a) + 0.5 * V). Low cross-entropy =
    predictable in-distribution text; high = outlier/gibberish, the
    tail a quality-filtering pass drops.

    Scale shape (r15): bigrams assemble ROW-LOCALLY — consecutive
    pairs are a zip_with over two slices of the per-doc token array,
    so assembly is a narrow map with NO shuffle (the pre-r15 form
    posexploded tokens and ran a window-lead per doc: one
    hash-partition-by-doc exchange plus a per-doc sort, and the plan
    re-ran that subtree once per consumer branch — 3 Window nodes).
    The (doc, a, b) bigram table persists once for its three
    consumers (C(a,b), C(a), the probability probe), the same
    one-pass-feeds-all-branches pattern as the shingle postings
    cache. C(a,b) and C(a) are partial-combined groupBys whose keys
    are token pairs, not documents; the vocabulary size rides as a
    broadcast 1-row scalar. The probability join shuffles on the
    bigram key — at 100 TB both sides are Zipf-skewed the same way,
    which AQE skew-split handles; nothing collects to the driver.
    """
    from dat_archive_map_reduce_spark.operators._util import fan_out

    # fan_out (r15): single-split inputs would tokenize the corpus on
    # one task (no-op when the scan has >= parallelism splits)
    base = fan_out(df.select(id_col, text_col)).select(
        F.col(id_col).alias("doc"),
        F.split(F.lower(F.col(text_col)), " ").alias("ts"),
    )
    # zip(ts[:-1], ts[1:]) == the window-lead pairs: slice(ts, 1,
    # size-1) and slice(ts, 2, size-1) are equal length, and a
    # single-token doc yields slice(.., 0) = [] — exactly the rows
    # the old lead-IS-NULL filter dropped
    big = base.select(
        "doc",
        F.explode(
            F.expr(
                "zip_with(slice(ts, 1, size(ts) - 1),"
                "         slice(ts, 2, size(ts) - 1),"
                "         (x, y) -> struct(x AS a, y AS b))"
            )
        ).alias("p"),
    ).select("doc", "p.a", "p.b").persist()
    cnt_ab = big.groupBy("a", "b").agg(F.count(F.lit(1)).alias("cab"))
    cnt_a = big.groupBy("a").agg(F.count(F.lit(1)).alias("ca"))
    # explode_outer: the plain-explode form gets an inferred
    # size(ts) > 0 filter that re-inlines the split() under it — the
    # corpus would tokenize 3x in this branch (same Catalyst trap the
    # shingle_sets docstring records). split() never yields an empty
    # array and count_distinct ignores the NULL row a NULL text
    # explodes to, so results are identical.
    vocab = base.select(F.explode_outer("ts").alias("a")).agg(
        F.count_distinct("a").alias("v")
    )
    scored = (
        big.join(cnt_ab, ["a", "b"])
        .join(cnt_a, "a")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc",
            F.log(
                (F.col("cab") + 0.5) / (F.col("ca") + 0.5 * F.col("v"))
            ).alias("lp"),
        )
    )
    return scored.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(-F.avg("lp"), 4).alias("xent"),
    ).withColumnRenamed("doc", id_col)


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 256,
) -> DataFrame:
    """DSIR data-selection scores (Xie et al. 2023, arXiv:2302.03169):
    rank raw-corpus documents by how target-like their hashed n-gram
    feature distribution is. Per hashed feature bucket b,
    ``lr_b = ln p_target(b) - ln p_raw(b)`` with add-1 smoothing; a
    document's score is the mean ``lr`` over its token occurrences
    (length-normalized so long documents are not favored). Positive
    score = looks like the target distribution; importance resampling
    keeps the top mass.

    Engine-portable hashing: bucket = first md5 hex byte of the token
    (``n_buckets`` must be 256 for that; the oracle replays it), the
    same content-addressed idiom as corpus_hash_split.

    Scale shape: both bucket-frequency tables partial-aggregate to
    <= n_buckets rows, then fold to ONE row each — a (bucket -> count)
    map plus its total in the same aggregation — and cross the
    scoring pass as a single broadcast row (round-6 verdict #6: the
    earlier <=256-row full-outer join + two separate scalar-total
    aggregates cost four metadata-side exchanges; the map carrier is
    the adaptive-k codebook idiom from nearest_centroid_join — data,
    not literals, O(1) plan size). Per-document work pre-aggregates to
    (doc, bucket) grain before scoring, so the real shuffles are: the
    two tokenizing fact aggregations, one bucket rollup of the
    already-reduced (doc, bucket) table, and the final per-doc score
    aggregation. Nothing collects to the driver.
    """
    if n_buckets != 256:
        raise ValueError("portable bucketing uses the first md5 hex byte (256)")

    def _buckets(df: DataFrame) -> DataFrame:
        # alias-then-explode_outer: one tokenizer-split evaluation.
        # length > 0 drops the empty-string tokens consecutive spaces
        # (or empty text) produce — they would hash to the md5('')
        # bucket and count as real feature mass in n_tokens and the
        # score (the bpe paths apply the same filter).
        from dat_archive_map_reduce_spark.operators._util import fan_out

        # fan_out (r15): tokenize+md5 is the corpus-sized compute; a
        # single-split input runs it on one task
        return (
            fan_out(df.select(id_col, text_col))
            .select(F.col(id_col).alias("doc"), tokens(text_col).alias("ts"))
            .select("doc", F.explode_outer("ts").alias("tok"))
            .filter(F.col("tok").isNotNull() & (F.length("tok") > 0))
            .select("doc", F.substring(F.md5("tok"), 1, 2).alias("bucket"))
        )

    ct = _buckets(target).groupBy("bucket").agg(F.count(F.lit(1)).alias("ct"))
    doc_b = _buckets(raw).groupBy("doc", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    cs = doc_b.groupBy("bucket").agg(F.sum("n").alias("cs"))
    # each <=256-row frequency table folds to ONE row carrying its
    # (bucket -> count) map AND its total; crossJoin of two 1-row
    # tables broadcasts into the scoring pass, and the log-ratio is
    # computed inline per (doc, bucket) row — no bucket-keyed join
    # exchange ever materializes the lr table
    ct1 = ct.agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "ct"))).alias(
            "ct_map"
        ),
        F.sum("ct").alias("t_tot"),
    )
    cs1 = cs.agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "cs"))).alias(
            "cs_map"
        ),
        F.sum("cs").alias("s_tot"),
    )
    # try_element_at: a bucket absent from the target map must read as
    # count 0, not raise (ANSI mode makes plain element_at throw on
    # missing map keys)
    lr = F.log(
        (F.coalesce(F.try_element_at("ct_map", F.col("bucket")), F.lit(0)) + 1.0)
        / (F.col("t_tot") + float(n_buckets))
    ) - F.log(
        (F.coalesce(F.try_element_at("cs_map", F.col("bucket")), F.lit(0)) + 1.0)
        / (F.col("s_tot") + float(n_buckets))
    )
    return (
        doc_b.crossJoin(F.broadcast(ct1.crossJoin(cs1)))
        .select("doc", "n", lr.alias("lr"))
        .groupBy("doc")
        .agg(
            F.sum("n").alias("n_tokens"),
            F.round(F.sum(F.col("n") * F.col("lr")) / F.sum("n"), 4).alias(
                "dsir_score"
            ),
        )
        .withColumnRenamed("doc", id_col)
    )


def _bpe_disjoint_prefix(
    rules: "list[tuple[str, str]]",
) -> "list[tuple[str, str]]":
    """Longest PREFIX of ``rules`` whose symbol sets {l, r, l+r} are
    pairwise disjoint. Such a batch applied by one left-to-right fold
    pass produces exactly the same segmentation as applying its rules
    one at a time in order: no rule's output can feed (or block)
    another rule in the batch, so application order is immaterial.
    Stopping at the FIRST overlap (rather than skipping past it)
    keeps the batch a rank-contiguous prefix — every batched rule
    outranks every deferred one."""
    used: set[str] = set()
    batch: list[tuple[str, str]] = []
    for left, right in rules:
        syms = {left, right, left + right}
        if used & syms:
            break
        used |= syms
        batch.append((left, right))
    return batch


def _bpe_fold_batch(vocab: DataFrame, batch: "list[tuple[str, str]]") -> DataFrame:
    """Apply a symbol-disjoint merge batch to a ``syms`` array column
    with ONE greedy left-to-right fold. The batch rides as a
    ``create_map`` over the rule strings (key = left || \\x00 ||
    right), which ConstantFolding collapses into a single map Literal
    whose VALUE lives in the codegen references array — the generated
    source is identical across passes, so janino compiles the fold
    once per query, not once per merge (the round-latency driver at
    real merge counts; measured flat ~0.2 s/pass vs the prior
    broadcast-1-row-DataFrame carrier whose createDataFrame round
    trips alone cost ~0.33 s per pass)."""
    m = {left + "\x00" + right: left + right for left, right in batch}
    map_lit = F.create_map(*[F.lit(x) for kv in m.items() for x in kv])

    def _step(acc, s):
        key = F.concat(F.element_at(acc, -1), F.lit("\x00"), s)
        merged = F.element_at(map_lit, key)
        return F.when(
            (F.size(acc) > 0) & merged.isNotNull(),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s)))

    new_syms = F.aggregate(F.col("syms"), F.array().cast("array<string>"), _step)
    return vocab.withColumn("syms", new_syms)


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 12,
    min_pair_count: int = 2,
    batch_size: int = 8,
    word_freqs: DataFrame | None = None,
) -> DataFrame:
    """Full BPE tokenizer training loop (Sennrich et al. 2016,
    arXiv:1508.07909), distributed and BATCHED: each pass counts
    adjacent symbol pairs once, then accepts the longest
    symbol-disjoint prefix of the ranking (up to ``batch_size``
    rules) and applies them all in one fold. corpus_bpe_merge_step is
    this loop's oracle-gated single iteration; the loop itself is
    iterative driver-coordinated compute, the category SQL cannot
    express.

    Scale shape per pass: pair counts partial-aggregate over the
    WORD-TYPE vocabulary (one row per distinct word, counts identical
    to the token stream by distributivity), the ranked head arrives as
    ONE small driver list via TakeOrdered, and the whole batch applies
    as a single narrow left-to-right fold parameterized by a broadcast
    merge MAP (compiled once — no per-merge janino recompile). The
    rewritten vocabulary is materialized each pass (localCheckpoint)
    so a 30k-merge tokenizer costs ~30k/batch_size bounded-lineage
    passes, not 30k chained plan segments.

    Semantics: ``batch_size=1`` is exactly classic greedy BPE. For
    larger batches the accepted rules are a rank-contiguous
    symbol-disjoint prefix, all counted at pass start — the standard
    batched-BPE trade (a deferred overlapping pair is re-ranked next
    pass with fresh counts; a created pair can only enter the ranking
    one pass later). Ties break on (count desc, left asc, right asc);
    symbols are plain strings and a merge concatenates them (the GPT-2
    convention). Greedy left-to-right application: in ``aaab`` the
    merge (a,a) produces ``aa,a,b``. The pytest reference
    implementation mirrors the batched selection bit-exactly.

    Returns (step, left, right, merged, pair_count) — the merge table
    a tokenizer-apply pass consumes, in acceptance (= rank) order with
    pass-start counts.

    ``word_freqs`` (columns w, freq) lets a train-then-serve caller
    reuse one corpus tokenization pass for both halves (see
    corpus_bpe_tokenize: doc-word counts roll up to type freqs without
    re-shuffling the token stream).
    """
    merges_df, _ = bpe_train_tokenizer(
        df,
        text_col,
        n_merges=n_merges,
        min_pair_count=min_pair_count,
        batch_size=batch_size,
        word_freqs=word_freqs,
    )
    return merges_df


def bpe_train_tokenizer(
    df: DataFrame,
    text_col: str,
    n_merges: int = 12,
    min_pair_count: int = 2,
    batch_size: int = 8,
    word_freqs: DataFrame | None = None,
) -> "tuple[DataFrame, DataFrame]":
    """bpe_train plus the trained TOKENIZER ARTIFACT: returns
    (merges_df, seg_df) where seg_df is the final word-type
    segmentation (w, syms) the training loop already computed as its
    own working state.

    seg_df is the serving asset: tokenizing any corpus whose
    vocabulary the training corpus covers is then ONE broadcast join
    against it (bpe_apply's ``seg`` fast path) — zero fold passes at
    serve time, where replaying the merge list costs
    n_merges/batch_size chained passes per corpus (~3,750 for a real
    30k-merge tokenizer). The fold passes amortize into training,
    exactly once, ever."""
    words = word_freqs if word_freqs is not None else (
        df.select(
            F.filter(
                F.split(F.lower(text_col), "[^a-z0-9]+"),
                lambda w: F.length(w) > 0,
            ).alias("ws")
        )
        .select(F.explode_outer("ws").alias("w"))
        .filter(F.col("w").isNotNull())
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # the word-type table is orders of magnitude smaller than the
    # corpus; a handful of partitions keeps each round's two jobs at
    # ~10 scheduled tasks instead of ~64 (the round latency driver on
    # a warm cluster). For a vocabulary that genuinely needs more
    # parallelism the fold below still distributes — raise this in
    # step with type count, not corpus size.
    vocab = words.coalesce(4).select(
        "w",
        "freq",
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.col("w").substr(i, F.lit(1)),
        ).alias("syms"),
    ).localCheckpoint(eager=True)  # ONE corpus pass; rounds read types only
    spark = df.sparkSession
    merges: list[tuple[int, str, str, str, int]] = []
    while len(merges) < n_merges:
        pairs = vocab.filter(F.size("syms") >= 2).select(
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at("syms", i).alias("l"),
                        F.element_at("syms", (i + 1)).alias("r"),
                    ),
                )
            ).alias("p"),
        )
        # ranked candidate head: enough rows that the disjoint prefix
        # rarely exhausts it; still one TakeOrdered driver round-trip
        # per PASS (not per merge)
        want = min(batch_size, n_merges - len(merges))
        head = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .filter(F.col("cnt") >= min_pair_count)
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(max(8 * want, 32))
            .collect()
        )
        if not head:
            break
        batch = _bpe_disjoint_prefix([(r["l"], r["r"]) for r in head])[:want]
        cnt_of = {(r["l"], r["r"]): int(r["cnt"]) for r in head}
        for a, b in batch:
            merges.append((len(merges), a, b, a + b, cnt_of[(a, b)]))
        # LAZY checkpoint each pass: lineage is truncated (next pass's
        # pair count reads the materialized type table, not a replay of
        # every earlier fold — replay was measured growing each pass's
        # job 0.25 -> 0.63 s by re-broadcasting every prior merge map)
        # but, unlike eager=True, materialization folds into the NEXT
        # pass's own job instead of costing a separate per-pass job —
        # per-pass cost stays flat at the single-job floor
        vocab = (
            _bpe_fold_batch(vocab, batch)
            .select("w", "freq", "syms")
            .localCheckpoint(eager=False)
        )
    merges_df = spark.createDataFrame(
        merges, "step int, left string, right string, merged string, pair_count bigint"
    )
    return merges_df, vocab.select("w", "syms")


def bpe_save_tokenizer(merges_df: DataFrame, seg: DataFrame, path: str) -> None:
    """Persist a trained tokenizer as a warehouse artifact: the merge
    table (rank-ordered rules, KBs) and the word-type segmentation
    table (the one-join serving asset) as two parquet directories. A
    serving cluster loads this once and tokenizes every corpus with a
    single join — the fold passes never run again for covered
    vocabulary."""
    merges_df.write.mode("overwrite").parquet(f"{path.rstrip('/')}/merges")
    seg.write.mode("overwrite").parquet(f"{path.rstrip('/')}/seg")


def bpe_load_tokenizer(
    spark, path: str
) -> "tuple[list[tuple[str, str]], DataFrame]":
    """Load a bpe_save_tokenizer artifact: (merge rules in rank order,
    segmentation DataFrame). The rules list is the fallback for word
    types outside the saved vocabulary; the seg table is the one-join
    fast path."""
    merges_df = spark.read.parquet(f"{path.rstrip('/')}/merges")
    rules = [
        (r["left"], r["right"])
        for r in merges_df.orderBy("step").collect()
    ]
    seg = spark.read.parquet(f"{path.rstrip('/')}/seg")
    return rules, seg


def _bpe_fold_merge_chain(
    types: DataFrame,
    merges: "list[tuple[str, str]]",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Segment a (w) word-type table by replaying a trained merge list:
    split to characters, then apply consecutive symbol-disjoint
    prefixes of the rules as single fold passes, localCheckpointing
    every ``checkpoint_every`` passes to bound plan depth. Returns
    (w, syms)."""
    out = types.withColumn(
        "syms",
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.col("w").substr(i, F.lit(1)),
        ),
    )
    rest = list(merges)
    n_pass = 0
    while rest:
        batch = _bpe_disjoint_prefix(rest)
        rest = rest[len(batch):]
        out = _bpe_fold_batch(out, batch)
        n_pass += 1
        if n_pass % checkpoint_every == 0 and rest:
            out = out.localCheckpoint(eager=True)
    return out.select("w", "syms")


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str,
    id_col: str,
    checkpoint_every: int = 4,
    doc_words: DataFrame | None = None,
    seg: DataFrame | None = None,
    assume_covered: bool = False,
) -> DataFrame:
    """Tokenize with a TRAINED merge table (the serving half of
    bpe_train): per document, the BPE token count and word count.
    Merges apply in training order; consecutive symbol-disjoint
    prefixes of the rule list collapse into one fold pass each
    (provably identical to one-at-a-time application — see
    _bpe_disjoint_prefix), and the type table localCheckpoints every
    ``checkpoint_every`` passes so a 30k-rule tokenizer is ~constant
    plan depth instead of 30k chained fold segments.

    Scale shape: merges apply to the word-TYPE table (fold passes over
    distinct words — never over the token stream), then the segmented
    types join back to per-document word counts on the word key. The
    merge table is a driver-side list (tokenizers are KBs); at 100 TB
    the type table is the only relation that re-tokenizes when the
    tokenizer changes.

    ``doc_words`` (columns doc, w, n) lets a train-then-serve caller
    hand in a precomputed per-document word-count table and skip the
    token-stream shuffle here.

    ``seg`` (columns w, syms — bpe_train_tokenizer's second return)
    is the trained segmentation artifact and the SERVING fast path:
    word types it covers are tokenized by one join — no fold passes
    at all — and only types it misses (words the training corpus
    never saw) fall back to the merge-fold chain. A corpus covered by
    the training vocabulary therefore tokenizes with zero folds; the
    per-merge passes run once at training time, ever, instead of
    n_merges/batch_size chained passes per served corpus.
    """
    words = None
    if doc_words is None:
        words = (
            df.select(
                F.col(id_col).alias("doc"),
                F.filter(
                    F.split(F.lower(text_col), "[^a-z0-9]+"),
                    lambda w: F.length(w) > 0,
                ).alias("ws"),
            )
            .select("doc", F.explode_outer("ws").alias("w"))
            .filter(F.col("w").isNotNull())
        )
    if seg is not None and assume_covered:
        # caller asserts the tokenizer vocabulary covers this corpus
        # (trivially true when serving the training corpus): no probe
        # job, no fold chain — tokenization is the token stream
        # broadcast-joined to the segmentation sizes and ONE per-doc
        # partial-combined aggregation (the (doc, w) pre-grouping the
        # fold path needs would only add a second corpus-grain shuffle
        # here). The join is LEFT + raise_error, not inner: an inner
        # join would silently DROP an uncovered word from both counts
        # (including n_words, which does not even depend on the
        # tokenizer) — a violated coverage assertion must fail the job
        # loudly instead of corrupting totals.
        token_counts = seg.select("w", F.size("syms").alias("w_tokens"))
        stream = (
            words
            if words is not None
            else doc_words.select(
                "doc", "w", F.col("n").alias("_n")
            )
        )
        n_expr = F.col("_n") if words is None else F.lit(1)
        checked = F.when(
            F.col("w_tokens").isNull(),
            F.raise_error(
                F.concat(
                    F.lit(
                        "bpe_apply(assume_covered=True): word not in "
                        "the tokenizer vocabulary: "
                    ),
                    F.col("w"),
                )
            ).cast("int"),
        ).otherwise(F.col("w_tokens"))
        return (
            stream.join(token_counts, "w", "left")
            .groupBy("doc")
            .agg(
                F.sum(n_expr * checked).alias("n_bpe_tokens"),
                F.sum(n_expr).alias("n_words"),
            )
            .withColumnRenamed("doc", id_col)
        )
    if doc_words is None:
        doc_words = words.groupBy("doc", "w").agg(F.count(F.lit(1)).alias("n"))
    corpus_types = doc_words.select("w").distinct()
    if seg is not None:
        types = corpus_types.join(seg.select("w", "syms"), "w", "left")
        # fold only the types the tokenizer never saw; the bounded
        # type-grain isEmpty probe skips the whole fold chain (and
        # its plan) when the training vocabulary covers the corpus
        # — the common serve shape
        missing = types.filter(F.col("syms").isNull()).select("w")
        if missing.isEmpty():
            types = types.select("w", "syms")
        else:
            folded = _bpe_fold_merge_chain(
                missing, list(merges), checkpoint_every
            )
            types = types.filter(F.col("syms").isNotNull()).select(
                "w", "syms"
            ).unionByName(folded)
    else:
        types = _bpe_fold_merge_chain(
            corpus_types, list(merges), checkpoint_every
        )
    token_counts = types.select("w", F.size("syms").alias("w_tokens"))
    return (
        doc_words.join(token_counts, "w")
        .groupBy("doc")
        .agg(
            F.sum(F.col("n") * F.col("w_tokens")).alias("n_bpe_tokens"),
            F.sum("n").alias("n_words"),
        )
        .withColumnRenamed("doc", id_col)
    )


def chunk_overlap(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int = 32,
    stride: int = 24,
    min_tail: int = 8,
) -> DataFrame:
    """Within-document sliding-window chunking with overlap (window W,
    stride S < W) — the retrieval-indexing prep step (RAG chunking),
    distinct from cross-document sequence packing (corpus_pack_chunks).
    Chunk k covers token positions [k*S, k*S + W); trailing chunks
    shorter than ``min_tail`` are dropped unless they are the doc's
    only chunk.

    Scale shape: the naive per-doc ``transform(starts, s -> slice(...))``
    re-inlines the tokenization into every chunk element (O(n^2/S) per
    doc — the shingle_sets lesson). Instead each token emits its <=
    ceil(W/S) owning chunk indices (constant fan-out), and chunks
    reassemble in ONE groupBy with an order-restoring struct sort —
    linear work, one shuffle, whatever the document length.

    Output: (doc, chunk_idx, start_pos [1-based], chunk_len,
    chunk_hash) — the hash stands in for the chunk text so downstream
    (and the oracle) can verify exact reassembly without shipping it.
    """
    from pyspark.sql import Window as W_

    toks = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias("pos", "tok"),
    )
    w_doc = W_.partitionBy("doc")
    # chunk ids owning token p: k in [max(0, ceil((p - W + 1)/S)), floor(p/S)]
    lo = F.greatest(F.lit(0), F.ceil((F.col("pos") - window + 1) / stride).cast("int"))
    hi = F.floor(F.col("pos") / stride).cast("int")
    owned = toks.select(
        "doc",
        "pos",
        "tok",
        F.count(F.lit(1)).over(w_doc).alias("n_tokens"),
        F.explode(F.sequence(lo, hi)).alias("k"),
    )
    chunks = (
        owned.groupBy("doc", "k")
        .agg(
            F.any_value("n_tokens").alias("n_tokens"),
            F.count(F.lit(1)).alias("chunk_len"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                        lambda s: s["tok"],
                    ),
                )
            ).alias("chunk_hash"),
        )
    )
    return chunks.filter(
        (F.col("chunk_len") >= min_tail) | (F.col("k") == 0)
    ).select(
        F.col("doc").alias(id_col),
        F.col("k").alias("chunk_idx"),
        (F.col("k") * stride + 1).alias("start_pos"),
        "chunk_len",
        "chunk_hash",
    )


def blocklist_filter(
    docs: DataFrame,
    terms: "list[str]",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style blocklist filtering (Raffel et al. 2020 §2.2 removed
    any page containing a word from a fixed blocklist): per document,
    the number of blocklisted token occurrences, the count of distinct
    blocklist terms present, and the keep/drop decision.

    Spark-first: the blocklist folds to one literal array, matching is
    a whole-word array scan inside codegen — a map-only stage with no
    shuffle and no Python, so the filter costs one corpus scan at any
    scale. Whole-token equality (not substring) avoids the classic
    scunthorpe false positive of substring blocklists.
    """
    words = F.split(F.col(text_col), " ")
    bl = F.array(*[F.lit(t) for t in sorted(set(terms))])
    n_hits = F.size(F.filter(words, lambda w: F.array_contains(bl, w)))
    n_terms = F.size(F.array_intersect(words, bl))
    out_cols = [F.col(id_col)] + [
        F.col(c) for c in docs.columns if c not in (id_col, text_col)
    ]
    return docs.select(
        *out_cols,
        n_hits.cast("bigint").alias("n_hits"),
        n_terms.cast("bigint").alias("n_matched_terms"),
        (n_hits == 0).alias("kept"),
    )


def line_boilerplate_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_line: int = 2,
    hot_num: int = 1,
    hot_den: int = 20,
) -> DataFrame:
    """CCNet/RefinedWeb-style line-level boilerplate removal (Wenzek
    et al. 2020 §3.1 drop duplicated paragraphs; Penedo et al. 2023
    line-wise filtering): segment each document into lines, find lines
    appearing in at least ``hot_num/hot_den`` of all documents
    (boilerplate: headers, nav bars, cookie banners), and rewrite
    every document without them. The synthetic corpus has no newlines,
    so the deterministic segmenter is fixed ``words_per_line`` word
    windows — the operator is segmentation-agnostic, the corpus-wide
    count/remove machinery is the real subject.

    Scale plan: one shuffle counts distinct docs per line (partial
    agg), the qualifying hot set folds to ONE broadcast array row
    (data, not plan nodes — the SemDeDup centroid-table pattern), and
    the rewrite is a map-side array filter inside codegen. The
    fractional threshold keeps the hot set small by definition: a
    line in >=1/20 of documents is bounded by 20*words_per_line lines
    of corpus-average length worth of candidates per document,
    independent of corpus size. Returns (id, n_lines, n_removed,
    text_clean).
    """
    words = F.split(F.col(text_col), " ")
    n_lines = F.ceil(F.size(words) / F.lit(words_per_line)).cast("int")
    lines_expr = F.when(
        n_lines > 0,
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda j: F.array_join(
                F.slice(words, j * words_per_line + 1, words_per_line), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    from dat_archive_map_reduce_spark.operators._util import fan_out

    # fan_out (r15): line segmentation + the hot-set rewrite are the
    # corpus-sized compute; single-split inputs run them on one task
    base = fan_out(docs.select(id_col, text_col)).select(
        F.col(id_col), lines_expr.alias("lines")
    )
    total = docs.agg(F.count(F.lit(1)).alias("total"))
    # distinct docs per line == plain count after per-doc array_distinct:
    # the shuffle then carries (line, partial count) rows with full
    # map-side combine instead of expanding (line, doc_id) pairs
    # through a two-exchange distinct aggregate.
    hot = (
        base.select(F.explode(F.array_distinct("lines")).alias("line"))
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("nd"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("nd") * F.lit(hot_den) >= F.col("total") * F.lit(hot_num))
        .agg(F.array_sort(F.collect_list("line")).alias("hot"))
    )
    is_hot = lambda line: F.array_contains(F.col("hot"), line)  # noqa: E731
    return base.crossJoin(F.broadcast(hot)).select(
        id_col,
        F.size("lines").cast("bigint").alias("n_lines"),
        F.size(F.filter(F.col("lines"), is_hot)).cast("bigint").alias("n_removed"),
        F.array_join(
            F.filter(F.col("lines"), lambda line: ~is_hot(line)), " "
        ).alias("text_clean"),
    )


# Structured-PII pattern classes. The subset of regex syntax used here
# (literal classes, bounded quantifiers, escaped metachars — no
# word-boundary \b, no lookaround, no backreferences) has identical
# match semantics under Java regex (Spark) and RE2 (DuckDB, Go), so an
# engine-portable oracle can replay the scrub bit-for-bit.
PII_PATTERNS: "list[tuple[str, str, str]]" = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
    ("phone", r"\+\d{2}-\d{3}-\d{4}", "<PHONE>"),
]


def pii_redact(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: "list[tuple[str, str, str]] | None" = None,
) -> DataFrame:
    """Structured-PII detection + masking, the pre-training scrub pass
    every public web corpus runs (ROOTS, Laurencon et al. 2022 §PII;
    RefinedWeb, Penedo et al. 2023 — emails/IPs/phones replaced with
    class tokens rather than dropped so surrounding text survives).

    Per document: one count per PII class measured on the ORIGINAL
    text, plus ``text_clean`` with every match replaced by its class
    token. Replacements apply in declaration order (email before ip
    before phone) so an earlier class's token can never be chewed up
    by a later pattern.

    Spark-first: counts are ``regexp_extract_all`` sizes and the scrub
    is chained ``regexp_replace`` — all inside one codegen'd map-only
    projection, no shuffle, no Python; the filter costs one corpus
    scan at any scale, exactly like ``blocklist_filter``.
    """
    pats = PII_PATTERNS if patterns is None else patterns
    clean = F.col(text_col)
    counts = []
    for cname, pat, token in pats:
        counts.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
            .cast("bigint")
            .alias(f"n_{cname}")
        )
        clean = F.regexp_replace(clean, pat, token)
    out_cols = [F.col(id_col)] + [
        F.col(c) for c in docs.columns if c not in (id_col, text_col)
    ]
    return docs.select(*out_cols, *counts, clean.alias("text_clean"))


def hashed_unigram_vecs(
    docs: DataFrame,
    label_col: "str | None" = None,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document hashed-unigram feature VECTOR shared by logreg
    train AND serve: (doc[, y], xs) where xs is a dense
    array<double> of length n_buckets + 1 — xs[0] is the constant
    bias feature (the sparse layout's bucket -1), xs[b + 1] =
    in-doc count of md5 bucket b / token count.

    r15 (2nd pass): replaces the exploded (doc, bucket, x) feature
    TABLE with per-doc sparse vectors: fx = the doc's
    array<struct<b, x>> sorted by bucket (the bias feature, bucket
    -1 / x = 1.0, stays implicit — it is constant). The old layout
    re-shuffled one row per (doc, bucket) back to doc grain on
    EVERY weight-apply pass (once per training round plus once to
    score); with doc-grain vectors, z = w·x is a map-side fold
    against the broadcast weight row, and only the per-round
    gradient aggregation ((n_buckets+1) keys) ever exchanges
    anything. The gradient sums see the same multiset of r*x terms
    as the old layout, so results are unchanged.

    fan_out: the tokenize+md5 projection is the corpus-sized
    compute; a single-split input would run it on one task."""
    from dat_archive_map_reduce_spark.operators._util import fan_out

    label = (
        [F.col(label_col).cast("double").alias("y")] if label_col else []
    )
    base = fan_out(
        docs.select(
            F.col(id_col).alias("doc"), *label, F.col(text_col).alias("__t_raw")
        )
    ).select(
        "doc",
        *(["y"] if label_col else []),
        F.split(F.lower(F.col("__t_raw")), " ").alias("t"),
    ).withColumn("n_tok", F.greatest(F.size("t"), F.lit(1)))
    keys = ["doc", "y"] if label_col else ["doc"]
    return (
        base.select(*keys, "n_tok", F.explode("t").alias("tok"))
        .withColumn(
            "b",
            (
                F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("bigint")
                % n_buckets
            ).cast("int"),
        )
        .groupBy(*keys, "n_tok", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(*keys)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("b"),
                        (F.col("cnt") / F.col("n_tok")).alias("x"),
                    )
                )
            ).alias("fx")
        )
    )


def _weights_row(weights: DataFrame) -> DataFrame:
    """Fold the (bucket, w) weight table into ONE broadcast row whose
    array is in bucket order (bias bucket -1 at index 0, bucket b at
    1-based position b + 2). The weights stay a table between rounds
    (never plan literals or driver vectors); this is the kmeans
    codebook-row pattern."""
    return F.broadcast(
        weights.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("bucket", "w"))),
                lambda s: s["w"],
            ).alias("__w_arr")
        )
    )


def _dot_w(fx_col: str = "fx"):
    """w·x as a fold over the doc's sparse feature vector with O(1)
    ``element_at`` weight lookups, seeded with the bias term (bucket
    -1, x = 1.0). Only present buckets contribute terms — the same
    multiset the old sparse-table aggregation summed."""
    return F.aggregate(
        F.col(fx_col),
        F.element_at(F.col("__w_arr"), 1) * F.lit(1.0),
        lambda a, e: a + e["x"] * F.element_at(F.col("__w_arr"), e["b"] + 2),
    )


def logreg_train_hashed(
    docs: DataFrame,
    label_col: str,
    n_buckets: int = 64,
    lr: float = 4.0,
    n_rounds: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    vecs: "DataFrame | None" = None,
) -> DataFrame:
    """Distributed batch-gradient-descent training of a hashed-feature
    logistic-regression quality classifier — the classifier-based
    document filter of the GPT-3/LLaMA-style pipelines (Brown et al.
    2020 §A; Touvron et al. 2023: classify pages against a quality
    target, keep by score), trained INSIDE the engine instead of
    exported to a separate ML system.

    Features are hashed unigram frequencies: token -> md5 bucket in
    [0, n_buckets), x = in-doc count / token count (the DSIR hashing
    trick, dsir_weights), plus a constant bias feature at bucket -1.
    Model state is a WEIGHT TABLE (bucket, w) — the kmeans_
    train_distributed centroid-table pattern: weights never exist as
    plan literals or driver vectors, every round is

        z_d   = sum_b w_b x_db          (map-side fold vs the
                                         broadcast weight row)
        p_d   = sigmoid(z_d)
        g_b   = sum_d (p_d - y_d) x_db / N
        w_b'  = round(w_b - lr * g_b, 6)

    r15 (2nd pass): featurization is hashed_unigram_vecs — doc-grain
    dense vectors folded in-row, so the ONLY exchange per round is
    the (n_buckets+1)-key gradient aggregation (the old layout paid
    a token-grain featurize shuffle plus a doc-grain re-group per
    weight apply). The gradient sums see the same multiset of
    r*x terms (dense zeros filtered before the agg), the 6-decimal
    per-round weight rounding is unchanged, and the oracle replays
    the recurrence exactly as before. Weights start at 0, so round
    1's p is exactly 0.5 — the oracle's first round is closed-form.
    Returns the final (bucket, weight) table, bias at bucket -1.
    Pass ``vecs`` (a cached hashed_unigram_vecs table with the label)
    to share one featurization with a scoring pass; otherwise the
    map-only featurization replays per round.
    """
    owns_vecs = vecs is None
    if owns_vecs:
        # cached so the per-round passes share one featurization; the
        # eager per-round checkpoints (below) guarantee it is both
        # materialized and safely releasable before return
        vecs = hashed_unigram_vecs(
            docs, label_col, n_buckets=n_buckets,
            text_col=text_col, id_col=id_col,
        ).persist()
    n_docs = F.broadcast(docs.agg(F.count(F.lit(1)).alias("n_docs")))
    spark = docs.sparkSession
    weights = spark.range(-1, n_buckets).select(
        F.col("id").cast("int").alias("bucket"), F.lit(0.0).alias("w")
    )
    bias = F.struct(
        F.lit(-1).cast("int").alias("b"), F.lit(1.0).alias("x")
    )
    for _ in range(n_rounds):
        resid = vecs.crossJoin(_weights_row(weights)).select(
            "fx",
            (
                F.lit(1.0) / (F.lit(1.0) + F.exp(-_dot_w())) - F.col("y")
            ).alias("r"),
        )
        grads = (
            resid.select(
                "r", F.explode(F.concat(F.array(bias), F.col("fx"))).alias("e")
            )
            .groupBy(F.col("e.b").alias("bucket"))
            .agg(F.sum(F.col("r") * F.col("e.x")).alias("gsum"))
            .crossJoin(n_docs)
            .select("bucket", (F.col("gsum") / F.col("n_docs")).alias("g"))
        )
        weights = (
            weights.join(grads, "bucket", "left")
            .select(
                "bucket",
                F.round(
                    F.col("w") - F.lit(lr) * F.coalesce("g", F.lit(0.0)), 6
                ).alias("w"),
            )
            # 65 rows — eager, tiny, truncates lineage per round (the
            # kmeans_train_distributed pattern)
            .localCheckpoint(eager=True)
        )
    if owns_vecs:
        vecs.unpersist()
    return weights


def logreg_score(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    vecs: "DataFrame | None" = None,
    keep_cols: "tuple[str, ...]" = (),
) -> DataFrame:
    """Serve a trained hashed-feature logistic model: per document the
    sigmoid score as a MAP-SIDE ordered fold of the doc's feature
    vector against the broadcast weight row — no shuffle, no driver
    state (r15 2nd pass; the sparse layout paid a (doc, bucket)
    re-group here). Pass ``vecs`` (a cached hashed_unigram_vecs
    table) to skip re-featurizing; ``keep_cols`` names extra vec
    columns (e.g. the training label) to carry through, which lets a
    calibration pipeline skip a corpus-grain join back to the label."""
    if vecs is None:
        vecs = hashed_unigram_vecs(
            docs, None, n_buckets=n_buckets, text_col=text_col, id_col=id_col
        )
    return (
        vecs.crossJoin(_weights_row(weights))
        .select(
            F.col("doc").alias(id_col),
            *keep_cols,
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-_dot_w()))).alias("score"),
        )
    )


def url_canonicalize(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "url_canon",
    domain_col: str = "domain",
) -> DataFrame:
    """URL canonicalization, the normalize-before-dedup step of every
    web-corpus pipeline (C4 deduplicated at URL level; Common Crawl
    processing strips tracking decoration so syntactic variants of one
    page collapse): drop the #fragment, drop tracking parameters
    (utm_*, gclid, fbclid), drop a slash left dangling before the
    query or at the end, drop a leading www., and lowercase the
    scheme+host span (paths stay case-sensitive). Adds the canonical
    URL and its registered domain.

    All steps are chained regexp_replace + group-indexed
    regexp_extract — a map-only codegen projection, no shuffle. The
    patterns avoid lookahead (RE2 has none); the single capture-group
    REPLACEMENT (re-anchoring a dangling '&' after param removal) is
    spelled $1 in Java and \\1 in RE2 — an engine-portable oracle
    transliterates that one token and replays everything else
    verbatim.
    """
    c = F.col(url_col)
    c = F.regexp_replace(c, r"#.*$", "")  # fragment
    c = F.regexp_replace(c, r"[?&](utm_[a-z]+|gclid|fbclid)=[^&#]*", "")
    # a removed leading '?param' may leave '&next' dangling
    c = F.regexp_replace(c, r"^([^?]*)&", r"$1?")
    c = F.regexp_replace(c, r"/\?", "?")  # slash before query
    c = F.regexp_replace(c, r"/$", "")  # trailing slash
    # lowercase scheme+host BEFORE the www. strip so WWW. is caught too
    head = F.regexp_extract(c, r"^[a-zA-Z]+://[^/?]+", 0)
    c = F.concat(F.lower(head), F.substring(c, F.length(head) + 1, 1 << 30))
    c = F.regexp_replace(c, r"://www\.", "://")
    return df.withColumn(out_col, c).withColumn(
        domain_col, F.regexp_extract(F.col(out_col), r"://([^/?]+)", 1)
    )


FUNNEL_STAGES: "list[tuple[int, str, str]]" = [
    (1, "words", "ok_words"),
    (2, "mean_word_length", "ok_mwl"),
    (3, "alpha_fraction", "ok_alpha"),
    (4, "symbol_ratio", "ok_symbol"),
    (5, "stopwords", "ok_stop"),
]


def filter_funnel(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-stage attrition report for the Gopher quality-filter chain —
    the funnel table every production pretraining pipeline publishes
    (Dolma, RefinedWeb, FineWeb all report per-rule document attrition
    so threshold changes are reviewable). Each document is attributed
    to its FIRST failing rule in the fixed stage order, so stages
    compose: stage i's n_in is the survivors of stages < i.

    Returns one row per stage: (stage_idx, stage, n_in, n_dropped,
    n_out), ordered by stage_idx.

    Scale shape: one corpus scan computes the first-fail stage
    map-side (the gopher_rules narrow projection + a CASE chain), ONE
    count shuffle groups by stage (<= 6 distinct keys, full partial
    combine), and the funnel prefix sum runs over the <= 6-row count
    table — the established SinglePartition-over-metadata pattern
    (ntile offsets, dsir totals). Corpus-sized work is exactly the
    scan.
    """
    from pyspark.sql import Window as W

    g = gopher_rules(df, text_col, id_col)
    first_fail = F.lit(0)
    for idx, _, flag in reversed(FUNNEL_STAGES):
        first_fail = F.when(~F.col(flag), F.lit(idx)).otherwise(first_fail)
    counts = (
        g.select(first_fail.alias("stage_idx"))
        .groupBy("stage_idx")
        .agg(F.count(F.lit(1)).alias("n_dropped"))
        # both the per-stage join and the total fold read this <= 6-row
        # table; the eager checkpoint pins it so the corpus scans
        # exactly once (Catalyst does not reuse the exchange across the
        # two different parent aggregates)
        .localCheckpoint(eager=True)
    )
    # stage 0 = kept docs lives in the count table too, so the grand
    # total folds from it without touching the corpus again (coalesce:
    # sum over an EMPTY corpus is NULL, the oracle's count(*) is 0)
    total = counts.agg(
        F.coalesce(F.sum("n_dropped"), F.lit(0)).alias("total")
    )
    spark = df.sparkSession
    stages = spark.createDataFrame(
        [(i, name) for i, name, _ in FUNNEL_STAGES],
        "stage_idx int, stage string",
    )
    prior = W.orderBy("stage_idx").rowsBetween(W.unboundedPreceding, -1)
    return (
        stages.join(counts, "stage_idx", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "stage_idx",
            "stage",
            F.col("total"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
        )
        .select(
            "stage_idx",
            "stage",
            (
                F.col("total")
                - F.coalesce(F.sum("n_dropped").over(prior), F.lit(0))
            ).alias("n_in"),
            F.col("n_dropped"),
        )
        .withColumn("n_out", F.col("n_in") - F.col("n_dropped"))
        .orderBy("stage_idx")
    )


def cdc_chunk_structs(
    text_col: "str | Column", gram: int = 4, boundary_below: str = "2"
) -> Column:
    """Content-defined chunking (Rabin-style; the boundary idea behind
    FastCDC / LBFS): split the token stream wherever the rolling
    ``gram``-gram fingerprint's first md5 hex char is < ``boundary_below``
    (probability 2/16 -> ~8-word average chunks). Boundaries depend
    only on LOCAL content, so an edit reshapes at most the chunks
    around it — the invariance that makes CDC the storage/transfer
    dedup primitive (a shifted byte stream still mostly re-hashes to
    the same chunks, where fixed-size blocks all change).

    Returns array<struct<h: md5 of the chunk's tokens, len: words>>.
    Pure native expressions (no shuffle, no Python); the identical
    boundary rule replays in the SQL oracle.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(F.lower(c), " ")
    n = F.size(toks)
    # boundary AFTER token i when the gram ending at i fingerprints
    # under the mask; i stops at n-1 (a boundary at the last token
    # would make an empty tail chunk). sequence() descends when
    # start > stop, so short docs guard to the empty array.
    ends = F.when(
        n >= gram + 1,
        F.filter(
            F.sequence(F.lit(gram), n - 1),
            lambda i: F.substring(
                F.md5(F.concat_ws(" ", F.slice(toks, i - (gram - 1), gram))),
                1,
                1,
            )
            < boundary_below,
        ),
    ).otherwise(F.array().cast("array<int>"))
    bounds = F.concat(ends, F.array(n))
    starts = F.concat(F.array(F.lit(0)), ends)
    return F.zip_with(
        bounds,
        starts,
        lambda e, s: F.struct(
            F.md5(F.concat_ws(" ", F.slice(toks, s + 1, e - s))).alias("h"),
            (e - s).alias("len"),
        ),
    )


def cdc_chunk_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram: int = 4,
    boundary_below: str = "2",
) -> DataFrame:
    """Per-document CDC chunk report + cross-document duplicate-chunk
    detection: (id, n_chunks, avg_chunk_words, n_dup_chunks) where
    n_dup_chunks counts this doc's chunk instances whose hash occurs
    in >= 2 DISTINCT documents — sub-document duplication that
    doc-level fingerprints miss entirely.

    Scale shape: chunking is a map-side projection; duplicate
    detection is one posting-style count shuffle on chunk hash (the
    per-doc array_distinct + plain count trick — no count-distinct
    double exchange) followed by one explode-join keyed on the same
    hash. No pair explosion anywhere: hot chunks only ever carry
    their COUNT.
    """
    from dat_archive_map_reduce_spark.operators._util import eager_release, fan_out

    # the chunking projection (one md5 per rolling gram + one per
    # chunk, the operator's dominant compute) feeds BOTH the instance
    # explode and the distinct-doc hash counts; persist it so Catalyst
    # does not re-chunk the corpus for the second branch. fan_out
    # (r15): a single-split parquet input would run that md5 pass on
    # ONE core; no-op when the scan already has >= parallelism splits
    base = fan_out(df.select(id_col, text_col)).select(
        F.col(id_col),
        cdc_chunk_structs(text_col, gram, boundary_below).alias("chunks"),
    ).persist()
    inst = base.select(
        id_col, F.explode("chunks").alias("c")
    ).select(id_col, F.col("c.h").alias("h"), F.col("c.len").alias("clen"))
    docs_per_hash = (
        base.select(
            F.explode(
                F.array_distinct(F.transform("chunks", lambda c: c["h"]))
            ).alias("h")
        )
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("nd"))
    )
    out = (
        inst.join(docs_per_hash, "h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.round(F.avg("clen"), 4).alias("avg_chunk_words"),
            F.sum((F.col("nd") >= 2).cast("long")).alias("n_dup_chunks"),
        )
    )
    return eager_release(out, base)


def source_drift_kl(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source distribution drift: KL(P_source || P_corpus) over
    16 first-md5-hex-char token buckets (the dsir hashing idiom at
    coarser grain), add-1 smoothed — the monitoring signal a
    data pipeline tracks per snapshot/source to catch composition
    drift (train/serve skew, a crawler gone wrong, a source changing
    register) before it reaches training. Returns (source, n_tokens,
    kl_bits) with KL in bits, 6dp.

    Engine determinism: the 16 per-bucket KL terms fold in BUCKET
    ORDER via an ordered array fold (the cosine/BM25 fixed-order-sum
    recipe), so the float sum is bit-identical across engines and
    partitionings — never a shuffle-order sum of doubles.

    Scale shape: one tokenizing fact aggregation to (source, bucket)
    grain (partial combine; <= 16 rows per source survive), the
    corpus marginal folds from that same table, totals broadcast; the
    fold runs on <= 16-element arrays per source.
    """
    import math

    from dat_archive_map_reduce_spark.operators._util import fan_out

    buckets = (
        fan_out(docs.select(source_col, text_col))
        .select(
            F.col(source_col).alias("src"), tokens(text_col).alias("ts")
        )
        .select("src", F.explode_outer("ts").alias("tok"))
        .filter(F.col("tok").isNotNull() & (F.length("tok") > 0))
        .select("src", F.substring(F.md5("tok"), 1, 1).alias("b1"))
        .withColumn("bucket", F.conv(F.col("b1"), 16, 10).cast("int"))
        .groupBy("src", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    corpus = buckets.groupBy("bucket").agg(F.sum("c").alias("cc"))
    corpus_tot = corpus.agg(F.sum("cc").alias("n_all"))
    qmap = corpus.crossJoin(F.broadcast(corpus_tot)).agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(F.struct("bucket", F.col("cc")))
            )
        ).alias("qc"),
        F.first("n_all").alias("n_all"),
    )
    per_src = buckets.groupBy("src").agg(
        F.array_sort(F.collect_list(F.struct("bucket", "c"))).alias("pcs"),
        F.sum("c").alias("n_tok"),
    )
    # fold over ALL 16 bucket ids in order; missing buckets contribute
    # their smoothed mass too (p = 1/(n+16))
    idx = F.sequence(F.lit(0), F.lit(15))
    term = lambda acc, b, pc, qc, n_tok, n_all: acc + (  # noqa: E731
        ((pc + 1.0) / (n_tok + 16.0))
        * F.log(
            ((pc + 1.0) / (n_tok + 16.0)) / ((qc + 1.0) / (n_all + 16.0))
        )
    )
    # materialize the per-source bucket map ONCE as a column — built
    # inside the fold lambda it re-constructs 16 times per row
    joined = per_src.crossJoin(F.broadcast(qmap)).withColumn(
        "pmap", F.map_from_entries(F.col("pcs"))
    )
    pc_of = lambda b: F.coalesce(  # noqa: E731
        F.element_at(F.col("pmap"), b).cast("double"),
        F.lit(0.0),
    )
    qc_of = lambda b: F.coalesce(  # noqa: E731
        F.element_at(F.col("qc"), b).cast("double"), F.lit(0.0)
    )
    kl_nats = F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, b: term(
            acc, b, pc_of(b), qc_of(b), F.col("n_tok"), F.col("n_all")
        ),
    )
    return joined.select(
        F.col("src").alias(source_col),
        F.col("n_tok").cast("bigint").alias("n_tokens"),
        F.round(kl_nats / float(math.log(2.0)), 6).alias("kl_bits"),
    )


def rake_keyphrases(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_phrase_len: int = 3,
    k: int = 10,
) -> DataFrame:
    """RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free token runs (capped at
    ``max_phrase_len``); each word scores degree/frequency over the
    candidate-phrase co-occurrence graph (degree = summed lengths of
    phrases containing the word, frequency = occurrence count); a
    phrase scores the sum of its word scores. Returns the corpus
    top-k phrases by (6dp-rounded score, phrase) with occurrence
    counts.

    Scale shape (r15): phrase assembly is ROW-LOCAL — stopword-bounded
    runs fold over ONE document's token array (a higher-order
    ``aggregate`` whose accumulator is (finished runs, current run)),
    so candidate phrases cost ZERO shuffle where the pre-r15 form
    hash-partitioned and per-doc-sorted the full exploded token
    stream (running stopword-count window) and re-aggregated on
    (doc, phrase_id). The fold preserves the window form's semantics
    exactly: empty tokens drop before segmentation, runs keep token
    order, consecutive stopwords yield empty runs (filtered, like
    the oracle's empty phrase_id groups), and the max-length cap
    applies per run. The (phrase, plen, words) occurrence table
    persists once for its two consumers (word stats, phrase scores).
    Word stats partial-combine on the word grain and join back on
    word (fact-sized, vocabulary never broadcasts); the phrase score
    folds word scores in word order (ordered float sum — the
    KL/BM25 portability recipe); top-k plans as
    TakeOrderedAndProject."""
    from dat_archive_map_reduce_spark.operators._util import fan_out

    stop_list = ",".join(f"'{w}'" for w in STOPWORDS)
    base = fan_out(df.select(id_col, text_col)).select(
        F.col(id_col).alias("doc"),
        tokens(text_col).alias("ts"),
    )
    # ``ts`` stays a multi-reference attribute so CollapseProject
    # cannot inline split() into the fold (the shingle_sets trap);
    # explode_outer blocks the inferred non-empty filter that would
    # re-evaluate the whole fold expression under it. A doc that is
    # all stopwords/empty folds to zero runs -> explode_outer emits
    # one NULL words row, which both consumers' explode("words")
    # drops (explode of NULL emits nothing).
    ph = F.expr(
        f"""
        filter(
          aggregate(
            filter(ts, w -> length(w) > 0),
            named_struct('done', cast(array() as array<array<string>>),
                         'cur',  cast(array() as array<string>)),
            (acc, w) -> IF(w IN ({stop_list}),
                           named_struct('done', acc.done || array(acc.cur),
                                        'cur',  cast(array() as array<string>)),
                           named_struct('done', acc.done,
                                        'cur',  acc.cur || array(w))),
            acc -> acc.done || array(acc.cur)),
          p -> size(p) >= 1 AND size(p) <= {max_phrase_len})
        """
    )
    phrases = (
        base.select(F.explode_outer(ph).alias("words"))
        .select(
            F.array_join("words", " ").alias("phrase"),
            F.size("words").alias("plen"),
            "words",
        )
        .persist()
    )
    word_stats = (
        phrases.select("plen", F.explode("words").alias("w"))
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("plen").alias("degree"),
        )
        .withColumn("wscore", F.col("degree") / F.col("freq"))
    )
    # one aggregate on the phrase key: every occurrence of the same
    # phrase string has the same word multiset, so the per-occurrence
    # RAKE score = (ordered fold over ALL word rows) * plen / n_rows,
    # and n_occurrences = n_rows / plen — integer-exact, no second
    # (doc, phrase) shuffle
    scored = (
        phrases.select("phrase", "plen", F.explode("words").alias("w"))
        .join(word_stats, "w")
        .groupBy("phrase")
        .agg(
            (F.count(F.lit(1)) / F.max("plen")).cast("bigint").alias(
                "n_occurrences"
            ),
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("w", "wscore"))),
                    F.lit(0.0).cast("double"),
                    lambda acc, s: acc + s["wscore"],
                )
                * F.max("plen")
                / F.count(F.lit(1)),
                6,
            ).alias("score"),
        )
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("phrase"))
        .limit(k)
        .select("phrase", "n_occurrences", "score")
    )
