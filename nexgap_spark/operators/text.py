"""Text-analysis operators for LLM training-data pipelines (scale extension
per BASELINE.json north star): tokenization, quality scoring, language ID,
document fingerprinting.

All JVM-side (built-in functions over arrays) — no Python in the hot path, so
plans stay inside whole-stage codegen and scale linearly with input splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nexgap_spark.session import materialize

DEFAULT_STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is", "on", "for")

# Small marker lexicons for the n-gram/stopword language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is", "and", "of"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
    "zh": ("的", "是", "了", "在", "和"),
}


def tokenize(col: Column | str) -> Column:
    """Whitespace tokenization, deterministic across engines:
    trim then split on runs of whitespace."""
    return F.split(F.trim(F.col(col) if isinstance(col, str) else col), r"\s+")


def bpe_ish_token_count(col: Column | str) -> Column:
    """Token counting with a BPE-ish regex: split on word/number/punct-run
    boundaries — a cheap, deterministic proxy for subword token counts."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_extract_all(
        c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
    )
    return F.size(pieces)


def word_shingles(tokens: Column, n: int = 3, *, mapper=None) -> Column:
    """Word n-gram shingles from a token array (JVM-side transform over a
    sequence of start indices; element_at is 1-based). Empty array for
    documents shorter than n tokens (sequence() would descend otherwise).
    ``mapper`` (Column -> Column) is fused over each shingle inside the
    SAME transform — one array traversal, no intermediate shingle-string
    array (fingerprint passes F.md5).

    PASS A MATERIALIZED ATTRIBUTE, not an inline split(...) expression:
    higher-order-function lambdas get no common-subexpression elimination,
    so an inline token expression is re-evaluated per element × per n —
    O(tokens²) per document (the q28 sf1.0 blowup, 228 s → 4 s once the
    tokens were staged in their own projection)."""
    idx = F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    parts = lambda i: [F.element_at(tokens, i + j) for j in range(n)]  # noqa: E731
    one = (lambda i: F.concat_ws(" ", *parts(i))) if mapper is None else (
        lambda i: mapper(F.concat_ws(" ", *parts(i)))
    )
    return F.when(
        F.size(tokens) >= n, F.transform(idx, one)
    ).otherwise(F.array().cast("array<string>"))


def stopword_ratio(tokens: Column, stopwords: tuple[str, ...] = DEFAULT_STOPWORDS) -> Column:
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(tokens, lambda x: F.array_contains(sw, x)))
    return hits / F.greatest(F.size(tokens), F.lit(1))


def quality_features(
    df: DataFrame,
    *,
    text_col: str = "text",
    stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
) -> DataFrame:
    """Quality-scoring features per document: token count, mean token length,
    punctuation ratio, stopword ratio, and a keep/drop flag — the standard
    pre-training filter set, fully codegen'd."""
    toks = tokenize(text_col)
    n_tokens = F.size(toks)
    # Sum of token lengths == count of non-whitespace chars: a codegen'd
    # regex instead of an array fold (array HOFs are interpreted per element
    # and serialize this, the hottest projection of the filter pipeline).
    tok_chars = F.length(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", ""))
    avg_tok_len = F.when(
        n_tokens > 0, tok_chars.cast("double") / n_tokens
    ).otherwise(F.lit(0.0))
    punct_ratio = (
        F.length(F.regexp_replace(F.col(text_col), r"[^!-/:-@\[-`{-~]", ""))
        / F.greatest(F.length(F.col(text_col)), F.lit(1))
    )
    sw_ratio = stopword_ratio(toks, stopwords)
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("avg_token_len", avg_tok_len)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio", sw_ratio)
        .withColumn(
            "quality_ok",
            (n_tokens >= min_tokens) & (n_tokens <= max_tokens) & (sw_ratio > 0),
        )
    )


def language_id(
    df: DataFrame,
    *,
    text_col: str = "text",
    markers: dict[str, tuple[str, ...]] | None = None,
    out_col: str = "pred_lang",
) -> DataFrame:
    """Marker-lexicon language ID: count marker hits per language and take
    the argmax (ties broken by language-code order, deterministic).

    Space-delimited languages score by whole-token equality; CJK marker
    sets (single chars, no whitespace segmentation in the source text)
    score by substring occurrence — token equality would be dead code for
    Chinese, whose whole sentence is one "token". Zero hits everywhere →
    'und' (unknown), never an arbitrary alphabetically-first language.
    A real deployment swaps the lexicons for char-n-gram profiles; the
    dataflow (per-row scoring, no shuffle) is identical."""
    markers = markers or LANG_MARKERS
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = tokenize(text_col)
    langs = sorted(markers)
    score_cols = []
    for lang in langs:
        if all(ord(ch) > 0x2E80 for m in markers[lang] for ch in m):
            # CJK: substring-occurrence count via char-length delta,
            # normalized by marker length so a multi-char marker ('です')
            # scores 1 per occurrence, not len(marker). The branch guard
            # checks EVERY char — a mixed marker ('的s') belongs to the
            # whole-token branch, where its ASCII tail is meaningful.
            hits = None
            for m in markers[lang]:
                h = (
                    (F.length(c) - F.length(F.replace(c, F.lit(m)))) / F.lit(len(m))
                ).cast("long")
                hits = h if hits is None else hits + h
        else:
            arr = F.array(*[F.lit(m) for m in markers[lang]])
            # long, matching the CJK branch: the per-language score structs
            # live in one array, whose element type must be uniform
            hits = F.size(F.filter(toks, lambda x: F.array_contains(arr, x))).cast("long")
        score_cols.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # argmax: sort by (hits desc, lang asc) → first. array_sort on structs
    # sorts ascending by field order, so negate hits.
    scored = F.transform(
        F.array(*score_cols),
        lambda s: F.struct((-s["hits"]).alias("neg"), s["lang"].alias("lang")),
    )
    best = F.element_at(F.array_sort(scored), 1)
    pred = F.when(best["neg"] == 0, F.lit("und")).otherwise(best["lang"])
    return df.withColumn(out_col, pred).withColumn(out_col + "_hits", -best["neg"])


def term_counts(
    df: DataFrame,
    *,
    text_col: str = "text",
    term_col: str = "term",
    cnt_col: str = "cnt",
) -> DataFrame:
    """Corpus term frequencies: tokenize → explode → count. The explode
    multiplies rows by tokens-per-doc BEFORE the shuffle, but the groupBy
    partial-aggregates map-side, so the exchange carries only distinct terms
    per partition — the natural-language Zipf head compresses hard."""
    tok = F.explode(tokenize(text_col)).alias(term_col)
    return (
        df.select(tok)
        .filter(F.length(term_col) > 0)
        .groupBy(term_col)
        .agg(F.count("*").alias(cnt_col))
    )


def tfidf(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
    share_tf: bool = True,
) -> DataFrame:
    """Per-(doc, term) TF-IDF: tf × ln((N+1)/(df+1)), the smoothed variant.

    One explode + two aggregations. The term-level document frequency is a
    groupBy on term (Zipf-compressed after map-side combine) that joins
    back broadcast by default — a natural-language vocabulary is
    millions of rows at most. Set ``broadcast_vocab=False`` for corpora
    whose distinct-term set is itself corpus-scale (web crawls full of
    typos/URLs/ids): the hint would ram that into the 8 GB broadcast
    limit, while the unhinted join lets AQE pick from actual sizes (its
    runtime conversion costs one extra shuffle-write of tf, which is why
    the hint stays the default for the common case). N comes from a 1-row
    aggregate cross-joined (broadcast) rather than a driver collect, so
    the plan stays fully lazy/distributed.

    ``share_tf=True`` (r17) materializes the tf frame once: the lazy plan
    computed the ENTIRE scan→tokenize→explode→tf-aggregate chain TWICE —
    once for the probe side, once below dfreq's broadcast (the two
    subtrees differ by join-pushed predicates, so neither canonical
    subtree equality nor AQE stage reuse bridges them; q62's before plan
    shows 3 scans and 2 independent explode chains). The aggregate keeps
    its map-side partial (the exchange carries the partially-deduped
    (id, term) stream, which on long repetitive documents is a large
    compression — measured at sf1.0, where docs are 13.7× the characters
    of sf0.1, an id-keyed pre-aggregate repartition that shuffles the RAW
    token stream was ~25% slower end to end); the tf output is then
    repartitioned by ``id_col`` and checkpointed, which (a) pins the
    materialized width to defaultParallelism (the q31 lesson: a
    checkpoint otherwise freezes AQE's 1-partition coalesce of a
    small-looking exchange and serializes every consumer) and (b) lets a
    downstream ``Window.partitionBy(id_col)`` (q62's rank) run with NO
    further exchange of the tf stream, since the broadcast joins preserve
    probe-side partitioning. Doc-keyed partitioning is skew-safe
    (documents are bounded; Zipf-hot TERMS never key a shuffle here —
    dfreq still two-level-aggregates over the materialized tf)."""
    toks = df.select(
        id_col, F.explode(tokenize(text_col)).alias("term")
    ).filter(F.length("term") > 0)
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    if share_tf:
        from nexgap_spark.session import adaptive_width, materialize

        # width from the corpus size estimate, not raw core count (r18):
        # at scale the two agree; on toy inputs the core-wide pin was pure
        # scheduling overhead (the 8-vs-32-core finding)
        tf = materialize(tf.repartition(adaptive_width(df), F.col(id_col)))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    return (
        tf.join(F.broadcast(dfreq) if broadcast_vocab else dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf") * F.log((F.col("n_docs") + 1) / (F.col("df") + 1)),
        )
        .select(id_col, "term", "tf", "score")
    )


def length_zscore(
    df: DataFrame,
    *,
    group_col: str = "lang",
    value_col: str = "n_chars",
    out_col: str = "z",
) -> DataFrame:
    """Per-group z-score of a numeric column (outlier scoring for corpus
    length filters). Group moments come from a groupBy + broadcast join back
    rather than two window passes: the aggregate side is tiny (one row per
    group) and the fact side never re-shuffles.

    The join is null-safe: rows with a NULL group value (imperfect language
    ID upstream is common) keep their row with z computed against the NULL
    group's own moments — an inner equi-join would silently DROP them,
    shrinking the corpus instead of scoring it. Singleton groups get a NULL
    z (stddev of one value is undefined)."""
    stats = df.groupBy(group_col).agg(
        F.avg(value_col).alias("_mu"),
        F.stddev_samp(value_col).alias("_sd"),
    ).withColumnRenamed(group_col, "_grp")
    joined = df.join(
        F.broadcast(stats), F.col(group_col).eqNullSafe(F.col("_grp"))
    )
    z = (F.col(value_col) - F.col("_mu")) / F.col("_sd")
    return joined.withColumn(out_col, z).drop("_grp", "_mu", "_sd")


def fingerprint(
    df: DataFrame,
    *,
    text_col: str = "text",
    shingle_n: int = 3,
    out_col: str = "fingerprint",
) -> DataFrame:
    """Document fingerprint: the minimum md5 over word n-gram shingles of the
    normalized text (winnowing-style min-hash selection). Near-identical
    documents collide; robust to local edits away from the minimal shingle.

    The normalized text and token array are materialized in their OWN
    projection before the shingle transform. Higher-order-function lambdas
    get no common-subexpression elimination, so inlining ``split(...)``
    makes every ``element_at`` re-split the whole document PER SHINGLE
    ELEMENT — O(tokens²) per doc. That was q28's sf1.0 blowup: ~5 ms/doc,
    228 s for 50k docs; with tokens as a plain attribute the walk is
    O(tokens) and the same input fingerprints in ~1 s. (CollapseProject
    keeps the split un-inlined because the alias is referenced more than
    once and split is non-cheap.) The md5 is fused into the shingle
    transform — one array traversal, no intermediate shingle-string
    array."""
    norm_c, toks_c = f"_{out_col}_norm", f"_{out_col}_toks"
    while norm_c in df.columns or toks_c in df.columns:
        # never shadow (and then silently drop) a user column (r13 review)
        norm_c, toks_c = norm_c + "_", toks_c + "_"
    staged = df.withColumn(
        norm_c, F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    ).withColumn(toks_c, F.split(F.col(norm_c), " "))
    toks = F.col(toks_c)
    sh_md5 = word_shingles(toks, shingle_n, mapper=F.md5)
    fp = F.when(F.size(toks) >= shingle_n, F.array_min(sh_md5)).otherwise(
        F.md5(F.col(norm_c))
    )
    return staged.withColumn(out_col, fp).drop(norm_c, toks_c)


def ngram_logprob(
    docs: DataFrame,
    train: DataFrame | None = None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: float = 0.5,
    broadcast_model: bool = True,
) -> DataFrame:
    """CCNet-style LM quality signal: per-document mean log-probability of
    its word bigrams under an add-k-smoothed bigram MLE trained on
    ``train`` (default: the scored corpus itself). Low scores flag the
    boilerplate/gibberish tail a perplexity filter drops; unlike the
    surface heuristics in quality_features this is a distributional
    signal — a doc can have perfect punctuation ratios and still be
    word salad.

    logp(w2|w1) = ln((C(w1,w2) + k) / (C(w1) + k·V)); unseen bigrams and
    unseen left contexts degrade to the smoothing floor rather than -inf.
    Scoring counts bigram INSTANCES (no distinct — repetition is signal
    here, the opposite of the dedup shingle contract). Docs with < 2
    tokens (or NULL text) score NULL with n_bigrams = 0 and survive —
    scoring must not drop rows.

    Scale shape: training is two hash aggregations over (w1, w2) / (w1)
    pairs; scoring joins the doc bigram stream against the model. With
    ``broadcast_model`` (default) both count tables broadcast — right for
    the usual vocabulary ≪ corpus regime; at web-crawl vocabulary scale
    set it False and the join shuffles on the (Zipf-skewed) word keys —
    pair it with skew.salted_join if a stopword context dominates."""
    from nexgap_spark.session import fan_out_python_stage

    train = docs if train is None else train

    def bigram_instances(df: DataFrame, cols: list[str]) -> DataFrame:
        # fan_out (r18) replaces the unconditional repartition(cores): an
        # already-wide corpus scan skips the full-text round-robin shuffle
        # outright, and narrow toy scans get an input-size-derived width
        # instead of core-count micro-tasks
        base = (
            fan_out_python_stage(df)
            .select(*cols, tokenize(text_col).alias("_t"))
            .filter(F.size("_t") >= 2)
        )
        idx = base.select(
            *cols,
            F.col("_t"),
            F.explode(F.sequence(F.lit(1), F.size("_t") - 1)).alias("_i"),
        )
        return idx.select(
            *cols,
            F.element_at("_t", F.col("_i")).alias("w1"),
            F.element_at("_t", F.col("_i") + 1).alias("w2"),
        )

    tb = bigram_instances(train, [])
    # ONE corpus scan: c2 is the only aggregate that needs the raw bigram
    # stream; c1 = Σ_w2 c2 and the vocabulary = distinct words over c2's
    # keys (every training word appears in some bigram position), so both
    # derive from the (vastly smaller) count table. localCheckpoint
    # materializes c2 once — the eager vocabulary count below would
    # otherwise re-run the tokenize+explode lineage, and c1/scoring again.
    c2 = (
        materialize(tb.groupBy("w1", "w2").agg(F.count("*").alias("_c2")))
    )
    c1 = c2.groupBy("w1").agg(F.sum("_c2").alias("_c1"))
    v = c2.select("w2").union(c2.select("w1")).distinct().count()
    if broadcast_model:
        c2, c1 = F.broadcast(c2), F.broadcast(c1)
    sb = bigram_instances(docs, [id_col])
    logp = F.log(
        (F.coalesce("_c2", F.lit(0)) + F.lit(add_k))
        / (F.coalesce("_c1", F.lit(0)) + F.lit(add_k) * F.lit(v))
    )
    scored = (
        sb.join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.avg(logp).alias("avg_logprob"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.col("avg_logprob"),
        )
    )
