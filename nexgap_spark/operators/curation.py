"""Training-corpus curation operators: benchmark decontamination, PII
scanning/redaction, repetition (boilerplate) detection, deterministic
train/val/test splits, and concat-and-chunk sequence packing.

These are extensions beyond the reference — standard dataset-preparation
steps a pre-training pipeline runs after dedup/quality filtering (filter →
dedup → decontaminate → split → pack); the reference has no corpus-curation
stage, so there is no file:line to cite. All hot paths are JVM-codegen
expressions; nothing here drops to Python row-at-a-time.

Scale notes (100 TB corpus, 1000 executors):
  * decontamination joins the corpus against a BENCHMARK n-gram set that is
    tiny (benchmarks are MBs) — we broadcast the gram set so the corpus
    never shuffles on gram; the only shuffle is the per-doc overlap count.
  * repetition features are fully row-local (array ops on the doc's own
    shingles) — zero shuffles, scales linearly.
  * split assignment is a pure projection on an md5 of the key — no RNG, no
    shuffle, reproducible across engines and runs.
  * packing shuffles once per (part_col) to lay out the running token sum;
    chunk ids are then a projection. Chunk semantics are concatenate-then-
    chunk (GPT-style): a document straddling a boundary belongs to the
    chunk where it starts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nexgap_spark.operators.text import tokenize

# Engine-portable PII regexes (same semantics under Java regex and RE2):
# character classes + bounded quantifiers only, no lookaround. The (?i)
# inline flag works in both engines — real emails are routinely mixed-case
# and a lowercase-only pattern would ship 'John.Doe@Gmail.COM' through
# redaction unmatched.
EMAIL_RE = r"(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,10}"
IPV4_RE = r"([0-9]{1,3}\.){3}[0-9]{1,3}"


# ---------------------------------------------------------------------------
# Decontamination — n-gram overlap against a benchmark/eval set
# ---------------------------------------------------------------------------


def benchmark_ngrams(
    benchmark: DataFrame, *, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct word n-grams of the benchmark set → one `gram` column.
    Distinct is cheap here (the benchmark side is small by construction).

    The shingle stream is taken UN-deduped and distinct'd once on the
    gram alone (r17): the previous default-distinct call deduped on
    (_bid, shingle) — with the constant _bid that is the same key set —
    and then distinct'd again on gram, paying two full exchanges of the
    benchmark gram stream for one dedup's worth of work."""
    from nexgap_spark.operators.dedup import shingle_table

    grams = shingle_table(
        benchmark.select(F.lit(0).alias("_bid"), F.col(text_col)),
        id_col="_bid",
        text_col=text_col,
        shingle_n=n,
        distinct=False,
    )
    return grams.select(F.col("shingle").alias("gram")).distinct()


def contamination_scores(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-document benchmark contamination: how many of the doc's distinct
    n-grams appear verbatim in the benchmark set (the GPT-3-style 13-gram
    decontamination check, parameterized to ``n``).

    Returns (id_col, n_grams, n_overlap, overlap_frac). Docs shorter than
    ``n`` tokens have n_grams=0 and overlap_frac=0.0.

    Plan shape: corpus-side explode → broadcast hash join against the gram
    set → single groupBy(id) count. The corpus is never shuffled on gram.
    """
    from nexgap_spark.operators.dedup import shingle_table

    doc_grams = shingle_table(docs, id_col=id_col, text_col=text_col, shingle_n=n)
    bench = benchmark_ngrams(benchmark, text_col=text_col, n=n)
    joined = doc_grams.join(
        F.broadcast(bench.withColumn("_bhit", F.lit(1))),
        doc_grams["shingle"] == bench["gram"],
        how="left",
    )
    scored = joined.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_grams"),
        F.sum(F.coalesce(F.col("_bhit"), F.lit(0))).cast("long").alias("n_overlap"),
    )
    # Docs shorter than n tokens produce no shingles; restore them with
    # zero counts so the score relation covers every input document.
    return (
        docs.select(id_col)
        .join(scored, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_overlap", F.lit(0).cast("long")).alias("n_overlap"),
            F.round(
                F.coalesce("n_overlap", F.lit(0).cast("long"))
                / F.greatest(F.coalesce("n_grams", F.lit(0)), F.lit(1)),
                6,
            ).alias("overlap_frac"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    max_overlap: int = 0,
) -> DataFrame:
    """Drop documents whose benchmark n-gram overlap exceeds ``max_overlap``
    (default: any verbatim n-gram shared with the benchmark evicts)."""
    scores = contamination_scores(
        docs, benchmark, id_col=id_col, text_col=text_col, n=n
    )
    clean_ids = scores.filter(F.col("n_overlap") <= max_overlap).select(id_col)
    return docs.join(clean_ids, on=id_col, how="left_semi")


# ---------------------------------------------------------------------------
# PII scanning / redaction
# ---------------------------------------------------------------------------


def pii_counts(text: Column) -> dict[str, Column]:
    """Match counts per PII class for a text column (codegen'd regex)."""
    return {
        "n_emails": F.regexp_count(text, F.lit(EMAIL_RE)),
        "n_phones": F.regexp_count(text, F.lit(PHONE_RE)),
        "n_ips": F.regexp_count(text, F.lit(IPV4_RE)),
    }


def pii_scan(
    df: DataFrame, *, text_col: str = "text", redact: bool = True
) -> DataFrame:
    """Per-row PII match counts (+ optionally a redacted text column where
    each match is replaced by a typed placeholder). Pure projection — no
    shuffle, scales with the scan."""
    text = F.col(text_col)
    out = df
    for name, col in pii_counts(text).items():
        out = out.withColumn(name, col)
    if redact:
        red = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
        red = F.regexp_replace(red, PHONE_RE, "<PHONE>")
        red = F.regexp_replace(red, IPV4_RE, "<IP>")
        out = out.withColumn("redacted", red)
    return out


# ---------------------------------------------------------------------------
# Repetition / boilerplate detection (Gopher-style duplicate n-gram fraction)
# ---------------------------------------------------------------------------


def repetition_features(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """Duplicate n-gram fraction per document for each n in ``ns``:
    1 - distinct_ngrams/total_ngrams (0.0 for docs shorter than n).

    Built as ONE explode(sequence) + element_at gram stream feeding a hash
    aggregate — the whole path stays in whole-stage codegen. (The obvious
    row-local formulation, transform()+array_distinct per row, is 30×
    slower because array-lambda HOFs are interpreted per element.) The
    stream carries one row per token position with a gram column per n;
    cost is one shuffle of (id, gram) keyed by id.
    """
    from nexgap_spark.session import fan_out_python_stage

    min_n = min(ns)
    base = (
        fan_out_python_stage(df)
        .select(F.col(id_col).alias("_rid"), tokenize(text_col).alias("_toks"))
        .filter(F.size("_toks") >= min_n)
    )
    idx = base.select(
        "_rid",
        "_toks",
        F.size("_toks").alias("_sz"),
        F.explode(
            F.sequence(F.lit(1), F.size("_toks") - (min_n - 1))
        ).alias("_i"),
    )
    gram_cols = []
    for n in ns:
        parts = [F.element_at("_toks", F.col("_i") + j) for j in range(n)]
        gram = F.when(
            F.col("_i") <= F.col("_sz") - (n - 1), F.concat_ws(" ", *parts)
        )
        gram_cols.append(gram.alias(f"_g{n}"))
    stream = idx.select("_rid", *gram_cols)
    aggs = []
    for n in ns:
        aggs.append(F.count(f"_g{n}").alias(f"_tot{n}"))
        # size(collect_set) not count_distinct: a multi-column distinct
        # aggregate plans Expand (one stream copy per distinct column) plus
        # a second exchange to resolve distinctness. collect_set partial-
        # aggregates map-side — all of a doc's positions sit in one
        # partition after explode, so the shuffle moves ONE set row per
        # doc instead of the multiplied gram stream. Set size is bounded
        # by tokens-per-document, so executor memory is safe at any corpus
        # scale.
        aggs.append(F.size(F.collect_set(f"_g{n}")).alias(f"_dis{n}"))
    stats = stream.groupBy("_rid").agg(*aggs)
    out = df.join(stats, df[id_col] == stats["_rid"], how="left")
    for n in ns:
        frac = F.when(
            F.col(f"_tot{n}") > 0,
            F.round(
                1.0 - F.col(f"_dis{n}") / F.col(f"_tot{n}").cast("double"), 6
            ),
        ).otherwise(F.lit(0.0))
        out = out.withColumn(f"dup_{n}gram_frac", frac)
    drop = ["_rid"] + [c for n in ns for c in (f"_tot{n}", f"_dis{n}")]
    return out.drop(*drop)


# ---------------------------------------------------------------------------
# Deterministic train/val/test split
# ---------------------------------------------------------------------------


def _hex_cut(frac: float) -> str:
    """Cumulative fraction → 4-hex-digit cutoff in md5-prefix space."""
    return format(min(int(frac * 65536), 65535), "04x")


def split_assign(
    df: DataFrame,
    *,
    key_col: str,
    weights: dict[str, float] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by md5(key) prefix — deterministic,
    engine-portable (same rows land in the same split in any system that can
    compute md5), stable under reruns and data growth. No RNG, no shuffle.

    ``weights`` maps split name → fraction (must sum to ≤ 1; any remainder
    falls into the last split).
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    names = list(weights)
    h = F.substring(F.md5(F.col(key_col).cast("string")), 1, 4)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name]
        cond = h < F.lit(_hex_cut(acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, expr)


def split_cut_sql(weights: dict[str, float], key_expr: str) -> str:
    """The DuckDB-side CASE expression mirroring :func:`split_assign` —
    kept next to the operator so oracle SQL can't drift."""
    names = list(weights)
    acc = 0.0
    branches = []
    for name in names[:-1]:
        acc += weights[name]
        branches.append(
            f"WHEN substr(md5(CAST({key_expr} AS VARCHAR)), 1, 4) < '{_hex_cut(acc)}' THEN '{name}'"
        )
    return "CASE " + " ".join(branches) + f" ELSE '{names[-1]}' END"


def leakage_safe_split(
    df: DataFrame,
    groups: DataFrame,
    *,
    key_col: str = "doc_id",
    group_col: str = "group_id",
    weights: dict[str, float] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """:func:`split_assign`, but the hash key is the near-dup GROUP id —
    so every member of a duplicate cluster lands in the SAME split.

    Per-document split assignment leaks through near-duplicates: a test
    document's near-copy has ~train_fraction probability of landing in
    train, which is exactly the contamination channel dedup exists to
    close (and the reason benchmark decontamination pipelines cluster
    before they split). ``groups`` is a (key, group) membership — e.g.
    ``dedup.dup_groups`` output — covering only clustered documents;
    absent keys are singletons and hash their own key, which keeps the
    assignment IDENTICAL to plain split_assign for them (adding documents
    or discovering new dup pairs never reshuffles untouched singletons).

    One broadcast-sized left join + the same no-shuffle md5 bucketing as
    split_assign; at 100 TB the membership side is the dedup stack's
    (already key-sized) group table.

    ``df`` must not already carry ``group_col`` — the join would make the
    coalesce ambiguous and which membership wins would be silent; rejected
    explicitly (drop or rename the column, or pass that mapping AS
    ``groups``). The temp key avoids shadowing by construction.

    ``groups`` is collapsed to ONE row per key before the join (r14
    review): a duplicate (key) membership row would otherwise fan out
    through the left join and silently duplicate input rows, corrupting
    every downstream count. A key claimed by two DIFFERENT groups keeps
    the lexicographically least group id — deterministic, and a key-sized
    map-side-combinable aggregate, not a row-order-dependent
    dropDuplicates."""
    if group_col in df.columns:
        raise ValueError(
            f"input already has a {group_col!r} column; drop/rename it, or "
            f"pass df.select({key_col!r}, {group_col!r}) as `groups` instead"
        )
    tmp = "_split_key"
    while tmp in df.columns:
        tmp += "_"
    one_per_key = (
        groups.select(key_col, group_col)
        .groupBy(key_col)
        .agg(F.min(group_col).alias(group_col))
    )
    keyed = df.join(one_per_key, key_col, "left")
    keyed = keyed.withColumn(tmp, F.coalesce(F.col(group_col), F.col(key_col)))
    out = split_assign(keyed, key_col=tmp, weights=weights, out_col=out_col)
    return out.drop(tmp)


# ---------------------------------------------------------------------------
# Sequence packing (concatenate-and-chunk)
# ---------------------------------------------------------------------------


def pack_chunks(
    df: DataFrame,
    *,
    token_col: str,
    order_col: str,
    part_cols: list[str] | None = None,
    budget: int = 2048,
    out_col: str = "chunk_id",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Assign each document to a fixed-token-budget training chunk using
    concatenate-then-chunk semantics: within each partition group (ordered
    deterministically by ``order_col``) documents are laid end-to-end and the
    stream is cut every ``budget`` tokens; a document belongs to the chunk
    where it STARTS. chunk_id = floor(running_tokens_before / budget).

    Determinism requires a TOTAL order: pass ``tiebreak_cols`` when
    ``order_col`` can repeat (e.g. a timestamp) — tied rows otherwise have
    no defined window order, so chunk ids can differ between runs and even
    between task retries within one job.

    One shuffle (the window partition); chunk assignment itself is a
    projection. At 100 TB, partition by shard/source so no single window
    partition exceeds an executor.
    """
    part_cols = part_cols or []
    order = [F.col(order_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn(out_col, F.floor(before / F.lit(budget)).cast("long"))


def chunk_text(
    df: DataFrame,
    *,
    text_col: str = "text",
    max_tokens: int = 128,
    overlap: int = 0,
    out_prefix: str = "chunk",
) -> DataFrame:
    """Sliding-window chunking: split each document's token stream into
    windows of ``max_tokens`` tokens advancing by ``stride = max_tokens -
    overlap`` — the context-window chunking step of a pretraining/RAG
    pipeline (pack_chunks assigns whole docs to budgets; this splits WITHIN
    a document). One output row per (doc, window): ``{prefix}_idx`` (0-based),
    ``{prefix}_text`` (tokens re-joined with single spaces), ``{prefix}_n``
    (tokens in the window).

    Window starts are 0, stride, 2·stride, … while start < n_tokens; an
    empty/blank document yields one empty chunk (row-count preservation —
    downstream joins back to the doc table must not silently lose docs).
    The last window may be shorter than ``max_tokens`` (it is kept even when
    the previous window's overlap already covers its tokens — the standard
    fixed-stride contract, which keeps chunk boundaries a pure function of
    position so reruns and distributed retries agree).

    Pure JVM expression chain (tokenize → sequence → explode → slice →
    array_join): no Python, no shuffle — chunking is row-local, and the
    explode multiplies rows by ceil(n/stride), which is the output's true
    size. At 100 TB: runs in the scan stage, pairs with split_assign /
    pack_chunks downstream.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    # NULL text must take the n<=0 one-empty-chunk path, not vanish: under
    # ANSI, size(NULL)=NULL -> sequence(0, NULL)=NULL -> explode emits 0 rows.
    toks = F.coalesce(tokenize(text_col), F.array().cast("array<string>"))
    n = F.size(toks)
    # number of window starts: 1 + floor((n-1)/stride) for n >= 1, else 1
    n_chunks = F.when(n <= 0, F.lit(1)).otherwise(
        F.lit(1) + F.floor((n - 1) / F.lit(stride))
    )
    idx = F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int")))
    out = df.withColumn("_toks", toks).withColumn(f"{out_prefix}_idx", idx)
    window = F.slice(
        F.col("_toks"), F.col(f"{out_prefix}_idx") * stride + 1, max_tokens
    )
    return (
        out.withColumn(f"{out_prefix}_text", F.array_join(window, " "))
        .withColumn(f"{out_prefix}_n", F.size(window).cast("long"))
        .drop("_toks")
    )


# Tracking-param identification is KEY-based (the part before '='), not
# whole-token: a prefix match on 'key=value' would silently strip
# legitimate params whose names merely start with a tracking name
# ('gclid2=1', 'ref_src_custom=x'), conflating genuinely distinct URLs.
# Opaque click ids match their key exactly; only the open-ended 'utm_'
# family is a key-prefix match.
TRACKING_PARAM_KEYS: tuple[str, ...] = (
    "gclid", "fbclid", "msclkid", "mc_eid", "igshid", "ref_src",
)
TRACKING_PARAM_PREFIXES: tuple[str, ...] = ("utm_",)


def canonical_url(col: Column | str) -> Column:
    """Crawl-dedup URL canonicalization, entirely as engine-portable
    string/array expressions (no parse_url — its per-engine edge cases
    would break oracle parity):

    1. strip the fragment (everything from the first '#');
    2. lowercase the scheme://host prefix (path/query case preserved);
    3. drop tracking query params (key in TRACKING_PARAM_KEYS, or key
       prefixed by TRACKING_PARAM_PREFIXES), SORT the
       survivors (param order is presentation, not identity), rejoin;
    4. drop an empty trailing '?'.

    Two crawls of ``HTTPS://Example.com/a?utm_source=x&b=2&a=1#top`` and
    ``https://example.com/a?a=1&b=2`` canonicalize identically — exact
    dedup on the canonical form then collapses them.

    Per URL this is exactly TWO regex evaluations — the scheme://host
    match and the anchored one-pass tracking strip
    ``(?:^|&)(?:utm_…|opaque-key)(?:=[^&]*)?(?=&|$)`` — with the
    fragment strip, query split and prefix removal done by plain
    ``substring_index``/``substr``/``concat`` and the per-token empty
    filter by ``array_remove`` (builtin, not an interpreted lambda).
    The q104 oracle's list_filter form stays the semantic witness,
    hash-checked every round, and tests/test_properties.py pins the
    contract against a pure-Python model on an adversarial corpus. The
    key-boundary lookahead is what keeps 'gclid2=1' alive while
    'gclid'/'gclid=x' strip: after an opaque key the next char must be
    '=', '&' or end.

    This Column form is for COMPOSABILITY (one expression, usable in any
    select). On a hot path prefer :func:`with_canonical_url` — Catalyst
    inlines this nested expression into every downstream use, so the
    head regex gets re-evaluated many times per row; the staged twin is
    ~3× faster at 750 k URLs (see its docstring)."""
    u = F.col(col) if isinstance(col, str) else col
    u0 = F.substring_index(u, "#", 1)                          # 1
    head = F.regexp_extract(u0, r"^([^:/?#]+://[^/?#]*)", 1)   # scheme://host
    # head='' → lower('') || substr(u0, 1) IS u0: no branch needed
    u1 = F.concat(F.lower(head), F.substr(u0, F.length(head) + F.lit(1)))  # 2
    base = F.substring_index(u1, "?", 1)
    # no '?' → substr past the end is '' — exactly the empty query
    q = F.substr(u1, F.length(base) + F.lit(2))
    keys = "|".join(TRACKING_PARAM_KEYS)
    prefixes = "|".join(p + "[^=&]*" for p in TRACKING_PARAM_PREFIXES)
    q = F.regexp_replace(
        q, f"(?:^|&)(?:{prefixes}|(?:{keys}))(?:=[^&]*)?(?=&|$)", ""
    )                                                          # 3a: strip
    # '' tokens (strip leftovers, '&&', leading '&') drop via array_remove
    params = F.array_sort(F.array_remove(F.split(q, "&"), ""))  # 3b
    qs = F.array_join(params, "&")
    return F.when(qs == "", base).otherwise(F.concat(base, F.lit("?"), qs))  # 4


def with_canonical_url(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    """Staged twin of :func:`canonical_url` — value-identical (the
    adversarial property corpus in tests/test_properties.py checks both
    forms against the same pure-Python model), but each intermediate
    lives in its OWN projection. This matters enormously for throughput:
    a single nested Column expression gets inlined by Catalyst into
    every downstream use (CollapseProject inlines an alias that is cheap
    or used once; the final tree re-evaluates the scheme://host regex
    ~16× per row), while staged withColumns keep the non-cheap,
    multiply-referenced intermediates materialized once per row.
    Measured at 750 k URLs: 0.57 s vs 1.89 s for the q104 dedup.

    Two branch eliminations keep the stages total-function (no CASE
    duplicating its operands): a failed head match means head='' and
    ``lower('') || substr(u0, 1)`` IS u0; a missing '?' makes
    ``substr(u1, length(u1)+2)`` the empty string, which is exactly the
    empty query."""
    keys = "|".join(TRACKING_PARAM_KEYS)
    prefixes = "|".join(p + "[^=&]*" for p in TRACKING_PARAM_PREFIXES)
    # stage-name collision guard (ADVICE r8): suffix until none of the six
    # temp names shadows an existing input column
    stems = ("_cu_u0", "_cu_head", "_cu_u1", "_cu_base", "_cu_q", "_cu_qs")
    suffix = ""
    existing = set(df.columns)
    while any(s + suffix in existing for s in stems):
        suffix += "x"
    u0, head, u1, base, q, qs = (s + suffix for s in stems)
    df = df.withColumn(u0, F.substring_index(F.col(url_col), "#", 1))
    df = df.withColumn(head, F.regexp_extract(u0, r"^([^:/?#]+://[^/?#]*)", 1))
    df = df.withColumn(
        u1, F.concat(F.lower(head), F.substr(u0, F.length(head) + F.lit(1)))
    )
    df = df.withColumn(base, F.substring_index(u1, "?", 1))
    df = df.withColumn(q, F.substr(u1, F.length(base) + F.lit(2)))
    df = df.withColumn(
        qs,
        F.array_join(
            F.array_sort(
                F.array_remove(
                    F.split(
                        F.regexp_replace(
                            q,
                            f"(?:^|&)(?:{prefixes}|(?:{keys}))(?:=[^&]*)?(?=&|$)",
                            "",
                        ),
                        "&",
                    ),
                    "",
                )
            ),
            "&",
        ),
    )
    df = df.withColumn(
        out_col,
        F.when(F.col(qs) == "", F.col(base)).otherwise(
            F.concat(base, F.lit("?"), qs)
        ),
    )
    return df.drop(u0, head, u1, base, q, qs)


def url_dedup_stats(
    df: DataFrame, *, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Canonical-URL dedup end product: one row per canonical URL with the
    min id as representative and the duplicate count — exact_dedup's
    shape, keyed on canonical_url instead of content digest (the
    crawl-side gate that runs BEFORE any text is fetched or hashed).
    Canonicalization runs through the staged with_canonical_url (see its
    docstring for why the single-expression form is ~3× slower)."""
    return (
        with_canonical_url(df, url_col, "_cu")
        .groupBy("_cu")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_dups"))
        .select(F.col("_cu").alias("canonical_url"), id_col, "n_dups")
    )


def repeated_ngram_spans(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """Cross-document repeated n-gram span detection — the exact-substring
    dedup signal of Lee et al. 2022 ("Deduplicating Training Data Makes
    Language Models Better"), bounded to fixed-length token n-grams so it
    runs as two hash aggregates instead of a suffix array.

    Returns one row per token position whose n-gram occurs at least
    ``min_count`` times across the WHOLE corpus: (id, position 1-based,
    gram, n_occurrences) — the mask/removal worklist for a curation pass.

    Scale shape: the explode(sequence)+element_at gram construction (the
    repetition_features path — whole-stage codegen, no interpreted
    lambdas) is CONSUMED TWICE — once feeding the count aggregate, once
    as the join probe — because at corpus scale caching O(tokens) gram
    rows is not an option; two scan-stage passes is the honest plan
    (measured 1.20× DuckDB at 750 k docs, flat with scale — SCALE.md).
    Gram counts collapse with map-side combine so the first shuffle
    carries distinct grams, not positions; the surviving repeated-gram
    table is usually corpus-⋘ and joins back by broadcast under the
    explicit cap (capped_broadcast — above it AQE plans the shuffle
    join). Output size equals the number of duplicated positions — the
    task's own answer, not a blow-up. Reference N/A (scale extension).
    """
    from nexgap_spark.operators.dedup import capped_broadcast
    from nexgap_spark.operators.text import tokenize

    base = df.select(
        F.col(id_col).alias("_rid"), tokenize(text_col).alias("_toks")
    ).filter(F.size("_toks") >= n)
    idx = base.select(
        "_rid",
        "_toks",
        F.explode(F.sequence(F.lit(1), F.size("_toks") - (n - 1))).alias("_pos"),
    )
    gram = F.concat_ws(
        " ", *[F.element_at("_toks", F.col("_pos") + j) for j in range(n)]
    )
    stream = idx.select("_rid", "_pos", gram.alias("_gram"))
    counts = (
        stream.groupBy("_gram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )
    spans = stream.join(capped_broadcast(counts), "_gram")
    return spans.select(
        F.col("_rid").alias(id_col),
        F.col("_pos").alias("position"),
        F.col("_gram").alias("gram"),
        "n_occurrences",
    )


def apply_expectations(
    df: DataFrame,
    rules: dict[str, Column],
    *,
    flags_col: str = "_failed_expectations",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Named data-quality expectations over a frame: returns
    ``(passed, quarantined, metrics)``.

    ``rules`` maps rule name → boolean Column that must hold (NULL counts
    as a FAILURE — an expectation that cannot be evaluated is not met,
    matching SQL CHECK-constraint semantics). ``passed`` carries rows
    satisfying every rule, unchanged; ``quarantined`` carries the rest
    plus ``flags_col``, the array of failed rule names (the routing key a
    repair/review pipeline needs). ``metrics`` is one row per rule —
    (rule, n_pass, n_fail) — plus a final ``_rows_`` row whose n_pass is
    the count of rows passing EVERY rule and n_fail the quarantined count
    (so a metrics consumer never re-scans the input for totals; n_rows =
    n_pass + n_fail on that row). All counts are 0 — never NULL — on
    empty input.

    Plan shape: the rule predicates are plain codegen'd projections
    evaluated ONCE into a flags array shared by both row outputs (lazy
    frames — a caller writing both sides pays one scan each, exactly like
    any filter); metrics is one aggregate over the same projection, each
    rule a conditional count — no per-rule scans, no shuffle beyond the
    1-row agg. At 100 TB this is a single pass over the fact table.
    """
    if not rules:
        raise ValueError("apply_expectations needs at least one rule")
    if flags_col in df.columns:
        raise ValueError(f"{flags_col!r} already exists in the input")
    names = list(rules)
    ok = {n: F.coalesce(rules[n].cast("boolean"), F.lit(False)) for n in names}
    flags = F.array(*[F.when(~ok[n], F.lit(n)) for n in names])
    flagged = df.withColumn(flags_col, F.filter(flags, lambda x: x.isNotNull()))
    passed = flagged.where(F.size(flags_col) == 0).drop(flags_col)
    quarantined = flagged.where(F.size(flags_col) > 0)
    # SUM over zero rows is NULL: coalesce every conditional count so an
    # empty partition/day yields 0s, not NULLs (r13 review)
    zsum = lambda c, a: F.coalesce(  # noqa: E731
        F.sum(F.when(c, 1).otherwise(0)), F.lit(0)
    ).cast("long").alias(a)
    all_ok = ok[names[0]]
    for n in names[1:]:
        all_ok = all_ok & ok[n]
    one = df.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        zsum(all_ok, "_all"),
        *[zsum(ok[n], f"_p_{i}") for i, n in enumerate(names)],
    )
    spark = df.sparkSession
    rows = spark.createDataFrame(
        [(n, i) for i, n in enumerate(names)] + [("_rows_", len(names))],
        "rule string, _i int",
    )
    pick = F.coalesce(
        *[F.when(F.col("_i") == i, F.col(f"_p_{i}")) for i in range(len(names))],
        F.col("_all"),  # the _rows_ row: rows passing every rule
    )
    metrics = (
        rows.crossJoin(F.broadcast(one))
        .select(
            "rule",
            pick.alias("n_pass"),
            (F.col("_n") - pick).cast("long").alias("n_fail"),
            "_i",
        )
        .orderBy("_i")
        .drop("_i")
    )
    return passed, quarantined, metrics
