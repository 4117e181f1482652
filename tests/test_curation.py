"""Curation operators: decontamination semantics, PII redaction, repetition
fractions, split determinism/proportions, packing boundaries, column
profiling, and quantization edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexgap_spark.operators import curation, profiling
from nexgap_spark.operators.similarity import quantize_int8_digest


@pytest.fixture(scope="module")
def corpus(spark):
    contaminated = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    clean = "one two three four five six seven eight nine ten eleven twelve"
    short = "tiny doc"
    rows = [(1, contaminated), (2, clean), (3, short)]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench_docs(spark):
    # shares the first 8-gram with doc 1, nothing with doc 2
    rows = [(100, "alpha beta gamma delta epsilon zeta eta theta other words")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_scores(corpus, bench_docs):
    got = {
        r.doc_id: r
        for r in curation.contamination_scores(corpus, bench_docs, n=8).collect()
    }
    assert got[1].n_overlap == 1  # exactly the shared leading 8-gram
    assert got[2].n_overlap == 0
    assert got[3].n_grams == 0 and got[3].n_overlap == 0  # < n tokens survives
    assert got[1].overlap_frac == pytest.approx(1 / 3)


def test_decontaminate_drops_only_contaminated(corpus, bench_docs):
    kept = {r.doc_id for r in curation.decontaminate(corpus, bench_docs, n=8).collect()}
    assert kept == {2, 3}


def test_pii_scan_counts_and_redacts(spark):
    df = spark.createDataFrame(
        [(1, "reach me at bob@mail.com or +1-555-0099 from 192.168.0.1 twice 192.168.0.2")],
        "id long, text string",
    )
    r = curation.pii_scan(df).first()
    assert (r.n_emails, r.n_phones, r.n_ips) == (1, 1, 2)
    assert "<EMAIL>" in r.redacted and "<PHONE>" in r.redacted
    assert r.redacted.count("<IP>") == 2
    assert "bob@mail.com" not in r.redacted


def test_repetition_features(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b c d e f"), (3, "x")],
        "id long, text string",
    )
    got = {r.id: r for r in curation.repetition_features(df, id_col="id", ns=(2,)).collect()}
    # "a b a b a b": 5 bigrams, 2 distinct ("a b","b a") → 0.6 duplicated
    assert got[1].dup_2gram_frac == pytest.approx(0.6)
    assert got[2].dup_2gram_frac == 0.0
    assert got[3].dup_2gram_frac == 0.0  # shorter than n → defined as 0


def test_split_assign_deterministic_and_proportional(spark):
    df = spark.range(20000).withColumnRenamed("id", "k")
    a = curation.split_assign(df, key_col="k")
    b = curation.split_assign(df, key_col="k")
    assert a.exceptAll(b).count() == 0  # rerun-stable
    frac = {
        r.split: r.n / 20000
        for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert frac["train"] == pytest.approx(0.9, abs=0.01)
    assert frac["val"] == pytest.approx(0.05, abs=0.01)
    assert frac["test"] == pytest.approx(0.05, abs=0.01)


def test_split_assign_stable_under_growth(spark):
    # hash split: adding rows never reassigns existing keys
    small = curation.split_assign(spark.range(100).withColumnRenamed("id", "k"), key_col="k")
    big = curation.split_assign(spark.range(1000).withColumnRenamed("id", "k"), key_col="k")
    joined = small.alias("s").join(big.alias("b"), on="k").filter("s.split <> b.split")
    assert joined.count() == 0


def test_pack_chunks_boundary(spark):
    # budget 10: tokens 6,6,6 → starts at 0,6,12 → chunks 0,0,1
    df = spark.createDataFrame(
        [(1, 6), (2, 6), (3, 6)], "doc_id long, nt long"
    )
    got = {
        r.doc_id: r.chunk_id
        for r in curation.pack_chunks(
            df, token_col="nt", order_col="doc_id", budget=10
        ).collect()
    }
    assert got == {1: 0, 2: 0, 3: 1}


def test_profile_columns_nulls_and_types(spark):
    df = spark.createDataFrame(
        [(1, "x", 1.5), (2, None, 2.5), (3, "y", None), (4, "x", 4.0)],
        "k long, s string, v double",
    )
    prof = {r.column_name: r for r in profiling.profile_columns(df, cols=["s", "v"]).collect()}
    assert prof["s"].n_rows == 4 and prof["s"].n_null == 1 and prof["s"].n_distinct == 2
    assert prof["s"].min_value == "x" and prof["s"].max_value == "y"
    assert prof["v"].n_null == 1 and prof["v"].min_value == "1.5"


def test_profile_plan_shape(spark):
    # r13 shape contract: one narrow scalar-agg branch plus one NATIVE
    # distinct branch per column (k+1 relation reads — disjoint bytes under
    # parquet column pruning), and still no Expand, no cached relation
    df = spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") % 3).alias("b")
    )
    out = profiling.profile_columns(df, cols=["a", "b"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 3  # scalars + 2 distinct branches
    assert "Expand" not in plan and "InMemoryRelation" not in plan
    out.collect()  # and the plan actually executes


def test_quantize_digest_saturation_and_zero(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -1.0, 0.5, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: r for r in quantize_int8_digest(df).collect()}
    # maxabs=1 → q = [127, -127, 64, 0]
    assert got[1].q_max == 127 and got[1].q_min == -127
    assert got[1].q_sum == 127 - 127 + 64 + 0
    assert got[1].n_saturated == 2
    # all-zero vector must not divide by zero
    assert got[2].q_sum == 0 and got[2].l2_norm == 0.0


def test_profile_columns_empty_input_keeps_column_rows(spark):
    df = spark.createDataFrame([], "a long, s string")
    prof = {r.column_name: r for r in profiling.profile_columns(df, cols=["a", "s"]).collect()}
    assert set(prof) == {"a", "s"}
    assert prof["a"].n_rows == 0 and prof["a"].n_null == 0 and prof["a"].n_distinct == 0
    assert prof["a"].min_value is None


def test_chunk_text_windows(spark):
    from nexgap_spark.operators.curation import chunk_text

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "x"), (3, "   "), (4, None)],
        "doc_id long, text string",
    )
    out = chunk_text(df, max_tokens=4, overlap=1).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_idx)):
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text, r.chunk_n))
    # stride 3 over 10 tokens: starts 0,3,6,9 → 4 windows, tail shorter
    assert by_doc[1] == [
        (0, "a b c d", 4),
        (1, "d e f g", 4),
        (2, "g h i j", 4),
        (3, "j", 1),
    ]
    # single-token, blank, and NULL-text docs each keep exactly one row
    # (count preserved — NULL must not vanish via sequence(0, NULL))
    assert by_doc[2] == [(0, "x", 1)]
    assert len(by_doc[3]) == 1 and by_doc[3][0][0] == 0
    assert len(by_doc[4]) == 1 and by_doc[4][0][2] == 0
    # invalid overlap rejected
    import pytest as _pt

    with _pt.raises(ValueError):
        chunk_text(df, max_tokens=4, overlap=4)


def test_canonical_url(spark):
    from nexgap_spark.operators.curation import canonical_url, url_dedup_stats

    df = spark.createDataFrame(
        [
            (1, "HTTPS://Example.COM/a?utm_source=x&b=2&a=1#top"),
            (2, "https://example.com/a?a=1&b=2"),          # same after canon
            (3, "https://example.com/a?b=2&a=1&gclid=zz"),  # same after canon
            (4, "https://example.com/a?a=1&b=3"),           # different value
            (5, "no-scheme/path?utm_source=x&k=1"),         # head-less URL
            (6, "https://example.com/bare#frag"),           # query-less
        ],
        "doc_id long, url string",
    )
    got = {r.doc_id: r.cu for r in df.select(
        "doc_id", canonical_url("url").alias("cu")).collect()}
    assert got[1] == got[2] == got[3] == "https://example.com/a?a=1&b=2"
    assert got[4] == "https://example.com/a?a=1&b=3"
    assert got[5] == "no-scheme/path?k=1"   # no scheme://host → case kept
    assert got[6] == "https://example.com/bare"

    stats = {r.canonical_url: (r.doc_id, r.n_dups)
             for r in url_dedup_stats(df).collect()}
    assert stats["https://example.com/a?a=1&b=2"] == (1, 3)
    assert stats["https://example.com/a?a=1&b=3"] == (4, 1)


def test_repeated_ngram_spans(spark):
    from nexgap_spark.operators.curation import repeated_ngram_spans

    rows = [
        (1, "the quick brown fox jumps over it"),   # 'the quick brown' x3 docs
        (2, "see the quick brown fox here now"),
        (3, "again the quick brown fox appears ok"),
        (4, "entirely unrelated words in this document"),
        (5, "too short"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = repeated_ngram_spans(df, n=4, min_count=3).collect()
    grams = {r.gram for r in spans}
    assert grams == {"the quick brown fox"}
    assert {r.doc_id for r in spans} == {1, 2, 3}
    assert all(r.n_occurrences == 3 for r in spans)
    # 1-based positions of the gram in each doc
    pos = {r.doc_id: r.position for r in spans}
    assert pos == {1: 1, 2: 2, 3: 2}


def test_profile_columns_quoted_names(spark):
    """r12 advice: column names needing backticks (space, dash, dot) must
    profile exactly like plain ones in BOTH the exact and approx paths —
    the generated stack()/agg SQL quotes every name and uses positional
    intermediate aliases."""
    from nexgap_spark.operators import profiling

    weird = ["user id", "total-value", "a.b", "it's"]
    df = spark.createDataFrame(
        [(1, 10.0, "x", None), (2, None, "y", "q"), (2, 30.0, None, "q")],
        f"`{weird[0]}` long, `{weird[1]}` double, `{weird[2]}` string, `{weird[3]}` string",
    )
    exact = {
        r.column_name: r
        for r in profiling.profile_columns(df, cols=weird).collect()
    }
    assert set(exact) == set(weird)
    assert exact["user id"].n_distinct == 2
    assert exact["total-value"].n_null == 1
    assert exact["total-value"].max_value == "30.0"
    assert exact["a.b"].n_null == 1
    assert exact["it's"].n_distinct == 1

    approx = {
        r.column_name: r
        for r in profiling.profile_columns_approx(df, cols=weird).collect()
    }
    assert set(approx) == set(weird)
    assert approx["user id"].n_distinct_approx == 2
    assert approx["total-value"].n_null == 1

    audit = {
        r.column_name: r
        for r in profiling.profile_columns_approx(
            df, cols=weird, exact_check=True
        ).collect()
    }
    assert all(audit[c].distinct_within_tol for c in weird)


def test_leakage_safe_split_no_group_straddles(spark):
    # 100 docs, groups of 4 consecutive ids -> every member must land in
    # the SAME split, so max splits per group == 1
    docs = spark.range(100).select(F.col("id").alias("doc_id"))
    groups = docs.select(
        "doc_id", (F.col("doc_id") - F.col("doc_id") % 4).alias("group_id")
    )
    out = curation.leakage_safe_split(docs, groups)  # keeps group_id
    straddle = (
        out.groupBy("group_id")
        .agg(F.count_distinct("split").alias("k"))
        .agg(F.max("k"))
        .first()[0]
    )
    assert straddle == 1
    # while the naive per-doc assignment DOES split groups apart (the
    # leakage channel this operator closes)
    naive = curation.split_assign(docs, key_col="doc_id")
    naive_straddle = (
        naive.join(groups, "doc_id")
        .groupBy(F.col("group_id").alias("g"))
        .agg(F.count_distinct("split").alias("k"))
        .agg(F.max("k"))
        .first()[0]
    )
    assert naive_straddle > 1


def test_leakage_safe_split_singletons_match_plain_assign(spark):
    # docs not in any group hash their own id: identical to split_assign,
    # so growing the group table never reshuffles untouched documents
    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    groups = spark.createDataFrame([(0, 0), (1, 0)], "doc_id long, group_id long")
    safe = {
        r.doc_id: r.split
        for r in curation.leakage_safe_split(docs, groups).collect()
    }
    plain = {
        r.doc_id: r.split for r in curation.split_assign(docs, key_col="doc_id").collect()
    }
    for d in range(2, 200):
        assert safe[d] == plain[d], d
    assert safe[0] == safe[1] == plain[0]  # group key = min member id


def test_apply_expectations_split_and_metrics(spark):
    df = spark.createDataFrame(
        [(1, 10, "en"), (2, 200, "en"), (3, 300, None), (4, 5, "zz")],
        "id long, n long, lang string",
    )
    rules = {
        "big": F.col("n") >= 100,
        "lang_ok": F.col("lang").isin("en", "fr"),  # NULL -> failed
    }
    passed, quarantined, metrics = curation.apply_expectations(df, rules)
    assert {r.id for r in passed.collect()} == {2}
    q = {r.id: sorted(r._failed_expectations) for r in quarantined.collect()}
    assert q == {1: ["big"], 3: ["lang_ok"], 4: ["big", "lang_ok"]}
    m = {r.rule: (r.n_pass, r.n_fail) for r in metrics.collect()}
    # the _rows_ row: n_pass = rows passing EVERY rule, n_fail = quarantined
    assert m == {"big": (2, 2), "lang_ok": (2, 2), "_rows_": (1, 3)}
    # passed rows keep the original schema exactly
    assert passed.columns == df.columns


def test_apply_expectations_empty_input_zero_metrics(spark):
    df = spark.createDataFrame([], "id long, n long")
    _, _, metrics = curation.apply_expectations(df, {"pos": F.col("n") > 0})
    m = {r.rule: (r.n_pass, r.n_fail) for r in metrics.collect()}
    # zero — never NULL — counts on an empty partition/day
    assert m == {"pos": (0, 0), "_rows_": (0, 0)}


def test_apply_expectations_rejects_bad_inputs(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError):
        curation.apply_expectations(df, {})
    df2 = df.withColumn("_failed_expectations", F.lit(0))
    with pytest.raises(ValueError):
        curation.apply_expectations(df2, {"r": F.col("x") > 0})


def test_apply_expectations_randomized_against_pandas(spark):
    # batched randomized sweep: random int frames + random thresholds (with
    # NULL injection) through the gate, cross-checked row-for-row and
    # metric-for-metric against a pandas reference applying the documented
    # NULL-is-failure semantics
    import random

    rng = random.Random(42)
    rows = [
        (
            i,
            rng.choice([None, rng.randint(-50, 50)]),
            rng.choice([None, rng.randint(0, 9)]),
        )
        for i in range(400)
    ]
    t1, t2 = rng.randint(-20, 20), rng.randint(2, 8)
    df = spark.createDataFrame(rows, "id long, a long, b long")
    rules = {"a_big": F.col("a") >= t1, "b_small": F.col("b") < t2}
    passed, quarantined, metrics = curation.apply_expectations(df, rules)

    def ok1(a):
        return a is not None and a >= t1

    def ok2(b):
        return b is not None and b < t2

    exp_pass = {i for i, a, b in rows if ok1(a) and ok2(b)}
    assert {r.id for r in passed.collect()} == exp_pass
    got_q = {r.id: set(r._failed_expectations) for r in quarantined.collect()}
    exp_q = {
        i: {n for n, bad in (("a_big", not ok1(a)), ("b_small", not ok2(b))) if bad}
        for i, a, b in rows
        if not (ok1(a) and ok2(b))
    }
    assert got_q == exp_q
    m = {r.rule: (r.n_pass, r.n_fail) for r in metrics.collect()}
    n1 = sum(1 for _, a, _ in rows if ok1(a))
    n2 = sum(1 for _, _, b in rows if ok2(b))
    assert m == {
        "a_big": (n1, 400 - n1),
        "b_small": (n2, 400 - n2),
        "_rows_": (len(exp_pass), 400 - len(exp_pass)),
    }
