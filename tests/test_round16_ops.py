"""Round-16 optimization-round tests: the shared per-doc shingle-array
corpus pass (one shuffle, set semantics by construction), the array-form
Jaccard verifier, the window-free aggregate-derived prefix in the
set-similarity join, and the integer hi/lo split in exact_unscaled_sum."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark):
    rows = [
        (1, "a b c d e f g"),
        (2, "a b c d e f g"),          # exact duplicate of 1
        (3, "a b c d e f g h i j"),    # superset-ish near-dup
        (4, "z y x w v u t s"),        # unrelated
        (5, "a b c"),                  # too short for n=3? 3 words -> 1 shingle
        (6, "q q q q q q"),            # repeated words (duplicate shingles)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_shingle_arrays_equal_distinct_stream(spark):
    """The one-shuffle array corpus pass must hold exactly the distinct
    shingle set per doc — identical to the previous distinct-stream cache
    (grouped), including on inputs with REPEATED shingles (doc 6), which is
    what the collect_set form guarantees by construction (r15 verdict
    'what's wrong #4': the old collect_list verify silently assumed a
    distinct input)."""
    from adventureworkslakehousepoc_spark.operators.dedup import (
        doc_shingle_arrays,
        word_shingles,
    )

    docs = _docs(spark)
    got = {
        r["doc_id"]: list(r["shs"])
        for r in doc_shingle_arrays(docs).collect()
    }
    expect = {
        r["doc_id"]: sorted(r["shs"])
        for r in word_shingles(docs)  # distinct=True stream
        .groupBy("doc_id")
        .agg(F.collect_list("sh").alias("shs"))
        .collect()
    }
    assert got == expect
    # and the hashed form carries 8-byte ids with the same cardinalities
    got_h = {
        r["doc_id"]: len(r["shs"])
        for r in doc_shingle_arrays(docs, hashed=True).collect()
    }
    assert got_h == {k: len(v) for k, v in expect.items()}


def test_jaccard_verify_arrays_exact(spark):
    """_jaccard_verify over the array frame computes the exact set Jaccard
    for given candidate pairs — hand-computed values, including a
    threshold-boundary pair and a no-overlap pair (dropped)."""
    from adventureworkslakehousepoc_spark.operators.dedup import (
        _jaccard_verify,
        doc_shingle_arrays,
    )

    docs = _docs(spark)
    arrs = doc_shingle_arrays(docs)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "doc_a long, doc_b long"
    )
    got = {
        (r["doc_a"], r["doc_b"]): round(r["jaccard"], 9)
        for r in _jaccard_verify(pairs, arrs, 0.4).collect()
    }
    # doc1: 5 shingles of 'a b c d e f g'; doc2 identical -> J = 1
    # doc3: 8 shingles, intersection = 5 -> J = 5/8 = 0.625
    # doc4: disjoint -> J = 0, filtered by threshold
    assert got == {(1, 2): 1.0, (1, 3): 0.625}


def test_prefix_filter_plan_has_no_window(spark):
    """r16: the per-doc rarity rank is aggregate-derived (array_sort over
    (df, sh) structs + positional slice) — the row_number window over the
    full shingle stream, and its exchange+sort, must be gone from the
    internal plan."""
    from adventureworkslakehousepoc_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )
    from adventureworkslakehousepoc_spark.plans.audit import capture_plans

    docs = _docs(spark)
    with capture_plans() as sink:
        prefix_filter_jaccard_pairs(docs).collect()
    all_plans = "\n".join(plan for _, plan in sink)
    assert "Window" not in all_plans, "row_number window is back in the prefix path"
    # the rarest-first order must still be derived somewhere (the struct sort)
    assert "collect_list" in all_plans


def test_exact_unscaled_sum_integer_split_full_range(spark):
    """The r16 integer hi/lo split is exact for magnitudes past 2^53 where
    the old double floor-division would silently corrupt hi (ADVICE r15):
    sum of values whose unscaled forms exceed 2^53 must equal the decimal
    reference bit-for-bit."""
    from adventureworkslakehousepoc_spark.functions.expressions import (
        exact_unscaled_sum,
    )

    big = 9_007_199_254_740_993  # 2^53 + 1: not representable as double
    vals = [(big,), (big + 2,), (-big,), (1,), (None,)]
    df = spark.createDataFrame(vals, "u long")
    got = df.agg(exact_unscaled_sum(F.col("u"), 2).alias("x")).collect()[0][0]
    ref = df.agg(
        F.sum(
            (F.col("u").cast("decimal(38,0)") / F.lit(100).cast("decimal(3,0)"))
            .cast("decimal(38,2)")
        )
        .cast("double")
        .alias("y")
    ).collect()[0][0]
    assert got == ref
