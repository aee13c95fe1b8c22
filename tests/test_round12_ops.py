"""Round-12 operator tests: audio perceptual fingerprint dedup and
per-frame video near-dup. Each pins the operator's defining property —
planted duplicates found, guards raised, verification exact — the DuckDB
oracles in queries/extensions.py cover engine parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# --------------------------------------------------------------------------
# audio_fingerprint_pairs
# --------------------------------------------------------------------------


def test_audio_identical_payloads_pair_at_hamming_zero(spark):
    """Same text AND doc_id = mod 64 => byte-identical WAV payloads =>
    identical fingerprints => the banded join MUST recover the pair at
    hamming 0 (pigeonhole: identical band bits in every band)."""
    from adventureworkslakehousepoc_spark.operators.multimodal import (
        audio_fingerprint_pairs,
    )

    rows = [(1, "the quick brown fox jumps over the lazy dog")] + [
        (1 + 64, "the quick brown fox jumps over the lazy dog"),  # clone
        (7, "completely different content with other words entirely"),
    ]
    out = {
        (r.doc_a, r.doc_b): r.hamming
        for r in audio_fingerprint_pairs(_docs(spark, rows)).collect()
    }
    assert out.get((1, 65)) == 0, out


def test_audio_pairs_are_canonical_and_verified(spark):
    """Every returned pair is doc_a < doc_b, hamming <= max_hamming, and
    the hamming matches an independent recomputation from the payload
    stats (no phantom candidates survive the verify)."""
    from adventureworkslakehousepoc_spark.operators.multimodal import (
        audio_fingerprint_pairs,
    )

    rows = [(i, f"word{i % 5} common text body shared tail") for i in range(40)]
    # 320 = lcm-compatible shift: 320 % 5 == 0 (same text variant) and
    # 320 % 64 == 0 (same sample count) => byte-identical clone payloads
    rows += [(i + 320, f"word{i % 5} common text body shared tail") for i in range(10)]
    out = audio_fingerprint_pairs(_docs(spark, rows), max_hamming=3).collect()
    assert out, "the +320 clones must collide"
    assert all(r.doc_a < r.doc_b for r in out)
    assert all(0 <= r.hamming <= 3 for r in out)


def test_audio_pigeonhole_guard_raises(spark):
    from adventureworkslakehousepoc_spark.operators.multimodal import (
        audio_fingerprint_pairs,
    )

    with pytest.raises(ValueError, match="pigeonhole"):
        audio_fingerprint_pairs(_docs(spark, [(1, "x")]), max_hamming=4, bands=4)


def test_audio_fingerprint_is_gain_invariant_by_construction(spark):
    """The mean-threshold rule compares each window's feature against the
    track mean of that feature, so uniformly scaling the samples cannot
    flip a bit. The encode path offers no gain knob, so pin the algebra
    where it lives: scaling every window feature by the same constant
    leaves every (f_w * W > total_f) comparison unchanged."""
    fw = [3, 9, 1, 7, 5, 2, 8, 4, 6, 3, 9, 1, 7, 5, 2, 8]
    tot = sum(fw)
    bits = [f * 16 > tot for f in fw]
    for c in (2, 10, 1000):
        assert [(f * c) * 16 > tot * c for f in fw] == bits


# --------------------------------------------------------------------------
# video_phash_pairs
# --------------------------------------------------------------------------


def test_video_identical_payloads_pair_fully(spark):
    """Same text and same doc_id mod 12 => identical y4m payloads (the
    encode keys h on id%3 and n_frames on id%4) => every aligned frame
    matches and the pair must be returned with matching == compared."""
    from adventureworkslakehousepoc_spark.operators.multimodal import (
        video_phash_pairs,
    )

    rows = [
        (2, "some shared video content words here"),
        (2 + 12, "some shared video content words here"),  # exact clone
        (5, "unrelated other document text"),
    ]
    out = {
        (r.doc_a, r.doc_b): (r.frames_compared, r.matching_frames)
        for r in video_phash_pairs(_docs(spark, rows)).collect()
    }
    fc, mf = out[(2, 14)]
    assert fc == mf and fc >= 2, out


def test_video_majority_rule_holds_on_every_row(spark):
    from adventureworkslakehousepoc_spark.operators.multimodal import (
        video_phash_pairs,
    )

    rows = [(i, f"tpl{i % 4} frame content body") for i in range(36)]
    out = video_phash_pairs(_docs(spark, rows)).collect()
    assert out
    for r in out:
        assert r.doc_a < r.doc_b
        assert 2 * r.matching_frames > r.frames_compared
        assert r.matching_frames <= r.frames_compared


def test_video_prefix_alignment_pairs_different_lengths(spark):
    """Same text + same h (id mod 3) but different n_frames (id mod 4):
    the shared frame prefix is byte-identical, so the majority vote over
    min(n_a, n_b) frames must recover the pair with a full-prefix match."""
    from adventureworkslakehousepoc_spark.operators.multimodal import (
        video_phash_pairs,
    )

    # ids 3 and 15: both h = 2 + 0 = 2; frames 2+3=5 vs 2+3=5... use ids
    # 3 (h=2, nf=5) and 27 (27%3=0 -> h=2, 27%4=3 -> nf=5)? pick ids with
    # same %3, different %4: 3 (nf=5) and 15 (15%4=3 -> nf=5) share both;
    # 3 and 39 (39%3=0, 39%4=3) same again — use 0 (nf=2) vs 36 (36%4=0,
    # nf=2)... construct directly: a=4 (4%3=1->h=3, 4%4=0->nf=2),
    # b=16 (16%3=1->h=3, 16%4=0->nf=2) are clones; b=28 (28%3=1,
    # 28%4=0) clone too. For DIFFERENT lengths: a=4 (nf=2), b=40
    # (40%3=1 -> h=3, 40%4=0 -> nf=2)... id%12 classes force nf with h;
    # pick a=4 (h=3, nf=2), b=13 (13%3=1 -> h=3, 13%4=1 -> nf=3).
    rows = [
        (4, "prefix aligned video words"),
        (13, "prefix aligned video words"),
    ]
    out = {
        (r.doc_a, r.doc_b): (r.frames_compared, r.matching_frames)
        for r in video_phash_pairs(_docs(spark, rows)).collect()
    }
    assert out.get((4, 13)) == (2, 2), out


# --------------------------------------------------------------------------
# maintenance: file_skipping_audit / compaction_bin_plan /
# dataset_fingerprints / snapshot_reconcile
# --------------------------------------------------------------------------


def test_file_skipping_clustered_beats_scattered(spark):
    """Date-clustered files MUST skip under a central date predicate while
    the match count is layout-invariant (the predicate never changes —
    only which files the footer test can prove empty of it)."""
    import datetime as dt

    from adventureworkslakehousepoc_spark.operators.maintenance import (
        file_skipping_audit,
    )

    rows = [
        (k, dt.datetime(2023, 1, 1) + dt.timedelta(days=k % 365))
        for k in range(2000)
    ]
    df = spark.createDataFrame(rows, "k bigint, d timestamp")
    out = {
        r.layout: r
        for r in file_skipping_audit(df, "d", "k", n_files=16).collect()
    }
    c, s = out["clustered"], out["scattered"]
    assert c.rows_total == s.rows_total == 2000
    assert c.rows_matching == s.rows_matching > 0
    assert c.n_files_skipped > s.n_files_skipped
    assert c.n_files_skipped >= 12  # ~10% predicate over 16 range files
    # footer-test soundness: a skipped file can hold no matching rows, so
    # the matches must all fit inside the NON-skipped files' rows
    assert c.rows_matching <= c.rows_total - c.rows_in_skipped_files


def test_file_skipping_degenerate_single_day(spark):
    """All rows on one date: span 0, every file's range equals the
    predicate point, nothing skips, everything matches (no div-by-zero)."""
    import datetime as dt

    from adventureworkslakehousepoc_spark.operators.maintenance import (
        file_skipping_audit,
    )

    df = spark.createDataFrame(
        [(k, dt.datetime(2023, 6, 1)) for k in range(64)], "k bigint, d timestamp"
    )
    for r in file_skipping_audit(df, "d", "k", n_files=8).collect():
        assert r.n_files_skipped == 0
        assert r.rows_matching == 64


def test_compaction_bin_plan_matches_sequential_referee(spark):
    """The distributed window plan must equal the sequential definition:
    bin = floor(cumulative-start / target) in file order, per partition."""
    from adventureworkslakehousepoc_spark.operators.maintenance import (
        compaction_bin_plan,
    )

    files = [("a", i, 100 + (i * 37) % 250) for i in range(20)] + [
        ("b", i, 400 + (i * 91) % 300) for i in range(7)
    ]
    df = spark.createDataFrame(files, "p string, i int, b bigint")
    got = {
        (r.part_key, r.bin_id): (r.n_files, r.bin_bytes)
        for r in compaction_bin_plan(df, "p", "i", "b", target_bytes=500).collect()
    }
    want: dict = {}
    for p in ("a", "b"):
        cum = 0
        for _, i, b in sorted(f for f in files if f[0] == p):
            key = (p, cum // 500)
            n, tot = want.get(key, (0, 0))
            want[key] = (n + 1, tot + b)
            cum += b
    assert got == want
    # conservation: every byte lands in exactly one bin
    assert sum(v[1] for v in got.values()) == sum(f[2] for f in files)


def test_dataset_fingerprints_order_and_partition_invariant(spark):
    """XOR fold => identical fingerprint under any row order / partition
    count; flipping one payload character changes it."""
    from adventureworkslakehousepoc_spark.operators.maintenance import (
        dataset_fingerprints,
    )

    rows = [(i, f"s{i % 3}", f"payload {i}") for i in range(90)]
    df = spark.createDataFrame(rows, "id bigint, g string, t string")

    def fp(frame):
        return {
            r.group_key: (r.n_rows, r.content_fingerprint)
            for r in dataset_fingerprints(frame, "g", "id", "t").collect()
        }

    base = fp(df)
    assert fp(df.orderBy(F.desc("t")).repartition(13)) == base
    flipped = spark.createDataFrame(
        [(i, g, t.upper() if i == 41 else t) for i, g, t in rows],
        "id bigint, g string, t string",
    )
    changed = fp(flipped)
    assert changed["s2"] != base["s2"]          # 41 % 3 == 2
    assert changed["s0"] == base["s0"]          # other groups untouched
    assert all(v[0] == 30 for v in base.values())


def test_snapshot_reconcile_classes_and_conservation(spark):
    from adventureworkslakehousepoc_spark.operators.maintenance import (
        snapshot_reconcile,
    )

    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C"), (5, 50.0, None)],
        "k bigint, p double, s string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 21.0, "B"), (4, 40.0, "D"), (5, 50.0, None)],
        "k bigint, p double, s string",
    )
    out = {
        r.change_class: r.n_rows
        for r in snapshot_reconcile(old, new, "k", ["p", "s"]).collect()
    }
    # key 5 has a NULL compare column on both sides -> unchanged (null-safe)
    assert out == {"added": 1, "removed": 1, "changed": 1, "unchanged": 2}
    assert out["added"] + out["changed"] + out["unchanged"] == 4      # |new|
    assert out["removed"] + out["changed"] + out["unchanged"] == 4    # |old|


# --------------------------------------------------------------------------
# batch 2: dp noise / reservoir / kaplan-meier / cuped / dim ablation /
# shot boundaries
# --------------------------------------------------------------------------


def test_dp_noise_is_centered_and_bounded(spark):
    """Per-group noise must be deterministic, mean-centered-ish, and the
    true count must be recoverable only to within the Laplace scale: with
    eps=1 the |noise| median is ~ln(2); assert every |noise| is finite and
    the empirical mean |noise| is within a loose [0.1, 10] envelope."""
    from adventureworkslakehousepoc_spark.operators.privacy import (
        dp_noisy_group_counts,
    )

    df = spark.createDataFrame(
        [(i, f"g{i % 40}") for i in range(4000)], "id bigint, g string"
    )
    out = dp_noisy_group_counts(df, ["g"], epsilon=1.0).collect()
    assert len(out) == 40
    noises = [abs(r.n_noisy - r.n_true) for r in out]
    assert all(n < 40 for n in noises), "eps=1 noise should be O(1), not O(n)"
    assert 0.1 < sum(noises) / len(noises) < 10
    # determinism: same keys -> same noise
    again = dp_noisy_group_counts(df, ["g"], epsilon=1.0).collect()
    assert {(r.g, r.n_noisy) for r in again} == {(r.g, r.n_noisy) for r in out}
    # scale: eps=0.1 noise is 10x eps=1 noise exactly (same uniform draw),
    # modulo the 1e-6 quantization of each
    wide = dp_noisy_group_counts(df, ["g"], epsilon=0.1).collect()
    wn = {r.g: abs(r.n_noisy - r.n_true) for r in wide}
    nn = {r.g: abs(r.n_noisy - r.n_true) for r in out}
    for g in wn:
        assert abs(wn[g] - 10 * nn[g]) < 1e-4, (g, wn[g], nn[g])


def test_dp_noise_key_is_injective_over_nulls_and_delimiters(spark):
    """Round-13 advice fix: the noise key hashes each group component
    SEPARATELY, so (1) a NULL component yields a non-null, well-defined
    noise draw (concat_ws used to silently skip NULLs, making ('a', NULL)
    and (NULL, 'a') share a draw — and diverge from the NULL-propagating
    oracle), and (2) a delimiter character inside a value cannot collide
    two distinct groups into one correlated draw ('a|b','c' vs 'a','b|c')."""
    from adventureworkslakehousepoc_spark.operators.privacy import (
        dp_noisy_group_counts,
    )

    rows = [
        (1, "a|b", "c"),
        (2, "a", "b|c"),
        (3, "a", None),
        (4, None, "a"),
        (5, None, None),
    ]
    df = spark.createDataFrame(rows, "id bigint, g1 string, g2 string")
    out = dp_noisy_group_counts(df, ["g1", "g2"], epsilon=1.0).collect()
    assert len(out) == 5
    noises = {(r.g1, r.g2): r.n_noisy - r.n_true for r in out}
    assert all(n is not None for n in noises.values()), noises
    # the old concat_ws('|') key collided BOTH hazards below:
    assert noises[("a|b", "c")] != noises[("a", "b|c")], "delimiter collision"
    assert noises[("a", None)] != noises[(None, "a")], "null-skip collision"
    assert len(set(noises.values())) == 5, f"correlated draws: {noises}"


def test_weighted_reservoir_favors_heavy_rows(spark):
    """With weights 1000:1, the k winners should be overwhelmingly heavy
    rows; exact k per group; ranks 1..k; deterministic."""
    from adventureworkslakehousepoc_spark.operators.sampling import (
        weighted_reservoir_sample,
    )

    rows = [(i, "g", 1000 if i < 50 else 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id bigint, src string, w bigint")
    out = weighted_reservoir_sample(
        df, group_col="src", weight_col="w", id_col="doc_id", k=10
    ).collect()
    assert len(out) == 10
    assert sorted(r.rank for r in out) == list(range(1, 11))
    heavy = sum(1 for r in out if r.id < 50)
    assert heavy >= 8, f"only {heavy}/10 heavy picks despite 1000x weight"


def test_kaplan_meier_structure(spark):
    """S must be monotone nonincreasing; n_at_risk telescopes exactly;
    a censored user never decrements survival at their lifetime."""
    import datetime as dt

    from adventureworkslakehousepoc_spark.operators.temporal import (
        kaplan_meier_lifetimes,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    # users 0..49: churn at lifetime (i % 20) days, last event well before horizon
    for i in range(50):
        rows += [(i, base), (i, base + dt.timedelta(days=i % 20))]
    # users 100..109: censored (active at the very end)
    for i in range(100, 110):
        rows += [(i, base), (i, base + dt.timedelta(days=40))]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    out = sorted(
        kaplan_meier_lifetimes(df).collect(), key=lambda r: r.lifetime_days
    )
    total = 60
    gone = 0
    prev_log = 0
    for r in out:
        assert r.n_at_risk == total - gone, r
        gone += r.n_churned + r.n_censored
        assert r.log_survival_ppb <= prev_log, "survival must not increase"
        prev_log = r.log_survival_ppb
    # the censored-only lifetime (40 days) must not drop survival
    last = out[-1]
    assert last.lifetime_days == 40 and last.n_churned == 0
    assert last.log_survival_ppb == out[-2].log_survival_ppb


def test_cuped_reduces_variance_on_correlated_metric(spark):
    """Plant a strong pre/post correlation with a true zero treatment
    effect: theta must be ~1, the CUPED lift must shrink toward 0 versus
    the raw lift, and the variance-reduction must be large."""
    import datetime as dt

    from adventureworkslakehousepoc_spark.operators.experiments import (
        cuped_adjusted_lift,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(400):
        persistent = (u * 37) % 100  # stable per-user level
        rows.append((u, base + dt.timedelta(days=1), float(persistent)))
        rows.append((u, base + dt.timedelta(days=20), float(persistent)))
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")
    r = cuped_adjusted_lift(df).collect()[0]
    assert r.n_treatment + r.n_control == 400
    assert abs(r.theta - 1.0) < 0.05, r.theta
    assert abs(r.lift_cuped) < abs(r.lift_raw) / 10 or abs(r.lift_raw) < 1e-9
    assert r.var_reduction_ppm > 900000  # rho^2 ~ 1


def test_cuped_moment_overflow_raises_instead_of_null(spark):
    """Round-13 advice fix: non-ANSI Spark returns NULL silently when a
    DECIMAL(38,0) moment SUM overflows (the decimal cast only protects the
    per-row product). Stage values big enough that sum(x²_micro) > 10³⁸
    and assert the readout raises rather than emitting NULL theta/lifts."""
    import pytest

    from adventureworkslakehousepoc_spark.operators.experiments import (
        cuped_adjusted_lift,
    )

    # 400 users x value 1e12 -> per-user micro sum 1e18, square 1e36,
    # sum ~4e38 > DECIMAL(38,0) max
    rows = [
        (i, f"2024-01-{1 + (i % 10):02d}", 1.0e12) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts string, value double").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    # ANSI on (Spark 4 default): Spark itself raises ARITHMETIC_OVERFLOW at
    # the sum — acceptable. ANSI off (the silent-NULL hazard the guard is
    # for): the sum yields NULL and OUR raise_error must fire.
    old = spark.conf.get("spark.sql.ansi.enabled")
    try:
        with pytest.raises(
            Exception, match="moment sum overflowed|ARITHMETIC_OVERFLOW"
        ):
            cuped_adjusted_lift(df).collect()
        spark.conf.set("spark.sql.ansi.enabled", "false")
        with pytest.raises(Exception, match="moment sum overflowed"):
            cuped_adjusted_lift(df).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


def test_dim_ablation_full_dim_is_perfect_and_monotonicish(spark):
    from adventureworkslakehousepoc_spark.operators.similarity import (
        dim_ablation_recall,
    )

    import math

    rows = [
        (
            i,
            [math.sin(0.1 * i * (j + 1)) for j in range(16)],
            i % 3,
        )
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    out = {
        r.dim: r.avg_recall_ppm
        for r in dim_ablation_recall(
            df, dims=(2, 8), full_dim=16, k=3, query_mod=10
        ).collect()
    }
    assert out[16] == 1000000, "full dim must recall itself perfectly"
    assert 0 <= out[2] <= out[8] <= 1000000, out


def test_dim_ablation_bounded_query_set_is_fixed_size_and_deterministic(spark):
    """The registered (scale-safe) form: max_queries hash-samples a FIXED
    number of query vectors — n_queries must equal the bound regardless of
    corpus size, the sample must be the smallest (md5(vec_id), vec_id)
    keys (deterministic, partitioning-invariant), and a corpus 2x larger
    must still score exactly the bound (linear, not quadratic, growth)."""
    import hashlib
    import math

    from adventureworkslakehousepoc_spark.operators.similarity import (
        dim_ablation_recall,
    )

    def mk(n):
        rows = [
            (i, [math.sin(0.1 * i * (j + 1)) for j in range(8)], 0)
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>, label int"
        )

    for n in (60, 120):
        out = dim_ablation_recall(
            mk(n), dims=(2,), full_dim=8, k=3, max_queries=10
        ).collect()
        assert {r.n_queries for r in out} == {10}, (n, out)
        assert {r.dim for r in out} == {2, 8}
        full = {r.dim: r.avg_recall_ppm for r in out}
        assert full[8] == 1000000

    # the sample is exactly the 10 smallest (md5(str(vec_id)), vec_id)
    expect = sorted(range(120), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:10]
    from pyspark.sql import functions as F

    picked = (
        mk(120)
        .select("vec_id", F.md5(F.col("vec_id").cast("string")).alias("h"))
        .orderBy("h", "vec_id")
        .limit(10)
        .collect()
    )
    assert [r.vec_id for r in picked] == expect


def test_shot_boundaries_per_video_invariants(spark):
    """1 <= n_shots <= n_frames; single-shot iff no hamming jump above the
    threshold; values reproducible."""
    from adventureworkslakehousepoc_spark.operators.multimodal import (
        video_shot_boundaries,
    )

    rows = [(i, f"video content body {i} with words") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = video_shot_boundaries(df).collect()
    assert len(out) == 30
    for r in out:
        assert 1 <= r.n_shots <= r.n_frames, r
        assert 0 <= r.max_cut_hamming <= 15
        if r.n_shots == 1:
            assert r.max_cut_hamming <= 4


# --------------------------------------------------------------------------
# batch 3: srm / sentence dedup / streaming fingerprint maintenance
# --------------------------------------------------------------------------


def test_srm_flags_planted_imbalance(spark):
    """A deliberately skewed assignment must flag; the md5 50/50 split on
    uniform ids must not; overall row present; chi2 matches the exact
    integer form."""
    import datetime as dt

    from adventureworkslakehousepoc_spark.operators.experiments import (
        srm_assignment_check,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [(u, base, "view", 1.0) for u in range(800)]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, event_type string, value double")
    out = {r.segment: r for r in srm_assignment_check(df).collect()}
    r = out["__overall__"]
    assert r.n_treatment + r.n_control == 800
    assert abs(r.chi2 - (r.n_treatment - r.n_control) ** 2 / 800) < 1e-12
    assert not r.srm_flag, f"uniform ids must not SRM-flag: {r}"
    # planted imbalance: only users whose md5 nibble says 'treatment'
    from pyspark.sql import functions as SF

    arm = (
        SF.conv(SF.substring(SF.md5(SF.concat(SF.lit("exp42:"), SF.col("user_id").cast("string"))), 1, 1), 16, 10)
        .cast("int") < 8
    )
    skewed = df.filter(arm | (SF.col("user_id") % 20 == 0))
    bad = {r.segment: r for r in srm_assignment_check(skewed).collect()}["__overall__"]
    assert bad.srm_flag, f"90/10 exposure must SRM-flag: {bad}"


def test_sentence_dedup_ownership_and_ratios(spark):
    """Planted shared sentence across docs: every doc counts it duplicated,
    only the first (doc, pos) owns its chars; short fragments ignored."""
    from adventureworkslakehousepoc_spark.operators.dedup import (
        sentence_dedup_stats,
    )

    shared = "this exact sentence appears everywhere"
    rows = [
        (1, f"unique one alpha. {shared}. tail one beta"),
        (2, f"{shared}. unique two gamma"),
        (3, "totally unique document three. ok"),  # 'ok' < 5 chars -> ignored
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in sentence_dedup_stats(df).collect()}
    assert out[1].n_sentences == 3 and out[1].n_dup_sentences == 1
    assert out[2].n_sentences == 2 and out[2].n_dup_sentences == 1
    assert out[3].n_sentences == 1 and out[3].n_dup_sentences == 0
    # doc 1 owns the shared sentence (lowest doc_id), so doc 2's kept chars
    # exclude it exactly
    assert out[1].chars_kept == sum(
        len(s) for s in rows[0][1].split(". ")
    )
    assert out[2].chars_kept == len("unique two gamma")
    assert out[2].dup_ratio_ppm == 500000


def test_sentence_dedup_within_doc_repeat_keeps_first(spark):
    from adventureworkslakehousepoc_spark.operators.dedup import (
        sentence_dedup_stats,
    )

    df = spark.createDataFrame(
        [(7, "repeat me now. repeat me now. repeat me now")],
        "doc_id bigint, text string",
    )
    r = sentence_dedup_stats(df).collect()[0]
    assert r.n_sentences == 3 and r.n_dup_sentences == 3
    assert r.chars_kept == len("repeat me now")


def test_st_fingerprint_replay_safe_under_both_trigger_shapes(spark, sf_dir):
    """The two replay guards, exercised explicitly: with
    maxFilesPerTrigger=1 the duplicate file is its own micro-batch
    (cross-batch replay -> distinct-partials guard); with a batched
    trigger both copies share one micro-batch (within-batch replay ->
    primary-key dedup guard). BOTH shapes must equal the single-copy
    batch fingerprint exactly."""
    import os

    import __spark_entry__ as em
    from adventureworkslakehousepoc_spark.operators.maintenance import (
        dataset_fingerprints,
    )
    from adventureworkslakehousepoc_spark.catalog import load_tables

    batch = {
        r.group_key: (r.n_rows, r.content_fingerprint)
        for r in dataset_fingerprints(
            load_tables(spark, sf_dir, ("documents",))["documents"],
            "source",
            "doc_id",
            "text",
        ).collect()
    }
    q = em.queries()["st_fingerprint_maintenance"]
    old = os.environ.get("SPARK_GRAFT_STREAM_TRIGGER_FILES")
    try:
        for shape in ("1", "2"):
            os.environ["SPARK_GRAFT_STREAM_TRIGGER_FILES"] = shape
            streamed = {
                r.group_key: (r.n_rows, r.content_fingerprint)
                for r in q(spark, sf_dir).collect()
            }
            assert streamed == batch, f"trigger shape {shape} diverged"
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_STREAM_TRIGGER_FILES", None)
        else:
            os.environ["SPARK_GRAFT_STREAM_TRIGGER_FILES"] = old


def test_st_fingerprint_replay_safe_multipart_unaligned_trigger(
    spark, sf_dir, tmp_path
):
    """The round-12 per-BATCH partials were replay-safe only when batch
    boundaries aligned with the duplicated file sequence. The unsafe shape:
    a MULTI-part table with a batched trigger that does not divide the part
    count, so one micro-batch straddles the copy-1/copy-2 boundary — the
    replayed file shares a batch with unrelated files, its per-batch
    partial is not byte-identical to any prior partial, and its rows
    XOR-cancel out of the fingerprint while n_rows double-counts. With
    per-FILE partials (round 13) the partial row is keyed on underlying
    file identity and collapses in the readout distinct regardless of
    batch composition. 4 parts × copies=2 staged as 8 files; trigger=3
    gives batches [p0 p1 p2][p3 p0' p1'][p2' p3'] — batch 2 mixes first
    deliveries with replays."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as em
    from adventureworkslakehousepoc_spark.catalog import load_tables
    from adventureworkslakehousepoc_spark.operators.maintenance import (
        dataset_fingerprints,
    )

    src = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    parts_dir = tmp_path / "documents.parquet"
    parts_dir.mkdir()
    n = src.num_rows
    assert n >= 8, "need enough rows for 4 non-empty parts"
    bounds = [0, n // 4, n // 2, 3 * n // 4, n]
    for i in range(4):
        pq.write_table(
            src.slice(bounds[i], bounds[i + 1] - bounds[i]),
            parts_dir / f"part-{i:02d}.parquet",
        )

    batch = {
        r.group_key: (r.n_rows, r.content_fingerprint)
        for r in dataset_fingerprints(
            load_tables(spark, str(tmp_path), ("documents",))["documents"],
            "source",
            "doc_id",
            "text",
        ).collect()
    }
    q = em.queries()["st_fingerprint_maintenance"]
    old = os.environ.get("SPARK_GRAFT_STREAM_TRIGGER_FILES")
    try:
        os.environ["SPARK_GRAFT_STREAM_TRIGGER_FILES"] = "3"
        streamed = {
            r.group_key: (r.n_rows, r.content_fingerprint)
            for r in q(spark, str(tmp_path)).collect()
        }
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_STREAM_TRIGGER_FILES", None)
        else:
            os.environ["SPARK_GRAFT_STREAM_TRIGGER_FILES"] = old
    assert streamed == batch, "unaligned batched trigger corrupted the manifest"
