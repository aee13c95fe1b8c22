"""Sketch-parameter sanity properties (round-12, verdict task 7): the
round-10 4096-bit Bloom saturation was caught by a COMPOSITION, not the
oracle — both engines agreed on the useless all-hits answer, because the
oracle checks ARITHMETIC, not PARAMETER ADEQUACY. These tests pin the
design-time guards (``bloom_design_check`` / ``cms_design_check`` /
``hll_design_check``) against pure-Python simulations of the EXACT md5
constructions the operators run (same hex slices, same integer
arithmetic), under adversarial cardinalities — so a silently-saturating
parameter choice fails here even when Spark and DuckDB agree on its
output. ``derandomize=True`` keeps the tail-bound assertions
deterministic (fixed example corpus, no flaky concentration draws)."""

from __future__ import annotations

import hashlib
import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from adventureworkslakehousepoc_spark.operators.sketches import (
    _BLOOM_K,
    _BLOOM_M,
    bloom_design_check,
    cms_design_check,
    hll_design_check,
)

_PROP = dict(max_examples=10, deadline=None, derandomize=True)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# --- pure-Python mirrors of the operator hash constructions ---------------


def bloom_probes(item: str, k: int = _BLOOM_K, m_bits: int = _BLOOM_M):
    """Mirror of _bloom_probe_idx: consecutive 8-hex md5 slices mod m."""
    h = _md5(item)
    return [int(h[p * 8 : (p + 1) * 8], 16) % m_bits for p in range(k)]


def cms_bucket(j: int, token: str, w: int) -> int:
    """Mirror of sketches._bucket: md5('j|token') first 15 hex mod w."""
    return int(_md5(f"{j}|{token}")[:15], 16) % w


def hll_estimate(tokens, m: int = 64) -> int:
    """Mirror of hll_registers + hll_summary (integer-exact path)."""
    w_bits = 60 - m.bit_length() + 1
    regs: dict[int, int] = {}
    for t in set(tokens):
        h = int(_md5(t)[:15], 16)
        bucket, r = h % m, h // m
        rank = (w_bits + 1) if r == 0 else (w_bits + 1) - r.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rank)
    n_reg = len(regs)
    v_empty = m - n_reg
    two55 = 1 << 55
    s = sum(1 << (55 - reg) for reg in regs.values()) + v_empty * two55
    raw = (709341 * m * m * two55) // (s * 1_000_000)
    if v_empty > 0 and raw <= m * 5 // 2:
        return int(math.floor(m * math.log(m / v_empty) + 0.5))
    return raw


# --- Bloom: FP rate tracks the analytic design bound ----------------------


@settings(**_PROP)
@given(st.integers(min_value=200, max_value=3000), st.integers(0, 10**6))
def test_bloom_fp_rate_matches_design(n_items, salt):
    fp_design = bloom_design_check(_BLOOM_M, _BLOOM_K, n_items)  # must pass
    bits = set()
    for i in range(n_items):
        bits.update(bloom_probes(f"item-{salt}-{i}"))
    probes = 400
    hits = sum(
        all(b in bits for b in bloom_probes(f"fresh-{salt}-{i}"))
        for i in range(probes)
    )
    measured = hits / probes
    # 3x the analytic rate + simulation slack: a saturating bitmap reads
    # ~1.0 here and fails by an order of magnitude
    assert measured <= 3 * fp_design + 0.015, (n_items, measured, fp_design)


def test_bloom_saturation_is_caught_and_real():
    """The r10 failure shape: m=4096 at ~4k items. The guard must raise,
    and the simulation confirms the guard is flagging a REAL saturation
    (measured FP ~1), not a phantom."""
    with pytest.raises(ValueError, match="saturates"):
        bloom_design_check(4096, 4, 4000)
    bits = set()
    for i in range(4000):
        bits.update(bloom_probes(f"item-{i}", m_bits=4096))
    hits = sum(
        all(b in bits for b in bloom_probes(f"fresh-{i}", m_bits=4096))
        for i in range(200)
    )
    assert hits / 200 > 0.5  # saturated: most fresh probes read as hits


# --- CMS: one-sidedness + noise floor --------------------------------------


@settings(**_PROP)
@given(st.integers(min_value=100, max_value=800), st.integers(0, 10**6))
def test_cms_one_sided_and_bounded(n_tokens, salt):
    d, w = 4, 256
    # zipf-ish multiset: token i appears (n_tokens // (i + 1)) times
    counts = {f"t-{salt}-{i}": max(1, n_tokens // (i + 1)) for i in range(n_tokens)}
    n_instances = sum(counts.values())
    grid: dict[tuple[int, int], int] = {}
    for tok, c in counts.items():
        for j in range(d):
            key = (j, cms_bucket(j, tok, w))
            grid[key] = grid.get(key, 0) + c
    floor = n_instances / w
    for tok in list(counts)[:20]:  # probe the heaviest 20
        est = min(grid[(j, cms_bucket(j, tok, w))] for j in range(d))
        over = est - counts[tok]
        assert over >= 0, "count-min must be one-sided"
        # min over d=4 rows: P[over > 8N/w] <= (1/8)^4 per probe; with
        # derandomize the example corpus is fixed, so this is a stable
        # regression bound, not a flaky tail draw
        assert over <= 8 * floor + 1, (tok, over, floor)


def test_cms_undersized_width_saturates():
    """w=4 cannot host 500 distinct tokens: the guard must raise and the
    simulation confirms every probe drowns in the N/w floor."""
    with pytest.raises(ValueError, match="noise floor"):
        cms_design_check(4, 4, n_instances=5000, min_heavy_count=100)
    d, w = 4, 4
    counts = {f"t{i}": 10 for i in range(500)}
    grid: dict[tuple[int, int], int] = {}
    for tok, c in counts.items():
        for j in range(d):
            key = (j, cms_bucket(j, tok, w))
            grid[key] = grid.get(key, 0) + c
    overs = [
        min(grid[(j, cms_bucket(j, tok, w))] for j in range(d)) - counts[tok]
        for tok in list(counts)[:50]
    ]
    assert min(overs) > 10 * 10  # every estimate >> any true count


# --- HLL: estimate error tracks 1.04/sqrt(m) across magnitudes -------------


@pytest.mark.parametrize("n", [50, 200, 1000, 5000, 20000])
def test_hll_estimate_within_design_error(n):
    err = hll_design_check(64)  # 13% standard error: must pass
    est = hll_estimate([f"tok-{i}" for i in range(n)], m=64)
    rel = abs(est - n) / n
    assert rel <= 3.5 * err, (n, est, rel)  # ~3.5 sigma, deterministic corpus


def test_hll_undersized_registers_rejected():
    with pytest.raises(ValueError):
        hll_design_check(4)  # 52% error: useless
    with pytest.raises(ValueError):
        hll_design_check(48)  # not a power of two


# --- mirror-vs-engine pins: the simulations above test the REAL
# constructions only if they match the Spark expressions bit-for-bit ------


def test_bloom_mirror_matches_engine(spark):
    from adventureworkslakehousepoc_spark.operators.sketches import bloom_words

    items = [f"gram-{i}" for i in range(64)]
    df = spark.createDataFrame([(i,) for i in items], "g string")
    engine = {
        (r["word_idx"], r["word"])
        for r in bloom_words(df, "g").collect()
    }
    words: dict[int, int] = {}
    for it in items:
        for b in bloom_probes(it):
            words[b // 32] = words.get(b // 32, 0) | (1 << (b % 32))
    assert engine == set(words.items())


def test_hll_mirror_matches_engine(spark):
    from adventureworkslakehousepoc_spark.operators.sketches import (
        hll_registers,
        hll_summary,
    )
    from pyspark.sql import functions as F

    toks = [f"tok-{i}" for i in range(300)]
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    regs = hll_registers(df, "token", 64)
    exact = df.agg(F.count_distinct("token").cast("bigint").alias("exact_distinct"))
    row = hll_summary(regs, exact, 64).collect()[0]
    assert row["corrected_estimate"] == hll_estimate(toks, 64)


def test_cms_mirror_matches_engine(spark):
    from adventureworkslakehousepoc_spark.operators.sketches import cms_cells

    toks = [f"t-{i % 40}" for i in range(400)]
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    engine = {
        (r["j"], r["bucket"]): r["c"]
        for r in cms_cells(df, "token", d=4, w=256).collect()
    }
    grid: dict[tuple[int, int], int] = {}
    for tok in toks:
        for j in range(4):
            key = (j, cms_bucket(j, tok, 256))
            grid[key] = grid.get(key, 0) + 1
    assert engine == grid
