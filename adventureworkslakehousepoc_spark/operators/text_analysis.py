"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All built-in-function pipelines (no UDFs) — the whole
module is one projection per operator, codegen'd and scan-parallel, which is
exactly what survives a 100 TB corpus sweep.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["language_id", "quality_scores", "token_counts", "fingerprints", "LANG_MARKERS"]

# marker-stopword lists per language (n-gram-heuristic langid; tiny on purpose
# — the operator shape matters, swap lists for fastText-grade tables in prod)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "a", "to", "in"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "de": ("der", "die", "und", "das", "ist", "ein"),
    "fr": ("le", "la", "et", "les", "des", "est"),
    "zh": ("的", "是", "在", "了", "和"),
}


def _marker_count(words_col: str, markers: Sequence[str]) -> Column:
    quoted = ", ".join("'" + m.replace("'", "''") + "'" for m in markers)
    return F.expr(f"size(filter({words_col}, w -> w IN ({quoted})))")


def language_id(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    markers: Mapping[str, Sequence[str]] = LANG_MARKERS,
) -> DataFrame:
    """Marker-word language ID: per-language hit counts over the word array,
    argmax with a fixed precedence order, 'und' when no markers hit.
    Returns (doc_id, predicted_lang, plus one <lang>_hits column each)."""
    from .dedup import spread

    langs = list(markers)
    base = spread(docs, id_col).select(
        F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("words")
    )
    scored = base.select(
        "doc_id", *[_marker_count("words", markers[lg]).alias(f"{lg}_hits") for lg in langs]
    )
    best = F.greatest(*[F.col(f"{lg}_hits") for lg in langs])
    pred: Column = F.lit("und")
    # fixed precedence: first language in dict order wins ties
    for lg in reversed(langs):
        pred = F.when((F.col(f"{lg}_hits") == best) & (best > 0), lg).otherwise(pred)
    return scored.select("doc_id", pred.alias("predicted_lang"), *[f"{lg}_hits" for lg in langs])


def quality_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic quality features + composite score: length, word stats,
    stopword ratio, alpha ratio. All IEEE-deterministic arithmetic."""
    from .dedup import spread

    stop = LANG_MARKERS["en"]
    quoted = ", ".join(f"'{m}'" for m in stop)
    base = spread(docs, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("t"),
        F.split(F.col(text_col), " ").alias("words"),
    )
    feats = base.select(
        "doc_id",
        F.length("t").alias("n_chars"),
        F.size("words").alias("n_words"),
        (F.length(F.regexp_replace(F.col("t"), " ", "")).cast("double") / F.size("words")).alias(
            "avg_word_len"
        ),
        (F.expr(f"size(filter(words, w -> w IN ({quoted})))").cast("double") / F.size("words")).alias(
            "stopword_ratio"
        ),
        (F.regexp_count(F.col("t"), F.lit("[a-z]")).cast("double") / F.length("t")).alias(
            "alpha_ratio"
        ),
    )
    score = (
        F.least(F.col("n_words").cast("double") / 100.0, F.lit(1.0)) * 0.4
        + F.col("stopword_ratio") * 0.3
        + F.col("alpha_ratio") * 0.3
    )
    return feats.select("*", score.alias("quality_score"))


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens
    (letter runs / digit runs / single punctuation) + chars."""
    from .dedup import spread

    return spread(docs, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).alias("ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")).alias(
            "bpe_ish_tokens"
        ),
        F.length(F.col(text_col)).alias("n_chars"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: content digest of normalized text, order-free
    digest of the sorted word set, and a winnowing-style min-shingle digest
    (min md5 over word 4-grams — the rolling-hash representative)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    words = F.split(norm, " ")
    shingle4 = (
        "CASE WHEN size(words) >= 4 THEN "
        "array_min(transform(sequence(1, size(words) - 3), "
        "i -> md5(concat_ws(' ', element_at(words, i), element_at(words, i + 1), "
        "element_at(words, i + 2), element_at(words, i + 3))))) ELSE NULL END"
    )
    from .dedup import spread

    return spread(docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)), id_col).select(
        F.col("doc_id"), norm.alias("norm"), words.alias("words")
    ).select(
        "doc_id",
        F.md5(F.col("norm")).alias("content_fp"),
        F.md5(F.concat_ws(" ", F.array_sort(F.col("words")))).alias("bag_of_words_fp"),
        F.expr(shingle4).alias("min_shingle_fp"),
    )


def repetition_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals for corpus filtering: per-document
    duplicate-token fraction (1 - distinct/total) and top-token fraction
    (modal token count / total). Highly repetitive documents (boilerplate,
    keyword stuffing, degenerate generations) score high on both.

    Fully distributed: explode -> two-level hash aggregate keyed by
    (doc, token) then doc. Both levels are map-side-combinable shuffles and
    per-document state is just its distinct-token set — no driver collects,
    no Python. Fractions are emitted as integer micro-units so the result is
    order-independent and oracle-exact."""
    from .dedup import spread

    toks = (
        spread(docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("t")), "doc_id")
        .select("doc_id", F.explode(F.split(F.lower(F.col("t")), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    per_tok = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    return per_tok.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.floor((F.lit(1.0) - F.count(F.lit(1)) / F.sum("c")) * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("dup_token_micros"),
        F.floor(F.max("c") / F.sum("c") * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("top_token_micros"),
    )
