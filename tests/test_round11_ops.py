"""Round-11 operator tests: profile-learned n-gram language ID
(Cavnar-Trenkle), DCT perceptual hash (pHash), and the cross-modal
pairing audit. Each pins the operator's defining property, not just
row counts — the DuckDB oracles in queries/extensions.py cover parity.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# langid_ngram_profile
# --------------------------------------------------------------------------


def _lang_docs(spark, n_per_lang=8):
    """Two artificial 'languages' with disjoint trigram inventories:
    aaa-speak and zzz-speak. Even ids train, odd ids are holdout."""
    rows = []
    for i in range(n_per_lang):
        rows.append((2 * i, "aaab aaac aaad aaab aaac", "aa"))
        rows.append((2 * i + 1, "aaab aaad aaac aaab aaad", "aa"))
        rows.append((100 + 2 * i, "zzzy zzzx zzzw zzzy zzzx", "zz"))
        rows.append((101 + 2 * i, "zzzy zzzw zzzx zzzy zzzw", "zz"))
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


def test_langid_separates_disjoint_trigram_languages(spark):
    from adventureworkslakehousepoc_spark.operators.text_analysis import (
        langid_ngram_profile,
    )

    out = langid_ngram_profile(_lang_docs(spark)).collect()
    assert len(out) == 32
    # disjoint inventories => every doc lands on its own language, both
    # the train-split docs and the holdout docs
    assert all(r.correct == 1 for r in out), [
        (r.doc_id, r.lang, r.pred_lang) for r in out if r.correct != 1
    ]
    # oop distance to the right language must beat the all-absent
    # penalty floor: a fully-missing profile costs doc_profile_size * P
    assert all(r.oop_dist < 15 * 40 for r in out)


def test_langid_is_deterministic_under_reordering(spark):
    from adventureworkslakehousepoc_spark.operators.text_analysis import (
        langid_ngram_profile,
    )

    docs = _lang_docs(spark)
    a = {r.doc_id: r.pred_lang for r in langid_ngram_profile(docs).collect()}
    b = {
        r.doc_id: r.pred_lang
        for r in langid_ngram_profile(
            docs.orderBy(F.desc("doc_id")).repartition(7)
        ).collect()
    }
    assert a == b


def test_langid_short_texts_are_dropped_not_crashed(spark):
    from adventureworkslakehousepoc_spark.operators.text_analysis import (
        langid_ngram_profile,
    )

    docs = spark.createDataFrame(
        [(0, "ab", "aa"), (1, "aaab aaac aaab", "aa"), (2, "aaac aaab aaac", "aa")],
        "doc_id bigint, text string, lang string",
    )
    out = langid_ngram_profile(docs).collect()
    assert sorted(r.doc_id for r in out) == [1, 2]


# --------------------------------------------------------------------------
# image_phash_pairs
# --------------------------------------------------------------------------


def test_phash_identical_content_pairs_at_hamming_zero(spark):
    from adventureworkslakehousepoc_spark.operators.multimodal import (
        image_phash_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "same banner text"), (2, "same banner text"), (3, "other words here")],
        "doc_id bigint, text string",
    )
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in image_phash_pairs(docs).collect()}
    assert pairs.get((1, 2)) == 0


def test_phash_compact_grid4_variant_also_pairs_duplicates(spark):
    from adventureworkslakehousepoc_spark.operators.multimodal import (
        image_phash_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "same banner text"), (2, "same banner text"), (3, "unrelated")],
        "doc_id bigint, text string",
    )
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in image_phash_pairs(
            docs, grid=4, bands=3, max_hamming=2
        ).collect()
    }
    assert pairs.get((1, 2)) == 0


def test_dct16_table_is_orthogonal_in_micros(spark):
    from adventureworkslakehousepoc_spark.operators.multimodal import (
        DCT16_COS_MICROS as ct,
    )

    for u in range(8):
        for v in range(8):
            s = sum(
                ct[((2 * x + 1) * u) % 32] * ct[((2 * x + 1) * v) % 32]
                for x in range(8)
            )
            if u == v:
                assert s >= 4 * 10**12 - 10**7
            else:
                assert abs(s) < 10**7, (u, v, s)


def test_separable_dct_equals_direct_2d_weights(spark):
    """The separable row/column decomposition must reproduce the direct
    2D basis-product sum exactly (integer associativity) — evaluated on
    a deterministic pseudo-random gray grid in pure Python."""
    from adventureworkslakehousepoc_spark.operators.multimodal import (
        DCT16_COS_MICROS as ct,
        dct_sign_fp_terms,
    )

    grid = 8
    gr = [(i * 97 + 31) % 256 for i in range(grid * grid)]
    rowdct_e, coefs_e = dct_sign_fp_terms(grid, lambda n, i: f"{n}[{i - 1}]")
    env = {"gr": gr}
    env["rd"] = [eval(e, {}, env) if e != "cast(0 as bigint)" else 0
                 for e in [x.replace(" as bigint)", ")").replace("cast(", "(")
                           for x in rowdct_e]]
    got = [eval(e, {}, env) if e != "cast(0 as bigint)" else 0
           for e in [x.replace(" as bigint)", ")").replace("cast(", "(")
                     for x in coefs_e]]
    for k in range(1, grid * grid):
        u, v = k % grid, k // grid
        direct = sum(
            gr[y * grid + x]
            * ct[((2 * x + 1) * u) % 32]
            * ct[((2 * y + 1) * v) % 32]
            for x in range(grid)
            for y in range(grid)
        )
        assert got[k - 1] == direct, k


def test_phash_rejects_threshold_breaking_pigeonhole(spark):
    from adventureworkslakehousepoc_spark.operators.multimodal import (
        image_phash_pairs,
    )

    docs = spark.createDataFrame([(1, "x y z")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="pigeonhole"):
        image_phash_pairs(docs, max_hamming=4, bands=4)


def test_dct_weight_table_is_an_orthogonal_basis_in_micros(spark):
    """Row-orthogonality of the embedded cosine table at the micro
    scale: sum_x ct[(2x+1)u % 16] * ct[(2x+1)v % 16] for u != v must
    vanish to rounding (|.| <= a few micro^2 ulps), and must be large
    for u == v — the property that makes the AC signs a basis
    decomposition rather than arbitrary projections."""
    from adventureworkslakehousepoc_spark.operators.multimodal import (
        DCT_COS_MICROS as ct,
    )

    for u in range(4):
        for v in range(4):
            s = sum(
                ct[((2 * x + 1) * u) % 16] * ct[((2 * x + 1) * v) % 16]
                for x in range(4)
            )
            if u == v:
                assert s >= 2 * 10**12 - 10**7
            else:
                assert abs(s) < 10**7, (u, v, s)


# --------------------------------------------------------------------------
# crossmodal_pair_audit
# --------------------------------------------------------------------------


def test_crossmodal_audit_consistent_corpus_passes_all_checks(spark):
    from adventureworkslakehousepoc_spark.operators.multimodal import (
        crossmodal_pair_audit,
    )

    docs = spark.createDataFrame(
        [
            (i, " ".join(["w"] * (10 + i)), f"src{i % 2}")
            for i in range(8)
        ],
        "doc_id bigint, text string, source string",
    )
    out = crossmodal_pair_audit(docs).collect()
    assert sum(r.n_docs for r in out) == 8
    # the relational encoders emit spec-exact containers, so the decode
    # reconciliation must find every payload size-consistent
    assert all(r.n_audio_sized_ok == r.n_docs for r in out)
    assert all(r.n_video_sized_ok == r.n_docs for r in out)
    # n_samples = 32 + doc_id % 64 >= 32 > n_words in {10..17}: none
    # underscaled here
    assert all(r.n_audio_underscaled == 0 for r in out)


def test_crossmodal_audit_flags_underscaled_audio(spark):
    from adventureworkslakehousepoc_spark.operators.multimodal import (
        crossmodal_pair_audit,
    )

    # doc_id 0 -> n_samples 32; 40 words > 32 samples -> underscaled
    docs = spark.createDataFrame(
        [(0, " ".join(["w"] * 40), "s"), (1, " ".join(["w"] * 5), "s")],
        "doc_id bigint, text string, source string",
    )
    row = crossmodal_pair_audit(docs).collect()[0]
    assert row.n_audio_underscaled == 1
    assert row.total_samples == 32 + 33


# --------------------------------------------------------------------------
# codec degenerate-payload guards (Spark's sequence(0, -1) is DESCENDING)
# --------------------------------------------------------------------------


def test_wav_decode_zero_sample_file_yields_zero_stats(spark):
    """A canonical-header WAV with an empty data chunk is a valid file;
    the sample fold must short-circuit to zeros, not fold sequence(0,-1)'s
    descending [0, -1] garbage indices."""
    import struct

    from adventureworkslakehousepoc_spark.operators.multimodal import (
        wav_pcm_decode,
    )

    def wav_bytes(n_samples):
        data = b"\x01\x00" * n_samples
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data
        )

    payloads = spark.createDataFrame(
        [(0, bytearray(wav_bytes(0))), (1, bytearray(wav_bytes(3)))],
        "doc_id bigint, payload binary",
    )
    got = {r.doc_id: r for r in wav_pcm_decode(payloads).collect()}
    assert got[0].n_samples == 0
    assert (got[0].sum_amplitude, got[0].sum_abs, got[0].peak_abs) == (0, 0, 0)
    assert got[1].n_samples == 3
    assert got[1].sum_amplitude == 3  # three samples of value 1
    assert got[1].peak_abs == 1


def test_wav_roundtrip_against_stdlib_wave_module(spark, tmp_path):
    """The relational decoder must agree with a file the stdlib `wave`
    writer produced — proof the codec reads REAL files, not just its own
    encoder's output."""
    import wave

    from adventureworkslakehousepoc_spark.operators.multimodal import (
        wav_pcm_decode,
    )

    path = tmp_path / "t.wav"
    samples = [100, -200, 32767, -32768, 0, 7]
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(16000)
        f.writeframes(b"".join(s.to_bytes(2, "little", signed=True) for s in samples))
    payloads = spark.createDataFrame(
        [(0, bytearray(path.read_bytes()))], "doc_id bigint, payload binary"
    )
    row = wav_pcm_decode(payloads).collect()[0]
    assert row.sample_rate == 16000
    assert row.n_samples == len(samples)
    assert row.sum_amplitude == sum(samples)
    assert row.sum_abs == sum(abs(s) for s in samples)
    assert row.peak_abs == 32768
