"""Text-analysis functions + multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pytrousse_spark.functions import text as tx
from pytrousse_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def docs(spark):
    from pytrousse_spark import read_parquet_df
    from tests.conftest import SF_DIR

    return read_parquet_df(spark, f"{SF_DIR}/documents.parquet")


def test_token_counts(spark):
    df = spark.createDataFrame([("Hello, world! 42",)], ["t"])
    r = df.select(
        tx.token_count(F.col("t")).alias("tc"),
        tx.bpe_ish_token_count(F.col("t")).alias("btc"),
    ).collect()[0]
    assert r["tc"] == 3           # whitespace tokens
    assert r["btc"] == 5          # hello , world ! 42


def test_lang_id_stopwords(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is in the house",),
            ("der Hund ist nicht ein Tier und das Haus",),
            ("el perro es un animal y la casa es grande",),
            ("xyzzy plugh qwerty",),
        ],
        ["t"],
    )
    got = [r[0] for r in df.select(tx.lang_id(F.col("t"))).collect()]
    assert got == ["en", "de", "es", "und"]


def test_quality_score_bounds(spark):
    df = spark.createDataFrame([("",), ("short",), ("a decent length sentence with reasonable words " * 3,)], ["t"])
    got = [r[0] for r in df.select(tx.quality_score(F.col("t"))).collect()]
    assert all(0.0 <= q <= 1.0 for q in got)
    assert got[0] < got[2]


def test_word_shingles_and_fingerprint(spark):
    df = spark.createDataFrame([("a b c d",), ("ab",)], ["t"])
    rows = df.select(
        tx.word_shingles(F.col("t"), 3).alias("sh"),
        tx.fingerprint(F.col("t")).alias("fp"),
    ).collect()
    assert rows[0]["sh"] == ["a b c", "b c d"]
    assert rows[1]["sh"] == ["ab"]          # shorter than n → whole text
    assert isinstance(rows[0]["fp"], int)
    # fingerprint is stable
    again = df.select(tx.fingerprint(F.col("t")).alias("fp")).collect()
    assert [r["fp"] for r in again] == [r["fp"] for r in rows]


def test_attach_media_and_decode_stub(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "world!")], ["doc_id", "text"])
    m = mm.attach_media_column(df, "text")
    metas = {r["doc_id"]: r["media_meta"] for r in m.collect()}
    assert metas[1]["byte_size"] == 5
    assert metas[1]["media_type"] == "image"
    assert len(metas[1]["sha256"]) == 64

    decoded = mm.decode_images(m, decoder="fake")
    assert decoded.columns == ["doc_id", "width", "height", "n_pixels", "checksum"]
    rows = {r["doc_id"]: r for r in decoded.collect()}
    assert rows[1]["n_pixels"] == rows[1]["width"] * rows[1]["height"]
    # deterministic
    again = {r["doc_id"]: r for r in mm.decode_images(m, decoder="fake").collect()}
    assert again[1] == rows[1]

    with pytest.raises(NotImplementedError):
        mm.decode_images(m)


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, "x" * 5000)], ["doc_id", "text"])
    m = mm.attach_media_column(df, "text", media_type="video")
    frames = mm.frame_sample_plan(m, every_nth=10)
    idx = sorted(r["frame_index"] for r in frames.collect())
    assert idx[0] == 0 and len(idx) > 1
    assert all(i % 10 == 0 for i in idx)


def test_chunk_documents_reconstructs_corpus(docs):
    """Chunks at zero overlap concatenate back to the tokenized documents;
    with overlap, consecutive chunks share exactly `overlap` tokens."""
    from pytrousse_spark.functions.text import chunk_documents

    sub = docs.limit(40)
    flat = chunk_documents(sub, "text", "doc_id", chunk_tokens=16, overlap=0)
    rebuilt = {}
    for r in sorted(flat.collect(), key=lambda r: (r["doc_id"], r["chunk_id"])):
        rebuilt.setdefault(r["doc_id"], []).extend(r["chunk_text"].split(" "))
    from pytrousse_spark.functions.text import tokens
    want = {
        r["doc_id"]: r["tk"]
        for r in sub.select("doc_id", tokens(F.col("text")).alias("tk")).collect()
        if r["tk"]
    }
    assert rebuilt == want

    ov = chunk_documents(sub, "text", "doc_id", chunk_tokens=16, overlap=4)
    by_doc = {}
    for r in sorted(ov.collect(), key=lambda r: (r["doc_id"], r["chunk_id"])):
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_text"].split(" "))
    for chunks in by_doc.values():
        for a, b in zip(chunks, chunks[1:]):
            # tokens past the stride boundary are the overlap both share
            # (either side may be truncated at the end of the document)
            shared = a[12:]
            assert shared == b[: len(shared)]

    with pytest.raises(ValueError):
        chunk_documents(sub, "text", "doc_id", chunk_tokens=8, overlap=8)


def test_wav_roundtrip_and_python_wave_agrees(spark):
    """The chunk-walking decoder must agree with Python's stdlib `wave`
    module on the same bytes — an independent reference decoder."""
    import io
    import wave

    from pytrousse_spark.operators.multimodal import (
        decode_wav_meta,
        synthesize_wav_column,
    )

    d = spark.createDataFrame(
        [(1, 20), (2, 7), (5, 33)], "doc_id long, n_tokens long"
    )
    wav = synthesize_wav_column(d)
    got = {r["doc_id"]: r for r in decode_wav_meta(wav).collect()}

    for row in wav.collect():
        with wave.open(io.BytesIO(bytes(row["media"]))) as w:
            g = got[row["doc_id"]]
            assert g["sample_rate"] == w.getframerate()
            assert g["channels"] == w.getnchannels()
            assert g["bit_depth"] == w.getsampwidth() * 8
            assert g["n_samples"] == w.getnframes() * 1  # frames == samples/ch
            assert g["n_samples"] == w.getnframes()


def test_wav_decoder_rejects_garbage(spark):
    from pytrousse_spark.operators.multimodal import decode_wav_meta

    bad = spark.createDataFrame(
        [(1, bytearray(b"not a wav file at all"))], "doc_id long, media binary"
    )
    with pytest.raises(Exception):
        decode_wav_meta(bad).collect()
