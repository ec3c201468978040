"""PII scrubbing, repetition signals, unigram surprisal, cross-corpus dedup
— semantics pinned on hand-computable frames (the DuckDB parity for the
driver queries q72-q75 lives in test_oracle_parity.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from pytrousse_spark.functions import text as tx
from pytrousse_spark.functions.pii import pii_counts, scrub_pii
from pytrousse_spark.operators import dedup as dd


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_scrub_pii_all_types(spark):
    raw = (
        "mail bob@site.org ip 192.168.0.1 ssn 123-45-6789 "
        "card 4111-1111-1111-1111 phone 555-123-4567 clean end"
    )
    df = spark.createDataFrame([(raw,)], ["t"])
    got = _one(df.select(scrub_pii(F.col("t")).alias("s")))["s"]
    assert got == (
        "mail <EMAIL> ip <IP> ssn <SSN> card <CARD> phone <PHONE> clean end"
    )


def test_pii_counts_independent_and_card_not_eaten_by_phone(spark):
    raw = "a@b.co c@d.io 4111-1111-1111-1111 call 555-123-4567"
    df = spark.createDataFrame([(raw,)], ["t"])
    row = _one(df.select(*[v.alias(k) for k, v in pii_counts(F.col("t")).items()]))
    assert row["n_email"] == 2
    assert row["n_card"] == 1
    assert row["n_phone"] == 1  # the card's digit runs must not count
    assert row["n_ssn"] == 0 and row["n_ip"] == 0


def test_scrub_pii_leaves_clean_text_alone(spark):
    raw = "nothing sensitive here just words and 42 numbers"
    df = spark.createDataFrame([(raw,)], ["t"])
    assert _one(df.select(scrub_pii(F.col("t")).alias("s")))["s"] == raw


def test_repetition_stats_known_values(spark):
    # doc 1: tokens [a a a b] -> distinct 2/4, top token 3/4;
    # bigrams [a a, a a, a b] -> top share 2/3
    df = spark.createDataFrame([(1, "a a a b")], ["doc_id", "text"])
    row = _one(tx.repetition_stats(df, "text", "doc_id"))
    assert row["n_tokens"] == 4
    assert row["distinct_ratio"] == 0.5
    assert row["top_token_share"] == 0.75
    assert row["top_ngram_share"] == round(2 / 3, 6)


def test_unigram_surprisal_known_values(spark):
    # corpus tokens: a a b -> p(a)=2/3, p(b)=1/3
    df = spark.createDataFrame([(1, "a a"), (2, "b")], ["doc_id", "text"])
    got = {
        r["doc_id"]: r["mean_surprisal"]
        for r in tx.unigram_surprisal(df, "text", "doc_id").collect()
    }
    assert got[1] == round(round(-math.log(2 / 3), 6), 4)
    assert got[2] == round(round(-math.log(1 / 3), 6), 4)


_REF_TEXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3


def test_cross_dedup_drops_exact_and_near_keeps_novel(spark):
    near = _REF_TEXT.replace("theta", "thetaX", 1)
    novel = "entirely different material with no overlap at all in any shingle here"
    incoming = spark.createDataFrame(
        [(10, _REF_TEXT), (11, near), (12, novel)], ["doc_id", "text"]
    )
    reference = spark.createDataFrame([(1, _REF_TEXT)], ["doc_id", "text"])
    out = dd.cross_dedup(
        incoming, reference, "text", "doc_id",
        num_perm=8, bands=4, threshold=0.5,
    )
    assert {r["doc_id"] for r in out.collect()} == {12}


def test_cross_dedup_keeps_short_null_fingerprint_doc(spark):
    # fewer tokens than shingle_n -> NULL fingerprint; must be KEPT, not
    # collapsed into the reference by a null-equality accident
    incoming = spark.createDataFrame([(10, "so short")], ["doc_id", "text"])
    reference = spark.createDataFrame([(1, "an other")], ["doc_id", "text"])
    out = dd.cross_dedup(incoming, reference, "text", "doc_id")
    assert {r["doc_id"] for r in out.collect()} == {10}


def test_cross_near_dedup_pairs_only_cross_side(spark):
    # incoming contains an internal duplicate pair (10, 11) - it must NOT
    # appear; only incoming-vs-reference pairs may
    incoming = spark.createDataFrame(
        [(10, _REF_TEXT), (11, _REF_TEXT)], ["doc_id", "text"]
    )
    reference = spark.createDataFrame([(10, _REF_TEXT)], ["doc_id", "text"])
    pairs = dd.cross_near_dedup_pairs(
        incoming, reference, "text", "doc_id",
        num_perm=8, bands=4, threshold=0.5,
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # id 10 exists on BOTH sides with the same text: the pair (10, 10) is a
    # legitimate cross-side match, proving sides are tracked by tag, not id
    assert got == {(10, 10), (11, 10)}


def test_duplicated_ngram_stats_planted(spark):
    from pytrousse_spark.functions.text import duplicated_ngram_stats

    rows = [
        (1, "a b c d e"),          # exact twin of 2 -> every 3-gram shared
        (2, "a b c d e"),
        (3, "p q r s t"),          # unique -> zero shared
        (4, "x y"),                # shorter than n -> zero grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           duplicated_ngram_stats(df, "text", "doc_id", n=3).collect()}
    assert out[1]["total_ngrams"] == 3 and out[1]["dup_ratio"] == 1.0
    assert out[3]["dup_ngrams"] == 0 and out[3]["dup_ratio"] == 0.0
    assert out[4]["total_ngrams"] == 0 and out[4]["dup_ratio"] is None


def test_remove_duplicated_ngrams_planted(spark):
    from pytrousse_spark.functions.text import remove_duplicated_ngrams

    rows = [
        (1, "a b c d e"),          # twin of 2: every position covered
        (2, "a b c d e"),
        (3, "p q r s t"),          # untouched
        (4, "x y"),                # too short for grams: untouched
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           remove_duplicated_ngrams(df, "text", "doc_id", n=3).collect()}
    assert out[1]["clean_text"] == "" and out[1]["n_removed"] == 5
    assert out[3]["clean_text"] == "p q r s t" and out[3]["n_removed"] == 0
    assert out[4]["clean_text"] == "x y" and out[4]["n_kept"] == 2


def test_pmi_collocations_finds_planted_phrase(spark):
    from pytrousse_spark.functions.text import pmi_collocations

    # "new york" always adjacent; filler tokens independent
    docs = [(i, f"new york t{i} u{i} v{i} w{i}") for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = pmi_collocations(df, "text", top_k=5, min_count=5).collect()
    assert rows, "min_count gate must keep the planted phrase"
    assert (rows[0]["w1"], rows[0]["w2"]) == ("new", "york")
    assert rows[0]["pair_count"] == 10 and rows[0]["pmi"] > 0


def test_bigram_nll_known_values(spark):
    # corpus: "a b a b" + "c" -> bigrams: (a,b)x2, (b,a)x1; V=3
    # c(a)=2, c(b)=2, c(c)=1
    # p(b|a) = (2+1)/(2+3) = 0.6 ; p(a|b) = (1+1)/(2+3) = 0.4
    import math

    df = spark.createDataFrame([(1, "a b a b"), (2, "c")], ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in tx.bigram_nll(df, "text", "doc_id").collect()}
    assert 2 not in rows  # single-token doc has no bigram positions
    r1 = rows[1]
    assert r1["n_bigrams"] == 3
    t_ab = round(round(-math.log(3 / 5), 6) * 1e6)
    t_ba = round(round(-math.log(2 / 5), 6) * 1e6)
    assert r1["nll"] == round((2 * t_ab + t_ba) / 1e6 / 3, 4)


def test_bigram_nll_flags_noise_over_template(spark):
    template = "the quick brown fox jumps over the lazy dog " * 5
    noise = "qq zz kx vw jj pq xr tz wq kk mn bv cx zl pr ts wd fh gj kl"
    corpus = [(i, template) for i in range(8)] + [(100, noise)]
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = {r["doc_id"]: r["nll"] for r in tx.bigram_nll(df, "text", "doc_id").collect()}
    assert got[100] > got[0]  # unseen bigrams cost more than templated ones


# ---------------------------------------------------------------------------
# readability census laws (round 7)
# ---------------------------------------------------------------------------
def test_readability_hand_scored(spark):
    from pytrousse_spark.operators.corpus import readability_census

    rows = [
        # 4 words, 1 sentence, syllables: the=1, cat=1, sat=1, down=1
        # fre = 206.835 - 1.015*4 - 84.6*1 = 118.175 -> easy band
        (1, "The cat sat down.", "en"),
        # polysyllabic monster, 3 words 1 sentence: vowel GROUPS —
        # extraordinary=5 [e,ao,i,a,y], intelligence=5, considerable=5
        # fre = 206.835 - 1.015*3 - 84.6*(15/3) = -219.21 -> difficult
        (2, "extraordinary intelligence considerable", "en"),
        # zero words -> unscored
        (3, "1234 5678 !!!", "en"),
        (4, "Um texto simples de teste.", "pt"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {
        r["group"]: r
        for r in readability_census(df, "text", "lang").collect()
    }
    en = got["en"]
    assert en["n_docs"] == 3 and en["n_unscored"] == 1
    assert en["n_easy"] == 1 and en["n_difficult"] == 1
    assert en["n_standard"] == 0
    # avg of the two scored docs
    fre1 = 206.835 - 1.015 * 4 - 84.6 * 1
    fre2 = 206.835 - 1.015 * 3 - 84.6 * (15 / 3)
    assert abs(en["avg_fre"] - (fre1 + fre2) / 2) < 1e-3
    assert got["pt"]["n_docs"] == 1


# ---------------------------------------------------------------------------
# CMH stratified test laws (round 7)
# ---------------------------------------------------------------------------
def test_cmh_detects_within_stratum_association(spark):
    from pyspark.sql import functions as F

    from pytrousse_spark.operators.cohort import cmh_test

    # strong association in BOTH strata, opposite marginal sizes
    rows = []
    for st, n_exp in (("A", 50), ("B", 20)):
        rows += [(st, 1, 1)] * n_exp + [(st, 1, 0)] * 10
        rows += [(st, 0, 1)] * 10 + [(st, 0, 0)] * n_exp
    df = spark.createDataFrame(rows, ["s", "x", "y"])
    row = cmh_test(df, "s", F.col("x"), F.col("y")).collect()[0]
    assert row["n_strata"] == 2
    assert row["p_value"] < 0.001
    assert row["or_mh"] > 5


def test_cmh_simpsons_paradox_null(spark):
    from pyspark.sql import functions as F

    from pytrousse_spark.operators.cohort import cmh_test

    # within each stratum x and y are INDEPENDENT, but stratum size
    # imbalance creates a pooled (marginal) association — CMH must
    # NOT reject while the pooled chi2 would
    rows = []
    # stratum A: mostly exposed, high base rate, independent
    rows += [("A", 1, 1)] * 40 + [("A", 1, 0)] * 40
    rows += [("A", 0, 1)] * 10 + [("A", 0, 0)] * 10
    # stratum B: mostly unexposed, low base rate, independent
    rows += [("B", 1, 1)] * 2 + [("B", 1, 0)] * 18
    rows += [("B", 0, 1)] * 8 + [("B", 0, 0)] * 72
    df = spark.createDataFrame(rows, ["s", "x", "y"])
    row = cmh_test(df, "s", F.col("x"), F.col("y")).collect()[0]
    # exact independence within strata -> chi2 ~ 0 (continuity clamp)
    assert row["chi2"] == 0.0
    assert row["p_value"] == 1.0
    assert abs(row["or_mh"] - 1.0) < 1e-6


# ---------------------------------------------------------------------------
# TextRank keyword laws (round 7)
# ---------------------------------------------------------------------------
def test_textrank_hub_outranks_leaves(spark):
    from pytrousse_spark.operators.corpus import textrank_keywords

    # 'central' is adjacent to many distinct words; leaves see only it
    docs = [
        (i, f"central word{chr(97 + i)}{chr(97 + i)} central"
            f" word{chr(97 + i)}{chr(97 + i)}")
        for i in range(12)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = textrank_keywords(df, "text", top_k=5, iters=6).collect()
    assert rows[0]["token"] == "central"
    assert rows[0]["rank_micro"] > rows[1]["rank_micro"]
    # short tokens are filtered by the min-length gate
    df2 = spark.createDataFrame(
        [(1, "aa bb aa bb considerable extraordinary considerable")],
        ["doc_id", "text"],
    )
    toks = {
        r["token"]
        for r in textrank_keywords(df2, "text", top_k=10).collect()
    }
    assert "aa" not in toks and "considerable" in toks
