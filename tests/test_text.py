"""Text-analysis operator tests."""

import os

from parq_tools_spark.operators.text import (
    with_fingerprint,
    with_language_id,
    with_quality_score,
    with_text_stats,
)


def test_text_stats_basic(spark):
    df = spark.createDataFrame([(1, "Hello, World 42!")], "id int, text string")
    row = with_text_stats(df).collect()[0]
    assert row.n_chars == 16
    assert row.n_tokens == 3
    assert row.punct_ratio == 2 / 16  # ',' and '!'
    assert row.digit_ratio == 2 / 16
    assert row.upper_ratio == 2 / 16
    assert row.stopword_ratio == 0.0


def test_text_stats_whitespace_edges(spark):
    df = spark.createDataFrame([(1, "  a  b  "), (2, "")], "id int, text string")
    rows = {r.id: r for r in with_text_stats(df).collect()}
    assert rows[1].n_tokens == 2
    assert rows[2].n_tokens == 0
    assert rows[2].avg_token_len == 0.0  # guarded division


def test_stopword_ratio(spark):
    df = spark.createDataFrame([(1, "the cat and the hat")], "id int, text string")
    row = with_text_stats(df).collect()[0]
    assert row.stopword_ratio == 3 / 5  # the, and, the


def test_quality_score_range_and_signal(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = with_quality_score(docs)
    mn, mx = out.selectExpr(
        "min(quality_score)", "max(quality_score)"
    ).collect()[0]
    assert 0.0 <= mn <= mx <= 1.0
    junk = spark.createDataFrame([(1, "!!! ??? ...")], "id int, text string")
    good = spark.createDataFrame(
        [(1, "The quick brown fox jumps over the lazy dog near the river bank today.")],
        "id int, text string",
    )
    junk_score = with_quality_score(junk).collect()[0].quality_score
    good_score = with_quality_score(good).collect()[0].quality_score
    assert good_score > junk_score


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat and that is that"),
            (2, "el perro de la casa que los gatos"),
            (3, "le chat est dans les maisons des gens"),
            (4, "xyzzy plugh qwerty"),
        ],
        "id int, text string",
    )
    rows = {r.id: r.lang_pred for r in with_language_id(df).collect()}
    assert rows[1] == "en"
    assert rows[2] == "es"
    assert rows[3] == "fr"
    assert rows[4] == "und"


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different")],
        "id int, text string",
    )
    rows = {r.id: r.fingerprint for r in with_fingerprint(df).collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]


def test_text_ops_on_real_documents(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = with_text_stats(docs)
    # the documents table carries its own n_chars; ours must agree
    assert out.filter("n_chars <> length(text)").count() == 0
    assert out.filter("n_tokens <= 0").count() == 0


def test_with_clean_text(spark):
    from parq_tools_spark.operators.text import with_clean_text

    df = spark.createDataFrame(
        [(1, "  a\x00b\tc\n\nd   e\x7f ")], "id int, text string"
    )
    row = with_clean_text(df).collect()[0]
    assert row.clean_text == "a b c d e"


def test_bpe_token_count(spark):
    from parq_tools_spark.operators.text import bpe_token_count, token_count

    df = spark.createDataFrame(
        [
            (1, "hello world"),            # 2 pre-tokens
            (2, "it's a test, isn't it?"), # it 's _a _test , _isn 't _it ? = 9
            (3, "abc123!!"),               # abc 123 !! = 3
            (4, ""),                       # 0
        ],
        "id long, text string",
    )
    rows = {r.id: (r.ws, r.bpe) for r in df.select(
        "id",
        token_count("text").alias("ws"),
        bpe_token_count("text").alias("bpe"),
    ).collect()}
    assert rows[1] == (2, 2)
    assert rows[2] == (5, 9)
    assert rows[3] == (1, 3)
    assert rows[4] == (0, 0)


def test_pii_redaction(spark):
    from parq_tools_spark.operators.text import with_pii_redacted

    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@sub.example.org thanks"),
            (2, "call +1-555-0123 or 212.555.9876 x77"),
            (3, "server at 192.168.1.254 and 10.0.0.1"),
            (4, "version 1.2.3 should stay, 1.2.3.4 should not"),
            (5, "clean text, nothing to scrub"),
        ],
        "id long, text string",
    )
    rows = {r.id: r for r in with_pii_redacted(df).collect()}
    assert rows[1].n_email == 1 and "<EMAIL>" in rows[1].redacted_text
    assert "jane" not in rows[1].redacted_text
    assert rows[2].n_phone == 2 and rows[2].redacted_text.count("<PHONE>") == 2
    assert rows[3].n_ipv4 == 2 and rows[3].redacted_text.count("<IP>") == 2
    # a 3-part version string is NOT an IPv4; a 4-part one is
    assert rows[4].n_ipv4 == 1 and "1.2.3 should stay" in rows[4].redacted_text
    clean = rows[5]
    assert (clean.n_email, clean.n_phone, clean.n_ipv4) == (0, 0, 0)
    assert clean.redacted_text == "clean text, nothing to scrub"


def test_pii_counts_reconcile_with_placeholders(spark):
    """Counts are computed on the progressively-redacted text, so every
    count corresponds to a placeholder in the output: a phone-shaped
    substring inside an email local-part is part of the email, not a
    phone."""
    from parq_tools_spark.operators.text import with_pii_redacted

    df = spark.createDataFrame(
        [(1, "reach me: 1-555-0123b@example.com")], "id long, text string"
    )
    row = with_pii_redacted(df).collect()[0]
    assert row.n_email == 1
    assert row.n_phone == 0  # consumed by the email redaction
    assert row.redacted_text == "reach me: <EMAIL>"
    assert row.redacted_text.count("<PHONE>") == row.n_phone


def test_pii_null_text_counts_zero(spark):
    """Null text keeps a null redacted_text but 0 (not null) counts, so
    downstream quarantine arithmetic (n_email + n_phone > k) cannot
    silently skip null-text rows."""
    from parq_tools_spark.operators.text import with_pii_redacted

    df = spark.createDataFrame(
        [(1, None), (2, "a@b.org")], "id long, text string"
    )
    rows = {r.id: r for r in with_pii_redacted(df).collect()}
    assert rows[1].redacted_text is None
    assert (rows[1].n_email, rows[1].n_phone, rows[1].n_ipv4) == (0, 0, 0)
    assert rows[2].n_email == 1


def test_chunk_documents_tiling_and_overlap(spark):
    from parq_tools_spark.operators.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    df = spark.createDataFrame(
        [(1, words), (2, "short doc"), (3, "   "), (4, "exact four token doc")],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.chunk_idx): r
        for r in chunk_documents(df, chunk_size=4, overlap=1).collect()
    }
    # doc 1: stride 3 over 10 tokens -> starts 0,3,6 -> 3 chunks
    assert sorted(k for k in out if k[0] == 1) == [(1, i) for i in range(3)]
    assert out[(1, 0)].chunk_text == "w0 w1 w2 w3"
    assert out[(1, 1)].chunk_text == "w3 w4 w5 w6"  # 1-token overlap
    assert out[(1, 2)].chunk_text == "w6 w7 w8 w9"
    # every token covered
    covered = []
    for i in range(3):
        covered += out[(1, i)].chunk_text.split()
    assert sorted(set(covered)) == sorted(f"w{i}" for i in range(10))
    # short doc: one chunk, whole text
    assert sorted(k for k in out if k[0] == 2) == [(2, 0)]
    assert out[(2, 0)].chunk_text == "short doc" and out[(2, 0)].n_tokens == 2
    # whitespace-only doc: one chunk with ZERO tokens (split('')'s
    # [''] artifact is normalized away; both engines agree)
    assert out[(3, 0)].n_tokens == 0 and out[(3, 0)].chunk_text == ""
    # exactly chunk_size tokens: one chunk, no spill
    assert sorted(k for k in out if k[0] == 4) == [(4, 0)]
    assert out[(4, 0)].n_tokens == 4


def test_chunk_documents_validation(spark):
    import pytest as _pytest

    from parq_tools_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_size=0)
    with _pytest.raises(ValueError):
        chunk_documents(df, chunk_size=4, overlap=4)


def test_chunk_by_sentences_keeps_sentences_intact(spark):
    from parq_tools_spark.operators.text import chunk_by_sentences

    df = spark.createDataFrame(
        [
            (1, "a b c. d e f g! h i? j k l m n o p q"),
            (2, "no terminators at all just words"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.chunk_idx): r
        for r in chunk_by_sentences(df, max_tokens=6).collect()
    }
    # doc 1: sentences of 3,4,2,8 tokens; offsets 0,3,7,9 -> chunks
    # 0,0,1,1 (the 8-token tail stays whole even though it overruns)
    assert out[(1, 0)].chunk_text == "a b c. d e f g!"
    assert out[(1, 0)].n_sentences == 2 and out[(1, 0)].n_tokens == 7
    assert out[(1, 1)].chunk_text == "h i? j k l m n o p q"
    assert out[(1, 1)].n_tokens == 10
    # no terminators: one sentence, one chunk, intact
    assert sorted(k for k in out if k[0] == 2) == [(2, 0)]
    assert out[(2, 0)].chunk_text == "no terminators at all just words"
    # empty text: single empty chunk, zero tokens
    assert out[(3, 0)].n_tokens == 0 and out[(3, 0)].chunk_text == ""
    with __import__("pytest").raises(ValueError):
        chunk_by_sentences(df, max_tokens=0)


# --------------------------------------------------- property checks
from hypothesis import given, settings
from hypothesis import strategies as st


def _ref_chunks(words, size, overlap):
    """Reference tiling model: starts 0, s, 2s, ... until coverage."""
    s = size - overlap
    if len(words) <= size:
        return [words]
    n_extra = -(-(len(words) - size) // s)  # ceil
    return [words[i * s : i * s + size] for i in range(n_extra + 1)]


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_chunk_documents_tiling_invariants(spark, data):
    from parq_tools_spark.operators.text import chunk_documents

    n_words = data.draw(st.integers(0, 40))
    size = data.draw(st.integers(1, 12))
    overlap = data.draw(st.integers(0, min(size - 1, 6)))
    words = [f"w{i}" for i in range(n_words)]
    df = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    got = {
        r.chunk_idx: r.chunk_text.split() if r.chunk_text else []
        for r in chunk_documents(
            df, chunk_size=size, overlap=overlap
        ).collect()
    }
    ref = _ref_chunks(words if words else [""], size, overlap)
    ref = [
        [w for w in chunk if w != ""] for chunk in ref
    ]  # empty text = one chunk with zero tokens in both engines
    assert sorted(got) == list(range(len(ref)))
    for i, chunk in enumerate(ref):
        assert got[i] == chunk
    # every token covered at least once, in order within each chunk
    covered = set(w for c in ref for w in c)
    assert covered == set(words)


def test_chunk_by_sentences_null_text_kept_as_empty(spark):
    from parq_tools_spark.operators.text import chunk_by_sentences

    df = spark.createDataFrame(
        [(1, None), (2, "real text here")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in chunk_by_sentences(df, max_tokens=8).collect()}
    assert out[1].n_tokens == 0 and out[1].chunk_text == ""  # not dropped
    assert out[2].chunk_text == "real text here"


def test_chunk_documents_null_text_kept_as_empty(spark):
    """Same NULL contract as chunk_by_sentences: a NULL-text document
    yields one (empty) chunk row instead of vanishing through
    split(NULL) -> sequence/explode."""
    from parq_tools_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, None), (2, "alpha beta gamma")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in chunk_documents(df, chunk_size=8).collect()}
    assert set(out) == {1, 2}  # NULL doc not dropped
    assert out[1].chunk_idx == 0 and out[1].chunk_text == ""
    assert out[1].n_tokens == 0  # '' is zero tokens, not ['']
    assert out[2].chunk_text == "alpha beta gamma"
    assert out[2].n_tokens == 3


def test_chunk_by_sentences_giant_doc_cap(spark):
    """One pathological document cannot own a task: sentences beyond
    max_sentences_per_doc are truncated BEFORE the explode, so the
    excess never enters the shuffle. Normal docs are untouched."""
    from parq_tools_spark.operators.text import chunk_by_sentences

    giant = ("word one two. " * 50).strip()  # 50 sentences
    df = spark.createDataFrame(
        [(1, giant), (2, "small doc. two sentences.")],
        "doc_id long, text string",
    )
    out = chunk_by_sentences(df, max_tokens=8, max_sentences_per_doc=5)
    agg = {
        r.doc_id: r.s
        for r in out.groupBy("doc_id")
        .agg(__import__("pyspark.sql.functions", fromlist=["sum"]).sum(
            "n_sentences"
        ).alias("s"))
        .collect()
    }
    assert agg[1] == 5  # truncated at the cap
    assert agg[2] == 2  # untouched
    # uncapped keeps everything
    full = chunk_by_sentences(df, max_tokens=8, max_sentences_per_doc=None)
    n1 = sum(
        r.n_sentences for r in full.collect() if r.doc_id == 1
    )
    assert n1 == 50
