"""Repetition quality signals (Gopher family) + paragraph dedup."""

from pyspark.sql import functions as F

from parq_tools_spark.operators.dedup import dedupe_paragraphs
from parq_tools_spark.operators.repetition import (
    ngram_repetition_stats,
    with_line_repetition_stats,
    with_word_repetition_stats,
)


def _one(df, **filters):
    for k, v in filters.items():
        df = df.filter(F.col(k) == v)
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_word_repetition_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a c a"),  # a x3, b, c -> 5 words, 3 unique, 3 dup occ
            (2, "x y z"),
            (3, ""),
            (4, "   "),
        ],
        "id long, text string",
    )
    out = with_word_repetition_stats(df)
    r1 = _one(out, id=1)
    assert r1.n_words == 5 and r1.n_unique_words == 3
    assert abs(r1.frac_unique_words - 0.6) < 1e-12
    assert abs(r1.frac_dup_words - 0.6) < 1e-12
    r2 = _one(out, id=2)
    assert r2.frac_dup_words == 0.0 and r2.frac_unique_words == 1.0
    for blank in (3, 4):
        rb = _one(out, id=blank)
        assert rb.n_words == 0
        assert rb.frac_unique_words == 1.0 and rb.frac_dup_words == 0.0


def test_line_repetition(spark):
    df = spark.createDataFrame(
        [(1, "dup\nx\ndup\n- bullet\ntail..."), (2, "single")],
        "id long, text string",
    )
    out = with_line_repetition_stats(df)
    r1 = _one(out, id=1)
    assert r1.n_lines == 5
    assert abs(r1.frac_dup_lines - 0.4) < 1e-12
    assert abs(r1.frac_bullet_lines - 0.2) < 1e-12
    assert abs(r1.frac_ellipsis_lines - 0.2) < 1e-12
    r2 = _one(out, id=2)
    assert r2.n_lines == 1 and r2.frac_dup_lines == 0.0


def test_ngram_repetition_basic(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a"),  # bigrams: "a b","b a","a b","b a" -> both x2
            (2, "p q r"),  # "p q","q r" -> unique
            (3, "solo"),  # < n words
        ],
        "doc_id long, text string",
    )
    out = ngram_repetition_stats(df, id_col="doc_id", n=2)
    r1 = _one(out, doc_id=1)
    # tie on count=2 -> lexicographically smallest wins
    assert r1.top_ngram == "a b" and r1.top_ngram_count == 2
    # 2 occurrences * 3 chars / 9 chars of text
    assert abs(r1.top_ngram_char_frac - 6 / 9) < 1e-12
    # all 4 bigram occurrences are duplicates
    assert abs(r1.dup_ngram_char_frac - 1.0) < 1e-12
    r2 = _one(out, doc_id=2)
    assert r2.top_ngram == "p q" and r2.dup_ngram_char_frac == 0.0
    r3 = _one(out, doc_id=3)
    assert r3.top_ngram is None and r3.top_ngram_count == 0
    assert r3.top_ngram_char_frac == 0.0 and r3.dup_ngram_char_frac == 0.0


def test_ngram_repetition_preserves_all_docs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = ngram_repetition_stats(docs.select("doc_id", "text"), n=2)
    assert out.count() == docs.count()


def test_paragraph_dedupe_first_occurrence_wins(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha\nbeta\ngamma"),
            (2, "beta\ndelta"),
            (3, "alpha\nbeta"),
            (4, "unique"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedupe_paragraphs(df).collect()}
    assert out[1].dedup_text == "alpha\nbeta\ngamma" and out[1].n_paras_kept == 3
    assert out[2].dedup_text == "delta" and out[2].n_paras_kept == 1
    assert out[3].dedup_text == "" and out[3].n_paras_kept == 0
    assert out[4].dedup_text == "unique"


def test_paragraph_dedupe_dedupes_within_document(spark):
    df = spark.createDataFrame([(1, "x\ny\nx\nz")], "doc_id long, text string")
    out = dedupe_paragraphs(df).collect()[0]
    assert out.dedup_text == "x\ny\nz"


def test_paragraph_dedupe_min_chars_exempts_short(spark):
    df = spark.createDataFrame(
        [(1, "##\nlong paragraph one"), (2, "##\nlong paragraph one")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedupe_paragraphs(df, min_chars=5).collect()}
    # "##" kept in both docs (exempt); the long paragraph deduped
    assert out[1].dedup_text == "##\nlong paragraph one"
    assert out[2].dedup_text == "##"


def test_paragraph_dedupe_partition_independent(spark):
    rows = [(i, f"shared\nuniq-{i}") for i in range(50)]
    df1 = spark.createDataFrame(rows, "doc_id long, text string").repartition(1)
    df8 = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    r1 = {(r.doc_id, r.dedup_text) for r in dedupe_paragraphs(df1).collect()}
    r8 = {(r.doc_id, r.dedup_text) for r in dedupe_paragraphs(df8).collect()}
    assert r1 == r8
    # only doc 0 keeps "shared"
    kept_shared = [d for d, t in r1 if "shared" in t]
    assert kept_shared == [0]


def test_dup_occurrence_count_matches_naive(spark):
    """Property: the sorted-neighbor linear count equals the naive
    multiplicity definition on random token lists."""
    import random

    from pyspark.sql import functions as F

    from parq_tools_spark.operators.repetition import dup_occurrence_count

    rng = random.Random(7)
    rows = []
    for i in range(200):
        n = rng.randint(0, 30)
        toks = [rng.choice("abcdefg") for _ in range(n)]
        naive = sum(1 for t in toks if toks.count(t) >= 2)
        rows.append((i, toks, naive))
    df = spark.createDataFrame(
        rows, "id long, toks array<string>, naive long"
    )
    got = df.select(
        "id",
        "naive",
        dup_occurrence_count(F.array_sort("toks")).alias("linear"),
    )
    bad = got.filter(F.col("naive") != F.col("linear")).collect()
    assert bad == []


def test_ngram_stats_giant_doc_cap(spark):
    """max_tokens_per_doc truncates the token stream before gram
    generation: stats describe the head; grams never span the cut;
    the char denominator stays the full document."""
    from parq_tools_spark.operators.repetition import ngram_repetition_stats

    # head = 10 tokens of 'a b', tail = pathological repetition of 'z z'
    text = "a b " * 5 + "z z " * 50
    df = spark.createDataFrame([(1, text.strip())], "doc_id long, text string")
    capped = ngram_repetition_stats(df, n=2, max_tokens_per_doc=10).collect()[0]
    full = ngram_repetition_stats(df, n=2, max_tokens_per_doc=None).collect()[0]
    assert capped.top_ngram in ("a b", "b a")  # tail never seen
    assert full.top_ngram == "z z"
    # denominator is the full doc's chars: a truncated giant reads as
    # LOW repetition, not as fully-covered
    assert capped.top_ngram_char_frac < full.top_ngram_char_frac


def test_ngram_repetition_truncated_flag_null_text(spark):
    """truncated is a real boolean for every row — a NULL-text doc
    must read False, not NULL (a NULL would silently escape both
    `truncated` and `~truncated` quarantine filters)."""
    from parq_tools_spark.operators.repetition import ngram_repetition_stats

    df = spark.createDataFrame(
        [(1, None), (2, "a b " * 50), (3, "x y")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.truncated
        for r in ngram_repetition_stats(df, n=2, max_tokens_per_doc=10).collect()
    }
    assert got == {1: False, 2: True, 3: False}


class TestGopherRepetitionStats:
    def _one(self, spark, text, **kw):
        from parq_tools_spark.operators.repetition import (
            with_gopher_repetition_stats,
        )

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return with_gopher_repetition_stats(df, **kw).collect()[0]

    def test_top_ngram_char_frac_hand_computed(self, spark):
        import pytest as pt

        # "x y x y x y": 2-grams = [x y, y x, x y, y x, x y] ->
        # top = "x y" (3 occurrences, 3 chars); text is 11 chars
        r = self._one(spark, "x y x y x y")
        assert r["top_2gram_char_frac"] == pt.approx(9 / 11)
        # 3-grams: [x y x, y x y, x y x, y x y] -> top "x y x" x2
        assert r["top_3gram_char_frac"] == pt.approx(10 / 11)
        # 5-grams: [x y x y x, y x y x y] both unique -> dup 0
        assert r["dup_5gram_char_frac"] == 0.0

    def test_dup_ngram_char_frac_hand_computed(self, spark):
        import pytest as pt

        # "a b a b a b": 5-grams = [a b a b a, b a b a b] unique;
        # "a b c a b c a b c": 5-grams = [a b c a b, b c a b c,
        # c a b c a, a b c a b, b c a b c] -> 4 of 5 occurrences
        # duplicated, all grams 9 chars -> 36/45
        r = self._one(spark, "a b c a b c a b c")
        assert r["dup_5gram_char_frac"] == pt.approx(36 / 45)

    def test_line_and_paragraph_dups(self, spark):
        import pytest as pt

        r = self._one(spark, "dup\ndup\nother")
        assert r["dup_line_frac"] == pt.approx(2 / 3)
        assert r["dup_line_char_frac"] == pt.approx(6 / 11)
        # paragraphs split on blank lines
        r2 = self._one(spark, "p1\n\np1\n\npX")
        assert r2["dup_para_frac"] == pt.approx(2 / 3)
        assert r2["dup_para_char_frac"] == pt.approx(4 / 6)
        assert r2["dup_line_frac"] == pt.approx(2 / 3)

    def test_empty_and_null_are_zero(self, spark):
        from parq_tools_spark.operators.repetition import (
            GOPHER_REPETITION_THRESHOLDS,
            with_gopher_repetition_stats,
        )

        df = spark.createDataFrame(
            [(1, ""), (2, None)], "doc_id long, text string"
        )
        for r in with_gopher_repetition_stats(df).collect():
            for c in GOPHER_REPETITION_THRESHOLDS:
                assert r[c] == 0.0, (r["doc_id"], c)

    def test_token_cap_bounds_grams(self, spark):
        # 10-token doc with a 4-token cap: grams computed on the head
        r = self._one(
            spark, "a b a b c d e f g h", max_tokens_per_doc=4
        )
        # head "a b a b": 2-grams [a b, b a, a b] -> top "a b" x2
        assert r["top_2gram_char_frac"] == 2 * 3 / len("a b a b c d e f g h")
        assert r["truncated"]
        assert not self._one(spark, "a b a b")["truncated"]

    def test_tie_breaks_to_smallest_gram(self, spark):
        import pytest as pt

        # "b c b c a d a d": 2-grams [b c, c b, b c, c a, a d, d a,
        # a d] -> "a d" x2 and "b c" x2 tie; smallest gram "a d" wins
        from parq_tools_spark.operators.repetition import _top_run

        df = spark.createDataFrame(
            [(1, ["b c", "c b", "b c", "c a", "a d", "d a", "a d"])],
            "doc_id long, g array<string>",
        )
        r = df.select(
            _top_run(F.array_sort(F.col("g"))).alias("t")
        ).collect()[0]["t"]
        assert r["best"] == 2 and r["bg"] == "a d"


class TestGopherFullFilter:
    def test_conjunction_and_repetition_rejection(self, spark):
        from parq_tools_spark.operators.text import gopher_full_filter

        # doc 1: 60 diverse words with required words -> passes both
        diverse = (
            "the quick brown fox jumps over one lazy dog and then "
            "walks to be near of that have with some other distinct "
            "words appear here making this document look quite "
            "natural for a filter test since every token differs "
            "from its neighbors keeping repetition metrics low and "
            "quality metrics comfortably inside their bounds today"
        )
        # doc 2: passes the QUALITY half (length, required words) but
        # is one 2-gram repeated -> repetition half rejects
        repetitive = "the cat " * 30 + "to be of and that have with"
        df = spark.createDataFrame(
            [(1, diverse), (2, repetitive)], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r for r in gopher_full_filter(df).collect()
        }
        assert got[1]["gopher_pass"] and got[1]["gopher_full_pass"]
        assert got[2]["gopher_pass"]  # quality half alone would keep it
        assert got[2]["top_2gram_char_frac"] > 0.2
        assert not got[2]["gopher_full_pass"]

    def test_quality_failure_fails_composite(self, spark):
        from parq_tools_spark.operators.text import gopher_full_filter

        df = spark.createDataFrame(
            [(1, "too short")], "doc_id long, text string"
        )
        r = gopher_full_filter(df).collect()[0]
        assert not r["gopher_pass"] and not r["gopher_full_pass"]


def test_gopher_stats_temp_names_never_clobber_caller_columns(spark):
    """Caller columns spelled like the internal temporaries
    (_grs_*/_grt_*/_grc_*/_rep_sorted) must survive every stats
    helper unchanged — the temp prefix is derived, not fixed."""
    from parq_tools_spark.operators.repetition import (
        with_gopher_repetition_stats,
        with_line_repetition_stats,
        with_word_repetition_stats,
    )

    df = spark.createDataFrame(
        [(1, "a b a b a b", "keep1", "keep2", "keep3")],
        "doc_id long, text string, _grs_3 string, _grt_2 string, "
        "_rep_sorted string",
    )
    for fn in (
        with_gopher_repetition_stats,
        with_line_repetition_stats,
        with_word_repetition_stats,
    ):
        out = fn(df)
        row = out.collect()[0]
        assert (row["_grs_3"], row["_grt_2"], row["_rep_sorted"]) == (
            "keep1", "keep2", "keep3"
        ), fn.__name__


def test_progressive_ngrams_match_reference_property(spark):
    """Property (hypothesis): the progressive gram chain inside
    with_gopher_repetition_stats (gram n+1 = materialized gram n + one
    shifted token) produces, for EVERY n in 2..10, exactly the naive
    python n-gram multiset of the whitespace tokens — n=2..4 through
    the top-gram fractions (count desc, gram asc tie-break), n=5..10
    through the dup-char fractions — including the cnt < n
    empty-array edge and repeated tokens. Randomized token
    streams; one Spark round-trip per example batch (examples are
    folded into one DataFrame to keep the property fast)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from parq_tools_spark.operators.repetition import (
        with_gopher_repetition_stats,
    )

    words = st.lists(
        st.sampled_from(["a", "bb", "ccc", "dd", "a", "e"]),
        min_size=0,
        max_size=14,
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(words, min_size=1, max_size=4))
    def check(docs):
        rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        # the stats frame keeps no gram arrays; assert through the
        # observable signal instead: dup_{n}gram_char_frac computed
        # from the naive python grams must match the operator's
        out = {
            r.doc_id: r.asDict()
            for r in with_gopher_repetition_stats(df).collect()
        }
        from collections import Counter

        for i, ws in enumerate(docs):
            text = " ".join(ws)
            nc = max(len(text), 1)
            for n in range(2, 11):
                grams = [
                    " ".join(ws[j:j + n])
                    for j in range(len(ws) - n + 1)
                ]
                c = Counter(grams)
                if n <= 4:
                    # top gram: count desc, gram asc — chars / doc chars
                    if c:
                        best = max(c.values())
                        bg = min(k for k, v in c.items() if v == best)
                        want = best * len(bg) / nc
                    else:
                        want = 0.0
                    got = out[i][f"top_{n}gram_char_frac"]
                else:
                    dup_chars = sum(
                        len(g) * v for g, v in c.items() if v >= 2
                    )
                    tot = sum(len(g) for g in grams)
                    want = (dup_chars / tot) if tot else 0.0
                    got = out[i][f"dup_{n}gram_char_frac"]
                assert abs(got - want) < 1e-9, (i, n, got, want)

    check()
