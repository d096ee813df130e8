"""Text analysis for training-data pipelines (beyond-reference, BASELINE.json north star).

All hot-path logic is built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs. Every metric is chosen to be
expressible identically in ANSI SQL (DuckDB oracle): explicit
character classes and ``\\S+`` token runs behave the same in Java
regex and RE2.

At 100 TB these are embarrassingly parallel map-only columns: no
shuffle, filters on the derived columns still prune via pushdown of
the base columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "STOPWORDS_EN",
    "GOPHER_REQUIRED_WORDS",
    "with_gopher_filter",
    "gopher_full_filter",
    "with_c4_filter",
    "LANG_MARKERS",
    "token_count",
    "BPE_PRETOKEN_REGEX",
    "bpe_token_count",
    "with_text_stats",
    "with_quality_score",
    "with_clean_text",
    "with_language_id",
    "with_fingerprint",
    "chunk_documents",
    "chunk_by_sentences",
    "PII_PATTERNS",
    "with_pii_redacted",
]

# small, fixed stopword inventories (public common-word lists)
STOPWORDS_EN = ("the", "and", "of", "to", "in", "a", "is", "that", "for", "it")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "that"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "les", "des", "est"),
    "de": ("der", "die", "und", "ist", "das"),
}


def _word_regex(words: tuple[str, ...]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


#: Gopher's "required word" inventory (Rae et al. 2021, appendix A1.1:
#: a document must contain at least 2 of these to survive filtering)
GOPHER_REQUIRED_WORDS = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def with_gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_required_words: int = 2,
    required_words: tuple[str, ...] = GOPHER_REQUIRED_WORDS,
) -> DataFrame:
    """Gopher-style document-quality rule flags (Rae et al. 2021,
    appendix A1.1 — the QUALITY half; the repetition half, Table A1,
    lives in ``operators/repetition.py``). One map-only pass, every
    signal a codegen'd expression over the token/line arrays — no
    shuffle, no Python — so at 100 TB this is a pure scan the
    optimizer fuses with neighboring projections.

    Adds per-rule columns and the composite verdict:

    - ``n_words`` (whitespace tokens), rule: 50 <= n <= 100,000
    - ``mean_word_len``, rule: 3 <= mean <= 10
    - ``symbol_word_ratio`` ('#' + '...' occurrences per word) <= 0.1
    - ``bullet_line_ratio`` (lines starting with a bullet) <= 0.9
    - ``ellipsis_line_ratio`` (lines ending with an ellipsis) <= 0.3
    - ``alpha_word_ratio`` (words containing a letter) >= 0.8
    - ``n_required_words`` (distinct hits from
      :data:`GOPHER_REQUIRED_WORDS`) >= 2
    - ``gopher_pass`` — every rule holds

    All counts are integers and every ratio divides two of them, so
    the DuckDB oracle reproduces each double bit-for-bit.

    The word-count bounds and the required-word rule are the knobs
    real pipelines tune (Gopher's defaults assume English web text —
    on a corpus without English function words the required-word rule
    rejects everything, correctly per the paper but often not what a
    non-English pipeline wants; pass ``required_words=`` for another
    language or ``min_required_words=0`` to disable the rule).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(t, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    safe_w = F.greatest(n_words, F.lit(1)).cast("double")
    mean_word_len = (
        F.aggregate(
            words, F.lit(0), lambda acc, w: acc + F.length(w)
        ).cast("double")
        / safe_w
    )
    symbol_ratio = (
        F.regexp_count(t, F.lit("#")) + F.regexp_count(t, F.lit(r"\.\.\."))
    ).cast("double") / safe_w
    lines = F.filter(F.split(t, r"\n"), lambda ln: ln != "")
    safe_l = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_ratio = (
        F.size(
            F.filter(lines, lambda ln: ln.rlike(r"^\s*[-*•]"))
        ).cast("double")
        / safe_l
    )
    ellipsis_ratio = (
        F.size(
            F.filter(lines, lambda ln: ln.rlike(r"(\.\.\.|…)\s*$"))
        ).cast("double")
        / safe_l
    )
    alpha_ratio = (
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast(
            "double"
        )
        / safe_w
    )
    import re as _re

    low = F.lower(t)
    n_required = F.lit(0)
    for w in required_words:
        # escape metacharacters ("c++", abbreviations) and anchor a
        # word boundary only where the word's edge IS a word char —
        # \b between two non-word chars never matches, and RE2 (the
        # oracle engine) has no lookbehind to emulate it with
        pat = _re.escape(w)
        if _re.match(r"\w", w[:1] or " "):
            pat = r"\b" + pat
        if _re.match(r"\w", w[-1:] or " "):
            pat = pat + r"\b"
        n_required = n_required + (
            F.regexp_count(low, F.lit(pat)) > 0
        ).cast("int")
    out = (
        df.withColumn("n_words", n_words)
        .withColumn("mean_word_len", mean_word_len)
        .withColumn("symbol_word_ratio", symbol_ratio)
        .withColumn("bullet_line_ratio", bullet_ratio)
        .withColumn("ellipsis_line_ratio", ellipsis_ratio)
        .withColumn("alpha_word_ratio", alpha_ratio)
        .withColumn("n_required_words", n_required)
    )
    gopher_pass = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0)
        & (F.col("symbol_word_ratio") <= 0.1)
        & (F.col("bullet_line_ratio") <= 0.9)
        & (F.col("ellipsis_line_ratio") <= 0.3)
        & (F.col("alpha_word_ratio") >= 0.8)
        & (F.col("n_required_words") >= min_required_words)
    )
    return out.withColumn("gopher_pass", gopher_pass)


def gopher_full_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_required_words: int = 2,
    required_words: tuple[str, ...] = GOPHER_REQUIRED_WORDS,
    max_tokens_per_doc: "int | None" = 200_000,
) -> DataFrame:
    """The COMPLETE Gopher document filter (Rae et al. 2021): the
    A1.1 quality rules (:func:`with_gopher_filter`) conjoined with
    every Table-A1 repetition threshold
    (:func:`~parq_tools_spark.operators.repetition.
    with_gopher_repetition_stats`) — the paper's actual filter is
    this conjunction, and a real pipeline wants it as ONE scan.

    Adds all 8 quality columns + all 13 repetition columns +
    ``gopher_full_pass``. Still map-only end to end: both halves are
    codegen'd array expressions, so the composite costs one pass over
    the text column with zero shuffles — at 100 TB the filter IS the
    scan.

    Quality knobs as in :func:`with_gopher_filter`; the repetition
    thresholds are the paper's (``GOPHER_REPETITION_THRESHOLDS``).
    ``max_tokens_per_doc`` bounds the n-gram expressions per document
    (its 200k default sits above ``max_words``'s 100k, so with
    default settings truncation only ever hits documents the length
    rule already rejects)."""
    from parq_tools_spark.operators.repetition import (
        GOPHER_REPETITION_THRESHOLDS,
        with_gopher_repetition_stats,
    )

    out = with_gopher_filter(
        df,
        text_col=text_col,
        min_words=min_words,
        max_words=max_words,
        min_required_words=min_required_words,
        required_words=required_words,
    )
    out = with_gopher_repetition_stats(
        out, text_col=text_col, max_tokens_per_doc=max_tokens_per_doc
    )
    rep_pass = F.lit(True)
    for col_name, bound in GOPHER_REPETITION_THRESHOLDS.items():
        rep_pass = rep_pass & (F.col(col_name) <= F.lit(bound))
    return out.withColumn(
        "gopher_full_pass", F.col("gopher_pass") & rep_pass
    )


def with_c4_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    out_col: str = "c4_text",
) -> DataFrame:
    """C4-style page cleaning (Raffel et al. 2020 §2.2), one map-only
    codegen'd pass — line-level retention plus page-level verdict:

    - a LINE is kept iff it ends in terminal punctuation (``. ! ? "``),
      carries at least ``min_words_per_line`` words, and does not
      mention "javascript";
    - ``out_col`` is the kept lines rejoined (the cleaned page);
    - a PAGE passes iff its cleaned text has at least
      ``min_sentences`` sentence-terminal marks and the ORIGINAL text
      contains neither "lorem ipsum" nor a curly brace.

    Adds ``n_lines``, ``n_kept_lines``, ``n_sentences``,
    ``has_lorem``, ``has_brace``, ``c4_pass`` and ``out_col``. Every
    signal is an integer count or a substring test, so the DuckDB
    oracle reproduces the verdicts and the cleaned text exactly."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(F.split(t, r"\n"), lambda ln: ln != "")
    kept = F.filter(
        lines,
        lambda ln: ln.rlike(r'[.!?"]\s*$')
        & (
            F.size(F.filter(F.split(ln, r"\s+"), lambda w: w != ""))
            >= min_words_per_line
        )
        & ~F.lower(ln).rlike(r"\bjavascript\b"),
    )
    c4_text = F.array_join(kept, "\n")
    low = F.lower(t)
    return (
        df.withColumn("n_lines", F.size(lines))
        .withColumn("n_kept_lines", F.size(kept))
        .withColumn(
            "n_sentences", F.regexp_count(c4_text, F.lit(r"[.!?]"))
        )
        .withColumn("has_lorem", low.contains("lorem ipsum"))
        .withColumn("has_brace", t.contains("{"))
        .withColumn(out_col, c4_text)
        .withColumn(
            "c4_pass",
            (F.col("n_sentences") >= min_sentences)
            & ~F.col("has_lorem")
            & ~F.col("has_brace"),
        )
    )


def token_count(text: Column | str) -> Column:
    r"""Whitespace token count: number of ``\S+`` runs.

    SQL oracle: ``len(regexp_extract_all(text, '\S+'))`` (DuckDB) /
    ``regexp_count(text, '\\S+')`` (Spark) — identical on any input,
    including leading/trailing/repeated whitespace.
    """
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(col, F.lit(r"\S+"))


#: GPT-2-style pre-tokenizer approximation, restricted to constructs
#: both Java regex (Spark) and RE2 (DuckDB) support — i.e. no
#: lookahead, so trailing-whitespace runs are simply not counted
#: (a real BPE vocab would merge them anyway). Contractions split off
#: ('s 't 're 've 'm 'll 'd), letter runs, digit runs, and
#: punctuation runs each count as one pre-token, with one leading
#: space folded in like GPT-2's encoder.
BPE_PRETOKEN_REGEX = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_token_count(text: Column | str) -> Column:
    r"""BPE-ish pre-token count (GPT-2 pre-tokenizer shape).

    Counts the units a byte-pair encoder would start from — a better
    LLM-token-budget proxy than whitespace splitting (punctuation and
    contractions cost tokens too; actual BPE merges then only lower
    the count within each pre-token). Pure ``regexp_count``: map-only,
    codegen'd, zero shuffle, and bit-identical in DuckDB via
    ``len(regexp_extract_all(text, <same regex>))``.
    """
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(col, F.lit(BPE_PRETOKEN_REGEX))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add per-document statistics columns (map-only, codegen'd).

    Columns: n_chars, n_tokens, avg_token_len, punct_ratio,
    digit_ratio, upper_ratio, space_ratio, stopword_ratio.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    nonspace = F.length(F.regexp_replace(t, r"\s", ""))
    safe_chars = F.greatest(n_chars, F.lit(1))
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    return (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "avg_token_len", nonspace.cast("double") / safe_tokens.cast("double")
        )
        .withColumn(
            "punct_ratio",
            F.regexp_count(t, F.lit(r"[.,;:!?]")).cast("double") / safe_chars,
        )
        .withColumn(
            "digit_ratio",
            F.regexp_count(t, F.lit(r"[0-9]")).cast("double") / safe_chars,
        )
        .withColumn(
            "upper_ratio",
            F.regexp_count(t, F.lit(r"[A-Z]")).cast("double") / safe_chars,
        )
        .withColumn(
            "space_ratio",
            F.regexp_count(t, F.lit(r"[ ]")).cast("double") / safe_chars,
        )
        .withColumn(
            "stopword_ratio",
            F.regexp_count(F.lower(t), F.lit(_word_regex(STOPWORDS_EN))).cast(
                "double"
            )
            / safe_tokens.cast("double"),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality in [0, 1] (Gopher/C4-style length,
    punctuation and stopword signals; deterministic, engine-portable).

    score = 0.25*len_ok + 0.25*token_len_ok + 0.25*has_stopwords
          + 0.25*(1 - excess punctuation), where
    len_ok: 50 <= n_chars <= 100000; token_len_ok: 2 <= avg <= 12.
    """
    stats = with_text_stats(df, text_col)
    len_ok = (F.col("n_chars") >= 50) & (F.col("n_chars") <= 100_000)
    tok_ok = (F.col("avg_token_len") >= 2.0) & (F.col("avg_token_len") <= 12.0)
    has_stop = F.col("stopword_ratio") > 0.0
    punct_pen = F.least(F.col("punct_ratio") * F.lit(5.0), F.lit(1.0))
    score = (
        len_ok.cast("double") * 0.25
        + tok_ok.cast("double") * 0.25
        + has_stop.cast("double") * 0.25
        + (F.lit(1.0) - punct_pen) * 0.25
    )
    return stats.withColumn("quality_score", score)


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram/marker-word language heuristic (beyond-reference op).

    Counts whole-word marker hits per language over the lowercased
    text; ``lang_pred`` is the argmax, ``'und'`` when no marker hits.
    Deterministic tie-break: languages compared in sorted order, first
    max wins. All JVM-side; SQL-oracle expressible with the same
    regexp counts + a greatest/case chain.
    """
    t = F.lower(F.col(text_col))
    langs = sorted(LANG_MARKERS)
    scored = df
    for lang in langs:
        scored = scored.withColumn(
            f"score_{lang}", F.regexp_count(t, F.lit(_word_regex(LANG_MARKERS[lang])))
        )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    # build reversed so earlier langs win ties
    for lang in reversed(langs):
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return scored.withColumn("lang_pred", pred)


def with_clean_text(
    df: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """C4-style text normalization, all built-in regexps (map-only):
    strip control characters, collapse runs of whitespace to one
    space, trim. Deterministic and SQL-oracle expressible."""
    t = F.col(text_col)
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(t, r"[\x00-\x1f\x7f]", " "), r"\s+", " "
        )
    )
    return df.withColumn(out_col, cleaned)


# PII categories as (name, pattern, replacement). Patterns stay in the
# regex subset shared by Java (Spark) and RE2 (DuckDB/Go scanners) — no
# lookaround, no backreferences — so redaction is engine-portable and
# oracle-checkable. Order matters: emails before phones so the digits
# in a local-part aren't half-eaten by the phone rule.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "phone",
        r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}(?:[-. ][0-9]{3,4})?",
        "<PHONE>",
    ),
    (
        "ipv4",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
)


def with_pii_redacted(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "redacted_text",
    count_matches: bool = True,
) -> DataFrame:
    """Redact common PII shapes (training-data hygiene pass).

    Map-only, all built-in regexp functions — no UDFs, so the pass
    rides whole-stage codegen and costs one scan at any corpus size.
    Emails, then phone numbers, then IPv4 literals are replaced with
    typed placeholders; with ``count_matches`` each category also gets
    an ``n_<category>`` column. Each category is counted on the text
    AFTER the earlier categories' redactions, so every count
    corresponds to a placeholder actually present in the output (a
    phone-shaped substring inside an email local-part is redacted as
    part of the email, and is NOT counted as a phone).

    Null text keeps a null ``out_col`` (nothing to redact) but counts
    are 0, not null — downstream arithmetic like
    ``n_email + n_phone > 3`` quarantine filters must not silently
    skip null-text rows.
    """
    out = df
    redacted = F.col(text_col)
    for name, pattern, replacement in PII_PATTERNS:
        if count_matches:
            out = out.withColumn(
                f"n_{name}",
                F.coalesce(
                    F.size(
                        # idx=0 (whole match): the patterns are group-free
                        F.regexp_extract_all(redacted, F.lit(pattern), F.lit(0))
                    ).cast("long"),
                    F.lit(0).cast("long"),
                ),
            )
        redacted = F.regexp_replace(redacted, pattern, replacement)
    return out.withColumn(out_col, redacted)


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprint for exact dedup: md5 of the
    whitespace-normalized, lowercased text.

    md5 is bit-identical across engines (unlike xxhash64 seeds), so
    the fingerprint itself is oracle-checkable. Rolling/locality
    hashes live in :mod:`parq_tools_spark.operators.dedup`.
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.withColumn("fingerprint", F.md5(norm))


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 64,
    overlap: int = 0,
) -> DataFrame:
    r"""Split documents into fixed-size token windows with overlap —
    the training-data / RAG chunking pass. Returns one row per chunk:
    ``(id, chunk_idx, n_tokens, chunk_text)``.

    Tokens are whitespace runs; window ``chunk_size`` tokens, stride
    ``chunk_size - overlap``. A document with <= ``chunk_size`` tokens
    yields exactly one (possibly short) chunk; otherwise chunks tile
    the document so every token is covered and consecutive chunks
    share ``overlap`` tokens (the final chunk may be shorter).

    Entirely built-in expressions — split / sequence / explode /
    slice / array_join, all codegen'd, zero Python. The explode is the
    only fan-out and stays inside the stage (no shuffle); at 100 TB
    this is a map-only pass whose output is ~``1/(1-overlap/size)``x
    the input tokens. DuckDB oracle: ``string_split_regex`` +
    1-based inclusive list slicing ``t[a:b]`` mirrors Spark
    ``slice(arr, a, size)`` exactly.
    """
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    if not 0 <= overlap < chunk_size:
        raise ValueError("overlap must be in [0, chunk_size)")
    stride = chunk_size - overlap
    # NULL text behaves like empty text — one chunk with ZERO tokens,
    # the same contract as chunk_by_sentences. Both halves matter: a
    # bare split(NULL) would silently drop the document's rows through
    # sequence/explode, and split('') yields [''] which would count
    # the empty string as one token.
    text = F.coalesce(F.col(text_col), F.lit(""))
    words = F.when(
        F.trim(text) == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(text), r"\s+"))
    n_extra_expr = (
        f"CASE WHEN _n <= {chunk_size} THEN 0 "
        f"ELSE CAST(ceil((_n - {chunk_size}) / {stride}.0) AS INT) END"
    )
    return (
        df.select(F.col(id_col), words.alias("_w"))
        .withColumn("_n", F.size("_w"))
        .withColumn("chunk_idx", F.explode(F.expr(f"sequence(0, {n_extra_expr})")))
        .select(
            id_col,
            "chunk_idx",
            F.expr(f"slice(_w, chunk_idx * {stride} + 1, {chunk_size})").alias(
                "_c"
            ),
        )
        .select(
            id_col,
            "chunk_idx",
            F.size("_c").alias("n_tokens"),
            F.array_join("_c", " ").alias("chunk_text"),
        )
    )


def chunk_by_sentences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 128,
    max_sentences_per_doc: "int | None" = 1_000_000,
) -> DataFrame:
    r"""Sentence-aware chunking: sentences stay intact, chunks tile
    the document at ~``max_tokens`` whitespace tokens. Returns
    ``(id, chunk_idx, n_sentences, n_tokens, chunk_text, truncated)``
    — ``truncated`` flags chunks of a document whose sentence count
    exceeded ``max_sentences_per_doc``, so callers can detect capped
    documents instead of relying on a docstring caveat.

    A sentence belongs to chunk ``floor(cum_tokens_before /
    max_tokens)`` — deterministic offset tiling, so a sentence
    straddling a boundary makes its chunk run slightly over budget
    (the price of never splitting a sentence; true greedy packing is
    sequential and engine-specific). Sentence boundaries are
    ``[.!?]`` + whitespace via replace-then-split (RE2 has no
    lookbehind, so the same spelling works in the DuckDB oracle; the
    \x1e separator must not occur in the text).

    Cost shape: one hash shuffle on ``id_col`` for the per-document
    running token count, then a partially-aggregated groupBy on
    (id, chunk) — both key on the document, so at 100 TB this is one
    repartition of the corpus with no skew beyond document length.
    That per-document bound is exactly what ``max_sentences_per_doc``
    caps: the running-count window puts ALL of one document's
    sentences in one task, so a single pathological crawl artifact
    (a multi-GB concatenation) would otherwise own a task for hours.
    Sentences beyond the cap are TRUNCATED (dropped) — the guard is
    for adversarial inputs, not a semantic feature; pass ``None`` to
    disable, or pre-split giants upstream if their tails matter. The
    cap slices the sentence array BEFORE the explode, so the excess
    never enters the shuffle at all.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    from pyspark.sql import Window

    sep = "\x1e"
    # NULL text behaves like empty text (one zero-token chunk) — a
    # bare split(NULL) would silently drop the document's rows
    text = F.coalesce(F.col(text_col), F.lit(""))
    sentences = F.split(
        F.regexp_replace(text, r"([.!?])\s+", "$1" + sep), sep
    )
    if max_sentences_per_doc is not None:
        if max_sentences_per_doc <= 0:
            raise ValueError("max_sentences_per_doc must be positive")
        trunc = F.size(sentences) > max_sentences_per_doc
        sentences = F.slice(sentences, 1, max_sentences_per_doc)
    else:
        trunc = F.lit(False)
    s = df.select(
        F.col(id_col),
        trunc.alias("_trunc"),
        F.posexplode(sentences).alias("idx", "sentence"),
    ).withColumn("n_tok", F.regexp_count("sentence", F.lit(r"\S+")))
    w = (
        Window.partitionBy(id_col)
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s = s.withColumn(
        "chunk_idx",
        F.floor(
            F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / max_tokens
        ).cast("int"),
    )
    ordered_text = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("idx", "sentence"))),
            lambda x: x["sentence"],
        ),
        " ",
    )
    return s.groupBy(id_col, "chunk_idx").agg(
        F.count(F.lit(1)).cast("int").alias("n_sentences"),
        F.sum("n_tok").cast("int").alias("n_tokens"),
        ordered_text.alias("chunk_text"),
        F.max("_trunc").alias("truncated"),
    )
