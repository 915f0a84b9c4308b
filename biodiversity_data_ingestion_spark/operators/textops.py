"""Text-analysis operators (BASELINE.json north-star extensions).

language-ID, quality scoring, token counting, document fingerprinting —
the per-document scoring stages of an LLM training-data pipeline. All
pure Catalyst expressions (no Python in the hot path): at 100 TB these
run inside whole-stage codegen directly over the parquet scan with full
column pruning (only `text` + id are read).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.partitioning import fan_out
from ..functions.textfn import tokenize

# tiny per-language stopword markers; enough for a deterministic n-gram /
# stopword-ratio heuristic (a real pipeline would swap in fastText — the
# operator shape is identical).
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "los", "que"),
    "fr": ("le", "la", "les", "des", "et"),
    "de": ("der", "die", "das", "und", "ist"),
}


def _count_in(words: Column, vocab: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(w) for w in vocab])
    return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))


def token_stats(df: DataFrame, id_col: str, text: str) -> DataFrame:
    """Whitespace + word-regex token counts, char count, mean token len."""
    words = tokenize(F.col(text))
    # BPE-ish pieces: runs of letters / digits / single other non-space chars.
    # Plain regex (no lookaround) so it is portable to RE2-based engines.
    bpe_ish = F.size(F.regexp_extract_all(F.col(text), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))
    return fan_out(df).select(
        F.col(id_col),
        F.size(words).cast("long").alias("n_tokens"),
        bpe_ish.cast("long").alias("n_subtokens"),
        F.length(F.col(text)).cast("long").alias("n_chars_computed"),
        F.round(F.length(F.col(text)) / F.size(words), 4).alias("chars_per_token"),
    )


def language_id(df: DataFrame, id_col: str, text: str) -> DataFrame:
    """Deterministic marker-word language ID with an 'und' fallback."""
    words = tokenize(F.lower(F.col(text)))
    counts = {lang: _count_in(words, vocab) for lang, vocab in _LANG_MARKERS.items()}
    best = None
    for lang, cnt in counts.items():
        pair = F.struct(cnt.alias("score"), F.lit(lang).alias("lang"))
        best = pair if best is None else F.when(pair["score"] > best["score"], pair).otherwise(best)
    out = fan_out(df).select(
        F.col(id_col),
        *[cnt.cast("long").alias(f"score_{lang}") for lang, cnt in counts.items()],
        best["lang"].alias("best_lang"),
        best["score"].alias("best_score"),
    )
    return out.withColumn(
        "predicted_lang",
        F.when(F.col("best_score") > 0, F.col("best_lang")).otherwise(F.lit("und")),
    ).drop("best_lang", "best_score")


def quality_score(df: DataFrame, id_col: str, text: str) -> DataFrame:
    """Heuristic document-quality features + composite score.

    length / punctuation ratio / stopword ratio / mean word length —
    the classic C4/Gopher-style filters, re-expressed as codegen'd
    column math.
    """
    t = F.col(text)
    words = tokenize(F.lower(t))
    n_words = F.size(words)
    stop = _count_in(words, _LANG_MARKERS["en"])
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    mean_wlen = F.round(
        F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w)) / n_words, 4
    )
    stop_ratio = F.round(stop / n_words, 4)
    punct_ratio = F.round(n_punct / F.greatest(F.length(t), F.lit(1)), 4)
    score = F.round(
        F.when(n_words >= 5, F.lit(1.0)).otherwise(F.lit(0.0))
        * (F.lit(1.0) - punct_ratio)
        * F.when(stop_ratio > 0.01, F.lit(1.0)).otherwise(F.lit(0.5)),
        4,
    )
    return fan_out(df).select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        mean_wlen.alias("mean_word_len"),
        score.alias("quality"),
    )


def text_features(
    df: DataFrame,
    id_col: str,
    text: str,
    keep: tuple[str, ...] = (),
    words_col: str | None = None,
    n_chars_col: str | None = None,
    n_punct_col: str | None = None,
) -> DataFrame:
    """One-pass fusion of language_id + quality_score: identical output
    columns, computed from a single scan with shared tokenization.
    ``keep`` columns ride along unchanged, so a downstream grouping key
    (e.g. source) needs no re-join against the corpus.

    The composition-friendly form: a pipeline that joins language_id
    and quality_score scans the corpus once per operator and shuffles
    on the join key; at 100 TB the scan is the dominant cost and the
    join is pure overhead for what are per-row projections. Expressions
    are the same Column trees as the standalone operators, so values
    (and oracle hashes) are bit-identical — asserted by
    test_text_features_fusion_matches_joins.

    ``words_col`` optionally supplies a pre-computed
    tokenize(lower(text)) array (the tokenize-once pipeline pattern —
    same Column tree, so values are unchanged); raw ``text`` is then
    still required for the punctuation ratio UNLESS ``n_chars_col`` /
    ``n_punct_col`` additionally supply pre-computed ``length(text)``
    and ``length(text) - length(regexp_replace(text, '[^\\w\\s]', ''))``
    — with all three supplied the raw text column need not be in ``df``
    at all, so a pipeline cache can hold two longs instead of the full
    document (guide §2.3: narrower types / project before the
    exchange). The ratio arithmetic sees the same integers either way,
    so values (and oracle hashes) are bit-identical.
    """
    t = F.col(text) if text in df.columns else None
    if t is None and not (words_col and n_chars_col and n_punct_col):
        # without the raw text, EVERY derived input must be precomputed;
        # otherwise F.lower(None)/F.length(None) below raises an opaque
        # TypeError at plan build (r14 verdict robustness nit)
        raise ValueError(
            f"text_features: column {text!r} is not in the frame; "
            "supply words_col, n_chars_col AND n_punct_col when the "
            "raw text column is absent"
        )
    words = F.col(words_col) if words_col else tokenize(F.lower(t))
    counts = {lang: _count_in(words, vocab) for lang, vocab in _LANG_MARKERS.items()}
    best = None
    for lang, cnt in counts.items():
        pair = F.struct(cnt.alias("score"), F.lit(lang).alias("lang"))
        best = pair if best is None else F.when(pair["score"] > best["score"], pair).otherwise(best)
    n_words = F.size(words)
    stop = counts["en"]
    n_chars = F.col(n_chars_col) if n_chars_col else F.length(t)
    n_punct = (
        F.col(n_punct_col)
        if n_punct_col
        else F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    )
    mean_wlen = F.round(
        F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w)) / n_words, 4
    )
    stop_ratio = F.round(stop / n_words, 4)
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4)
    score = F.round(
        F.when(n_words >= 5, F.lit(1.0)).otherwise(F.lit(0.0))
        * (F.lit(1.0) - punct_ratio)
        * F.when(stop_ratio > 0.01, F.lit(1.0)).otherwise(F.lit(0.5)),
        4,
    )
    return fan_out(df).select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        *[cnt.cast("long").alias(f"score_{lang}") for lang, cnt in counts.items()],
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias("predicted_lang"),
        n_words.cast("long").alias("n_words"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        mean_wlen.alias("mean_word_len"),
        score.alias("quality"),
    )


def fingerprint(df: DataFrame, id_col: str, text: str) -> DataFrame:
    """Content fingerprints: full-text md5 + a rolling min-gram hash
    (min md5 over word 3-grams — robust to local edits)."""
    words = tokenize(F.lower(F.trim(F.col(text))))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - F.lit(2), F.lit(1))),
        lambda i: F.md5(F.array_join(F.slice(words, i, 3), " ")),
    )
    return fan_out(df).select(
        F.col(id_col),
        F.md5(F.lower(F.trim(F.col(text)))).alias("exact_fp"),
        F.array_min(grams).alias("min_gram_fp"),
    )


# PII patterns kept to the regex subset with identical semantics in
# Java regex (Spark) and RE2 (DuckDB oracles): no lookarounds, no
# backrefs. The C4/Dolma-style scrub pass run before a corpus ships.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\d{3}-\d{3}-\d{4}",
    "ipv4": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
}


def redact_pii(
    df: DataFrame,
    id_col: str,
    text: str,
    replacement: str = "<PII>",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Scrub emails / phone numbers / IPv4 literals from a text column,
    reporting per-row match counts — the standard pre-release corpus
    hygiene pass.

    Order matters: counts are taken on the ORIGINAL text, then patterns
    are replaced longest-semantics-first (email before ipv4 so a dotted
    hostname inside an address is not double-counted as an IP — the
    ipv4 count is taken on the email-redacted text). Pure per-row
    expressions: no shuffle, scales linearly.

    Returns (id, redacted, n_email, n_phone, n_ipv4).
    """
    t = F.col(text)
    n_email = F.size(F.regexp_extract_all(t, F.lit(PII_PATTERNS["email"]), F.lit(0)))
    after_email = F.regexp_replace(t, PII_PATTERNS["email"], replacement)
    n_phone = F.size(
        F.regexp_extract_all(after_email, F.lit(PII_PATTERNS["phone"]), F.lit(0))
    )
    after_phone = F.regexp_replace(after_email, PII_PATTERNS["phone"], replacement)
    n_ipv4 = F.size(
        F.regexp_extract_all(after_phone, F.lit(PII_PATTERNS["ipv4"]), F.lit(0))
    )
    redacted = F.regexp_replace(after_phone, PII_PATTERNS["ipv4"], replacement)
    return fan_out(df).select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        redacted.alias("redacted"),
        n_email.cast("long").alias("n_email"),
        n_phone.cast("long").alias("n_phone"),
        n_ipv4.cast("long").alias("n_ipv4"),
    )
