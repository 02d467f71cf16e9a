"""Text-analysis functions for training-data curation: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All native Column expressions (whole-stage codegen; no Python). Every
derivation is arithmetic/string-only so the DuckDB oracles can compute
bit-identical results — the same property that makes them reproducible
across cluster versions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny marker-word lists per language; on real corpora you'd swap in
# proper stopword tables — the operator shape (occurrence scoring +
# argmax) is what matters
LANG_MARKERS = {
    "en": ("the", "value", "fast"),
    "de": ("agg", "der", "und"),
    "fr": ("le", "la", "query"),
    "es": ("el", "los", "data"),
    "zh": ("window", "merge", "big"),
}


def token_count(col="text") -> Column:
    """Whitespace tokens (0 for empty/blank)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(c), r"\s+"))
    )


def bpe_ish_token_count(col="text") -> Column:
    """BPE-ish proxy: alphanumeric runs + individual punctuation marks
    each count as a token (regex split on word boundaries)."""
    c = F.col(col) if isinstance(col, str) else col
    # count alnum runs + non-space punct chars
    runs = F.size(
        F.filter(F.split(c, r"[^0-9A-Za-z]+"), lambda x: F.length(x) > 0)
    )
    punct = F.length(F.regexp_replace(c, r"[0-9A-Za-z\s]", ""))
    return runs + punct


def gopher_word_stats(col: str = "text") -> list[Column]:
    """Gopher-style quality signals as INTEGER components (ratios are
    the caller's division — integers compare bit-exact across engines):
    n_words, sum_word_chars (→ mean word length), n_alpha_words
    (→ fraction of words containing a letter). Words are the non-empty
    whitespace splits on both engines."""
    w = (
        f"filter(split(trim({col}), '\\\\s+'), x -> length(x) > 0)"
    )
    return [
        F.expr(f"size({w})").cast("long").alias("n_words"),
        F.expr(
            f"aggregate({w}, 0L, (acc, x) -> acc + length(x))"
        ).alias("sum_word_chars"),
        F.expr(
            f"size(filter({w}, x -> x rlike '[A-Za-z]'))"
        ).cast("long").alias("n_alpha_words"),
    ]


def hash_split(
    col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    salt: str = "split:v1",
) -> Column:
    """Deterministic dataset split assignment: sha256(salt || id) mod
    10000 lands in per-split integer ranges. Content-addressed, so the
    assignment is stable across runs, engines, partitionings, and
    corpus growth (a doc never migrates between splits when other docs
    are added/removed) — the property random() sampling lacks. Change
    ``salt`` to draw an independent split."""
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    c = F.col(col) if isinstance(col, str) else col
    bucket = (
        F.conv(
            F.substring(
                F.sha2(F.concat(F.lit(salt), c.cast("string")), 256), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % 10000
    )
    expr = None
    lo = 0
    for name, frac in fractions.items():
        hi = lo + int(round(frac * 10000))
        cond = (bucket >= F.lit(lo)) & (bucket < F.lit(hi))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
        lo = hi
    return expr.otherwise(F.lit("train"))


def occurrences(col, word: str) -> Column:
    """Non-overlapping occurrences of ' word ' using the length-diff
    trick (identical semantics in every SQL engine)."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(F.lit(" "), c, F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def quality_features(col="text"):
    """(n_tokens, n_chars, avg_token_len, stopword_ratio) — the inputs
    of the quality score."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c)
    n_chars = F.length(c)
    avg_len = F.when(n_tok > 0, (n_chars - (n_tok - 1)) / n_tok).otherwise(
        F.lit(0.0)
    )
    stop = sum(occurrences(c, w) for w in ("the", "a", "of"))
    stop_ratio = F.when(n_tok > 0, stop / n_tok).otherwise(F.lit(0.0))
    return n_tok, n_chars, avg_len, stop_ratio


def quality_score(col="text") -> Column:
    """Heuristic quality in [0,1]: long enough, sane word lengths, some
    stopwords (real-language-ness)."""
    n_tok, _n_chars, avg_len, stop_ratio = quality_features(col)
    len_ok = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    word_ok = F.when((avg_len >= 2) & (avg_len <= 12), F.lit(1.0)).otherwise(
        F.lit(0.3)
    )
    stop_ok = F.least(stop_ratio * 5, F.lit(1.0))
    return (len_ok * 0.4 + word_ok * 0.3 + stop_ok * 0.3).alias("quality")


def lang_scores(col="text"):
    """Per-language marker-occurrence scores (deterministic argmax in
    lang_id)."""
    return {
        lang: sum(occurrences(col, w) for w in words)
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(col="text") -> Column:
    """Predicted language = argmax marker score, ties broken by lang
    code order (deterministic)."""
    scores = lang_scores(col)
    pairs = [
        F.struct(s.alias("score"), F.lit(lang).alias("lang"))
        for lang, s in sorted(scores.items())
    ]
    # array_max on struct: max by score, then by lang string — we want
    # ties to pick the SMALLEST lang, so invert the lang for ordering
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    s.alias("score"),
                    F.lit(len(LANG_MARKERS) - i).alias("tie"),
                    F.lit(lang).alias("lang"),
                )
                for i, (lang, s) in enumerate(sorted(scores.items()))
            ]
        )
    )
    return best["lang"]


EMAIL_RX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RX = r"\+?[0-9][0-9\-\s]{7,}[0-9]"


def normalize_text(col="text") -> Column:
    """Curation normalization: trim, collapse whitespace, lowercase —
    the canonical form exact-dedup should hash."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))


def scrub_pii(col="text") -> Column:
    """Redact emails and phone-number-shaped digit runs (training-data
    hygiene pass; extend the pattern list per policy)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_replace(c, EMAIL_RX, "<EMAIL>"), PHONE_RX, "<PHONE>"
    )


def doc_fingerprint(col="text", k: int = 8, stride: int = 4) -> Column:
    """Winnowing-lite fingerprint: min sha256-prefix over char k-grams
    sampled every `stride` positions. Equal fingerprints ⇒ near-certain
    shared substring window; robust to small edits elsewhere."""
    name = col if isinstance(col, str) else col._jc.toString()
    return F.expr(
        f"array_min(transform(sequence(1, greatest(length({name}) - {k - 1}, 1), {stride}), "
        f"i -> substring(sha2(substring({name}, i, {k}), 256), 1, 16)))"
    )
