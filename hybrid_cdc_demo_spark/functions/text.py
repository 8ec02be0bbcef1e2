"""Text-analysis column expressions for large-scale training-data prep.

All hot-path expressions are built from ``pyspark.sql.functions``
(JVM-side, whole-stage-codegen'd) — no Python UDFs. Operators:

* tokenization / token counting (whitespace + BPE-ish regex),
* quality scoring (length, punctuation ratio, stopword ratio),
* language identification (stopword-hit heuristic over per-language
  wordlists — pure column expressions, argmax via greatest),
* document fingerprinting (normalized-text SHA-256, plus polynomial
  rolling-hash shingles used by the dedup operators).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

WHITESPACE_RE = r"\s+"
#: BPE-ish word/number/punct splitter (public GPT-2-style pattern shape).
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic. Deliberately small — the point is the Spark plumbing
#: (score columns + greatest/argmax), not lexicon quality.
STOPWORDS = {
    "en": ["the", "a", "an", "and", "of", "in", "to", "is", "it", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "de", "que", "por"],
}


def tokens(text: Column | str, pattern: str = WHITESPACE_RE) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), pattern)


def token_count(text: Column | str, pattern: str = WHITESPACE_RE) -> Column:
    return F.size(tokens(text, pattern))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Count of GPT-2-style sub-tokens via regexp_extract_all."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_RE), 0))


def char_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c)


PUNCT_CLASS = "[.,!?;:]"


def punct_ratio(text: Column | str) -> Column:
    """punctuation chars / total chars, as double."""
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    return n_punct.cast("double") / F.length(c).cast("double")


def stopword_ratio(text: Column | str, lang: str = "en") -> Column:
    """stopword tokens / total tokens, as double."""
    toks = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return n_stop.cast("double") / F.size(toks).cast("double")


def quality_score(text: Column | str, round_digits: int | None = 4) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation
    + reasonable stopword density. Deterministic, JVM-only.

    ``round_digits=None`` returns the raw double — every term is plain
    IEEE arithmetic over the (oracle-verified) ratio signals, so the
    unrounded value is bitwise-reproducible in ANSI SQL, while ROUND()
    on a boundary double is engine-dependent."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c).cast("double")
    len_score = F.least(n / F.lit(200.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(c) * 5, F.lit(1.0))
    stop = stopword_ratio(c)
    stop_score = F.lit(1.0) - F.least(F.abs(stop - F.lit(0.4)), F.lit(1.0))
    score = (len_score + punct_score + stop_score) / 3
    if round_digits is None:
        return score
    return F.round(score, round_digits)


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit ratio columns."""
    toks = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    out = {}
    for lang, words in STOPWORDS.items():
        stops = F.array(*[F.lit(w) for w in words])
        out[lang] = (
            F.size(F.filter(toks, lambda t: F.array_contains(stops, t))).cast("double")
            / F.size(toks).cast("double")
        )
    return out


def lang_id(text: Column | str) -> Column:
    """Argmax language by stopword-hit ratio; 'und' when nothing hits.

    Built as a fold over (score, lang) structs with array_max —
    stays in codegen, scales linearly, no shuffle.
    """
    scores = lang_scores(text)
    pairs = F.array(
        *[F.struct(s.alias("score"), F.lit(lang).alias("lang")) for lang, s in scores.items()]
    )
    best = F.array_max(pairs)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def normalized_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.lower(F.trim(c)), WHITESPACE_RE, " ")


def fingerprint(text: Column | str) -> Column:
    """Whole-document fingerprint: SHA-256 of the normalized text."""
    return F.sha2(normalized_text(text), 256)


def let1(col: Column, fn) -> Column:
    """Evaluate ``col`` ONCE per row and bind it as a lambda variable
    inside ``fn``. Higher-order functions run interpreted and
    re-evaluate expressions captured in lambda BODIES per element —
    binding through a one-element array makes the value a cheap bound
    reference instead (the HOF's argument is evaluated once)."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def rolling_hashes(text: Column | str, k: int = 8) -> Column:
    """Array of 64-bit hashes of the k-char windows of the normalized
    text (rolling-hash shingles). Used for winnowing-style
    fingerprints and character-shingle dedup; xxhash64 keeps it
    JVM-side instead of a literal polynomial loop. The normalized
    text is let-bound so the per-window substr reads a bound value
    rather than re-normalizing per element."""
    return let1(
        normalized_text(text),
        lambda norm: F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1))),
            lambda i: F.xxhash64(norm.substr(i, F.lit(k))),
        ),
    )


def winnowing_fingerprint(text: Column | str, k: int = 8, window: int = 4) -> Column:
    """Winnowing document fingerprint: min rolling-hash per window of
    ``window`` consecutive k-gram hashes, deduplicated (public
    winnowing algorithm, Schleimer/Wilkerson/Aiken 2003). The hash
    array is let-bound — capturing it raw re-ran the whole rolling-
    hash computation per window, which did not finish in minutes at
    sf0.1 and is sub-second let-bound."""
    def window_mins(hashes: Column) -> Column:
        # Sliding-window min as a zip_with fold over `window` shifted
        # views of the hash array: O(n·w) with arrays only in argument
        # position, vs the slice-per-position formulation whose
        # per-element allocations cost ~25% more interpreted work.
        # Short docs (size < window): the later shifted slices come up
        # empty, zip_with null-pads, and `least` ignores nulls — the
        # min is over however many hashes exist, same as slicing.
        n = F.greatest(F.size(hashes) - (window - 1), F.lit(1))
        mins = F.slice(hashes, 1, n)
        for j in range(1, window):
            mins = F.zip_with(
                mins, F.slice(hashes, j + 1, n), lambda x, y: F.least(x, y)
            )
        return F.array_distinct(mins)

    return let1(rolling_hashes(text, k), window_mins)


def words_lower(text: Column | str) -> Column:
    """Lowercased whitespace tokens — the shared input of the
    repetition / novelty signals below."""
    c = F.col(text) if isinstance(text, str) else text
    return tokens(F.lower(c))


def ngram_array(w: Column, n: int = 3) -> Column:
    """Array of space-joined word n-grams over a precomputed token
    array; empty array when the document has fewer than ``n`` words.
    Built with sequence+transform (JVM-side, no explode) so callers
    decide whether to stay per-row or explode into an inverted index."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(n)]),
    )
    return F.when(F.size(w) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def word_ngrams(text: Column | str, n: int = 3) -> Column:
    return ngram_array(words_lower(text), n)


def dup_frac(arr: Column) -> Column:
    """Fraction of array elements that repeat an earlier element —
    the Gopher-style within-document repetition signal (public rule
    family: MassiveText quality heuristics); 0.0 on empty arrays."""
    frac = (F.size(arr) - F.size(F.array_distinct(arr))).cast("double") / F.size(
        arr
    ).cast("double")
    return F.when(F.size(arr) > 0, frac).otherwise(F.lit(0.0))


def max_run_frac(w: Column) -> Column:
    """Occurrences of the single most frequent element / total
    elements. Sort the array, then one aggregate() fold tracks the
    longest equal-run — O(n log n) per row with a constant-size
    expression tree. (The naive transform(distinct, d ->
    size(filter(w, x==d))) nests higher-order lambdas, which drops
    out of codegen and re-evaluates the inner array per element —
    quadratic AND interpreted.)"""
    s = F.array_sort(w)
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.lit("").alias("prev"), zero.alias("run"), zero.alias("best")
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    best = F.aggregate(s, init, step)["best"]
    return best.cast("double") / F.size(w).cast("double")


def dup_word_frac(text: Column | str) -> Column:
    return dup_frac(words_lower(text))


def top_word_frac(text: Column | str) -> Column:
    return max_run_frac(words_lower(text))


def dup_ngram_frac(text: Column | str, n: int = 2) -> Column:
    """Fraction of word n-grams that are duplicates of an earlier
    n-gram in the same document; 0.0 when the document is too short
    to have any."""
    return dup_frac(word_ngrams(text, n))
