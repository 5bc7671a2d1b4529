"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

North-star extension (BASELINE.json): the per-document scoring
passes a training-data pipeline runs before filtering/dedup. All
pure Catalyst expressions — one narrow projection pass over the
corpus, no shuffle, no Python.

Portability notes: ratios divide exact integers (deterministic
doubles); the fingerprint is a sequential polynomial fold with
modular integer arithmetic — both reproducible in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hadoop_main_spark.functions.hashing import hash64
from hadoop_main_spark.operators.transforms import tokenize

FP_P = 2_147_483_647  # fingerprint modulus (2^31-1)
FP_MULT = 131

#: tiny per-language stopword profiles for the n-gram/stopword
#: language-ID heuristic (deterministic; tie → first in this order).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "en"),
    "zh": ("的", "是", "了", "在", "我", "有", "他", "这"),
}


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokenize(text))


def bpe_ish_count(text: Column | str) -> Column:
    """BPE-ish subword proxy: count of maximal runs of ≤4 word chars
    plus standalone non-space punctuation (a cheap, deterministic
    stand-in for a real tokenizer's piece count)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(
        F.regexp_extract_all(c, F.lit("[A-Za-z0-9]{1,4}|[^A-Za-z0-9\\s]"), F.lit(0))
    )


def stopword_score(text: Column | str, words: tuple[str, ...]) -> Column:
    """Number of tokens that are in the given stopword set."""
    toks = tokenize(text)
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wl, F.lower(t))))


#: languages whose text is UNSEGMENTED (no whitespace tokens): their
#: profiles score by substring OCCURRENCE counts, not token equality —
#: a token-equality zh profile could never fire on real Chinese text
#: (review-r4b: '我有他的书' is ONE whitespace token).
CHAR_PROFILE_LANGS: frozenset[str] = frozenset({"zh"})

# lang_id's compiled-regex token scoring uses (?i), which is
# ASCII-only case folding in Java regex — equivalent to the lowercase
# token equality it replaced ONLY while every token-profile word is
# ASCII (advice r11 #3: a future accented profile word, e.g. French
# 'été', would silently miss uppercase forms). Assert at import so
# adding such a word fails loudly instead of mis-scoring.
for _lang, _words in LANG_PROFILES.items():
    if _lang not in CHAR_PROFILE_LANGS and not all(w.isascii() for w in _words):
        raise AssertionError(
            f"LANG_PROFILES[{_lang!r}] has non-ASCII words; lang_id's "
            "(?i) regex folds ASCII only — switch to (?iu) or revert "
            "to lowercase token equality for this profile"
        )
del _lang, _words


def char_profile_score(text: Column | str, chars: tuple[str, ...]) -> Column:
    """Total occurrence count of the profile characters in the raw
    text (each profile entry is a single char, so length deltas count
    occurrences exactly)."""
    c = F.col(text) if isinstance(text, str) else text
    score = F.lit(0)
    for ch in chars:
        score = score + (F.length(c) - F.length(F.replace(c, F.lit(ch), F.lit(""))))
    return score


def _profile_score(text: Column | str, lang: str, words: tuple[str, ...]) -> Column:
    if lang in CHAR_PROFILE_LANGS:
        return char_profile_score(text, words)
    return stopword_score(text, words)


def lang_id(text: Column | str) -> Column:
    """argmax-of-profile-hits language guess; deterministic
    tie-break = profile declaration order; no hits at all → 'und'.
    Whitespace-tokenized languages score by stopword-token hits;
    unsegmented languages (CHAR_PROFILE_LANGS) by profile-character
    occurrence counts.

    Single-pass argmax: every profile score is evaluated exactly ONCE
    into an array of (score, -declaration_index, lang) structs and
    array_max picks the winner by struct order — max score first,
    earliest-declared language on ties. An all-zero corpus row falls
    to the appended 'und' sentinel (score 0, tie-rank ABOVE every
    language, so any language needs score > 0 to beat it — the
    documented no-hits rule). The previous fold of nested WHENs
    doubled the expression tree per language (~2^|langs| copies of
    the innermost tokenize once Catalyst inlined the chain) and its
    conditional branches defeated codegen subexpression elimination
    (optimization r11: the curation feature projection alone cost
    1.1 s at sf0.1).

    Token-profile scores count stopword-token hits with ONE compiled
    regex per language over the raw text instead of
    tokenize-then-filter: ``(?i)(?:^|\\s)(?:w1|...|wn)(?=\\s|$)``
    matches exactly the whitespace-delimited tokens whose lowercase
    form equals a profile word (tokens are maximal non-space runs, so
    a single leading ^|\\s and a trailing \\s|$ lookahead reproduce
    token equality; the lookahead leaves the trailing separator for
    the next match, so adjacent stopwords all count). Higher-order
    filter lambdas are interpreted per token — the regex runs inside
    codegen (optimization r11: 0.52 s -> 0.36 s for the projection at
    sf0.1, equivalence checked row-for-row at all three scales)."""
    import re as _re

    entries = []
    for i, (lang, words) in enumerate(LANG_PROFILES.items()):
        if lang in CHAR_PROFILE_LANGS:
            s = _profile_score(text, lang, words)
        else:
            c = F.col(text) if isinstance(text, str) else text
            pat = (
                "(?i)(?:^|\\s)(?:"
                + "|".join(_re.escape(w) for w in words)
                + ")(?=\\s|$)"
            )
            s = F.regexp_count(c, F.lit(pat))
        entries.append(
            F.struct(
                s.cast("bigint").alias("s"),
                F.lit(-i).alias("ni"),
                F.lit(lang).alias("lang"),
            )
        )
    entries.append(
        F.struct(
            F.lit(0).cast("bigint").alias("s"),
            F.lit(1).alias("ni"),
            F.lit("und").alias("lang"),
        )
    )
    return F.array_max(F.array(*entries))["lang"]


def token_quality_cols(text_col: str) -> dict[str, Column]:
    """The token-derived quality expressions as reusable Columns —
    :func:`quality_features` and the fused curation pipeline both
    build from this single definition, so the gate semantics cannot
    diverge between the two call sites."""
    toks = tokenize(text_col)
    n_tok = F.size(toks).cast("bigint")
    n_uniq = F.size(F.array_distinct(toks)).cast("bigint")
    safe = F.when(n_tok > 0, n_tok.cast("double")).otherwise(F.lit(1.0))
    return {
        "n_tokens": n_tok,
        "n_unique_tokens": n_uniq,
        "unique_ratio": n_uniq.cast("double") / safe,
    }


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality feature COUNTS AND RATIOS: length, token
    stats, stopword ratio, punctuation ratio, unique token ratio —
    the usual cheap pre-filter signals (compose them downstream; no
    opinionated composite score is emitted). Token-derived columns
    share :func:`token_quality_cols`' definitions, so the gate
    semantics cannot diverge between the feature table and the fused
    curation pipeline."""
    qcols = token_quality_cols(text_col)
    n_tok = qcols["n_tokens"]
    n_chars = F.length(text_col).cast("bigint")
    n_stop = stopword_score(text_col, LANG_PROFILES["en"]).cast("bigint")
    n_uniq = qcols["n_unique_tokens"]
    # Column-based regexp (never interpolate the column name into SQL
    # text — the transforms.py regex_matches rule)
    n_punct = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"[^A-Za-z0-9\s]"), F.lit(0))
    ).cast("bigint")
    out = df.select(
        F.col(id_col),
        n_chars.alias("n_chars_computed"),
        n_tok.alias("n_tokens"),
        n_uniq.alias("n_unique_tokens"),
        n_stop.alias("n_stopwords"),
        n_punct.alias("n_punct"),
    )
    tok_d = F.col("n_tokens").cast("double")
    safe = F.when(F.col("n_tokens") > 0, tok_d).otherwise(F.lit(1.0))
    return out.select(
        "*",
        (F.col("n_unique_tokens").cast("double") / safe).alias("unique_ratio"),
        (F.col("n_stopwords").cast("double") / safe).alias("stopword_ratio"),
        (F.col("n_punct").cast("double") / F.greatest(F.col("n_chars_computed"), F.lit(1)).cast("double")).alias("punct_ratio"),
    )


def fingerprint(text: Column | str) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash
    over token hashes, fp = fold(fp*131 + h(tok)) mod (2^31-1).
    Equal fingerprints ⇒ (w.h.p.) same token sequence — unlike the
    bag-of-words hashes used for dedup."""
    toks = tokenize(text)
    hs = F.transform(toks, lambda t: hash64(t) % FP_P)
    return F.aggregate(
        hs, F.lit(0).cast("bigint"), lambda acc, h: (acc * FP_MULT + h) % FP_P
    )


#: the Gopher quality-rule stopword set (Rae et al. 2021,
#: arXiv:2112.11446 §A1.1) — distinct from LANG_PROFILES (that is the
#: language-ID heuristic; this is the published filter rule).
GOPHER_STOPWORDS: tuple[str, ...] = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_flags_cols(text_col: str) -> dict[str, Column]:
    """Gopher-style document quality rules (Rae et al. 2021,
    arXiv:2112.11446 §A1.1) as reusable boolean Columns, one narrow
    projection, INTEGER-ONLY comparisons (every ratio threshold is
    cross-multiplied, e.g. mean word length in [3,10] becomes
    ``3*n <= sum_len <= 10*n``) so the flags are bit-portable to the
    SQL oracle with zero float divisions:

    - ``ok_token_count``: 50 <= #tokens <= 100000
    - ``ok_word_length``: mean token length in [3, 10]
    - ``ok_symbol_ratio``: (#'#' + #'...') / #tokens <= 0.1
    - ``ok_bullet_lines``: <= 90% of lines start with a bullet
    - ``ok_ellipsis_lines``: <= 30% of lines end with '...'
    - ``ok_alpha_words``: >= 80% of tokens contain a letter
    - ``ok_stopwords``: >= 2 distinct Gopher stopwords present
    - ``pass_gopher``: all of the above

    NULL text is treated as the empty document (flags evaluate on
    '' — deterministic booleans, never NULL flags).
    """
    c = F.coalesce(F.col(text_col), F.lit(""))
    toks = tokenize(c)
    n_tok = F.size(toks).cast("bigint")
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    lines = F.split(c, "\n")
    n_lines = F.size(lines).cast("bigint")
    bullet_lines = F.size(
        F.filter(lines, lambda l: l.startswith("- ") | l.startswith("* "))
    ).cast("bigint")
    ellipsis_lines = F.size(F.filter(lines, lambda l: l.endswith("..."))).cast("bigint")
    n_hash = (F.length(c) - F.length(F.regexp_replace(c, "#", ""))).cast("bigint")
    # each non-overlapping '...' occurrence removes exactly 3 chars
    n_ellipsis = (
        (F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))) / F.lit(3)
    ).cast("bigint")
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("bigint")
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    stop_distinct = F.size(
        F.array_intersect(F.transform(toks, F.lower), stop_arr)
    ).cast("bigint")
    flags = {
        "n_tokens": n_tok,
        "ok_token_count": (n_tok >= 50) & (n_tok <= 100_000),
        "ok_word_length": (3 * n_tok <= sum_len) & (sum_len <= 10 * n_tok),
        "ok_symbol_ratio": 10 * (n_hash + n_ellipsis) <= n_tok,
        "ok_bullet_lines": 10 * bullet_lines <= 9 * n_lines,
        "ok_ellipsis_lines": 10 * ellipsis_lines <= 3 * n_lines,
        "ok_alpha_words": 5 * alpha_words >= 4 * n_tok,
        "ok_stopwords": stop_distinct >= 2,
    }
    flags["pass_gopher"] = (
        flags["ok_token_count"]
        & flags["ok_word_length"]
        & flags["ok_symbol_ratio"]
        & flags["ok_bullet_lines"]
        & flags["ok_ellipsis_lines"]
        & flags["ok_alpha_words"]
        & flags["ok_stopwords"]
    )
    return flags
