"""Pure-Catalyst text analysis expressions (the JVM fast path).

Every function here returns a ``pyspark.sql.Column`` built only from
built-in functions, so the whole stage stays inside whole-stage codegen —
no Python in the hot path.  Each has a deterministic ANSI-SQL twin used as
the DuckDB oracle in ``__spark_entry__.py``.

Reference parity notes:

* ``normalized_for_compare`` — evaluation comparator normalization
  (``evaluation/comparator.py:86-101``).
* ``line_join`` — LINE-join fallback of the Textract parse
  (``ocr/service.py:1622-1630``) for plain text payloads.
* ``ocr_lines_from_json`` — the same over a Textract-shaped JSON column
  (``_parse_textract_response`` fallback) using from_json + higher-order
  functions.
* ``numeric_normalize`` — ``comparator.py:104-126`` ($,()-stripping cast).
* ``turn_class_col`` — regex classification cascade
  (``classification/service.py:570-596``).

ASCII character classes are used instead of ``\\w`` so Java-regex (Spark)
and RE2 (DuckDB oracle) agree byte-for-byte.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

PUNCT_RE = "[^a-zA-Z0-9_ \\t\\n\\r]"
WS_RE = "[ \\t\\n\\r]+"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that", "for", "with"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por", "con", "para"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "von"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour", "que", "avec"],
}


def normalized_for_compare(c: Column) -> Column:
    """lower(collapse_ws(strip_punct(c))) — comparator.py:86-101."""
    return F.lower(
        F.trim(F.regexp_replace(F.regexp_replace(c, PUNCT_RE, ""), WS_RE, " "))
    )


def line_join(c: Column) -> Column:
    """Split → trim → drop empties → join '\\n' (plain-text normalize)."""
    return F.array_join(
        F.filter(
            F.transform(F.split(c, "\n"), lambda x: F.trim(x)),
            lambda x: x != F.lit(""),
        ),
        "\n",
    )


_BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField(
            "Blocks",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("BlockType", T.StringType()),
                        T.StructField("Text", T.StringType()),
                        T.StructField("Confidence", T.DoubleType()),
                        T.StructField("TextType", T.StringType()),
                    ]
                )
            ),
        )
    ]
)


def ocr_lines_from_json(c: Column) -> Column:
    """Textract-shaped JSON → LINE texts joined with '\\n' (pure Catalyst)."""
    blocks = F.from_json(c, _BLOCKS_SCHEMA)["Blocks"]
    lines = F.filter(
        blocks,
        lambda b: (b["BlockType"] == F.lit("LINE"))
        & b["Text"].isNotNull()
        & (b["Text"] != F.lit("")),
    )
    return F.array_join(F.transform(lines, lambda b: b["Text"]), "\n")


def numeric_normalize(c: Column) -> Column:
    """Strip $ , and spaces; (x) → -x; cast double (comparator.py:104-126).
    try_cast so unparseable values become NULL (reference returns None)
    instead of raising under ANSI mode."""
    s = F.regexp_replace(c, "[$, ]", "")
    neg = s.rlike("^\\(.*\\)$")
    inner = F.substring(s, 2, F.length(s) - F.lit(2))
    return F.when(neg, -inner.try_cast("double")).otherwise(s.try_cast("double"))


def token_count(c: Column) -> Column:
    """Whitespace token count (size guardrail analog, utils:606-635)."""
    return F.regexp_count(c, F.lit("[^ \\t\\n\\r]+"))


def punct_ratio(c: Column) -> Column:
    return F.regexp_count(c, F.lit("[^a-zA-Z0-9 \\t\\n\\r]")).cast("double") / F.greatest(
        F.length(c), F.lit(1)
    ).cast("double")


def stopword_count(c: Column, lang: str = "en") -> Column:
    words = "|".join(STOPWORDS[lang])
    return F.regexp_count(F.lower(c), F.lit(f"\\b(?:{words})\\b"))


def stopword_ratio(c: Column, lang: str = "en") -> Column:
    return stopword_count(c, lang).cast("double") / F.greatest(
        token_count(c), F.lit(1)
    ).cast("double")


def lang_id(c: Column) -> Column:
    """Stopword-vote language id with deterministic priority tie-break
    (en > es > de > fr > unknown); CJK presence short-circuits to zh."""
    counts = {lg: stopword_count(c, lg) for lg in STOPWORDS}
    has_cjk = F.regexp_count(c, F.lit("[\\x{4e00}-\\x{9fff}]")) > F.lit(0)
    en, es, de, fr = counts["en"], counts["es"], counts["de"], counts["fr"]
    best = F.greatest(en, es, de, fr)
    return (
        F.when(has_cjk, F.lit("zh"))
        .when(best == F.lit(0), F.lit("unknown"))
        .when(en == best, F.lit("en"))
        .when(es == best, F.lit("es"))
        .when(de == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )


def quality_score(c: Column) -> Column:
    """Deterministic quality heuristic in [0,1]: length component,
    punctuation cleanliness, stopword naturalness.  Rounded to 4dp so the
    double arithmetic hashes identically against the SQL oracle."""
    tk = token_count(c).cast("double")
    length_c = F.least(tk / F.lit(100.0), F.lit(1.0))
    clean_c = F.lit(1.0) - F.least(punct_ratio(c) * F.lit(4.0), F.lit(1.0))
    natural_c = F.least(stopword_ratio(c) * F.lit(5.0), F.lit(1.0))
    return F.round(
        F.lit(0.4) * length_c + F.lit(0.3) * clean_c + F.lit(0.3) * natural_c, 4
    )


def fingerprint(c: Column) -> Column:
    """Document fingerprint = md5 of the comparator-normalized text."""
    return F.md5(normalized_for_compare(c))


# BPE-ish pre-tokenizer: letter runs (with optional apostrophe suffix),
# digit runs, or single punctuation marks — the GPT-2-style pre-split that
# upper-bounds subword token counts far better than whitespace splitting.
BPE_ISH_RE = "[a-zA-Z]+(?:'[a-z]+)?|[0-9]+|[^a-zA-Z0-9 \\t\\n\\r]"


def bpe_ish_token_count(c: Column) -> Column:
    """Subword-ish token count (training-data budgeting; the reference's
    len/4 estimate, utils/__init__.py:606-635, replaced by a real
    pre-tokenizer count)."""
    return F.regexp_count(c, F.lit(BPE_ISH_RE))


ROLL_BASE = 131
ROLL_MOD = 1_000_000_007


def rolling_hash(c: Column, length: int = 64) -> Column:
    """Polynomial rolling hash (Rabin-Karp) of the first ``length`` chars:
    acc = (acc*B + code) mod M, folded left-to-right JVM-side with
    ``aggregate`` over the exploded char array — the document-fingerprint
    primitive behind content-defined chunking."""
    chars = F.split(F.substring(c, 1, length), "")
    return F.aggregate(
        F.filter(chars, lambda ch: ch != F.lit("")),
        F.lit(0).cast("long"),
        lambda acc, ch: F.pmod(
            acc * F.lit(ROLL_BASE) + F.ascii(ch).cast("long"), F.lit(ROLL_MOD)
        ),
    )


def template_fill(template: Column, values: dict) -> Column:
    """{PLACEHOLDER} substitution (P12, extraction/service.py:122-311):
    a chain of literal replaces generated from the mapping — pure Catalyst,
    no format engine needed for the reference's brace-token contract."""
    out = template
    for key, val in values.items():
        out = F.replace(out, F.lit("{" + key + "}"), val)
    return out


def turn_class_col(
    c: Column, classes: Optional[List[Tuple[str, Optional[str]]]] = None
) -> Column:
    """First-match-wins rlike cascade (classification/service.py:570-596)."""
    from ..kernels.classify import DEFAULT_CLASSES

    classes = classes or DEFAULT_CLASSES
    expr = None
    fallback = "unknown"
    for name, rx in classes:
        if rx is None:
            fallback = name
            continue
        cond = c.rlike(rx)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr.otherwise(F.lit(fallback)) if expr is not None else F.lit(fallback)


def word_ngrams(words, n: int):
    """Array of space-joined word ``n``-grams from a word-array column;
    empty array when the doc has fewer than ``n`` words.  Shared by the
    ROUGE metric and the hashed-feature builders so tokenization edge
    handling lives in ONE place (``lm_score_bits`` keeps its struct-pair
    form — its model joins on (w1, w2) columns, not joined strings)."""
    k = F.size(words)
    return F.when(
        k >= n,
        F.transform(
            F.sequence(F.lit(1), k - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


# Readability counters (Flesch 1948 / Kincaid 1975), deterministic
# regex approximations: sentences = terminal-punctuation runs (min 1),
# syllables = vowel-group runs per word (min 1 per word) — the standard
# dictionary-free estimate.
SENT_RE = "[.!?]+"
VOWEL_GROUP_RE = "[aeiouyAEIOUY]+"
WORD_RE = "[a-zA-Z]+"


def readability_cols(c: Column) -> tuple[Column, Column, Column, Column]:
    """(n_words, n_sentences, n_syllables, flesch_reading_ease) — the
    curation-side readability gate (very low scores flag legalese /
    machine-generated sludge; implausibly high ones flag word-soup).
    ``flesch = 206.835 - 1.015·(words/sentences) - 84.6·(syllables/
    words)``, computed with clamped-≥1 denominators and rounded to 4dp
    so the double arithmetic hashes identically in the SQL oracle.
    Pure Catalyst (three regexp_counts) — whole-stage codegen, no
    Python, no shuffle."""
    words = F.regexp_count(c, F.lit(WORD_RE))
    sents = F.greatest(F.regexp_count(c, F.lit(SENT_RE)), F.lit(1))
    # vowel groups, floored at one syllable per word: count vowel runs,
    # then add one for every word containing NO vowel (e.g. "7th", "xyz")
    vgroups = F.regexp_count(c, F.lit(VOWEL_GROUP_RE))
    novowel = words - F.regexp_count(
        c, F.lit("[a-zA-Z]*[aeiouyAEIOUY][a-zA-Z]*")
    )
    syll = vgroups + F.greatest(novowel, F.lit(0))
    wd = F.greatest(words, F.lit(1)).cast("double")
    flesch = F.round(
        F.lit(206.835)
        - F.lit(1.015) * (wd / sents.cast("double"))
        - F.lit(84.6) * (syll.cast("double") / wd),
        4,
    )
    return (
        words.cast("long"),
        sents.cast("long"),
        syll.cast("long"),
        flesch,
    )
