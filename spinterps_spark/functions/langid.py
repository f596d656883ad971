"""Rule-based language identification over text + token arrays.

Two evidence families, one argmax (VERDICT r3 next-step #6 extends the r2
4-language stopword argmax to non-Latin scripts):

- Latin-script languages (en/fr/de/es): per-language stopword tables
  (public common-word lists) give one token-hit ratio per language.
- Non-Latin languages (zh/ja/ru/ar/ko): Unicode script-block character ratios
  over the non-space text — pure `regexp_count` / codepoint-class
  arithmetic. Japanese is separated from Chinese by kana (unique to ja):
  the zh score is the CJK-ideograph ratio *suppressed* by twice the kana
  ratio, so any kana-bearing text scores ja, while pure-ideograph text
  scores zh.

The prediction is the argmax over all 9 scores with a fixed priority
tie-break, or 'unk' when no language clears MIN_RATIO. The SAME tables
drive both the Spark expression and the generated DuckDB SQL twin
(sql_lang_expr), so the oracle can never drift from the engine — the
simhash-blocks pattern.

Scale: everything is JVM-side array/regex algebra (split / array_contains
filters / regexp_count / greatest) — no Python in the hot path, whole-stage
codegen applies, and the expression is O(n_chars + n_tokens * n_langs) per
row with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# public common-word lists (top function words per language)
STOPWORDS_BY_LANG: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "you", "that",
           "was", "for", "on", "are", "with", "as", "they", "at", "this",
           "have"),
    "fr": ("le", "la", "les", "de", "des", "un", "une", "et", "est", "que",
           "qui", "dans", "pour", "pas", "vous", "je", "il", "au", "avec",
           "sur"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "ich",
           "er", "sie", "wir", "ihr", "den", "dem", "mit", "auf", "für",
           "von", "zu"),
    "es": ("el", "los", "las", "que", "y", "en", "un", "una", "es", "no",
           "por", "con", "para", "su", "al", "lo", "se", "mi", "como",
           "más"),
}

# Unicode script blocks (public ranges): (java_regex_class, re2_regex_class)
SCRIPT_CLASSES: dict[str, tuple[str, str]] = {
    "cjk": ("[\\u4e00-\\u9fff]", "[\\x{4E00}-\\x{9FFF}]"),   # CJK ideographs
    "kana": ("[\\u3040-\\u30ff]", "[\\x{3040}-\\x{30FF}]"),  # hiragana+katakana
    "cyr": ("[\\u0400-\\u04ff]", "[\\x{0400}-\\x{04FF}]"),   # Cyrillic
    "arab": ("[\\u0600-\\u06ff]", "[\\x{0600}-\\x{06FF}]"),  # Arabic
    "hang": ("[\\uac00-\\ud7a3]", "[\\x{AC00}-\\x{D7A3}]"),  # Hangul syllables
}

SCRIPT_LANGS = ("zh", "ja", "ru", "ar", "ko")
LANG_ORDER = tuple(STOPWORDS_BY_LANG) + SCRIPT_LANGS  # argmax tie-break
MIN_RATIO = 0.04


def lang_score_cols(text: Column, toks: Column) -> dict[str, Column]:
    """Per-language score columns: stopword-hit ratio for Latin-script
    languages, script-block character ratio for zh/ja/ru/ar/ko."""
    # Both divisors are guarded: under Spark 4's ANSI mode an empty or
    # whitespace-only doc (n == 0 or nz == 0) would otherwise throw
    # DIVIDE_BY_ZERO and fail the whole job. Degenerate docs score 0.0 on
    # every language and fall through to 'unk' — identically in the DuckDB
    # twin (sql_lang_expr uses nullif+coalesce).
    n = F.size(toks).cast("double")
    out = {}
    for lang, words in STOPWORDS_BY_LANG.items():
        hits = F.size(F.filter(toks, lambda x: x.isin(*words)))
        out[lang] = F.when(n > 0, hits / n).otherwise(F.lit(0.0))
    nz = F.length(F.translate(text, " ", "")).cast("double")
    script = {
        k: F.when(
            nz > 0, F.regexp_count(text, F.lit(java)).cast("double") / nz
        ).otherwise(F.lit(0.0))
        for k, (java, _re2) in SCRIPT_CLASSES.items()
    }
    out["zh"] = F.greatest(
        F.lit(0.0), script["cjk"] - F.lit(2.0) * script["kana"]
    )
    out["ja"] = script["kana"]
    out["ru"] = script["cyr"]
    out["ar"] = script["arab"]
    out["ko"] = script["hang"]
    return out


def lang_pred_col(
    text: Column, toks: Column, min_ratio: float = MIN_RATIO
) -> Column:
    """argmax-by-score language prediction ('unk' below min_ratio); ties
    resolve to the earliest language in LANG_ORDER."""
    scores = lang_score_cols(text, toks)
    best = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    expr = F.lit("unk")
    for lang in reversed(LANG_ORDER):
        expr = F.when(
            (scores[lang] == best) & (best >= min_ratio), F.lit(lang)
        ).otherwise(expr)
    return expr


def _sql_word_list(words: tuple[str, ...]) -> str:
    return "(" + ",".join(f"'{w}'" for w in words) + ")"


def sql_lang_expr(
    text_sql: str, toks_sql: str, min_ratio: float = MIN_RATIO
) -> str:
    """DuckDB twin of lang_pred_col, generated from the same tables.
    text_sql / toks_sql: SQL expressions producing the raw text and the
    token list. Script counts use RE2 \\x{...} classes over the identical
    codepoint ranges the Spark side counts with Java \\uXXXX classes."""
    score = {
        lang: (
            f"coalesce(len(list_filter({toks_sql}, x -> x IN "
            f"{_sql_word_list(words)})) "
            f"/ CAST(nullif(len({toks_sql}), 0) AS DOUBLE), 0.0)"
        )
        for lang, words in STOPWORDS_BY_LANG.items()
    }
    nz = f"CAST(length(replace({text_sql}, ' ', '')) AS DOUBLE)"
    sc = {
        k: (
            f"coalesce(CAST(len(regexp_extract_all({text_sql}, '{re2}')) "
            f"AS DOUBLE) / nullif({nz}, 0), 0.0)"
        )
        for k, (_java, re2) in SCRIPT_CLASSES.items()
    }
    score["zh"] = f"greatest(0.0, {sc['cjk']} - 2.0 * {sc['kana']})"
    score["ja"] = sc["kana"]
    score["ru"] = sc["cyr"]
    score["ar"] = sc["arab"]
    score["ko"] = sc["hang"]
    best = "greatest(" + ", ".join(score[lang] for lang in LANG_ORDER) + ")"
    whens = "\n         ".join(
        f"WHEN {score[lang]} = {best} AND {best} >= {min_ratio} THEN '{lang}'"
        for lang in LANG_ORDER
    )
    return f"CASE {whens}\n         ELSE 'unk' END"
