"""PII detection / redaction over text columns (training-data pipeline).

A corpus-curation staple: count and scrub emails, phone numbers, IPv4
addresses and long digit runs (card-like) before text enters a training
set. Patterns are written for the REGEX INTERSECTION of Java (Spark) and
RE2 (DuckDB): explicit character classes only — no \\d, \\b, or
lookarounds (RE2 has no lookbehind; Java's \\b is Unicode-aware while
RE2's is ASCII) — so the generated SQL twin matches the engine
occurrence-for-occurrence and the oracle gate locks the COUNTS and the
REDACTED TEXT, not just determinism.

Scale: pure regexp_count / regexp_replace projections — JVM-side,
whole-stage codegen, zero shuffle, O(n_chars) per row.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# order matters: earlier rules run first on the running redacted text
# (email before phone so a phone-like digit run inside an email local
# part is already masked; card before phone so 13+ digit runs don't get
# half-eaten by the shorter phone rule; ipv4 BEFORE phone — review r4:
# phone's greedy trailing [ -]?[0-9]{0,4} would otherwise eat the first
# octet of an adjacent IP, leaving '<PHONE>.2.3.4' with three octets
# leaked and no 4-octet match left for the ipv4 rule)
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email",
     "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+",
     "<EMAIL>"),
    ("card",
     "[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}",
     "<CARD>"),
    ("ipv4",
     "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}",
     "<IP>"),
    ("phone",
     # the optional 4th group is atomic ([ -][0-9]{1,4})? — a bare [ -]?
     # would swallow a trailing separator space even with zero digits
     "[+][0-9]{1,3}[ -][0-9]{2,4}[ -][0-9]{3,4}([ -][0-9]{1,4})?",
     "<PHONE>"),
)


def pii_count_cols(text: Column) -> dict[str, Column]:
    """Per-rule occurrence counts on the ORIGINAL text (reporting view —
    counts are independent of the rule cascade)."""
    return {
        name: F.regexp_count(text, F.lit(pat)).cast("long")
        for name, pat, _repl in PII_RULES
    }


def redact_col(text: Column) -> Column:
    """The redaction cascade: each rule's replacement applied in PII_RULES
    order over the running result."""
    out = text
    for _name, pat, repl in PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def sql_pii_exprs(text_sql: str) -> tuple[dict[str, str], str]:
    """DuckDB twins generated from the SAME rule table: per-rule
    regexp-count expressions and the cascaded redaction expression."""
    counts = {
        name: (
            f"CAST(len(regexp_extract_all({text_sql}, '{pat}')) AS BIGINT)"
        )
        for name, pat, _repl in PII_RULES
    }
    red = text_sql
    for _name, pat, repl in PII_RULES:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return counts, red
