"""PII detection and redaction — pure-codegen regex scrubbing.

The standard privacy pass over a pre-training corpus: find and replace
emails, phone numbers, IP addresses, SSNs, and card numbers with typed
placeholder tokens (the convention used by public corpus pipelines such
as BigScience ROOTS / The Pile derivatives).

Scale design: every rule is a JVM-side ``regexp_replace`` /
``regexp_count`` column expression — zero shuffle, zero Python, one
scan, trivially pushdown-compatible. Rules apply in a fixed order
(specific before general) so e.g. a card number is never half-eaten by
the phone rule. The reference system has no corpus operators; this is
north-star surface like text.py / repetition.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered (name, pattern, replacement). Patterns are deliberately
# conservative (word-boundary anchored, bounded lengths) — a corpus
# scrubber must not mangle code/technical text with false positives.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\b",
        "<IP>",
    ),
    (
        "ssn",
        r"\b(?!000|666|9[0-9]{2})[0-9]{3}-(?!00)[0-9]{2}-(?!0000)[0-9]{4}\b",
        "<SSN>",
    ),
    (
        "card",
        r"\b(?:[0-9][ -]?){12,18}[0-9]\b",
        "<CARD>",
    ),
    (
        "phone",
        r"(?<![0-9])(?:\+?[0-9]{1,3}[ .-]?)?(?:\([0-9]{2,4}\)[ .-]?)?"
        r"[0-9]{3}[ .-][0-9]{3,4}(?:[ .-][0-9]{2,4})?(?![0-9])",
        "<PHONE>",
    ),
)


def _rule_counts(text_col: str) -> list[Column]:
    """Per-rule match-count columns, measured on the progressively-
    redacted text exactly as ``redact_pii`` consumes it — a card number
    counts once as `card`, never again as `phone`. Row-local."""
    t: Column = F.col(text_col)
    counts = []
    for name, pat, repl in PII_RULES:
        counts.append(F.regexp_count(t, F.lit(pat)).alias(f"n_{name}"))
        t = F.regexp_replace(t, pat, repl)
    return counts


def pii_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document match counts per rule + total (detection / audit pass)."""
    counts = _rule_counts(text_col)
    names = [f"n_{name}" for name, _, _ in PII_RULES]
    total = sum((F.col(n) for n in names), F.lit(0))
    return docs.select("doc_id", *counts).select(
        "doc_id", *names, total.alias("n_pii")
    )


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace every PII match with its typed placeholder, in rule order.

    Returns the input with ``text_col`` rewritten — a drop-in stage for
    curate pipelines.
    """
    col: Column = F.col(text_col)
    for _, pat, repl in PII_RULES:
        col = F.regexp_replace(col, pat, repl)
    return docs.withColumn(text_col, col)


def pii_filter(docs: DataFrame, max_pii: int = 0, text_col: str = "text") -> DataFrame:
    """Documents with at most ``max_pii`` PII matches.

    The count is row-local, so this is a single filter over one scan —
    no join, no shuffle, original rows returned unchanged.
    """
    total: Column = F.lit(0)
    t: Column = F.col(text_col)
    for _, pat, repl in PII_RULES:
        total = total + F.regexp_count(t, F.lit(pat))
        t = F.regexp_replace(t, pat, repl)
    return docs.filter(total <= max_pii)
