"""PII scrubbing — the masking pass a web-crawl curation pipeline runs
before training-data release (emails, IPv4 addresses, phone-shaped numbers
replaced by typed placeholder tokens).

Patterns are deliberately written in the Java-regex ∩ RE2 common subset (no
lookaround, no backreferences) so the DuckDB oracle runs them VERBATIM:

- email: ``local@domain.tld`` with the usual liberal local/domain classes,
- ipv4: four dot-separated 1-3 digit runs on word boundaries,
- phone: an optional ``+`` then >= 9 chars of digits/space/()/- bounded by
  digits (catches +1 (555) 123-4567 and 0123-456-789 shapes).

Masking order is fixed (email -> ipv4 -> phone) and each count is taken on
the text as ALREADY scrubbed by the earlier passes, so a phone-shaped digit
run inside an email is counted once as email, never twice — the same
sequential semantics in both engines, bit-identical outputs.

Scale shape: three JVM ``regexp_replace``/``regexp_count`` passes in one
narrow projection — no shuffle, no Python, embarrassingly parallel; at
10^12 pages this stage is scan-bound exactly like the tokenizers.

Reference tie-in: none (ANN library); the training-data curation layer the
north rule's Common-Crawl deployment requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d() -]{7,}\d", "<PHONE>"),
]


def _passes(text: Column) -> tuple[dict[str, Column], Column]:
    """-> (per-kind counts on the progressively-scrubbed text, final text)."""
    counts: dict[str, Column] = {}
    cur = text
    for kind, pat, token in PII_PATTERNS:
        counts[kind] = F.regexp_count(cur, F.lit(pat)).cast("long")
        cur = F.regexp_replace(cur, pat, token)
    return counts, cur


def pii_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_email, n_ip, n_phone, n_pii): match counts per document."""
    counts, _ = _passes(F.col(text_col))
    total = counts["email"] + counts["ip"] + counts["phone"]
    return docs.select(
        F.col(id_col),
        counts["email"].alias("n_email"),
        counts["ip"].alias("n_ip"),
        counts["phone"].alias("n_phone"),
        total.alias("n_pii"),
    )


def scrub_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, text, n_pii): the scrubbed corpus — text with every match
    replaced by its typed token, plus the total masked count (0 rows keep
    their text bytes untouched by construction: replace is a no-op without
    a match)."""
    counts, cur = _passes(F.col(text_col))
    total = counts["email"] + counts["ip"] + counts["phone"]
    return docs.select(F.col(id_col), cur.alias(text_col), total.alias("n_pii"))


def _sql_passes(text: str) -> tuple[dict[str, str], str]:
    counts: dict[str, str] = {}
    cur = text
    for kind, pat, token in PII_PATTERNS:
        counts[kind] = f"CAST(len(regexp_extract_all({cur}, '{pat}')) AS BIGINT)"
        cur = f"regexp_replace({cur}, '{pat}', '{token}', 'g')"
    return counts, cur


def pii_stats_sql(rel: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    c, _ = _sql_passes(text_col)
    return f"""
        SELECT {id_col},
               {c['email']} AS n_email,
               {c['ip']} AS n_ip,
               {c['phone']} AS n_phone,
               {c['email']} + {c['ip']} + {c['phone']} AS n_pii
        FROM {rel}
    """


def scrub_pii_sql(rel: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    c, cur = _sql_passes(text_col)
    return f"""
        SELECT {id_col},
               {cur} AS {text_col},
               {c['email']} + {c['ip']} + {c['phone']} AS n_pii
        FROM {rel}
    """


def scrub_text(text: Column) -> Column:
    """Column form of the masking pass (for composition into pipelines)."""
    return _passes(text)[1]


def scrub_text_sql(text: str) -> str:
    return _sql_passes(text)[1]
