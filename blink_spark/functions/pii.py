"""PII detection / redaction kernels for training-data curation.

Counts and redacts email addresses, IPv4 literals, and international
phone numbers with pure JVM regex expressions (``regexp_count`` /
nested ``regexp_replace`` — whole-stage codegen, no Python). Each
kernel has a DuckDB SQL twin for the driver's cross-engine oracle.

The patterns deliberately use only the regex subset where Java's
engine (Spark) and RE2 (DuckDB) agree: character classes, bounded
repetition, and ASCII ``\\b`` word boundaries — no backreferences,
no lookaround.

Reference lineage: the reference has no PII stage (it links entities,
it doesn't curate corpora); this extends the engine toward the
training-data pipeline the brief asks for. The redaction invariant
(sha256 of the redacted text) mirrors the per-row content-sha256
discipline of the ER pipeline (BASELINE.json input_hint).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Pattern constants shared verbatim by both engines. Keep these in
# sync with nothing — they ARE the single source of truth; the SQL
# twins interpolate the same strings.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b"
# +CC then 6-16 further digits/space/()/- ending in a digit; anchored
# on the leading '+' so prose numerals don't false-positive.
PHONE_RE = r"\+[0-9][0-9 ()-]{5,17}[0-9]"

# Redaction order is part of the contract: emails first (their
# local/domain parts may contain digit runs the IP/phone patterns
# would otherwise nibble), then IPs, then phones.
_REDACTIONS: tuple[tuple[str, str], ...] = (
    (EMAIL_RE, "<EMAIL>"),
    (IPV4_RE, "<IP>"),
    (PHONE_RE, "<PHONE>"),
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_counts(text_col: Column | str) -> dict[str, Column]:
    """Per-row match counts for each PII class. long columns.

    Each class is counted on the text with all EARLIER classes already
    redacted (the ``_REDACTIONS`` order), so counts agree with what
    :func:`redact` actually replaces — a plus-addressed email like
    ``a+4930123456@x.com`` is one email, not an email AND a phone."""
    cur = _c(text_col)
    out: dict[str, Column] = {}
    for (pat, tag), name in zip(_REDACTIONS, ("n_emails", "n_ipv4", "n_phones")):
        out[name] = F.regexp_count(cur, F.lit(pat)).cast("long")
        cur = F.regexp_replace(cur, pat, tag)
    return out


def pii_counts_sql(col: str) -> dict[str, str]:
    # DuckDB single-quoted literals are escape-free: a backslash in
    # the Python pattern string passes through to RE2 verbatim. Same
    # progressive-redaction order as pii_counts.
    def q(pat: str) -> str:
        return pat.replace(chr(39), chr(39) * 2)

    out: dict[str, str] = {}
    cur = col
    for (pat, tag), name in zip(_REDACTIONS, ("n_emails", "n_ipv4", "n_phones")):
        out[name] = f"len(regexp_extract_all({cur}, '{q(pat)}'))::BIGINT"
        cur = f"regexp_replace({cur}, '{q(pat)}', '{tag}', 'g')"
    return out


def redact(text_col: Column | str) -> Column:
    """Text with every PII match replaced by its class tag."""
    out = _c(text_col)
    for pat, tag in _REDACTIONS:
        out = F.regexp_replace(out, pat, tag)
    return out


def redact_sql(col: str) -> str:
    out = col
    for pat, tag in _REDACTIONS:
        out = (
            f"regexp_replace({out}, "
            f"'{pat.replace(chr(39), chr(39) * 2)}', '{tag}', 'g')"
        )
    return out


def redacted_sha256(text_col: Column | str) -> Column:
    """Hex sha256 of the redacted text — the cheap cross-engine
    equality witness that the two redaction pipelines agree
    byte-for-byte (stronger than comparing counts)."""
    return F.sha2(redact(text_col), 256)


def redacted_sha256_sql(col: str) -> str:
    return f"sha256({redact_sql(col)})"
