"""PII redaction and URL/domain extraction — training-data scrubbing ops.

Before text reaches a training corpus, a pipeline redacts contact
information (emails, phone numbers) and normalizes/aggregates URLs by
domain. Both are pure Catalyst regexp expressions — ``regexp_replace`` /
``regexp_extract_all`` compile once per task and run inside whole-stage
codegen, so the scrub is a map-only pass over the corpus scan: zero
shuffles, linear at 100 TB.

The fixture corpus carries no natural PII/URLs (TESTDATA.md synthetic
text), so the registry query manufactures deterministic contact strings
FROM fixture columns (customer names/keys) and then scrubs them — the
oracle runs the identical construction + redaction in DuckDB, so what is
actually being verified is the cross-engine regex semantics of the
redaction operator itself (Spark's Java regex vs DuckDB's RE2 on the same
patterns), which is exactly the part a user would rely on.

Patterns are deliberately RE2-safe (no backreferences/lookaround) so the
same pattern text means the same language in both engines — and in any
other engine a user might port to.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: RE2-safe, anchored-by-context patterns (no lookaround)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}"
URL_RE = r"https?://[A-Za-z0-9.-]+(/[A-Za-z0-9./_-]*)?"
DOMAIN_RE = r"https?://([A-Za-z0-9.-]+)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def redact_pii(text: Column | str) -> Column:
    """Replace every email then every phone with typed placeholders.

    Order matters: emails first, so a phone-looking fragment inside an
    address is never half-redacted. Spark's regexp_replace is global by
    default (DuckDB needs the explicit 'g' flag — the oracle sets it).
    """
    t = _c(text)
    t = F.regexp_replace(t, EMAIL_RE, "[EMAIL]")
    return F.regexp_replace(t, PHONE_RE, "[PHONE]")


def pii_counts(text: Column | str) -> tuple[Column, Column]:
    """(n_emails, n_phones) found in the text — the audit metric a scrub
    job reports per shard."""
    t = _c(text)
    return (
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), 0)),
    )


def extract_domains(text: Column | str) -> Column:
    """All URL domains mentioned in the text (capture group 1), for
    domain-level frequency/blocklist aggregation."""
    return F.regexp_extract_all(_c(text), F.lit(DOMAIN_RE), 1)
