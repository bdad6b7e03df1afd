"""PII detection / redaction expression library (native Catalyst regexps).

Training-data pipelines scrub personally identifiable information before
anything else touches the text; these are the standard pattern scanners
(email, phone, IPv4, SSN-shaped ids) as JVM-side regexp expressions — the
100 TB path is a pure scan, no Python, no shuffle.

Pattern notes: every regex here is valid and equivalent under both Java's
backtracking engine (Spark) and RE2 (DuckDB — the oracle; RE2's default is
leftmost-first, same as Java): no lookaround, no backreferences, and no
alternation whose branches can match at the same starting position.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# Two shapes: fully-separated 3/4-group numbers ("+1-415-555-2671",
# "415 555 2671") and parenthesized area codes ("(415) 555-2671").  The
# alternation is safe cross-engine because the branches start with disjoint
# characters ('(' vs digit/'+'): RE2's default semantics are leftmost-first,
# the same as Java's, and even under leftmost-longest the disjoint first
# characters mean only one branch can match at any position — branch choice
# is identical either way.  Recall envelope: bare
# unseparated 10-digit runs and exotic international groupings (e.g.
# "+44 20 7946 0958" — 2-digit city code) are NOT detected; matching every
# 10-digit run would redact order ids/timestamps wholesale, so we keep the
# separator requirement.
PHONE_RE = (
    r"\([0-9]{3}\)[-. ]?[0-9]{3}[-. ][0-9]{4}"
    r"|\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{3,4}"
)
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"

# scrub order matters: SSN before phone (a dashed SSN also matches loose
# phone shapes), phone before plain digit patterns, email first (contains
# dots that IPv4 could nibble)
_REDACTIONS: list[tuple[str, str]] = [
    (EMAIL_RE, "<EMAIL>"),
    (SSN_RE, "<SSN>"),
    (PHONE_RE, "<PHONE>"),
    (IPV4_RE, "<IP>"),
]


def email_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(EMAIL_RE))


def phone_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(PHONE_RE))


def ipv4_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(IPV4_RE))


def ssn_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(SSN_RE))


def pii_count(text: Column) -> Column:
    """Total PII hits of all classes (double-counting overlaps is fine for
    a has-PII gate; use redact_pii for exact scrubbing)."""
    return email_count(text) + phone_count(text) + ipv4_count(text) + ssn_count(text)


def redact_pii(text: Column) -> Column:
    """Replace every PII span with a typed placeholder, in fixed scrub order."""
    out = text
    for pat, repl in _REDACTIONS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pseudonymize_emails(text: Column, salt: str = "", token_len: int = 10) -> Column:
    """Replace every email with a CONSISTENT pseudonym token
    `<EMAIL:xxxxxxxxxx>` derived from sha256(lower(email) || salt): the
    same address maps to the same token corpus-wide, so joins/threading
    on the pseudonymized text still link the same principal — redact_pii's
    uniform `<EMAIL>` destroys that linkage. The GDPR-style
    pseudonymization step of a training-data scrub (keep the salt secret
    and rotation re-keys the whole corpus).

    Pure expression form (split on the email regex, hash the extracted
    matches, interleave back): zero shuffle, zero Python — Java's
    split(limit=-1) and DuckDB's str_split_regex both keep leading/
    trailing empty parts, so parts is always matches+1 long and the
    interleave is a total rebuild, byte-identical across engines.
    """
    parts = F.split(text, EMAIL_RE, -1)
    matches = F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)
    pseudo = F.transform(
        matches,
        lambda m: F.concat(
            F.lit("<EMAIL:"),
            F.substring(F.sha2(F.concat(F.lower(m), F.lit(salt)), 256), 1, token_len),
            F.lit(">"),
        ),
    )
    # pad the match list to len(parts) == len(matches)+1 so zip_with never
    # pads with NULL (concat(p, NULL) would null the whole part)
    padded = F.concat(pseudo, F.array(F.lit("")))
    return F.array_join(F.zip_with(parts, padded, lambda p, h: F.concat(p, h)), "")


def duckdb_pseudonymize_emails_sql(col: str, salt: str = "", token_len: int = 10) -> str:
    """DuckDB mirror of pseudonymize_emails (oracle construction)."""
    pat = EMAIL_RE.replace("'", "''")
    return (
        f"array_to_string(list_transform(range(1, len(str_split_regex({col}, '{pat}')) + 1), "
        f"i -> str_split_regex({col}, '{pat}')[i] || coalesce("
        f"'<EMAIL:' || substr(sha256(lower(regexp_extract_all({col}, '{pat}')[i]) || '{salt}'), 1, {token_len}) || '>', "
        f"'')), '')"
    )


# DuckDB-side equivalents for oracle SQL construction (RE2 syntax is
# identical for these patterns; \b and (?:...) are supported by RE2)
def duckdb_count_sql(col: str, pattern: str) -> str:
    escaped = pattern.replace("'", "''")
    return f"CAST(len(regexp_extract_all({col}, '{escaped}')) AS INT)"


def duckdb_redact_sql(col: str) -> str:
    out = col
    for pat, repl in _REDACTIONS:
        escaped = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{escaped}', '{repl}', 'g')"
    return out


# Credit-card-shaped numbers: 4x4 digit groups, separator CONSISTENT
# across the whole number (all-dash, all-space, or none) — an alternation,
# not a per-gap [- ]? class, because backreferences are unavailable in RE2
# and per-gap optionals accept mixed forms like '4111-1111 1111 1111'.
# Known residual over-match (RE2 has no lookahead to exclude it): a LONGER
# consistently-grouped run such as '1234-5678-9012-3456-7890' matches on
# its first 16 digits, since the trailing separator satisfies \b. Bare
# digit runs longer than 16 are excluded by the \b anchors (no interior
# start position has a word boundary). Both engines share this pattern,
# so the Spark/DuckDB parity contract is unaffected by the tradeoff.
CC_RE = (
    r"\b(?:[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}"
    r"|[0-9]{4} [0-9]{4} [0-9]{4} [0-9]{4}"
    r"|[0-9]{16})\b"
)


def cc_count(text: Column) -> Column:
    """Credit-card-SHAPED matches (pattern only — see cc_valid_count for
    the checksum-verified tier)."""
    return F.regexp_count(text, F.lit(CC_RE))


def luhn_valid(digits: Column) -> Column:
    """True when a digits-only string passes the Luhn mod-10 checksum —
    the verification tier that separates a real card number from an order
    id that merely LOOKS like one (pattern scanners alone over-redact;
    ~10% of random 16-digit runs pass Luhn). Pure integer array
    expression: doubling walks from the rightmost digit, folds >9 to
    digit-sum (2d-9), sums mod 10. Zero shuffle, zero Python."""
    n = F.length(digits)
    terms = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda j: F.when(
            j % 2 == 1,
            F.when(
                (F.ascii(F.substr(digits, n - j, F.lit(1))) - 48) * 2 > 9,
                (F.ascii(F.substr(digits, n - j, F.lit(1))) - 48) * 2 - 9,
            ).otherwise((F.ascii(F.substr(digits, n - j, F.lit(1))) - 48) * 2),
        ).otherwise(F.ascii(F.substr(digits, n - j, F.lit(1))) - 48),
    )
    return F.aggregate(terms, F.lit(0), lambda acc, x: acc + x) % 10 == 0


def cc_valid_count(text: Column) -> Column:
    """Luhn-verified credit-card hits: extract the CC-shaped candidates,
    strip separators, keep only checksum-valid numbers. The scrub-policy
    split this enables: redact verified numbers, leave lookalikes
    (timestamps, order ids) intact."""
    cands = F.regexp_extract_all(text, F.lit(CC_RE), 0)
    digits = F.transform(cands, lambda s: F.regexp_replace(s, "[- ]", ""))
    return F.size(F.filter(digits, luhn_valid))


def duckdb_luhn_sql(c: str) -> str:
    """DuckDB mirror of luhn_valid over a digits-only expression."""
    d = f"(ascii(substr({c}, length({c}) - j, 1)) - 48)"
    return (
        f"(list_sum(list_transform(generate_series(0, length({c}) - 1), j -> "
        f"CASE WHEN j % 2 = 1 THEN CASE WHEN 2*{d} > 9 THEN 2*{d} - 9 "
        f"ELSE 2*{d} END ELSE {d} END)) % 10 = 0)"
    )


def duckdb_cc_valid_count_sql(col: str) -> str:
    """DuckDB mirror of cc_valid_count (oracle construction)."""
    pat = CC_RE.replace("'", "''")
    stripped = "regexp_replace(x, '[- ]', '', 'g')"
    luhn = duckdb_luhn_sql("d")
    return (
        f"CAST(len(list_filter(list_transform(regexp_extract_all({col}, '{pat}'), "
        f"x -> {stripped}), d -> {luhn})) AS INT)"
    )
