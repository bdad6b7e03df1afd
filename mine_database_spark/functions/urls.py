"""URL normalization — pure JVM expression chains (no UDFs), built so a
DuckDB oracle can reproduce every step: the regexes avoid lookaround (RE2
and java.util.regex agree on everything used here) and the query-parameter
work is array ops (split / filter / sort / join), which both engines share.

The canonicalizer implements the C4/CommonCrawl dedup-by-URL contract:
two fetches of the same resource — differing only in host/scheme case, a
fragment, tracking parameters, parameter order, or a trailing slash —
canonicalize to one key. It deliberately does NOT touch the scheme
(http vs https are different fetches), subdomains (www. vs bare can be
different sites), or percent-encoding (decoding can change semantics).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tracking parameters stripped by the canonicalizer: the industry-standard
# analytics/click-id set — shared with the SQL oracle via TRACKING_PARAM_RE.
# Case-folded ((?i): trackers emit UTM_SOURCE too) and optionally valueless
# ((=|$): a bare '?utm_source' must also collapse); `(?i)` and the
# alternation parse identically in java.util.regex and DuckDB's RE2.
TRACKING_PARAM_RE = r"^(?i)(utm_[^=&]*|fbclid|gclid|msclkid|mc_eid|ref)(=|$)"


def canonical_url(url: Column) -> Column:
    """Canonical dedup key for a URL (see module docstring for the contract).

    Steps, each expressible identically in Spark and DuckDB:
      1. drop the fragment (#... never reaches the server)
      2. lowercase the scheme and host (case-insensitive by RFC 3986)
      3. strip trailing slashes from the path ('' and '/' unify)
      4. drop tracking query parameters, sort the survivors (order is
         semantically irrelevant), rejoin
    NULL and scheme-less inputs return NULL (no canonical form).
    """
    u = F.regexp_replace(url, r"#.*", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?]+)", 1))
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]+(.*)", 1)
    path = F.regexp_replace(F.regexp_extract(rest, r"^([^?]*)", 1), r"/+$", "")
    query = F.regexp_extract(rest, r"\?(.*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(params, "&")
    # reference qs ONCE (r15, guide §4.1): the split/filter/sort/join chain
    # is a higher-order function — CodegenFallback, evaluated interpreted
    # with NO subexpression elimination, so every textual copy re-runs the
    # whole chain per row. when(qs != '', concat('?', qs)) carries two
    # copies; nullif(concat('?', qs), '?') carries one and is value-
    # identical (qs='' -> '?' -> NULL -> coalesce ''; qs=NULL propagates
    # NULL through concat exactly as the when-form's otherwise('') only
    # to be swallowed by the outer NULL scheme/host guard).
    query_part = F.coalesce(F.nullif(F.concat(F.lit("?"), qs), F.lit("?")), F.lit(""))
    return F.when(
        (scheme == "") | (host == ""), F.lit(None).cast("string")
    ).otherwise(F.concat(scheme, F.lit("://"), host, path, query_part))
