"""Web-corpus acquisition operators: URL normalization + URL-level dedup.

URL dedup is stage one of every web-scale corpus pipeline (CCNet,
RefinedWeb, Dolma all dedup by normalized URL before any content is ever
fetched or scored) — it removes the cheapest duplicates first, at
metadata cost only. The normalizer is a fixed chain of RE2-subset
regexes (the same engine-portable discipline as ``text.pii_redact``'s
chain, replayable verbatim in the DuckDB oracle), applied in one codegen
projection; the dedup itself is one ``min_by`` hash aggregate on the
normalized key — map-side partial combines, so the exchange carries
~1/r rows at dup-ratio r, identical scale posture to ``dedup_exact``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: the normalization chain, in application order: (pattern, replacement).
#: Kept as data so the oracle and any other engine can replay it exactly.
URL_NORMALIZE_CHAIN: list[tuple[str, str]] = [
    (r"#.*$", ""),                                # drop fragment
    (r"^https?://", ""),                          # scheme-insensitive
    (r"^www\.", ""),                              # host alias
    (r"(utm_[a-z]+|gclid|fbclid)=[^&]*&?", ""),   # tracking params
    (r"\?&", "?"),                                # dangling separators…
    (r"[?&]+$", ""),                              # …left by param removal
    (r"/+$", ""),                                 # trailing slash(es) — +
    # quantifiers keep the form a fixed point (normalize∘normalize =
    # normalize, property-tested), which one-char strips are not
]


def url_normalize(url: Column | str) -> Column:
    """Canonical form of a URL for identity comparison: lowercased,
    scheme/www/fragment/tracking-param/trailing-slash insensitive."""
    u = F.lower(F.trim(F.col(url) if isinstance(url, str) else url))
    for pat, repl in URL_NORMALIZE_CHAIN:
        u = F.regexp_replace(u, pat, repl)
    return u


def url_dedup(
    df: DataFrame,
    id_col: str,
    url_col: str,
) -> DataFrame:
    """One survivor per normalized URL — the lowest ``id_col`` (first
    occurrence under a monotonically assigned id, the standard crawl
    policy). Output: the survivor's ``id_col``, ``url_norm``, and
    ``n_dups`` (rows collapsed into this survivor, ≥1).
    """
    normed = df.select(
        F.col(id_col), url_normalize(F.col(url_col)).alias("url_norm")
    )
    return (
        normed.groupBy("url_norm")
        .agg(
            F.min(F.col(id_col)).alias(id_col),
            F.count(F.lit(1)).cast("long").alias("n_dups"),
        )
        .select(id_col, "url_norm", "n_dups")
    )
