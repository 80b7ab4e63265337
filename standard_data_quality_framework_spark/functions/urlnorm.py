"""URL canonicalization — pure native column expressions.

The standard web-curation prelude (CCNet / RefinedWeb both dedup by
normalized URL before any content pass): fragments and tracking
parameters never change the fetched document, host case never matters,
and `www.` is an alias — so two URLs differing only in those must
collapse to one key BEFORE content dedup, or the expensive passes pay
for the same page twice.

Everything here is `regexp_replace` / `regexp_extract` / `lower` /
`concat` — JVM-side, codegen-capable, zero Python. The exact rewrite
sequence is mirrored step-for-step by the DuckDB oracle in
`plans/entry_queries.py::url_dedup_q` (Java regex and RE2 agree on
every pattern used here).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scheme://authority prefix (everything before the first /, ? or #
# after the scheme separator) — the only case-insensitive part of a URL
_PREFIX_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"


def normalize_url(url) -> Column:
    """Canonical form of ``url`` for URL-level deduplication.

    Rewrite sequence (order matters, pinned by tests):
      1. trim surrounding whitespace;
      2. drop the fragment (``#...``);
      3. lowercase the ``scheme://host[:port]`` prefix only (paths are
         case-sensitive on most origin servers — left untouched);
      4. drop a ``www.`` host alias;
      5. strip tracking query parameters (``utm_*``, ``fbclid``,
         ``gclid``) and tidy the separators they leave behind;
      6. drop an empty trailing ``?`` and trailing slashes.
    """
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    u = F.regexp_replace(u, "#.*", "")
    pfx = F.regexp_extract(u, _PREFIX_RE, 1)
    u = F.concat(F.lower(pfx), F.substring(u, F.length(pfx) + 1, F.lit(1 << 30)))
    u = F.regexp_replace(u, "://www\\.", "://")
    u = F.regexp_replace(u, "(utm_[a-zA-Z]+|fbclid|gclid)=[^&#]*&?", "")
    u = F.regexp_replace(u, "\\?&", "?")
    u = F.regexp_replace(u, "[?&]+$", "")
    return F.regexp_replace(u, "/+$", "")


def host_of(url) -> Column:
    """Lower-cased host (authority minus port) — the grouping key for
    per-domain quotas and blocklist joins."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    return F.lower(F.regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1))
