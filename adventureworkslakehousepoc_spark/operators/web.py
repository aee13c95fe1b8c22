"""Web-corpus provenance operators: URL canonicalization and URL/domain-level
dedup.

Common Crawl-scale pipelines dedup by URL BEFORE any content pass — the
same page is fetched under scheme/case/port/trailing-slash/tracking-param
variants across snapshots, and collapsing those variants is orders of
magnitude cheaper than content dedup (one string expression + one keyed
aggregate vs a token-scale shuffle). The canonicalizer applies the
standard RFC 3986 syntax-based normalizations (lowercase scheme+host,
drop default port, drop fragment) plus the conventional crawl-pipeline
extensions (strip ``www.``, drop trailing path slash, strip tracking
parameters, sort surviving query parameters): pure relational
expressions, no UDF, so the whole pass stays inside whole-stage codegen
and pushes through any scan.

The canonical-URL clusters feed the existing connected-components
machinery (``operators/graph.py``) the same way MinHash/SimHash candidate
pairs do — URL identity is just the cheapest edge source.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["canonicalize_url", "url_domain", "url_dedup_clusters"]

# tracking parameters conventionally stripped by crawl canonicalizers:
# the utm_* family plus the common click-id / referrer params
_TRACKING_PREFIXES = ("utm_",)
_TRACKING_KEYS = ("ref", "fbclid", "gclid", "mc_eid")


def _tracking_predicate(var: str = "p") -> str:
    """SQL boolean over one ``key=value`` query-param string: true when the
    param survives (is NOT a tracking param). Prefix tests use
    ``startswith`` — NOT SQL ``LIKE`` — because ``_`` is a single-char
    LIKE wildcard, so ``like 'utm_%'`` would also drop non-tracking
    params such as ``utmost=1`` (round-10 advice)."""
    drops = [f"startswith({var}, '{pfx}')" for pfx in _TRACKING_PREFIXES]
    drops += [f"startswith({var}, '{key}=')" for key in _TRACKING_KEYS]
    return f"{var} != '' and not ({' or '.join(drops)})"


def canonicalize_url(col: str) -> Column:
    """Canonical form of a URL column as ONE relational expression:

      1. drop the fragment (``#…``),
      2. lowercase the scheme and the host, keep path/query case,
      3. strip a leading ``www.`` label,
      4. strip the scheme's default port (``:443`` for https, ``:80``
         for http),
      5. drop trailing slashes on the path,
      6. drop tracking query params (utm_*, ref, fbclid, gclid, mc_eid),
         sort the survivors byte-lexicographically, rejoin with ``&``.

    http and https stay DISTINCT schemes (folding them equates different
    resources; crawl canonicalizers that want scheme folding do it as a
    separate opt-in). Invalid/scheme-less strings pass through steps
    they can't match — the expression never raises.
    """
    nofrag = f"regexp_replace({col}, '#.*$', '')"
    scheme = f"lower(regexp_extract({nofrag}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    rest = f"regexp_replace({nofrag}, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    hostport = f"lower(regexp_extract({rest}, '^[^/?]+', 0))"
    host = (
        "regexp_replace(regexp_replace("
        f"regexp_replace({hostport}, '^www\\\\.', ''),"
        f" ':443$', if({scheme} = 'https', '', ':443')),"
        f" ':80$', if({scheme} = 'http', '', ':80'))"
    )
    pathq = f"substring({rest}, length({hostport}) + 1)"
    path = f"regexp_replace(regexp_extract({pathq}, '^[^?]*', 0), '/+$', '')"
    rawq = f"regexp_extract({pathq}, '\\\\?(.*)$', 1)"
    kept = (
        f"array_join(array_sort(filter(split({rawq}, '&'),"
        f" p -> {_tracking_predicate('p')})), '&')"
    )
    return F.expr(
        f"concat({scheme}, '://', {host}, {path},"
        f" if({kept} != '', concat('?', {kept}), ''))"
    )


def url_domain(canonical_col: str) -> Column:
    """Registrable-host extraction from an already-canonical URL (the
    grouping key for domain-level dedup quotas and per-site rate stats)."""
    return F.expr(f"regexp_extract({canonical_col}, '^[a-z0-9+.-]+://([^/?]+)', 1)")


def url_dedup_clusters(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level dedup: canonicalize, then one canonical-key aggregate —
    (canonical_url, domain, n_docs, n_raw_variants, representative_id),
    representative = min id (the deterministic keeper), n_raw_variants =
    distinct raw spellings collapsed into the cluster.

    Scale: one projection + one keyed shuffle on the canonical string;
    no text column moves. At 100 TB this is the first dedup pass
    precisely because it is scan-shaped."""
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(url_col).alias("raw_url"),
            canonicalize_url(url_col).alias("canonical_url"),
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_distinct("raw_url").cast("bigint").alias("n_raw_variants"),
            F.min("doc_id").alias("representative_id"),
        )
        .select(
            "canonical_url",
            url_domain("canonical_url").alias("domain"),
            "n_docs",
            "n_raw_variants",
            "representative_id",
        )
    )
