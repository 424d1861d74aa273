"""URL and domain curation — the web-corpus filtering stage (the
FineWeb/C4/RefinedWeb pattern: extract URLs, reduce to domains, apply
a domain blocklist with subdomain suffix semantics, audit per-domain
volume before mixing).

Pure Column expressions for extraction/parsing (regexp inside
codegen, engine-portable RE2-compatible patterns — no ``parse_url``,
whose engine availability varies); the blocklist applies as a
broadcast join against the (tiny) blocklist side, with suffix
semantics expressed by exploding each domain's ancestor suffixes
(``a.b.c.com -> [a.b.c.com, b.c.com, c.com]``) so the match is an
equi-join, never a LIKE scan per pattern — the shape that survives a
100-TB corpus against a 100k-entry blocklist.

No reference counterpart (extension op for the training-data
surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme://host[:port][/path][?query] — conservative, RE2-portable
URL_PATTERN = r"https?://[A-Za-z0-9._~:/?#\[\]@!$&'()*+,;=%-]+"
# host label run: letters/digits/hyphens dotted; used on the
# authority part after scheme strip
_HOST_PATTERN = r"^([A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)*)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def extract_urls(df: DataFrame, text_col: str = "text", out_col: str = "urls") -> DataFrame:
    """All http(s) URLs per document as an array column (may be
    empty; never NULL for non-NULL text)."""
    return df.withColumn(
        out_col,
        F.when(_col(text_col).isNull(), F.array().cast("array<string>")).otherwise(
            F.regexp_extract_all(_col(text_col), F.lit(URL_PATTERN), 0)
        ),
    )


def url_domain(url: Column | str) -> Column:
    """Lower-cased host of a URL: strip scheme, userinfo, then take the
    leading host-label run (drops :port and /path). Pure Column."""
    u = F.lower(_col(url))
    after_scheme = F.regexp_replace(u, r"^https?://", "")
    after_user = F.regexp_replace(after_scheme, r"^[^/@]*@", "")
    return F.regexp_extract(after_user, _HOST_PATTERN, 1)


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-URL audit columns: ``domain``, ``registered_domain`` (last
    two labels — an APPROXIMATION without a public-suffix list; `co.uk`
    style suffixes reduce to the suffix itself, documented), ``path_depth``
    (count of non-empty path segments) and ``has_query``."""
    u = _col(url_col)
    dom = url_domain(u)
    labels = F.split(dom, r"\.")
    n = F.size(labels)
    reg = F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1)),
    ).otherwise(dom)
    # path: after scheme+authority, before ?/#
    rest = F.regexp_replace(F.lower(u), r"^https?://[^/]*", "")
    path = F.regexp_replace(rest, r"[?#].*$", "")
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    return df.withColumns(
        {
            "domain": dom,
            "registered_domain": reg,
            "path_depth": depth.cast("long"),
            "has_query": F.lower(u).rlike(r"\?"),
        }
    )


def _domain_suffixes(dom: Column, max_labels: int = 6) -> Column:
    """[c.com, b.c.com, a.b.c.com] — ancestor suffixes with >= 2 labels
    (single-label TLDs are never blocklist entries), SHORTEST FIRST and
    bounded at ``max_labels`` labels per suffix so adversarial
    100-label hosts can't explode rows. Truncation must drop the
    LONGEST suffixes: blocklist entries are registered domains (short),
    so an 8-label host must still emit its 2-label suffix or nesting
    6+ subdomains would bypass the blocklist entirely. Hosts with < 2
    labels (localhost, empty parse) yield an empty array — they can
    never match a blocklist entry, and the sequence() guard keeps the
    expression from building a descending range (a runtime error).
    Blocklist entries deeper than ``max_labels`` labels are outside the
    bound (document per deployment)."""
    labels = F.split(dom, r"\.")
    n = F.size(labels)
    return F.when(
        n >= 2,
        F.transform(
            # k = label count of the suffix, ascending 2..min(n, max)
            F.sequence(F.lit(2), F.least(n, F.lit(max_labels))),
            lambda k: F.concat_ws(
                ".", F.slice(labels, (n - k + 1).cast("int"), k.cast("int"))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def filter_blocked_domains(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    keep: bool = True,
    block_col: str = "domain",
) -> DataFrame:
    """Drop (or keep only, ``keep=False``) rows whose URL's domain — or
    ANY parent domain — appears in the blocklist (standard subdomain
    semantics: blocking ``bad.org`` blocks ``x.bad.org``).

    Shape: explode the bounded suffix array, broadcast the blocklist,
    left-anti (or left-semi) join, dedup back to input rows by the
    original row — one shuffle of the corpus keyed on suffix, blocklist
    never leaves memory. The corpus side never string-scans the
    blocklist (no LIKE-per-pattern)."""
    b = F.broadcast(
        blocklist.select(F.lower(F.col(block_col)).alias("_blocked")).distinct()
    )
    exploded = df.select(_col(url_col).alias("_u__")).withColumn(
        "_sfx__", F.explode(_domain_suffixes(url_domain(F.col("_u__"))))
    )
    hit_urls = (
        exploded.join(b, exploded["_sfx__"] == b["_blocked"], "left_semi")
        .select(F.col("_u__").alias(url_col))
        .distinct()
    )
    return df.join(hit_urls, url_col, "left_anti" if keep else "left_semi")


def domain_stats(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """Per-registered-domain volume audit: (registered_domain, n_urls,
    n_docs) — the pre-mixing concentration check (one domain
    dominating a source is the classic web-corpus failure)."""
    feats = url_features(df.select(id_col, url_col), url_col)
    return feats.groupBy("registered_domain").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.countDistinct(id_col).cast("long").alias("n_docs"),
    )
