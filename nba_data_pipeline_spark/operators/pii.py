"""PII detection and redaction — the scrubbing stage every public-web
training corpus runs before release (emails, phone numbers, IP
addresses, and card-shaped digit runs, per the common practice of the
public corpus pipelines: Dolma, RedPajama, FineWeb all ship regex
PII scrubbers of exactly this shape).

Everything here is pure Column expressions (``regexp_count`` /
``regexp_replace`` inside codegen): one scan pass, no shuffle, no UDF,
composes with predicate pushdown at any corpus size. Patterns are
deliberately RE2-compatible (no backreferences or lookaround) so the
same pattern strings run on Spark (java.util.regex), DuckDB, and RE2
engines — which also keeps the ops oracle-checkable.

No reference counterpart (extension op for the training-data
surface); the reference pipeline at /root/reference has no text
scrubbing stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: redaction applies in this order, and detection reports one
# count column per type. Patterns are intentionally conservative
# (precision over recall) — the standard trade for corpus scrubbing,
# where a false positive destroys real text.
PII_PATTERNS: dict[str, str] = {
    # local-part @ domain.tld
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # 16-digit card shapes first so phone patterns can't eat a prefix:
    # 4x4 groups separated by space/dash, or a bare 16-digit run
    "card": r"[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}|[0-9]{16}",
    # NANP-ish phone: optional +1 / 1 prefix, 3-3-4 with ()/-/./space
    "phone": r"(\+?1[ .-])?(\([0-9]{3}\)[ .-]?|[0-9]{3}[ .-])[0-9]{3}[ .-][0-9]{4}",
    # dotted-quad IPv4 (word-bounded via explicit non-digit guards is
    # not RE2-portable; conservative bare form documented)
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    # SSN shape: 3-2-4 dashed only (bare 9-digit runs are too noisy)
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def detect_pii(
    df: DataFrame,
    text_col: str = "text",
    types: list[str] | None = None,
) -> DataFrame:
    """Per-document PII counts: one ``pii_<type>`` long column per
    requested type plus ``pii_total``. One codegen pass; counts are
    non-overlapping matches per Java/RE2 semantics."""
    names = list(types or PII_PATTERNS)
    unknown = [t for t in names if t not in PII_PATTERNS]
    if unknown:
        raise ValueError(f"unknown PII types: {unknown}; known: {list(PII_PATTERNS)}")
    t = _col(text_col)
    counts = {
        f"pii_{name}": F.coalesce(
            F.regexp_count(t, F.lit(PII_PATTERNS[name])), F.lit(0)
        ).cast("long")
        for name in names
    }
    out = df.withColumns(counts)
    total = None
    for name in names:
        c = F.col(f"pii_{name}")
        total = c if total is None else total + c
    return out.withColumn("pii_total", total.cast("long"))


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    types: list[str] | None = None,
    out_col: str | None = None,
    token_format: str = "[{T}]",
) -> DataFrame:
    """Replace each PII match with a typed placeholder (``[EMAIL]``,
    ``[PHONE]``, ...). Replacement applies in ``PII_PATTERNS`` order —
    card shapes before phone shapes so a 16-digit run is not partially
    eaten as a phone number. Chained ``regexp_replace`` stays a single
    projection (one pass over the scan output)."""
    names = list(types or PII_PATTERNS)
    unknown = [t for t in names if t not in PII_PATTERNS]
    if unknown:
        raise ValueError(f"unknown PII types: {unknown}; known: {list(PII_PATTERNS)}")
    # apply in canonical dict order regardless of caller order: the
    # order is part of the semantics (card before phone)
    expr = _col(text_col)
    for name in PII_PATTERNS:
        if name in names:
            expr = F.regexp_replace(
                expr, PII_PATTERNS[name], token_format.format(T=name.upper())
            )
    return df.withColumn(out_col or text_col, expr)


def pii_summary(
    df: DataFrame,
    text_col: str = "text",
    types: list[str] | None = None,
) -> DataFrame:
    """Corpus-level audit: (pii_type, n_docs, n_matches) — the release
    gate number ("0 emails survive in the published corpus"). One
    aggregate over the detect pass; the per-type rows come from ONE
    scan via an exploded struct array (never a union of per-column
    selects, which would rescan the table per type)."""
    names = list(types or PII_PATTERNS)
    detected = detect_pii(df, text_col, names)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("pii_type"),
                F.col(f"pii_{name}").alias("n"),
            )
            for name in names
        ]
    )
    return (
        detected.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.pii_type").alias("pii_type"))
        .agg(
            F.sum(F.when(F.col("p.n") > 0, 1).otherwise(0)).cast("long").alias("n_docs"),
            F.sum("p.n").cast("long").alias("n_matches"),
        )
    )
