"""PII detection/redaction (operators/pii.py): typed counts, ordered
redaction (card before phone), precision-biased patterns."""

import pytest
from pyspark.sql import functions as F

from nba_data_pipeline_spark.operators.pii import (
    PII_PATTERNS,
    detect_pii,
    pii_summary,
    redact_pii,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@example.co.uk today"),
            (2, "call 555-123-4567 or (555) 987-6543"),
            (3, "server at 192.168.001.1 port 80"),
            (4, "card 4111 1111 1111 1111 on file"),
            (5, "ssn 123-45-6789 leaked"),
            (6, "clean text with no identifiers at all"),
            (7, None),
        ],
        "doc_id long, text string",
    )


def test_detect_counts_per_type(spark):
    out = {r.doc_id: r for r in detect_pii(_docs(spark).filter("text is not null")).collect()}
    assert out[1].pii_email == 1 and out[1].pii_total == 1
    assert out[2].pii_phone == 2
    assert out[3].pii_ipv4 == 1
    assert out[4].pii_card == 1
    assert out[5].pii_ssn == 1
    assert out[6].pii_total == 0


def test_redact_replaces_with_typed_tokens(spark):
    out = {r.doc_id: r.text for r in redact_pii(_docs(spark).filter("doc_id <= 2")).collect()}
    assert out[1] == "mail me at [EMAIL] today"
    assert out[2] == "call [PHONE] or [PHONE]"


def test_card_redacts_before_phone(spark):
    # a 16-digit card must become ONE [CARD], not a partial [PHONE]
    df = spark.createDataFrame([(1, "pay 4111-1111-1111-1111 now")], "doc_id long, text string")
    out = redact_pii(df, types=["phone", "card"]).collect()[0]
    assert out.text == "pay [CARD] now"


def test_ssn_not_double_counted_as_phone(spark):
    # 123-45-6789 is 3-2-4: the 3-3-4 phone pattern must NOT match it
    df = spark.createDataFrame([(1, "ssn 123-45-6789")], "doc_id long, text string")
    r = detect_pii(df).collect()[0]
    assert r.pii_ssn == 1 and r.pii_phone == 0


def test_summary_one_row_per_type(spark):
    out = {r.pii_type: (r.n_docs, r.n_matches) for r in pii_summary(
        _docs(spark).filter("text is not null")).collect()}
    assert set(out) == set(PII_PATTERNS)
    assert out["email"] == (1, 1)
    assert out["phone"] == (1, 2)
    assert out["ssn"] == (1, 1)


def test_unknown_type_raises(spark):
    with pytest.raises(ValueError, match="unknown PII types"):
        detect_pii(_docs(spark), types=["email", "passport"])
    with pytest.raises(ValueError, match="unknown PII types"):
        redact_pii(_docs(spark), types=["bogus"])


def test_null_text_passthrough(spark):
    # redaction keeps NULL NULL; detect yields 0 counts (coalesced)
    det = detect_pii(_docs(spark)).filter("doc_id = 7").collect()[0]
    assert det.pii_total == 0
    red = redact_pii(_docs(spark)).filter("doc_id = 7").collect()[0]
    assert red.text is None
