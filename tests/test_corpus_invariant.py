"""Guard the whitespace invariant the text oracles depend on.

The DuckDB oracle SQL for the text-analysis queries (token_stats,
quality_scores, lang_id, doc_fingerprint, ngram_jaccard, tfidf,
posexplode_tokens) tokenizes with ``string_split(text, ' ')`` while the
Spark side splits on ``\\s+`` and drops empties.  The two agree only
when every document is a single-space-joined token sequence with no
leading/trailing/doubled whitespace and no tabs/newlines.  This test
makes that corpus invariant explicit: if future testdata violates it,
this fails loudly instead of the oracle hash gate failing silently.
"""

import os

import duckdb
import pytest

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.exists(os.path.join(d, "documents.parquet"))
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_documents_text_is_single_space_tokenized(sf_dir):
    con = duckdb.connect()
    bad = con.execute(
        f"""
        SELECT COUNT(*) FROM read_parquet('{sf_dir}/documents.parquet')
        WHERE text IS NULL
           OR text = ''
           OR regexp_matches(text, '\\s\\s')
           OR regexp_matches(text, '^\\s')
           OR regexp_matches(text, '\\s$')
           OR regexp_matches(text, '[\\t\\n\\r]')
        """
    ).fetchone()[0]
    assert bad == 0, (
        f"{bad} documents in {sf_dir} violate the single-space-joined "
        "invariant that the text-oracle SQL (string_split(text, ' ')) "
        "relies on; update the oracle SQL to regexp-based splitting "
        "before trusting the hash gate"
    )
