"""Winnowing fingerprints vs an independent pure-Python reference
(robust winnowing: window minimum, rightmost on ties), plus the
paper's coverage guarantee on shared substrings."""

import hashlib
import re

from nba_data_pipeline_spark.operators.dedup import (
    winnow_fingerprints,
    winnow_match_pairs,
)


def _norm(text):
    return re.sub(r"[^a-z0-9]+", " ", text.lower()).strip()


def _h(gram):
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)


def _ref_winnow(text, k=5, w=4):
    t = _norm(text)
    hashes = [_h(t[i : i + k]) for i in range(len(t) - k + 1)]
    picks = set()
    for s in range(len(hashes) - w + 1):
        window = hashes[s : s + w]
        m = min(window)
        # rightmost minimal
        pos = s + max(i for i, v in enumerate(window) if v == m)
        picks.add((pos + 1, m))  # 1-based like the Spark op
    return picks


def test_winnow_matches_reference(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs, says the fox"),
        (3, "aaaaaaaaaaaaaaaa"),  # degenerate: all grams equal (tie rule)
        (4, "tiny"),  # shorter than k + w - 1 -> no fingerprints
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for doc_id, text in rows:
        expect = _ref_winnow(text)
        assert got.get(doc_id, set()) == expect, doc_id


def test_winnow_guarantee_shared_substring_detected(spark):
    # docs share a substring of length >= k + w - 1 = 8 -> the paper
    # guarantees at least one common fingerprint
    shared = "identical stretch of text here"
    df = spark.createDataFrame(
        [(1, f"prefix one {shared} suffix alpha"),
         (2, f"completely different opening {shared} and ending")],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(df)
    pairs = winnow_match_pairs(fps, min_shared=1).collect()
    assert len(pairs) == 1 and {pairs[0].id_a, pairs[0].id_b} == {1, 2}
    assert pairs[0].shared_fps >= 1


def test_winnow_match_pairs_threshold(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    pairs = winnow_match_pairs(winnow_fingerprints(df), min_shared=1).collect()
    assert pairs == []  # nothing shared -> postings join emits nothing


def test_winnow_overlap_spans_localize_shared_region(spark):
    from nba_data_pipeline_spark.operators.dedup import winnow_overlap_spans

    shared = "this exact shared passage appears verbatim in both documents"
    df = spark.createDataFrame(
        [(1, f"unique opening words {shared}"),
         (2, f"{shared} trailed by an unrelated ending"),
         (3, "entirely disjoint content with nothing in common at all")],
        "doc_id long, text string",
    )
    spans = winnow_overlap_spans(winnow_fingerprints(df), min_run=2).collect()
    assert spans, "shared region must produce at least one span"
    assert all({s.id_a, s.id_b} == {1, 2} for s in spans)
    s = max(spans, key=lambda r: r.n_matches)
    # doc 1's span sits AFTER its unique prefix; doc 2's at the start
    assert s.a_start > s.b_start
    assert s.a_end > s.a_start and s.b_end > s.b_start


def test_incremental_winnow_pairs_never_forms_old_old(spark):
    from nba_data_pipeline_spark.operators.dedup import (
        incremental_winnow_pairs,
    )

    shared = "a long enough common passage that winnowing fingerprints"
    old = spark.createDataFrame(
        [(1, f"archive copy {shared}"), (2, f"second archive {shared}"),
         (3, "unrelated archived text with completely different words")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(10, f"fresh ingest {shared}"), (11, f"another fresh {shared}"),
         (3, "re-ingested replacement text that no longer matches anything")],
        "doc_id long, text string",
    )
    old_fps = winnow_fingerprints(old)
    new_fps = winnow_fingerprints(new)
    got = incremental_winnow_pairs(new_fps, old_fps, min_shared=2).collect()
    # every pair is batch-driven
    assert all(r.id_new in (10, 11, 3) for r in got)
    # old-vs-old (1,2) never appears
    assert not any({r.id_new, r.id_other} == {1, 2} for r in got)
    # new docs match the archived near-dups and each other
    keys = {(r.id_new, r.id_other, r.other_is_new) for r in got}
    assert (10, 1, False) in keys and (10, 11, True) in keys
    # re-ingested id 3 must not match its own stale fingerprints
    assert not any(r.id_new == 3 and r.id_other == 3 for r in got)


def test_winnow_random_corpus_matches_reference(spark):
    """Table-driven property test: 200 random texts (mixed alphabets,
    heavy repetition, whitespace runs, sub-threshold lengths) must
    produce EXACTLY the reference fingerprint sets in one Spark pass."""
    import random

    rng = random.Random(20260814)
    alphabets = ["ab", "abcde", "abcdefghij klmno", "a b  c", "xyz 0123"]
    rows = []
    for i in range(200):
        alpha = rng.choice(alphabets)
        length = rng.choice([0, 1, 5, 8, 20, 60, 200])
        rows.append((i, "".join(rng.choice(alpha) for _ in range(length))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    mismatches = []
    for doc_id, text in rows:
        expect = _ref_winnow(text)
        if got.get(doc_id, set()) != expect:
            mismatches.append((doc_id, text))
    assert not mismatches, mismatches[:3]


def test_xxhash64_path_same_coverage_guarantee(spark):
    """The production (xxhash64) gram hash must find the same planted
    near-duplicates as the portable md5 path: the winnowing coverage
    guarantee is hash-agnostic, only fingerprint VALUES change."""
    from nba_data_pipeline_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_match_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again in the yard "
    rows = [
        (1, base * 4),
        (2, base * 4 + "tail difference here"),      # near-dup of 1
        (3, "completely different content with nothing shared at all whatsoever"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {(1, 2)}
    for h in ("md5", "xxhash64"):
        fps = winnow_fingerprints(df, hash=h)
        pairs = {(r.id_a, r.id_b) for r in winnow_match_pairs(fps, min_shared=4).collect()}
        assert pairs == want, (h, pairs)
    # values differ between hashes (different spaces), positions overlap
    a = {r.fp for r in winnow_fingerprints(df.limit(1), hash="md5").collect()}
    b = {r.fp for r in winnow_fingerprints(df.limit(1), hash="xxhash64").collect()}
    assert a != b
