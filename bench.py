"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Runs a representative slice of the registry (TPC-H classics, window/
session analytics, rollup, as-of, dedup, similarity, text analysis,
lineup tracking) on local[$SPARK_GRAFT_CPUS] and prints ONE compact
(<2 KB) JSON line as the LAST stdout line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
where "queries" carries the per-query isolated floors (fresh-session
min-of-3; falls back to in-session timing if a floor didn't run). The
full payload (in-session timings, errors, floors, run counts) is
written to BENCH_full.json next to this file.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "tpch_q1",
    "tpch_q2",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q9",
    "tpch_q11",
    "tpch_q16",
    "tpch_q20",
    "left_anti_delta",
    "merge_upsert",
    "incremental_agg_state",
    "cdc_apply",
    # manifest-committed snapshot table: create + fenced COW merges +
    # keyed takedown (the lakehouse-format counterpart of merge_upsert),
    # with its cdf=False twin so the write-time change-file tax is a
    # first-class floor, and the reference-pipeline-through-snapshot
    # composition (the CLI's default sink path)
    "snapshot_merge_gate",
    "snapshot_merge_nocdf_gate",
    "snapshot_pipeline_gate",
    "broadcast_dim_join",
    "collect_roundtrip",
    "first_event_per_user",
    "sessionize",
    "running_distinct",
    "asof_join",
    "range_join_buckets",
    "tumbling_window",
    "funnel_counts",
    "rolling_window_agg",
    "table_diff",
    "json_extract",
    "token_stats",
    "quality_scores",
    "lang_id",
    "doc_fingerprint",
    "ngram_jaccard",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "cosine_topk",
    "lsh_ann_topk",
    "cosine_neardup",
    "decontaminate",
    "bm25_search",
    "gopher_gate",
    "pack_sequences",
    "lm_perplexity",
    "dsir_select",
    "winnow_pairs",
    "winnow_pairs_fast",
    # portable-hash (md5) near-dup paths next to their xxhash64
    # production twins: the portability tax is a first-class datum
    "minhash_pairs_portable",
    "simhash_pairs_portable",
    "resample_ffill",
    "resample_interpolate",
    "activity_bursts",
    "touch_attribution",
    "oov_rate",
    "video_frame_overlap",
    "pii_scrub",
    "domain_block_filter",
    # seen-set family: the Bloom flag pass and the full two-stage
    # (Bloom + exact anti-join) delta vs the same batch grain
    "bloom_seen_filter",
    "seen_content_delta",
    "lineups_declarative_bulk",
    # same 200-game x 300-event grain through the applyInPandas scan,
    # so the Python/Arrow transfer tax vs the declarative range-join
    # is a first-class bench datum (see COVERAGE.md crossover note)
    "lineup_tracking_bulk",
]


def _loadavg() -> list[float] | None:
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:
        return None


def main() -> None:
    from nba_data_pipeline_spark.core.session import get_session
    from nba_data_pipeline_spark import harness

    # sampled before this process does any Spark work: the 1-min value
    # here is other tenants' load, not ours
    load_start = _loadavg()
    load_floors = None

    spark = get_session("bench")
    qs = harness.queries()

    # warm the JVM + parquet footers once so per-query numbers measure
    # the plans, not session startup (fault-isolated like everything
    # else: a broken warmup query must not kill the whole run)
    try:
        qs["tpch_q6"](spark, SF_DIR).collect()
    except Exception as exc:  # noqa: BLE001
        print(f"# warmup failed: {exc}", file=sys.stderr)
    try:
        # materialize the synthetic bulk-lineup fixture before any
        # timer: the lineup rows should time the operator, not the
        # fixture fan-out
        harness._replicated_fixture(spark, 200, events_mult=50)
    except Exception as exc:  # noqa: BLE001
        print(f"# fixture warmup failed: {exc}", file=sys.stderr)

    # Per-query minimum of three back-to-back runs: single-shot numbers
    # on this host swing ~40% with phantom load (same commit measured
    # 28.5s and 36.6s hours apart), and the min is the standard way to
    # measure the plan rather than the scheduler jitter. Two runs
    # proved insufficient: round 5 reported +11%/+12% "regressions" on
    # minhash_lsh_pairs/ngram_jaccard that a min-of-4 re-measure showed
    # were pure jitter (both at or below their round-3 minima).
    # Reported transparently via runs_per_query.
    RUNS = 3
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = qs[name]
        best, n = None, 0
        # per-query fault isolation: one broken query records an error
        # entry and the run keeps timing the rest (round-4 lesson — a
        # single AnalysisException must never zero the whole bench)
        try:
            for _ in range(RUNS):
                t0 = time.time()
                df = fn(spark, SF_DIR)
                n = df.count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(best, 3)
        print(f"# {name}: {n} rows in {timings[name]}s (min of {RUNS})", file=sys.stderr)

    # a partial run must not report a smaller total that reads as a
    # speedup: any error voids the headline number (per-query timings
    # stay available for the queries that did run)
    total = round(sum(timings.values()), 3) if not errors else None
    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None

    # Isolated per-query FLOORS (the round-over-round regression gate).
    # The in-session numbers above float ±15% with shared-JVM state:
    # round 8 measured the identical code 15% faster than round 7, and
    # round 7 flagged eight phantom "+25-49% regressions" that round 8
    # un-flagged with zero code change. Floors remove the cross-query
    # contamination: each query gets a FRESH SparkSession (new
    # SparkContext, empty block manager, cold codegen cache), one
    # untimed warm run (parquet footers, codegen compile, fixture
    # materialization), then min-of-3 timed runs. Compare floor-vs-floor
    # across rounds; treat in-session numbers as contention telemetry.
    floors: dict[str, float] = {}
    floor_errors: dict[str, str] = {}
    floor_runs = 0
    canary_series: list[dict] = []
    if os.environ.get("SPARK_GRAFT_FLOORS", "1") != "0":
        from nba_data_pipeline_spark.core.session import get_session

        FLOOR_RUNS = 3
        floor_runs = FLOOR_RUNS
        budget = float(os.environ.get("SPARK_GRAFT_FLOOR_BUDGET", "1500"))
        t_floor0 = time.time()
        spark.stop()
        time.sleep(2)  # let our own in-session load drain from the 1-min avg
        load_floors = _loadavg()

        # Canary protocol (r17, VERDICT r16 #10): this host has
        # minute-scale phantom-load bursts that poison CONTIGUOUS blocks
        # of the sequential floor phase (r16 committed two such blocks).
        # Re-measure ONE fixed untouched query (the first headline,
        # tpch_q1) between every CANARY_EVERY floors, with the exact
        # floor methodology, and stamp the series into BENCH_full.json —
        # a judge can then divide any floor by its neighboring canary to
        # separate host drift from code deltas. Telemetry only: the
        # driver-parsed stdout line and the per-query floor numbers are
        # computed exactly as before.
        CANARY = HEADLINE[0]
        CANARY_EVERY = int(os.environ.get("SPARK_GRAFT_CANARY_EVERY", "10"))

        def _canary_floor(after_n: int) -> None:
            cspark = get_session("bench-canary")
            try:
                cfn = qs[CANARY]
                cfn(cspark, SF_DIR).count()  # warm (untimed)
                cbest = None
                for _ in range(2):
                    c0 = time.time()
                    cfn(cspark, SF_DIR).count()
                    cdt = time.time() - c0
                    cbest = cdt if cbest is None else min(cbest, cdt)
                la = _loadavg()
                canary_series.append(
                    {
                        "after_n": after_n,
                        "sec": round(cbest, 3),
                        "load1": la[0] if la else None,
                    }
                )
                print(
                    f"# canary[{after_n}] {CANARY}: {canary_series[-1]['sec']}s",
                    file=sys.stderr,
                )
            except Exception as exc:  # noqa: BLE001
                print(f"# canary[{after_n}]: ERROR {exc}", file=sys.stderr)
            finally:
                cspark.stop()

        for idx, name in enumerate(HEADLINE):
            if idx and idx % CANARY_EVERY == 0:
                _canary_floor(idx)
            if time.time() - t_floor0 > budget:
                floor_errors["__budget__"] = (
                    f"floor budget {budget}s exhausted after "
                    f"{len(floors)}/{len(HEADLINE)} queries"
                )
                print(f"# floors: {floor_errors['__budget__']}", file=sys.stderr)
                break
            fspark = get_session("bench-floor")
            try:
                fn = qs[name]
                fn(fspark, SF_DIR).count()  # warm (untimed)
                best = None
                for _ in range(FLOOR_RUNS):
                    t0 = time.time()
                    fn(fspark, SF_DIR).count()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                floors[name] = round(best, 3)
                print(f"# floor {name}: {floors[name]}s", file=sys.stderr)
            except Exception as exc:  # noqa: BLE001
                floor_errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                print(f"# floor {name}: ERROR {floor_errors[name]}", file=sys.stderr)
            finally:
                fspark.stop()
        if floors:
            _canary_floor(len(HEADLINE))

    # Full payload goes to a FILE; stdout gets one compact (<2 KB)
    # line. Round-11 lesson (VERDICT r11 "What's wrong" #2): the
    # driver's tail capture truncated the old single giant JSON line
    # mid-string, so BENCH_r10/r11 recorded `"parsed": null` — the
    # official bench history was a string fragment. The driver parses
    # the LAST stdout line; keep it small and self-contained.
    # Measurement basis (VERDICT r14 "What's wrong" #2): the driver's
    # per-round run overwrites BENCH_full.json, and its numbers ran
    # under host contention — a uniform ~1.24x above idle floors in
    # r14 — so an artifact must SAY what it holds. The closing gate
    # sets SPARK_GRAFT_BENCH_BASIS=idle-floors-min-of-3 when it runs
    # on a quiet host; anything else self-describes from what actually
    # ran. tools/bench_diff.py refuses to compare mismatched bases
    # without --force.
    # Idle evidence (VERDICT r15 "Next round" #1): the committed floors
    # must carry the host-load context they were taken under, so a
    # round-over-round diff can tell "code regressed" from "host was
    # busy". loadavg_start is sampled before this process did any work;
    # loadavg_floors at the floor-phase start (our own in-session runs
    # are finished and the session stopped by then). If BOTH 1-min
    # samples are below IDLE_LOAD1 the run self-describes as idle
    # floors; SPARK_GRAFT_BENCH_BASIS still overrides for attended runs.
    IDLE_LOAD1 = float(os.environ.get("SPARK_GRAFT_IDLE_LOAD1", "3.0"))
    idle = (
        load_start is not None
        and load_floors is not None
        and load_start[0] < IDLE_LOAD1
        and load_floors[0] < IDLE_LOAD1
    )
    basis = os.environ.get("SPARK_GRAFT_BENCH_BASIS")
    if not basis:
        if floors and not floor_errors:
            basis = "idle-floors-min-of-3" if idle else "unattended-floors-min-of-3"
        elif floors:
            basis = "unattended-floors-partial"
        else:
            basis = "in-session-single-run"
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "errors": errors,
        "runs_per_query": RUNS,
        "floors": floors,
        "floor_errors": floor_errors,
        "floor_runs_per_query": floor_runs,
        "basis": basis,
        "loadavg_start": load_start,
        "loadavg_floors": load_floors,
        "idle_load1_threshold": IDLE_LOAD1,
        "canary": {
            "query": HEADLINE[0],
            "every": int(os.environ.get("SPARK_GRAFT_CANARY_EVERY", "10")),
            "series": canary_series if floors else [],
        },
        "sf": sf,
    }
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_full.json"
    )
    try:
        with open(full_path, "w") as fh:
            json.dump(full, fh, indent=1, sort_keys=True)
    except OSError as exc:
        print(f"# could not write {full_path}: {exc}", file=sys.stderr)

    # Compact line: floors are the cross-round signal (fresh-session
    # min-of-3); fall back to the in-session timing for any query whose
    # floor didn't run (budget exhaustion / SPARK_GRAFT_FLOORS=0).
    compact_q = {
        name: floors.get(name, timings.get(name))
        for name in HEADLINE
        if name in floors or name in timings
    }
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": compact_q,
                "n_errors": len(errors) + len(floor_errors),
                "basis": basis,
                "load1": [
                    load_start[0] if load_start else None,
                    load_floors[0] if load_floors else None,
                ],
                "sf": sf,
                "full": "BENCH_full.json",
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # noqa: BLE001
        # catastrophic failure (session bootstrap, registry import):
        # still emit the one parseable JSON line the driver expects
        print(
            json.dumps(
                {
                    "metric": "headline_queries_total",
                    "value": None,
                    "unit": "sec",
                    "queries": {},
                    "errors": {"__fatal__": f"{type(exc).__name__}: {exc}"[:500]},
                    "runs_per_query": 0,
                    "floors": {},
                    "floor_errors": {},
                    "floor_runs_per_query": 0,
                    "sf": None,
                }
            )
        )
        raise SystemExit(1)
