"""Driver bench contract: run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is collected (or counted) so the full plan executes.  A
first warm-up action absorbs JVM/codegen startup so the numbers
measure the plans, not the JIT.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "validate_documents",
    "violations_events_props",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "join_customer_orders",
    "dedup_exact_documents",
    "paragraph_dedup_docs",
    "dedup_key_count",
    "dup_key_exemplars",
    "stats_profile",
    "profile_exact_orders",
    "lang_histogram",
    "topk_events_per_user",
    "events_json_props",
    "minhash_lsh_docs",
    "text_profile_docs",
    "dup_span_docs",
    "winnow_docs",
    "repetition_docs",
    "curate_documents",
    "curate_full_docs",
    "token_topk_docs",
    "chunk_docs",
    "tfidf_topterms_docs",
    "pack_docs",
    "mix_quota_docs",
    "mix_interleave_docs",
    "quality_pct_docs",
    "lexdiv_docs",
    "asof_click_purchase",
    "range_view_error",
    "sessionize_events",
    "stream_sessionize_events",
    "funnel_events",
    "retention_events",
    "cube_order_stats",
    "outliers_order_price",
    "embedding_topk",
    "embedding_near_dup_lsh",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "grammar_priority_orders",
    "grammar_number_docs",
    "openapi_requests",
    "openapi_responses",
    "xsd_orders_xml",
    "xsd_violation_paths",
    "validate_dynamic_tree",
    "json_violation_pointers",
    "multimodal_features",
    "multimodal_frames",
    "multimodal_resize",
    "generate_confusion_fixtures",
    "validate_files_200k",
    "files_verdicts_buckets",
    "files_violation_rows",
    "stream_files_verdicts",
    "stream_drift_events",
    "divergence_docs_stats",
    "decontaminate_docs",
    "redact_docs",
    "blocklist_docs",
    "length_band_docs",
    "shuffle_shard_docs",
    "luhn_cards_docs",
    "iban_docs",
    "entropy_secrets_docs",
    "surprisal_docs",
    "json_profile_orders",
    "stream_schema_drift_events",
    "scrub_docs",
    "incremental_dedup_docs",
    "json_values_orders",
]


def main() -> None:
    # optional composite-pipeline mode: `python bench.py --pipeline [ROWS]`
    # runs the end-to-end curation pipeline bench (scripts/bench_pipeline.py)
    # instead of the per-query headline suite.
    if len(sys.argv) > 1 and sys.argv[1] == "--pipeline":
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
        import bench_pipeline

        rows = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000_000
        print(json.dumps(bench_pipeline.run(rows, CPUS, None)))
        return

    from fences_spark.entry_queries import QUERIES
    from fences_spark.session import get_spark

    spark = get_spark(app="fences_spark_bench", cores=CPUS, shuffle_partitions=CPUS)

    # warm-up: trivial job through the whole stack
    spark.range(100000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    total = 0.0
    sf = SF_DIR.rstrip("/").split("sf")[-1]

    # untimed warm-up pass over every headline query: the first
    # execution of each distinct plan pays one-time JVM JIT/codegen
    # compilation and cold OS page-cache reads of the parquet inputs
    # (observed 2x on the whole suite from a cold container).  Those
    # are per-process/per-boot costs, not plan costs — a long-lived
    # cluster pays them once, so the baseline tracks the warm plan.
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is not None:
            fn(spark, SF_DIR).count()

    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        # min over repeats absorbs host scheduling jitter on this
        # shared box; sub-second plans get extra repeats because their
        # wall is jitter-dominated (observed up to 3x run-to-run on
        # unchanged plans at <0.5s), and >1s plans get min-of-3 so a
        # single co-tenant burst can't inflate the driver-visible
        # number (r4's mix_quota_docs/pack_docs outliers were exactly
        # that: byte-identical plans, 3x wall under shared-host load).
        best, n, reps = float("inf"), 0, 3
        for rep in range(5):
            if rep >= reps:
                break
            t0 = time.time()
            df = fn(spark, SF_DIR)
            n = df.count()
            best = min(best, time.time() - t0)
            if best < 0.6:
                reps = 4
        timings[name] = round(best, 3)
        total += best
        print(f"# {name}: {n} rows in {best:.2f}s (min of {reps})", file=sys.stderr)

    # skew-stress block (north rule: explicit skew handling) — the
    # same skew-sensitive jobs on a uniform vs a pathologically skewed
    # input of identical size; criterion wall(skewed) <= 2x
    # wall(uniform) per job, plus plan evidence that AQE's skew-join
    # split actually fired.  Disable with SPARK_GRAFT_SKIP_SKEW=1.
    skew_block = None
    if os.environ.get("SPARK_GRAFT_SKIP_SKEW", "0") != "1":
        from fences_spark.skewbench import run_skew_stress

        skew_rows = int(os.environ.get("SPARK_GRAFT_SKEW_ROWS", "2000000"))
        skew_block = run_skew_stress(spark, n=skew_rows).as_dict()

    out = {
        "metric": "headline_queries_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
    }
    if skew_block is not None:
        out["skew_stress"] = skew_block
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
