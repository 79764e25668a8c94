"""Dump formatted physical plans for flagship queries into PLANS.md.

Human-readable evidence (alongside tools/plan_audit.py's programmatic
assertions) that the plans have the shapes the 100 TB design claims:
PushedFilters / ReadSchema pruning at the parquet scans, broadcasts on dim
sides, WholeStageCodegen spans over the hot expressions, partition filters
where layout allows, and no row-at-a-time Python in any batch plan.

Usage: python tools/plans_snapshot.py   # rewrites PLANS.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataframe_differ_spark.queries import load_all
from dataframe_differ_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
)

# query -> what the plan proves
FLAGSHIPS = {
    "graph_link_prediction_capped": (
        "round-5 scale path: per-vertex top-64 neighbor sample via the "
        "two-phase partitioned_topk (per-(vertex, input-partition) prune "
        "then per-vertex rank) BEFORE the wedge self-join — sum(deg^2) is "
        "bounded at 64^2 per vertex; existing edges drop via left_anti"
    ),
    "dedup_semantic_sqrtn": (
        "SemDeDup with derived K=ceil(sqrt(N)): broadcast argmax cluster "
        "assignment, in-cluster pair join on the uniform cluster_id key — "
        "no all-pairs product; the quantizer chain is checkpointed and "
        "session-cached"
    ),
    "orders_market_basket_lift": (
        "association rules: one basket groupBy + bounded in-basket HOF "
        "pair expansion (C(3,2) per order), item supports broadcast to "
        "the pair counts, top-20 via TakeOrderedAndProject"
    ),
    "sketch_cms_topk": (
        "mergeable sketch: one md5 per record, map-side partial aggregation "
        "collapses the shuffle to <=1024 (r, bucket) cells; probe side joins "
        "the broadcast sketch"
    ),
    "dedup_minhash_exact": (
        "portable MinHash-LSH: signature build is one doc-keyed shuffle, "
        "candidates come from the (band, bkey) equi-join — bucket-bound, "
        "no all-pairs product in the plan"
    ),
    "dedup_pipeline_e2e": (
        "end-to-end dedup: LSH candidate equi-join feeds O(diameter) "
        "min-label join rounds with localCheckpoint lineage cuts"
    ),
    "diff_summary": (
        "the flagship diff: ONE null-safe full-outer SortMergeJoin on the "
        "key, comparison expressions inside WholeStageCodegen, map-side "
        "partial aggregation of the 4 statuses"
    ),
    "agg_pricing_summary": (
        "TPC-H Q1 shape: filter pushed to the parquet scan (PushedFilters), "
        "ReadSchema pruned to the 7 needed columns, partial+final hash "
        "aggregate"
    ),
    "tpch_q5_shape": (
        "star join: every dimension side a BroadcastHashJoin, single "
        "shuffle for the fact-fact join, broadcasts reused across the "
        "join chain"
    ),
    "join_bloom_prune": (
        "runtime pruning: the 1-row digest broadcasts; the fact scan's "
        "survivors flow into the exact BroadcastHashJoin that removes "
        "false positives"
    ),
    "join_range_bucketed": (
        "fact-fact interval join rewritten as an equi-join: the explode "
        "(replication factor 3) feeds a hash-partitioned join on bucket "
        "id — no BroadcastNestedLoopJoin anywhere in the plan"
    ),
    "sim_topk": (
        "vector search: broadcast of the query set, cosine arithmetic as "
        "codegen'd higher-order functions (no Python), two-phase window "
        "top-k (per-partition prune before the per-query exchange)"
    ),
    "dedup_paragraph": (
        "chunk dedup: shuffle carries only (128-bit hash, doc_id) pairs; "
        "distinct-count partials combine map-side"
    ),
    "join_partition_pruned": (
        "partition layout pays off: the scan lists PartitionFilters on "
        "the partition column and never opens pruned directories"
    ),
    "win_topk_group": (
        "top-k per group: a single hash-partitioned sort per group key "
        "feeding rank + filter — no global sort"
    ),
    "merge_upsert": (
        "MERGE-shape plan: one shuffle on the natural key, the changeset "
        "union folded into the same exchange"
    ),
    "dedup_fuzzy_names": (
        "FastSS edit-distance blocking (round 2): deletion-variant "
        "signatures built by HOFs inside codegen, ONE shuffle on "
        "(nation, signature hash), in-bucket pair generation — no "
        "all-pairs join node anywhere"
    ),
    "sim_join_lsh": (
        "LSH similarity join (round 2): the only cross product is the "
        "DELIBERATE broadcast of the 50-row hyperplane table onto the "
        "pool (constant-width, scan-shaped); candidate pairs come from "
        "hash-partitioned (band, sig) buckets, exact cosine verify after "
        "— no data-sized cartesian anywhere"
    ),
    "agg_histogram_equidepth_sketch": (
        "two-phase distributed rank (round 4): the boundary sketch is a "
        "1-row aggregate broadcast back map-side, the ONLY Window is "
        "partitioned by the bucket id (no 'Exchange SinglePartition' under "
        "any Window node), and bucket offsets come from a broadcast "
        "triangle join over <=32 stats rows"
    ),
    "vec_pq_codes": (
        "PQ encode (round-4 seed fix): codebook seeds selected by "
        "TakeOrderedAndProject (per-partition top-16 + driver merge), "
        "never a full-table single-partition row_number; the 128-row "
        "codebook broadcasts onto the subvector stream"
    ),
    "tpch_q9_shape": (
        "completed TPC-H suite (round 4): five-way star join with every "
        "dimension a BroadcastHashJoin, the lineitem-orders fact join the "
        "single shuffle, exact-decimal profit arithmetic inside "
        "WholeStageCodegen"
    ),
    "text_winnowing": (
        "winnowing fingerprints (round 4): doc-partitioned sliding-window "
        "MIN (no global window), rightmost-min selection as a "
        "hash-partitioned self-join on (doc, pos), one final "
        "groupBy(fingerprint) shuffle over the SAMPLED hash set"
    ),
    "dedup_semantic": (
        "SemDeDup (round 4 cont.): broadcast-centroid assignment (no "
        "shuffle to cluster), then in-cluster pair join on the uniform "
        "cluster_id key — the quadratic all-pairs never appears; the IVF "
        "quantizer blocks come from the shared localCheckpoint cache"
    ),
    "text_tokenize_greedy": (
        "dictionary-encoded tokenizer apply (round 4 cont.): the per-char "
        "segmentation fold runs over DISTINCT words only, then a "
        "BroadcastHashJoin maps segmentations back to token positions — "
        "fold cost is bounded by vocabulary, not corpus"
    ),
    "graph_triangle_count": (
        "compact-forward triangles (round 4 cont.): one hash aggregation "
        "picks the per-basket sample AND emits pairs via a capped HOF "
        "expansion; degree joins broadcast; the wedge join is an "
        "equi-join on oriented vertex keys"
    ),
    "vec_matryoshka_prefix": (
        "Matryoshka funnel (round 4 cont.): stage-1 scan scores the "
        "16-dim prefix against a broadcast query set with per-partition "
        "top-k pruning before the per-query exchange; only 20 candidates "
        "reach the full 64-dim re-rank"
    ),
}


def main() -> None:
    spark = get_spark("plans")
    registry = load_all()
    parts = [
        "# PLANS — formatted physical plans for flagship queries\n",
        "Generated by `python tools/plans_snapshot.py` at sf0.01.",
        "Programmatic assertions over these same plans run in",
        "`tools/plan_audit.py`; this file is the human-readable evidence.\n",
    ]
    for name, why in FLAGSHIPS.items():
        df = registry[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        parts.append(f"\n## {name}\n\n*What to look for: {why}.*\n")
        parts.append("```\n" + plan.strip() + "\n```\n")
    with open(OUT, "w") as f:
        f.write("\n".join(parts))
    print(f"wrote {OUT} ({len(FLAGSHIPS)} plans)")


if __name__ == "__main__":
    main()
