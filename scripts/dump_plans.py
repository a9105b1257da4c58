"""Dump formatted physical plans for key queries into PLANS_r2.md —
plan-quality evidence (pushdown, broadcast, partial agg, no global
windows) reviewable without running Spark."""

from __future__ import annotations

import contextlib
import io
import sys

sys.path.insert(0, "/root/repo")

QUERIES = {
    # round-3 additions: the lifted-guard gates — check the mode/rank
    # paths have NO unpartitioned window (the r3 distributed-scan rewrite)
    "mode_frame_lineitem": "per-column mode sets: hash agg + broadcast max join + ranged position, no global window",
    "corrwith_spearman_orders": "average-tie ranks via distributed prefix scan; no SinglePartition window",
    "iloc_slice_orders": "position pass + modular filter; no global sort",
    "resample_gapfill_grouped": "per-group spine: post-agg sequence/explode + equi-join",
    "rank_bucket_orders": "Series.rank on distinct-value table via ranged scan (r3 rewrite)",
    "q8_market_share": "all 5 dimension joins broadcast; single fact-fact shuffle",
    "q21_waiting_suppliers": "EXISTS/NOT-EXISTS as one pre-grouped pass (1 scan, 1 shuffle)",
    "filter_project": "PushedFilters + pruned ReadSchema at the parquet scan",
    "period_month_revenue": "period workflow: date_trunc codegen + one hash agg",
    "pack_sequences_documents": "window PARTITIONED by bucket (no SinglePartition)",
    "embedding_near_dup_lsh": "banded LSH: posexplode buckets + equi-join, no CartesianProduct",
    "rolling_minmax_orders": "van Herk blocks: per-block windows + position join",
    "minhash_verified_dups": "banded candidates + exact verify; persisted inverted projections",
    "asof_nearest_events": "both direction windows over ONE by-key exchange",
    "groupby_agg_multi": "partial (map-side) + final hash aggregation, one shuffle",
    # continuation-6 additions
    "doc_line_dedup": "line dedup: posexplode + line-text DF agg + per-doc rebuild — two shuffles, no window",
    "doc_dup_windows": "strided-window dedup: JVM window array + DF agg + join-back — two shuffles",
    "rolling_corr_orders": "pairwise moments: ONE shared prefix scan + ONE position join; no SinglePartition data window",
    "rank_naopt_events": "rank na_option: distinct-value scan + broadcast 1-row stats join",
    # continuation-8 additions
    "url_dedup_docs": "URL dedup: ONE map-side-combining max_by groupBy, no window",
    "cap_per_source_docs": "per-group cap: md5-prefix histogram, broadcast semi join, boundary-bucket-only window",
    "groupby_sample_frac_orders": "hash-draw sample: two-phase cap with frac quota derived on the tiny histogram",
    "sort_limit_customers": "sort+head FUSED (r6): TakeOrderedAndProject over the SORT KEYS on the pre-sort plan — no global Exchange+Sort",
    # continuation-9 additions
    "dsir_select_docs": "DSIR: one-pass hashed-ngram features, broadcast LLR table, TakeOrderedAndProject top-k",
    "rolling_time_daily_events": "time-offset rolling: block-bucketed self-join + per-row hash agg, NO global RANGE window",
    "knn_join_embeddings": "batch kNN: broadcast query table (corpus streams once), per-query top-k window partitioned by query",
    # round-4 additions: converted gates + the loc/reindex rework
    "minhash_near_dup_pairs": "planted-range recall gate: banded equi-join + distinct, no CartesianProduct",
    "multimodal_features": "real PNG header parse: Arrow pandas_udf over synthesized payloads, narrow output",
    "bpe_top_pairs_documents": "BPE pair counts: map-side partial agg on exploded pairs + TopK",
    "reindex_nation_keys": "reindex: broadcast-INNER join + tiny anti-join union — the big side never shuffles",
    # round-5 additions: the exact-mode sketch conversions + the signed-zero gate
    "kll_doclen_quantiles": "KLL quantiles: ONE mergeable sketch agg per lang (KB state), no value shuffle",
    "audience_overlap_events": "theta overlap: one raw scan -> tiny per-type sketches; pairwise work on KB states only",
    "rolling_corr_orders": "pairwise moments + signed-zero-normalized projection; no SinglePartition data window",
    "crosstab_status_priority": "crosstab: groupBy+pivot with PINNED values (no discovery scan), one shuffle",
    # round-5 continuation: the new fuzzy-dedup capability
    "fuzzy_dup_pairs_edit": "edit-distance dedup: banded LSH candidates + length prefilter + levenshtein(threshold) verify — no CartesianProduct, text never in a quadratic stage",
    # round-6 additions: the TopK fusion family (r5 verdict #1/#2) + the
    # two rows-only→exact conversions
    "top_orders": "sort+head FUSED: TakeOrderedAndProject(10, sort keys) directly over the scan — the r5 full-sort prelude is gone",
    "tail_orders": "sort+tail FUSED: REVERSE TopK over flipped sort keys + tiny re-sort of the n survivors — no count action, no global sort",
    "head_sorted_nations": "sort+head fusion through the rowid label anchor (index preserved), TopK over sort keys + rowid tiebreak",
    "sample_fraction_lineitem": "deterministic hash sample: pure JVM md5-bucket filter at the scan, no RNG, no shuffle",
    # round-6 continuation: new capabilities + the stamp-packed melt
    "doc_dedup_pipeline": "end-to-end dedup: banded LSH equi-joins + exact verify feeding CC — no CartesianProduct anywhere in the composition",
    "doc_link_pagerank": "pagerank: per-iteration ranks⋈edges hash join + partial-agg groupBy(dst) sum + 1-row dangling broadcast; checkpointed edges",
    "melt_customer_metrics": "column-major melt with ARITHMETIC stamp ((var<<44)|dense rowid): Scan → Project → Expand, no Sort, no range exchange",
    # round-7 additions: the in-scan positional-label machinery
    "filter_label_parity": "bare filter returning pandas labels: PushedFilters INTACT on the label-carrying scan; label = reader-generated _metadata.row_index (the _tmp_metadata_row_index in ReadSchema is synthesized in-memory, zero disk IO); no shuffle, no checkpoint",
    "dropna_label_parity": "dropna keeping labels: same in-scan label promotion through a derived-null where() — scan+filter plan shape",
    "tail_label_parity": "tail via label reverse-TopK: TakeOrderedAndProject(n, label desc) + tiny re-sort — no count action, no stamp mint",
    "embedding_ann_lsh": "ANN recall gate: bucket-probe filter + TakeOrderedAndProject rerank vs brute-force top-k; join of two TopKs, no CartesianProduct",
    # round-8 additions: the stamp/position machinery + the name-scrub gate
    "stamped_rank_orders": "stamped dedup-survivor frame -> rank + positional reset: ranged position passes over the stamp (mapInPandas arange + tiny offset broadcast), per-column distinct-value rank join — no global window over data rows, no CartesianProduct",
    "unnamed_vc_reset_names": "unnamed value_counts + reset_index: hash agg with map-side-combined count+min(position), output-sized orderBy — the tie key costs one agg cell, no extra shuffle",
    "value_counts_priority": "value_counts first-appearance ties: label-carrying scan (pure rename anchor) -> partial-agg groupBy; PushedFilters/pruned ReadSchema intact",
    "explode_tokens": "explode keeping labels: generator over the label-anchored scan, no shuffle",
    "trained_quality_scorer": "5-iteration batch-GD: per iteration ONE k+1-cell hash agg (map-side combined) over the checkpointed projection; weights enter as literals",
    # round-9 additions: the scan-family summary fold + banded SemDeDup
    "cumsum_running_revenue": "r9 summary fold: carry Window reads the marker rows of the ONE fused pass (no HashAggregate second pass); data branch = pinned RDD + broadcast carry join",
    "ffill_global_events": "r9 summary fold on last_scan: ffilled last row IS the partition summary; one fused pass, carry fold over #partitions rows",
    "semdedup_embeddings": "banded within-cluster pair join (cluster, band) behind the checkpoint pin; canon broadcast join visible",
    "doc_line_dedup": "filtered dup-line frequency table LEFT-joined back (broadcast build); exploded corpus never shuffles for the verdict join",
}


def main() -> None:
    import pandas_expr_spark as pes
    import __spark_entry__ as entry

    spark = pes.get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    sf = "/root/testdata/sf0.001"
    out = ["# Physical plans (round 9) — key queries at sf0.001",
           "",
           "Generated by `scripts/dump_plans.py`.  What to look for is noted",
           "per query; grep for `PushedFilters`, `ReadSchema`, `BroadcastHashJoin`,",
           "`partial_`, and the ABSENCE of `CartesianProduct` / global "
           "windows.  Note: the `SinglePartition` exchanges that DO appear "
           "are all over per-partition SUMMARY tables (one row per "
           "partition — the scan family's documented tiny carry fold), "
           "never over data rows.",
           ""]
    for name, note in QUERIES.items():
        df = qs[name](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out.append(f"## {name}\n\n_{note}_\n\n```\n{buf.getvalue().strip()}\n```\n")
    with open("/root/repo/PLANS_r9.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS_r9.md")


if __name__ == "__main__":
    main()
