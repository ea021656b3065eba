"""Regenerate QUERIES.md from __ray_entry__.queries()/oracle_sql().

Check class comes from oracle_sql membership; the description is the first
sentence(s) of the query callable's docstring (truncated).  Run after adding
or renaming a query:

    python scripts/gen_queries_md.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod

HEADER = """# Query catalog

Every `queries()` entry in `__ray_entry__.py`, its correctness check class, and what it computes.
`SQL oracle` = the driver runs the Ray pipeline and the DuckDB `oracle_sql()` side by side and
compares row count, schema, and a value hash.  `rows-only` = approximate / model-based /
stub-backed by design; accuracy is gated in pytest instead (see each docstring).

| # | query | check | what it computes |
|---|---|---|---|
"""


AUDIT = """
## Driver-window slot audit

The external driver verifies only the FIRST 50 entries of `queries()` (row
count + schema + value hash vs `oracle_sql()` at sf0.01); every entry past
slot 50 relies on the repo's own gates instead.  Those gates are mechanical
and run every time: `tests/test_queries_oracle.py` parametrizes over EVERY
oracle-backed entry on every pytest run, and `scripts/check_oracle.py`
re-verifies all of them hash-exact at sf0.01 (artifact:
`ORACLE_SELFCHECK_r*.json`).

Slot policy, applied by REGRESSION RISK each round: every kernel that is NEW
or was MODIFIED in the round sits INSIDE the window; the entries displaced to
make room are (a) unchanged since their last driver-green round
(function body and oracle string byte-identical at cede time), or (b) trivial
variants whose machinery an in-window sibling drives end-to-end.

Historical cede decisions (why each out-of-window entry is safe):

- **r2 → r3 cedes** (sibling coverage): `lang_stats` (in-window
  `lang_stats_salted` composes the identical aggregate plus the salted
  exchange); `audio_metadata` / `video_metadata` (`media_metadata` drives the
  same actor-pool payload-header round-trip); `token_count` (the shared
  `_text_col` null-fill also runs inside in-window `stopword_stats` /
  `repetition_stats` / `tfidf_top5_per_lang`); `global_length_rank`
  (`ccnet_tercile_buckets` and `stratified_sample` ARE its histogram-rank
  primitive); `jaccard_pairs` (`ngram_jaccard_pairs` / `minhash_lsh_pairs`
  drive the same LSH-prefiltered exact verify); `embedding_dup_pairs`
  (`dup_clusters` / `semantic_dedup_docs` / `fuzzy_dedup_keep` compose the
  same pair kernel in-window); `events_sessionize` / `user_rolling_avg`
  (`events_funnel` / `events_user_interarrival` drive the same groupby-user
  ordered-numpy machinery); `word_cooccurrence_top100` (condensed-triangular
  decode inside in-window `substring_dup_pairs`, `_unique_doc_grams` inside
  in-window `boilerplate_ngram_stats`); `knn_cosine_top10` /
  `knn_label_filtered` (r3 change was an early-return empty-input guard only);
  `lang_percentiles` / `events_asof_purchase` / `customers_per_region` /
  `top_docs_per_lang` / `word_lang_incidence` / `ngram_jaccard_pairs` /
  `revenue_filter` (each unchanged since green with the named in-window
  sibling: histogram-rank, groupby-user, broadcast star, grouped top-k cut,
  distinct-count combiner, LSH verify, pruned lineitem partials).
- **Unchanged-since-green cedes**: `sentence_stats`, `bigram_top50`,
  `events_hourly`, `embedding_quantize`, `source_stats`,
  `train_val_test_split`, `longest_docs_top100`, `exact_dedup`,
  `winnow_fingerprints`, `events_funnel`, `documents_profile`,
  `length_outlier_filter`, `repetition_stats`, `stopword_stats` — each
  verified function-body- and oracle-string-identical against its last green
  commit at cede time, and NULL-hardening-sweep edits (mechanical
  tag/filter/guard only) re-verified hash-exact afterwards.
- **r4 cedes**: `gopher_keep_rates` (r3-green; in-window
  `gopher_quality_flags` IS its flag source) ceded its slot to the new
  `embedding_dup_pairs_ivf` (cluster-first pair source, VERDICT r3 #1);
  `event_type_transitions` (r3-green, unchanged; LAG-pair groupby-user
  machinery driven in-window by `events_user_interarrival` /
  `events_purchases_within_hour`) ceded its slot back to
  `documents_profile`, whose kernel was rewritten in r4 (one fused scan);
  `events_retention_cohorts` and `user_trailing_spend` (both r3-green,
  unchanged; groupby-user ordered / RANGE-window machinery driven
  in-window by `events_user_interarrival` / `events_purchases_within_hour`
  / `user_cumulative_spend`) ceded their slots to the new r4 kernels
  `events_latest_per_user` and `mixture_plan`.
  r4's other modified kernels — `promo_revenue`, `source_length_gini`,
  `stratified_sample` — were already in-window.
- **r4 session-4 cedes** (seven new kernels in, seven unchanged-since-green
  out): `lineitem_pricing_summary` (r2-green; its lineitem cents-partial →
  small-groupby shape is driven in-window by the new
  `top_supplier_revenue`, which adds the argmax scalar broadcast) →
  `top_supplier_revenue`; `large_order_customers` (r3-green; in-window
  `returned_item_revenue` drives the same Q10/Q18 bucket co-partition +
  customer sidecar) → `small_quantity_revenue`; `inactive_customers`
  (r2-green; the new `idle_rich_customers` composes the IDENTICAL
  union-tag anti-join plus the integer-cents global-scalar gate) →
  `idle_rich_customers`; `ccnet_tercile_buckets` (r3-green; in-window
  `stratified_sample` drives the same histogram-rank banding) →
  `normalized_exact_dedup`; `events_hopping_window` (r3-green; in-window
  `events_hourly_distinct_users` drives the same window-key partial
  machinery) → `url_dedup`; `vocab_coverage_90` (r3-green; in-window
  `distinct_words_per_lang` + `tfidf_top5_per_lang` drive the same
  word-freq combiner cascade) → `embedding_covariance`; `source_novelty`
  (r3-green; in-window `boilerplate_ngram_stats` drives the same
  distinct-gram combiner attribution) → `domain_pagerank`;
  `orders_by_mktsegment` (r2-green; in-window `top_revenue_orders` drives
  the same size-gated broadcast/sidecar dual plan) → `bpe_pair_counts`;
  `distinct_words_per_lang` (r2-green; in-window `tfidf_top5_per_lang`
  drives the same distinct-count combiner) → `gram_novelty_by_bucket`;
  `late_shipment_priority` (r3-green; in-window `top_revenue_orders`
  drives the same broadcast-vs-join dual plan) → `blocklist_filter`;
  `value_zscore_outliers` (r3-green; the new `idle_rich_customers` drives
  the same broadcast-global-scalar filter gate in-window) →
  `doc_length_histogram`; `lang_centroids` (r3-green; its union-tag
  bucket-join machinery stays driven in-window by `bitext_mine_pairs`) →
  `customer_order_full_join` (which itself exercises the union-tag groupby
  as a FULL OUTER join in-window); `sequence_pack_offsets` (r3-green; its
  histogram-offset prefix-sum machinery stays driven in-window by
  `stratified_sample`) → `crawl_delta`; `fuzzy_dedup_keep` (r3-green;
  in-window `semantic_dedup_docs` drives the same union-tag anti-join keep
  over the same embedding pair source) → `events_dedup_idempotent`;
  `revenue_by_supplier_nation` (r2-green; the new in-window
  `top_supplier_revenue` drives the same dimension broadcast +
  grouped-cents machinery) → `kmeans_train`; `per_source_cap` (r2-green;
  in-window `top_revenue_orders` drives the same per-batch top-k cut) →
  `knn_self_top1`; `bm25_topk` (r2-green; in-window `tfidf_top5_per_lang`
  drives the same tf/idf scoring cascade) → `nation_trade_volume`.
- **r4 session-6 cedes** (three new kernels in, three r3-driver-green
  unchanged-since-green out): `kmeans_assign` (r3-green; in-window
  `kmeans_train` RUNS the identical assignment step every Lloyd iteration)
  → `sole_late_supplier` (Q21-shaped grouped EXISTS/NOT-EXISTS set logic
  inside the orderkey bucket co-partition); `cross_source_dup_stats`
  (r3-green; in-window `normalized_exact_dedup` + `url_dedup` drive the
  same hash-keyed dedup rollup) → `regional_market_share` (Q8-shaped
  conditional share ratio over the two-sided star);
  `dsir_importance_weights` (r3-green; in-window `source_unigram_kl`
  drives the same unigram log-ratio machinery) → `readability_scores`
  (map-only Flesch reading ease, three RE2 count kernels per batch).
- **r5 cedes** (four new kernels in, four r4-driver-green
  unchanged-since-green out): `events_collapse_consecutive` (r4-green;
  in-window `events_latest_per_user` + `top_user_paths` drive the same
  groupby-user ordered-scan machinery) → `min_cost_suppliers` (Q2-shaped
  correlated-min join, one partkey-keyed exchange over pair-min partials);
  `promo_revenue` (r4-green; in-window `returned_item_revenue` +
  `top_supplier_revenue` drive the same part/supplier-dimension broadcast
  + cents-partial machinery) → `dominant_share_suppliers` (Q20-shaped
  nested-semi-join share gate, cross-multiplied int64, two compressed
  exchanges); `user_metrics_long` (r4-green; the trivial UNPIVOT inverse
  of the in-window `user_event_type_pivot`) →
  `events_hopping_window_watermark` (bounded-out-of-orderness windowing:
  distributed prefix scan, then the shared hop expansion);
  `chars_tokens_corr` (r4-green; in-window `event_volume_trend` drives the
  same grouped sum-of-products machinery) → `quality_rules_audit`
  (hash-exact DuckDB replica of the KeepDropRules cascade — rule order,
  first-failing-rule attribution, threshold boundaries).
  Fifth r5 cede: `score_percent_rank` (r4-green; in-window
  `stratified_sample` drives the same histogram-rank machinery) →
  `weighted_sample_docs` (Efraimidis-Spirtes weighted reservoir, per-batch
  top-k prefilter + one k-bounded sort, deterministic md5 keys).
  Sixth r5 cede: `events_weekday_hour_heatmap` (r4-green; in-window
  `daily_top_spenders` + `monthly_revenue_growth` drive the same
  calendar-key grouped-count machinery) → `nation_year_profit` (Q9-shaped
  five-way star profit rollup: part/supplier/nation broadcast sidecars,
  one orderkey-bucket fact-fact co-partition, nations×years final
  groupby).
  Seventh r5 cede: `lang_stats_incremental` (r-green; in-window
  `lang_stats_salted` drives the same salted lang-stats aggregate the
  incremental variant composes) → `events_sessionize_watermark` (the
  shared watermark prefix-scan composed with gaps-and-islands
  sessionization — late-tolerant session windows, hash-exact oracle).
"""


def describe(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    if not doc:
        return ""
    flat = " ".join(line.strip() for line in doc.splitlines())
    # hard cap ~180 chars, truncating at a word boundary so no dangling
    # mid-word or mid-``code`` fragments land in the table
    if len(flat) > 180:
        flat = flat[:177].rsplit(" ", 1)[0].rstrip("`,;:") + "..."
    return flat.replace("|", "\\|")


def main() -> None:
    qs = entrymod.queries()
    oracles = set(entrymod.oracle_sql())
    rows = []
    for i, name in enumerate(sorted(qs), 1):
        check = "SQL oracle" if name in oracles else "rows-only"
        rows.append(f"| {i} | `{name}` | {check} | {describe(qs[name])} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as f:
        f.write(HEADER + "\n".join(rows) + "\n" + AUDIT)
    print(f"wrote {out}: {len(rows)} queries ({len(oracles & set(qs))} SQL-backed)")


if __name__ == "__main__":
    main()
