"""Physical-plan regression suite for the headline queries.

Pins the scale-critical plan shapes (human-readable dumps: PLANS.md,
regenerate with `python tools/dump_plans.py`):

- small dimensions join via broadcast, never a shuffled cartesian;
- rank Top-N pushes the limit below the shuffle (WindowGroupLimit);
- aggregations are partial (map-side combine before the exchange);
- filters reach the parquet scan (PushedFilters);
- shuffle counts don't regress (each Exchange is a full-data shuffle
  — one extra at 100 TB is the difference between a plan that works
  and one that doesn't).

A plan change that trips these is either a Spark upgrade (re-baseline
deliberately) or a real regression in how an operator is expressed.
"""

from __future__ import annotations

import re

import pytest

from flink_demo_spark.plans.registry import REGISTRY, _load_all

_load_all()


def plan_str(df, mode: str = "formatted") -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        mode
    )
    return df._jdf.queryExecution().explainString(jmode)


def n_exchanges(plan: str) -> int:
    # shuffle exchanges only (BroadcastExchange is cheap by design)
    return len(re.findall(r"\n\(\d+\) Exchange", plan))


def n_hash_aggregates(plan: str) -> int:
    return len(re.findall(r"\n\(\d+\) HashAggregate", plan))


# per-query expectations: substrings that must / must not appear,
# shuffle-count ceilings, and partial-aggregation requirements
EXPECT = {
    "topn_per_group": dict(
        contains=["WindowGroupLimit"], absent=["CartesianProduct"], max_exchanges=2
    ),
    "hotitems_topn": dict(
        contains=["WindowGroupLimit"], partial_agg=True, max_exchanges=2
    ),
    "pv_uv_hourly": dict(partial_agg=True, max_exchanges=2),
    # round-9 additions -------------------------------------------------
    # pure-map quality screens: rules fold inside whole-stage codegen,
    # zero shuffles, zero joins, zero aggregates
    "quality_gopher_rules": dict(
        absent=["HashAggregate", "SortMergeJoin", "CartesianProduct",
                "BroadcastHashJoin"],
        max_exchanges=0,
    ),
    "text_blocklist_filter": dict(
        absent=["HashAggregate", "SortMergeJoin", "CartesianProduct",
                "BroadcastHashJoin"],
        max_exchanges=0,
    ),
    # the top-16 vocabulary must BROADCAST back onto the exploded token
    # stream; the census rank collapses to a TakeOrdered, not a window
    # over the corpus
    "text_oov_rate": dict(
        contains=["BroadcastHashJoin"],
        absent=["SortMergeJoin", "CartesianProduct"],
        partial_agg=True,
        max_exchanges=2,
    ),
    # census-sized graph joins all broadcast off ONE persisted edge set
    # (a single base scan); nothing sort-merges
    "browse_triangle_count": dict(
        contains=["BroadcastHashJoin", "InMemoryRelation"],
        absent=["SortMergeJoin", "CartesianProduct"],
        max_exchanges=6,
    ),
    # global top-20 on the triple census rides TakeOrderedAndProject
    # (limit pushed into the shuffle read), never a full census sort
    "browse_path_topk": dict(
        contains=["TakeOrderedAndProject"],
        absent=["SortMergeJoin", "CartesianProduct"],
        partial_agg=True,
        max_exchanges=2,
    ),
    # both order-statistic medians broadcast as 1-row frames off the
    # persisted hour census (single base scan)
    "events_hourly_mad_outliers": dict(
        contains=["BroadcastNestedLoopJoin", "InMemoryRelation"],
        absent=["SortMergeJoin", "CartesianProduct"],
        max_exchanges=4,
    ),
    # exact per-key quantiles: one census shuffle + census window; the
    # conditional-aggregate cut adds one more exchange, nothing joins
    "events_value_quantiles_by_type": dict(
        absent=["SortMergeJoin", "CartesianProduct", "BroadcastHashJoin"],
        partial_agg=True,
        max_exchanges=2,
    ),
    # Flink CUMULATE TVF as an integer explode: ONE shuffle total
    "window_cumulate": dict(
        absent=["SortMergeJoin", "CartesianProduct", "BroadcastHashJoin",
                "Window"],
        partial_agg=True,
        max_exchanges=1,
    ),
    # pivot with an EXPLICIT value list compiles to one conditional
    # aggregate pass — no distinct-discovery job, no Expand
    "pivot_status_priority": dict(
        absent=["SortMergeJoin", "CartesianProduct", "BroadcastHashJoin",
                "Expand"],
        partial_agg=True,
        max_exchanges=2,
    ),
    # the (day,user) census persists once; trailing windows join back
    # via broadcast off the census
    "events_dau_wau_mau": dict(
        contains=["BroadcastHashJoin", "InMemoryRelation"],
        absent=["SortMergeJoin", "CartesianProduct"],
        partial_agg=True,
        max_exchanges=6,
    ),
    # sessionized behavior: ONE user shuffle feeds both window passes
    # and the per-session fold; nothing joins
    "session_funnel_conversion": dict(
        absent=["SortMergeJoin", "CartesianProduct", "BroadcastHashJoin"],
        partial_agg=True,
        max_exchanges=2,
    ),
    # in-session pair fan-out stays in array lambdas (no event-scale
    # self-join); global top-15 rides TakeOrderedAndProject
    "session_page_pairs_topk": dict(
        contains=["TakeOrderedAndProject"],
        absent=["SortMergeJoin", "CartesianProduct", "BroadcastHashJoin"],
        max_exchanges=2,
    ),
    # one corpus shuffle into the source census; Gini math on census
    "corpus_source_gini": dict(
        absent=["SortMergeJoin", "CartesianProduct", "BroadcastHashJoin"],
        partial_agg=True,
        max_exchanges=2,
    ),
    # label/global centroids from one persisted exploded pass; the
    # 1-row global centroid broadcasts
    "embedding_label_drift": dict(
        contains=["BroadcastHashJoin", "InMemoryRelation"],
        absent=["SortMergeJoin", "CartesianProduct"],
        partial_agg=True,
        max_exchanges=5,
    ),
    # the block-pair kernel must run ONCE (persisted) with the directed
    # top-3 cuts riding WindowGroupLimit
    "knn_graph_mutual": dict(
        contains=["WindowGroupLimit", "InMemoryRelation"],
        absent=["SortMergeJoin", "CartesianProduct"],
        max_exchanges=3,
    ),
    # shingle groupBy + pair groupBy only — registry results carry NO
    # final sort (driver hash and local oracle compare are both
    # order-insensitive; a presentation sort would funnel the
    # table-proportional pair list through one task). The
    # scale-relative posting cap (max_posting_frac) rides a 1-row
    # corpus-count broadcast (BroadcastNestedLoopJoin over one row +
    # one single-partition scalar-agg exchange — the
    # embedding_int8_quant pattern); pair math itself still never
    # sort-merge-joins or cartesians
    "dedup_jaccard_pairs": dict(
        contains=["BroadcastNestedLoopJoin"],  # 1-row n_docs cross join
        absent=["CartesianProduct", "SortMergeJoin"],
        partial_agg=True,
        max_exchanges=4,
    ),
    "dedup_minhash_lsh": dict(
        contains=["BroadcastHashJoin"], absent=["CartesianProduct"], partial_agg=True
    ),
    # pure map: chunking shuffles only for the scan fan-out
    "chunk_documents": dict(
        absent=["SortMergeJoin", "CartesianProduct", "HashAggregate"],
        max_exchanges=1,
    ),
    # the vocabulary (df) side must broadcast — a sort-merge join here
    # would reshuffle the corpus-sized tf table on the token key
    "text_tfidf_topk": dict(
        contains=["BroadcastHashJoin"],
        absent=["SortMergeJoin", "CartesianProduct"],
        partial_agg=True,
    ),
    # one scalar min/max row broadcast back over the scan — no
    # shuffle-side join, no per-vector aggregation shuffle
    "embedding_int8_quant": dict(
        contains=["BroadcastNestedLoopJoin"],  # 1-row cross join
        absent=["SortMergeJoin", "SortAggregate"],
        max_exchanges=1,  # scalar-agg single partition only
    ),
    # synthesize->decode mapInPandas stages must FUSE (no exchange
    # between them): payloads stream through one python worker pass
    "multimodal_ppm_decode": dict(
        contains=["MapInPandas"], absent=["HashAggregate"], max_exchanges=1
    ),
    "multimodal_wav_decode": dict(
        contains=["MapInPandas"], absent=["HashAggregate"], max_exchanges=1
    ),
    "multimodal_y4m_frames": dict(
        contains=["MapInPandas"], absent=["HashAggregate"], max_exchanges=1
    ),
    # brute-force ANN: broadcast the (tiny) query set and stream the
    # corpus — the broadcast nested-loop cross is the intended shape;
    # a shuffled CartesianProduct is not
    "similarity_topk": dict(
        contains=["BroadcastNestedLoopJoin", "WindowGroupLimit"],
        absent=["CartesianProduct"],
        max_exchanges=2,
    ),
    # multi-probe IVF: the exploded query side broadcasts; candidates
    # restricted to probed cells — never a cartesian/shuffled join
    "similarity_ivf_nprobe": dict(
        contains=["BroadcastHashJoin", "WindowGroupLimit"],
        absent=["CartesianProduct", "SortMergeJoin"],
        max_exchanges=2,
    ),
    # NFA operators: one key shuffle into mapInPandas, nothing else.
    # REPARTITION_BY_NUM pins the EXPLICIT partition count — without it
    # AQE's byte-size coalescing collapses the CPU-bound NFA stage to
    # ONE task (measured 8x at sf0.1); no rangepartitioning = no final
    # sort at all (results are compared order-insensitively)
    "cep_iterative_threshold": dict(
        contains=["MapInPandas", "REPARTITION_BY_NUM"],
        absent=["CartesianProduct", "SortMergeJoin", "rangepartitioning"],
        max_exchanges=2,
    ),
    "match_recognize_all_rows": dict(
        contains=["MapInPandas", "REPARTITION_BY_NUM"],
        absent=["CartesianProduct", "SortMergeJoin", "rangepartitioning"],
        max_exchanges=2,
    ),
    # block-pair dgemm kernel: the exchange feeding the CPU-bound
    # applyInPandas kernel must carry OUR explicit partition count
    "dedup_embedding_cosine": dict(
        contains=["FlatMapGroupsInPandas", "REPARTITION_BY_NUM"],
        absent=["CartesianProduct", "SortMergeJoin"],
    ),
    "cep_order_timeout": dict(
        contains=["MapInPandas", "REPARTITION_BY_NUM"],
        absent=["CartesianProduct", "SortMergeJoin", "rangepartitioning"],
        max_exchanges=1,
    ),
    "match_recognize_sum_budget": dict(
        contains=["MapInPandas", "REPARTITION_BY_NUM"],
        absent=["CartesianProduct", "SortMergeJoin", "rangepartitioning"],
        max_exchanges=1,
    ),
    # salting must not introduce a cartesian or a broadcast-defeating
    # plan; the small side replicates via explode, joined hash-to-hash
    "join_salted_skew": dict(
        absent=["CartesianProduct", "BroadcastNestedLoopJoin"],
    ),
    "agg_salted_hot_keys": dict(
        partial_agg=True,
        max_exchanges=3,  # (key,salt) agg + key agg + 5-row output sort
    ),
    "lookup_broadcast_dict": dict(
        contains=["MapInPandas"],
        absent=["SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"],
        max_exchanges=0,  # map-only: broadcast dict, no shuffle at all
    ),
    "geo_grid_cells": dict(
        absent=["MapInPandas", "CartesianProduct"],  # pure column math
        partial_agg=True,
        max_exchanges=1,
    ),
    # pure map: regex detect/redact stays in JVM column expressions —
    # no python stage, no aggregation, no shuffle at all
    "text_pii_redact": dict(
        absent=["MapInPandas", "HashAggregate", "Exchange"],
    ),
    # CMS heavy hitters: 4 width-bounded bucket-agg shuffles broadcast
    # back onto the token stream + ONE candidate-only exact shuffle —
    # never a vocabulary-wide sort-merge join
    "text_cms_heavy_hitters": dict(
        contains=["BroadcastHashJoin"],
        absent=["SortMergeJoin", "CartesianProduct", "MapInPandas"],
        partial_agg=True,
        max_exchanges=5,
    ),
    # one Lloyd iteration happens eagerly at build time (bounded K x dim
    # collects); the RESULT plan must stay a pure centroid-argmax
    # projection over the scan — no shuffle, no python stage
    "embedding_kmeans": dict(
        absent=["Exchange", "MapInPandas", "HashAggregate", "Join"],
    ),
    # keep-first inside a cluster: the anti-join must key on the
    # cluster equality (hash join; shuffled-on-cluster at scale) —
    # never an all-pairs nested loop over the corpus
    "embedding_semantic_dedup": dict(
        absent=["CartesianProduct", "BroadcastNestedLoopJoin", "SortMergeJoin"],
    ),
    # trained-IVF serve stage: same shape contract as
    # similarity_ivf_nprobe — query side broadcasts, corpus streams
    "similarity_ivf_kmeans": dict(
        contains=["BroadcastHashJoin", "WindowGroupLimit"],
        absent=["CartesianProduct", "SortMergeJoin"],
        max_exchanges=2,
    ),
    # the whole curation gate is ONE fingerprint shuffle: keep-first
    # dedup reduces map-side (WindowGroupLimit below the exchange),
    # quality + sampling are fused filters above it
    "pipeline_corpus_curation": dict(
        contains=["WindowGroupLimit"],
        absent=["Join", "MapInPandas", "CartesianProduct"],
        max_exchanges=1,
    ),
    # bloom membership is a pure column expression FUSED INTO THE SCAN
    # FILTER (no join, no shuffle for the prefilter); only the exact
    # verify semi-join remains — never a nested loop
    "dedup_bloom_incremental": dict(
        absent=["CartesianProduct", "BroadcastNestedLoopJoin", "MapInPandas"],
        max_exchanges=2,
    ),
    # the z-order key is pure shift/and column math over the scan —
    # the (deliberate) range-partition shuffle lives in the WRITER
    # (operators/layout.write_zordered), never in the key computation
    "zorder_values": dict(
        absent=["Exchange", "HashAggregate", "MapInPandas", "Join"],
    ),
    # approx quantiles: partial GK sketches merge map-side via
    # ObjectHashAggregate — ONE shuffle of sketch state, never the
    # per-group value sort of the exact twin
    "text_token_quantiles_approx": dict(
        contains=["ObjectHashAggregate"],
        absent=["SortAggregate", "Window", "Join"],
        max_exchanges=1,
    ),
    # temperature mixing: one scalar stats row (partial agg) broadcast
    # back over the scan — the 1-row cross join is the intended shape
    "mix_temperature_langs": dict(
        contains=["BroadcastNestedLoopJoin"],
        absent=["SortMergeJoin", "MapInPandas"],
        partial_agg=True,
        max_exchanges=1,
    ),
    # single-pass profile: 5 exact-distinct aggs via ONE Expand and
    # the two-phase agg exchanges — never one scan per column
    "profile_columns": dict(
        contains=["Expand"],
        absent=["Join", "MapInPandas", "Union"],
        max_exchanges=2,
    ),
    # deterministic importance sampling is a narrow filter: the plan
    # must stay a fused filter+project over the scan, zero shuffles
    "sample_importance": dict(
        absent=["Exchange", "HashAggregate", "SortAggregate", "MapInPandas"],
    ),
    # DSIR two-pass shape: census pass (fan-out RR + 256-row bucket agg
    # + single-partition totals window) + scoring pass (doc_id agg);
    # the 256-row weights frame must re-enter as a BROADCAST — a
    # sort-merge join here would shuffle the whole token stream on the
    # bucket key, and any third Exchange chain means the token scan
    # got recomputed for the totals
    "sample_dsir": dict(
        contains=["BroadcastHashJoin"],
        absent=["SortMergeJoin", "CartesianProduct", "BroadcastNestedLoopJoin",
                "MapInPandas"],
        partial_agg=True,
        max_exchanges=4,
    ),
    # composed v2 curation pipeline: all stages stay JVM-side (no
    # pandas), nothing degenerates to a cartesian, and the final DSIR
    # weights re-enter as a broadcast exactly like sample_dsir
    "pipeline_corpus_curation_v2": dict(
        contains=["BroadcastHashJoin"],
        absent=["CartesianProduct", "BroadcastNestedLoopJoin", "MapInPandas"],
        partial_agg=True,
    ),
    # composed v3 pipeline: lang scoring must fuse into the scan (no
    # shuffle of its own), every stage stays JVM-side, nothing pairs
    # all docs
    # (no partial_agg assertion: the CC stage materializes its label
    # frame during construction, so the RETURNED plan is the keep-best
    # window + split projection — its aggregates live in the
    # already-executed stages, each pinned under its own entry)
    "pipeline_corpus_curation_v3": dict(
        absent=["CartesianProduct", "MapInPandas"],
    ),
    # RRF hybrid: the query-token side broadcasts into the lexical
    # overlap join; both top-k cuts ride WindowGroupLimit. The ONE
    # SortMergeJoin is the fusion full-outer of the two ~(queries x
    # 20)-row rank lists — full outer is never broadcastable in Spark
    # and the inputs are k-bounded, so it is by construction tiny
    "hybrid_search_rrf": dict(
        contains=["BroadcastHashJoin", "WindowGroupLimit"],
        absent=["CartesianProduct", "MapInPandas"],
        partial_agg=True,
    ),
    # int8 ANN: 1-row min/max + 5-query broadcasts over the scan,
    # integer-dot ranking cut by WindowGroupLimit; the 3 exchanges are
    # the ranking shuffle + two single-row global-agg exchanges for
    # the min/max grid (corpus and query branches each derive it)
    "similarity_int8_topk": dict(
        contains=["WindowGroupLimit"],
        absent=["CartesianProduct", "SortMergeJoin", "MapInPandas"],
        max_exchanges=3,
    ),
    # funnel: no join anywhere — one user_id shuffle (map-side partial
    # collect) + the scalar conditional-count agg
    "funnel_conversion": dict(
        absent=["Join", "CartesianProduct", "MapInPandas"],
        max_exchanges=2,
    ),
    # funnel_stages census: the two 1-row stage-count joins enter as
    # EXPLICIT broadcasts (round-12 verdict nit) — a broadcast
    # nested-loop, never a shuffled cartesian
    "funnel_stages": dict(
        contains=["BroadcastNestedLoopJoin"],
        absent=["CartesianProduct", "MapInPandas"],
    ),
    # MMR re-rank (round 13): top-20 candidates cut by
    # WindowGroupLimit, candidate vectors fetched by BROADCAST probe
    # over the corpus scan (no shuffled join anywhere), integer greedy
    # in one per-query pandas stage
    "similarity_topk_mmr": dict(
        contains=["WindowGroupLimit", "FlatMapGroupsInPandas"],
        absent=["CartesianProduct", "SortMergeJoin"],
    ),
    # perceptron serve pass: the hashed-features projection must come
    # from the persisted frame (training already paid for it), the
    # 256-long model enters as an array literal (no join of any kind),
    # and the per-doc score is one partial-agg shuffle
    "quality_perceptron": dict(
        contains=["InMemoryTableScan"],
        absent=["Join", "CartesianProduct", "MapInPandas"],
        partial_agg=True,
    ),
    # synthesize + canonicalize are map-side; the only shuffle is the
    # canonical-form dedup groupBy (partial agg before it)
    "url_canonicalize_dedup": dict(
        absent=["MapInPandas", "CartesianProduct"],
        partial_agg=True,
        max_exchanges=1,
    ),
    "q1_pricing_summary": dict(
        pushed=["l_shipdate"], partial_agg=True, max_exchanges=2
    ),
    "q3_top_revenue": dict(
        contains=["BroadcastHashJoin"],
        absent=["SortMergeJoin", "CartesianProduct"],
        pushed=["c_mktsegment", "o_orderdate"],
        partial_agg=True,
        max_exchanges=1,
    ),
    "q5_regional_revenue": dict(
        contains=["BroadcastHashJoin"],
        absent=["SortMergeJoin", "CartesianProduct"],
        pushed=["r_name"],
        partial_agg=True,
        max_exchanges=2,
    ),
    "q10_returned_items": dict(
        contains=["BroadcastHashJoin"],
        absent=["SortMergeJoin", "CartesianProduct"],
        pushed=["l_returnflag"],
        partial_agg=True,
        max_exchanges=1,
    ),
    "count_window_agg": dict(partial_agg=True, max_exchanges=1),
    "window_tumbling_hourly": dict(partial_agg=True, max_exchanges=1),
    "window_session": dict(partial_agg=True, max_exchanges=1),
    "interval_join": dict(
        contains=["BroadcastHashJoin"],
        absent=["CartesianProduct", "BroadcastNestedLoopJoin"],
        max_exchanges=0,  # broadcast join, no shuffle at all
    ),
    "asof_join_latest_signup": dict(
        # union + last_value over one shuffle — no join operator at all
        absent=["Join"],
        max_exchanges=1,
    ),
    # FOR SYSTEM_TIME AS OF front-end lowers to the same no-Join asof
    # plan: rate-version dedup agg + the union/last_value key shuffle
    "temporal_join_system_time_sql": dict(
        contains=["Window"],
        absent=["Join", "rangepartitioning"],
        partial_agg=True,
        max_exchanges=2,
    ),
    # --- TPC-H-style suite (plans/tpch.py): dims must broadcast, the
    # fact tables shuffle at most on groupBy keys + the output sort ---
    "q4_order_priority": dict(
        contains=["BroadcastHashJoin"],
        absent=["SortMergeJoin", "CartesianProduct"],
        pushed=["o_orderdate"],
        partial_agg=True,
        max_exchanges=2,
    ),
    "q6_forecast_revenue": dict(
        pushed=["l_shipdate", "l_discount", "l_quantity"],
        partial_agg=True,
        max_exchanges=1,
    ),
    "q7_volume_shipping": dict(
        contains=["BroadcastHashJoin"],
        absent=["SortMergeJoin", "CartesianProduct"],
        pushed=["l_shipdate"],
        partial_agg=True,
        max_exchanges=2,
    ),
    "q8_market_share": dict(
        contains=["BroadcastHashJoin"],
        absent=["SortMergeJoin", "CartesianProduct"],
        pushed=["p_type", "r_name"],
        partial_agg=True,
        max_exchanges=2,
    ),
    "q9_product_profit": dict(
        contains=["BroadcastHashJoin"],
        absent=["SortMergeJoin", "CartesianProduct"],
        pushed=["p_name"],
        partial_agg=True,
        max_exchanges=2,
    ),
    "q12_priority_shipping": dict(
        contains=["BroadcastHashJoin"],
        absent=["SortMergeJoin"],
        pushed=["l_shipdate"],
        partial_agg=True,
        max_exchanges=2,
    ),
    "q13_customer_distribution": dict(
        contains=["BroadcastHashJoin"],
        absent=["SortMergeJoin"],
        partial_agg=True,
        max_exchanges=3,
    ),
    # one lineitem scan only: the scalar max is a window over the
    # aggregated supplier-revenue rows, not a second fact aggregation
    "q15_top_supplier": dict(
        contains=["Window"],
        absent=["SortMergeJoin"],
        pushed=["l_shipdate"],
        partial_agg=True,
        max_exchanges=2,
    ),
    "q16_supplier_cnt": dict(
        contains=["BroadcastHashJoin"],
        absent=["SortMergeJoin"],
        pushed=["p_brand"],
        partial_agg=True,
        max_exchanges=3,
    ),
    "q17_small_qty_revenue": dict(
        contains=["BroadcastHashJoin"],
        absent=["SortMergeJoin"],
        pushed=["p_brand"],
        partial_agg=True,
        max_exchanges=2,
    ),
    "q19_discounted_revenue": dict(
        contains=["BroadcastHashJoin"],
        absent=["SortMergeJoin", "CartesianProduct"],
        pushed=["l_quantity"],
        partial_agg=True,
        max_exchanges=1,
    ),
    # bigram histogram via explode + partial agg; no cartesian anywhere
    "text_repetition_filter": dict(
        absent=["CartesianProduct", "SortMergeJoin"],
        partial_agg=True,
        max_exchanges=3,
    ),
    # the benchmark n-gram set must broadcast; the corpus side only
    # shuffles for its own distinct/groupBy, never for the join
    "decontam_ngram_overlap": dict(
        contains=["BroadcastHashJoin"],
        absent=["CartesianProduct", "SortMergeJoin"],
        partial_agg=True,
        max_exchanges=4,
    ),
    # ranked vocab broadcasts to the token stream; corpus side only
    # shuffles for its own aggs (vocab count, per-doc sum)
    "text_lm_rank_score": dict(
        contains=["BroadcastHashJoin"],
        absent=["CartesianProduct", "SortMergeJoin"],
        partial_agg=True,
        max_exchanges=4,
    ),
    "q21_waiting_suppliers": dict(
        contains=["BroadcastHashJoin", "Window"],
        absent=["SortMergeJoin", "CartesianProduct"],
        pushed=["o_orderstatus"],
        partial_agg=True,
        max_exchanges=2,
    ),
    # exact-substring passage dedup (round 8): seed counts must keep
    # map-side partial agg (boilerplate-gram skew absorber); no
    # cartesian/BNLJ anywhere; budget = gram-agg + gram-join +
    # doc-island shuffles (+1 AQE read slack)
    "dedup_exact_substring": dict(
        absent=["CartesianProduct", "BroadcastNestedLoopJoin"],
        partial_agg=True,
        max_exchanges=4,
    ),
    # round-10 additions ------------------------------------------------
    # language-ID is a pure map: the integer n-gram scorer must fuse
    # into the scan — no shuffle, no aggregate, no join of any kind
    "lang_id_ngram": dict(
        absent=["HashAggregate", "SortMergeJoin", "CartesianProduct",
                "BroadcastHashJoin", "Exchange"],
        max_exchanges=0,
    ),
    # derived-label mixing keeps the original's shape: ONE stats-agg
    # shuffle + the 1-row broadcast back over the scan; deriving the
    # label must stay in the map phase (no extra shuffle)
    "mix_temperature_langs_derived": dict(
        contains=["BroadcastNestedLoopJoin"],
        absent=["SortMergeJoin", "MapInPandas"],
        partial_agg=True,
        max_exchanges=1,
    ),
    # repetition rules: gram families shuffle on doc-bounded keys and
    # the three per-doc summaries BROADCAST back off the persisted
    # tokenized frame — nothing sort-merges, nothing pairs up
    "quality_repetition_rules": dict(
        contains=["InMemoryRelation", "BroadcastHashJoin"],
        absent=["SortMergeJoin", "CartesianProduct"],
        partial_agg=True,
        max_exchanges=7,
    ),
    # span removal rides the detector's bounded-key shuffles; the
    # covered-position join back to the token arrays broadcasts
    "dedup_substring_removal": dict(
        contains=["BroadcastHashJoin"],
        absent=["SortMergeJoin", "CartesianProduct",
                "BroadcastNestedLoopJoin"],
        partial_agg=True,
        max_exchanges=4,
    ),
    # sketch-tier DAU/WAU/MAU: one event shuffle into the persisted
    # day-sketch frame (ObjectHashAggregate — DataSketches HLL is a
    # typed imperative agg), then day-keyed sketch merges that join
    # broadcast; the exact twin's census×7/×30 distinct shuffles must
    # NOT reappear
    "events_dau_wau_mau_hll": dict(
        contains=["InMemoryRelation", "ObjectHashAggregate",
                  "BroadcastHashJoin"],
        absent=["SortMergeJoin", "CartesianProduct"],
        max_exchanges=3,
    ),
    # decayed trending: ONE event shuffle into the persisted (day,
    # page) census, the max-day anchor is a 1-row broadcast back over
    # it, and the top-10 must ride TakeOrderedAndProject (never a
    # global sort of the page census)
    "events_decayed_popularity": dict(
        contains=["InMemoryRelation", "BroadcastNestedLoopJoin",
                  "TakeOrderedAndProject"],
        absent=["SortMergeJoin", "CartesianProduct"],
        partial_agg=True,
        max_exchanges=3,
    ),
    # content-defined chunking: the cut/chunk construction is a pure
    # map over bind-materialized arrays (one Generate, no window, no
    # doc-keyed shuffle); only the chunk-hash census shuffles, and the
    # census joins back as a broadcast off the persisted chunk frame
    "chunk_cdc": dict(
        contains=["InMemoryRelation", "Generate", "BroadcastHashJoin"],
        absent=["SortMergeJoin", "CartesianProduct", "Window"],
        partial_agg=True,
        max_exchanges=2,
    ),
    # recall harness: composes the two pinned pair stages (their own
    # EXPECT rows above guard the expensive shapes); here we only pin
    # that the intersection/count layer adds no all-pairs operator
    "dedup_recall_minhash": dict(
        contains=["InMemoryRelation"],
        absent=["CartesianProduct", "SortMergeJoin"],
        max_exchanges=16,
    ),
    # leakage-safe split: the pair stage + CC labels are persisted
    # (iterative min-label propagation re-reads edges), the split
    # decision is a pure map off the labels, and the audit joins are
    # census-sized — nothing may pair up all docs
    "split_leakage_safe": dict(
        contains=["InMemoryRelation"],
        absent=["CartesianProduct"],
        partial_agg=True,
    ),
    # chunk-level savings: one chunk-hash census shuffle + the 1-row
    # reduce; no join of any kind (the census IS the data)
    "dedup_chunk_level": dict(
        absent=["SortMergeJoin", "CartesianProduct", "BroadcastHashJoin",
                "BroadcastNestedLoopJoin"],
        partial_agg=True,
        max_exchanges=2,
    ),
    # vocab coverage curve: one token-census shuffle; the curve math
    # fans out per census row (constant array explode), the 1-row
    # total broadcasts — never a sizes-x-census shuffled join
    "text_vocab_coverage": dict(
        contains=["InMemoryRelation", "BroadcastNestedLoopJoin"],
        absent=["SortMergeJoin", "CartesianProduct"],
        partial_agg=True,
        max_exchanges=4,
    ),
    # burstiness screen: ONE user_id shuffle reused by the lag window
    # AND the per-user aggregate; no join of any kind
    "user_interarrival_bots": dict(
        absent=["SortMergeJoin", "CartesianProduct", "BroadcastHashJoin",
                "BroadcastNestedLoopJoin"],
        max_exchanges=1,
    ),
    # last-touch attribution: the packed-BIGINT carry makes this ONE
    # event-scale user_id shuffle plus the catalog-bounded page-census
    # agg — the naive purchase-x-click interval self-join must never
    # appear
    "attribution_last_touch": dict(
        absent=["SortMergeJoin", "CartesianProduct", "BroadcastHashJoin",
                "BroadcastNestedLoopJoin"],
        partial_agg=True,
        max_exchanges=2,
    ),
    # session durations: user shuffle reused by lag/cumsum/session
    # reduce (subset-partitioning satisfies the (user, sid) group), a
    # duration-domain census, then the census-bounded global cumulate
    "session_duration_quantiles": dict(
        absent=["SortMergeJoin", "CartesianProduct", "BroadcastHashJoin"],
        partial_agg=True,
        max_exchanges=4,
    ),
    # Markov eval: transition frame persisted once (both splits filter
    # it), the top-1 model broadcasts onto the test side — the train
    # census must never sort-merge back onto event-scale data
    "browse_prediction_accuracy": dict(
        contains=["InMemoryRelation", "BroadcastHashJoin"],
        absent=["SortMergeJoin", "CartesianProduct"],
        partial_agg=True,
    ),
    # BPE round-1 pair counts: one corpus-sized word agg + vocab-sized
    # pair agg, both partial; top-50 must be a TakeOrderedAndProject
    # (never a global Sort of the pair table)
    "bpe_pair_counts": dict(
        contains=["TakeOrderedAndProject"],
        absent=["CartesianProduct", "BroadcastNestedLoopJoin"],
        partial_agg=True,
        max_exchanges=3,
    ),
    # global top-(k+1) rides the scalable partial-top-k physical op;
    # ZERO shuffles (the only joins are 1-row broadcasts)
    "sample_priority": dict(
        contains=["TakeOrderedAndProject"],
        absent=["CartesianProduct", "SortMergeJoin"],
        max_exchanges=0,
    ),
    # one (lang, source) shuffle serves both window functions; no join
    # (quality_bp_frame threads `source` through instead)
    "quality_stratified_cut": dict(
        absent=["CartesianProduct", "SortMergeJoin", "HashAggregate"],
        max_exchanges=2,
    ),
    # unigram census + pair census + two vocab joins + final top-50;
    # the N census is a 1-row broadcast
    "text_collocations": dict(
        contains=["TakeOrderedAndProject"],
        absent=["CartesianProduct"],
        partial_agg=True,
        max_exchanges=8,
    ),
    # iterative, fully declarative: every crossJoin is a 1-row
    # broadcast; no cartesian anywhere in the 3-round unroll
    "pagerank_browse": dict(absent=["CartesianProduct"]),
    # grouped weighted top-k: one stratum shuffle, limit below it
    "sample_priority_stratified": dict(
        contains=["WindowGroupLimit"],
        absent=["CartesianProduct", "SortMergeJoin"],
        max_exchanges=1,
    ),
    # shingle census + gram join-back + doc agg, all partial-agg
    "text_novelty_score": dict(
        absent=["CartesianProduct", "SortMergeJoin"],
        partial_agg=True,
        max_exchanges=4,
    ),
    # (type, hour) census + trailing window: two bounded-key shuffles
    "events_rate_spikes": dict(
        absent=["CartesianProduct", "SortMergeJoin", "Join"],
        partial_agg=True,
        max_exchanges=2,
    ),
    # (user, type) census collapsing into the per-user census
    "user_event_diversity": dict(
        absent=["CartesianProduct", "SortMergeJoin", "Join", "Window"],
        partial_agg=True,
        max_exchanges=2,
    ),
    # value census + cumulate; the k-frame is a 1-row broadcast
    "exact_median_nchars": dict(
        absent=["CartesianProduct", "SortMergeJoin"],
        partial_agg=True,
        max_exchanges=4,
    ),
    # per-src top-3 cut below the shuffle
    "browse_transition_topk": dict(
        contains=["WindowGroupLimit"],
        absent=["CartesianProduct", "SortMergeJoin"],
        partial_agg=True,
        max_exchanges=6,
    ),
    # round-11: trained-IVF recall curve. Training happens eagerly at
    # build time (K x dim collects, the embedding_kmeans contract); the
    # RESULT plan is the three probe settings over the ONE persisted
    # corpus assignment (InMemoryRelation) with the query side always
    # broadcast — never a shuffled join, never an all-pairs cartesian
    # (the brute-force truth side is the intended BroadcastNestedLoopJoin
    # of the tiny query set, same as similarity_topk)
    "similarity_recall_ivf_trained": dict(
        contains=["InMemoryRelation", "BroadcastHashJoin"],
        absent=["CartesianProduct", "SortMergeJoin"],
    ),
    # round-11: recall-vs-bands curve. ONE persisted signature table
    # (and one persisted exact tier) feeds all three band settings;
    # candidates only ever form inside (band, bucket) groups — never
    # an all-pairs stage
    "dedup_recall_minhash_curve": dict(
        contains=["InMemoryRelation"],
        absent=["CartesianProduct"],
        partial_agg=True,
    ),
    # round-11: prequential walk. ONE user shuffle builds transitions,
    # the per-src walk is a pinned-count exchange into the pandas
    # stage (AQE byte-coalescing must not collapse the CPU-bound
    # walk), and no join exists anywhere — the oracle's quadratic
    # prior-count join is exactly what the engine avoids
    "browse_prequential_accuracy": dict(
        contains=["FlatMapGroupsInPandas", "REPARTITION_BY_NUM"],
        absent=["CartesianProduct", "SortMergeJoin", "BroadcastHashJoin"],
    ),
    # same shape with the per-day census on top
    "browse_prequential_drift": dict(
        contains=["FlatMapGroupsInPandas", "REPARTITION_BY_NUM"],
        absent=["CartesianProduct", "SortMergeJoin", "BroadcastHashJoin"],
        partial_agg=True,
    ),
    # round-12: recall-vs-hashes curve. Same contract as the bands
    # curve - ONE persisted (32-hash) signature table feeds both
    # settings, candidates only form inside (band, bucket) groups
    "dedup_recall_minhash_hashes": dict(
        contains=["InMemoryRelation"],
        absent=["CartesianProduct"],
        partial_agg=True,
    ),
    # round-12: the JVM-only packed-scan prequential twin - NO pandas
    # stage, no join anywhere; two window sorts inside codegen
    "browse_prequential_accuracy_scan": dict(
        contains=["Window"],
        absent=[
            "FlatMapGroupsInPandas", "CartesianProduct",
            "SortMergeJoin", "BroadcastHashJoin",
        ],
    ),
}


@pytest.mark.parametrize("name", sorted(EXPECT))
def test_plan_shape(name, spark, sf_dir):
    # queries that persist() shared frames leave cache entries behind;
    # if an earlier test (oracle parity) already materialized the same
    # logical plan, CacheManager substitutes ITS compiled subtree here
    # and the printed exchange count reflects that run's state, not
    # this query's shape — clear the cache so the pin is order-free
    spark.catalog.clearCache()
    plan = plan_str(REGISTRY[name].fn(spark, sf_dir))
    exp = EXPECT[name]
    for s in exp.get("contains", []):
        assert s in plan, f"{name}: expected {s} in plan\n{plan}"
    for s in exp.get("absent", []):
        assert s not in plan, f"{name}: {s} must not appear\n{plan}"
    for col in exp.get("pushed", []):
        assert re.search(rf"PushedFilters: \[[^\]]*{col}", plan), (
            f"{name}: filter on {col} not pushed to the scan\n{plan}"
        )
    if exp.get("partial_agg"):
        assert n_hash_aggregates(plan) >= 2, (
            f"{name}: expected partial+final HashAggregate\n{plan}"
        )
    if "max_exchanges" in exp:
        got = n_exchanges(plan)
        assert got <= exp["max_exchanges"], (
            f"{name}: {got} shuffle exchanges (budget "
            f"{exp['max_exchanges']}) — a new shuffle crept in\n{plan}"
        )
