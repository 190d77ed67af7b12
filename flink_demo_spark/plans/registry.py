"""Central query registry.

Every operator/query claimed from SURVEY.md §2 registers here with
(a) a Spark implementation ``fn(spark, sf_dir) -> DataFrame`` and
(b) when SQL-expressible, a DuckDB oracle SQL string over the same
parquet tables. The driver's correctness gate compares the two
(row-count + schema + order-insensitive value hash).

Determinism contract for every registered query:
- alias every computed column identically in Spark and oracle SQL;
- round derived doubles (``round(x, 2..6)``) on BOTH sides;
- never output raw event-time at sub-µs precision (events.ts is ns in
  parquet; oracles must ``CAST(ts AS TIMESTAMP)`` to µs);
- break all ordering/top-k ties with a unique key column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> driver does rows-only check
    doc: str = ""
    bench: bool = False  # part of the bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a query implementation + its oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), bench)
        return fn

    return deco


# The verification driver samples the FIRST 50 entries of queries(),
# so iteration order decides which operator families get a driver-side
# correctness row. Rounds 1-3 sampled only the relational/analytics/
# behavior head; this explicit priority list front-loads the families
# that have never had a driver row (streaming, CEP/MATCH_RECOGNIZE,
# dedup/similarity, text, windows). Names missing from the registry
# are skipped (safe across renames); unlisted queries follow in
# registration order, and _previously_green() rotates names with an
# existing driver row to the back automatically each round.
# (Folding the scalar_*_funcs/scalar_*_funcs2 batches further was
# considered and dropped: each pair scans a DIFFERENT base table
# (part vs documents, orders vs events), so a merge would need a
# cross-table join with no shared key — the rotation makes the
# sample-slot motivation moot.)
_SAMPLE_PRIORITY = [
    # round-4 additions: the live-broker Kafka round-trip and the new
    # training-pipeline operators — never driver-checked yet
    "kafka_roundtrip_window",
    "streaming_kafka_window",
    "chunk_documents",
    "text_tfidf_topk",
    "embedding_int8_quant",
    "multimodal_ppm_decode",
    "multimodal_wav_decode",
    "multimodal_y4m_frames",
    # streaming (applyInPandasWithState / watermark surfaces)
    "streaming_window_hourly",
    "streaming_interval_join",
    "streaming_sliding_window",
    "streaming_dedup",
    "streaming_lookup_join",
    "streaming_pattern_burst",
    "streaming_session_window",
    "streaming_window_join",
    "streaming_hotitems_topn",
    "streaming_uv_per_element",
    "streaming_triggered_agg",
    "streaming_decontam",
    "streaming_punctuated_windows",
    "streaming_allowed_lateness",
    "streaming_match_recognize",
    # CEP / MATCH_RECOGNIZE
    "cep_order_timeout",
    "cep_v_pattern",
    "cep_iterative_threshold",
    "streaming_cep_iterative",
    "match_recognize_v_pattern",
    "match_recognize_rise_fall",
    "match_recognize_sum_budget",
    "match_recognize_all_rows",
    "pattern_error_burst",
    # dedup / similarity (LLM-pipeline surface)
    "dedup_exact",
    "dedup_keep_first",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_lsh",
    "dedup_cluster_assign",
    "similarity_topk",
    "similarity_lsh_topk",
    "similarity_ivf_topk",
    "similarity_ivf_nprobe",
    "embedding_norms",
    # text analysis
    "text_token_stats",
    "text_bpe_token_stats",
    "text_quality_score",
    "text_langid",
    "text_fingerprint",
    "text_winnow_fingerprint",
    "text_vocab_topk",
    "text_token_quantiles",
    "decontam_ngram_overlap",
    # multimodal plumbing (never driver-checked before round 4)
    "multimodal_features",
    "multimodal_frame_sample",
    # windows / temporal joins
    "window_tumbling_hourly",
    "window_sliding",
    "window_session",
    "window_session_dynamic",
    "window_tumbling_offset",
    "count_window_agg",
    "interval_join",
    "asof_join_latest_signup",
    # round-5: the remaining never-driver-checked round-4 names rank
    # BEFORE the queries added in round 5, so the driver's 50-sample
    # drains the old backlog first (VERDICT r4 item 1)
    "conversion_timeout",
    "window_join",
    "funnel_stages",
    "retention_weekly_cohort",
    "sample_stratified",
    "text_bigram_topk",
    "text_repetition_filter",
    "text_lm_rank_score",
    "pack_sequences",
    "json_extract_props",
    "text_length_histogram",
    "predicate_suite",
    "scalar_string_funcs2",
    "subquery_scalar_correlated",
    "subquery_in_uncorrelated",
    "subquery_scalar_global",
    "sessionize_operator",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q12_priority_shipping",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q17_small_qty_revenue",
    "q19_discounted_revenue",
    "q21_waiting_suppliers",
    # round-5 additions (never checked; after the older backlog)
    "cep_skip_to_last_pairs",
    "cep_skip_to_first_prefixes",
    "cep_no_skip_branches",
    "iterate_min_label",
    "geo_grid_cells",
    "side_output_channels",
    "lookup_broadcast_dict",
    "streaming_match_recognize_all_rows",
    "join_salted_skew",
    "agg_salted_hot_keys",
    "cogroup_order_items",
    "join_bucketed_colocated",
    "streaming_cep_skip_to_last",
]


_GREEN_CACHE: set[str] | None = None


def _previously_green() -> set[str]:
    """Query names with a green (or rows-only) row in any past round's
    CORRECTNESS_r*.json — these already have driver-side evidence, so
    the sample rotates toward never-checked queries automatically.
    Read once per process: the record files only change between
    rounds, never while a session is querying the registry."""
    import glob
    import json
    import os
    import re

    global _GREEN_CACHE
    if _GREEN_CACHE is not None:
        return _GREEN_CACHE

    # Green status is the MOST RECENT row per query, not the union of all
    # rounds: a query that regressed after once being green must rotate
    # back to the front of the sampled window so the regression is caught,
    # instead of staying permanently deprioritized (round-7 ADVICE).
    latest: dict[str, bool] = {}
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    try:
        def _round_no(p: str) -> int:
            # Sort by the parsed integer round number, not the raw path:
            # lexicographic order breaks once rounds outgrow the zero
            # padding (r100 < r99) or an unpadded file appears (ADVICE r8).
            m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", os.path.basename(p))
            return int(m.group(1)) if m else -1

        for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")), key=_round_no):
            with open(path) as f:
                rows = json.load(f)
            for name, r in rows.items():
                if not isinstance(r, dict):
                    continue
                ok = bool(r.get("hash_match"))
                rows_only = r.get("err") == "no_oracle" and bool(r.get("spark_rows"))
                latest[name] = ok or rows_only
        seen = {n for n, ok in latest.items() if ok}
    except Exception:
        seen = set()  # unreadable records: fall back to static order
    _GREEN_CACHE = seen
    return seen


def _ordered_specs() -> dict[str, QuerySpec]:
    _load_all()
    ranked: dict[str, QuerySpec] = {}
    for n in _SAMPLE_PRIORITY:
        if n in REGISTRY:
            ranked[n] = REGISTRY[n]
    for n, s in REGISTRY.items():
        if n not in ranked:
            ranked[n] = s
    # stable three-pass: never-green oracle-backed queries first (in the
    # ranked order), then already-evidenced oracle-backed ones, then the
    # oracle-less queries at the very back. The driver's hash check
    # samples the first 50 names; an oracle-less query can only ever
    # produce an `err: no_oracle` row there (r06 burned a slot learning
    # that), so those names must never occupy a sampled slot — their
    # correctness evidence is the local error-bound tests vs exact twins.
    green = _previously_green()
    out: dict[str, QuerySpec] = {}
    for n, s in ranked.items():
        if n not in green and s.oracle is not None:
            out[n] = s
    for n, s in ranked.items():
        if n not in out and s.oracle is not None:
            out[n] = s
    for n, s in ranked.items():
        if n not in out:
            out[n] = s
    return out


def all_queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in _ordered_specs().items()}


def all_oracles() -> dict[str, str]:
    return {
        n: s.oracle for n, s in _ordered_specs().items() if s.oracle is not None
    }


def bench_queries() -> dict[str, QuerySpec]:
    _load_all()
    return {n: s for n, s in REGISTRY.items() if s.bench}


_LOADED = False


def _load_all() -> None:
    """Import all plan modules so their @query decorators run."""
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        analytics,
        behavior,
        corpus,
        datapipe,
        matchrec,
        predicates,
        relational,
        stream_parity,
        subqueries,
        temporal,
        tpch,
    )

    _LOADED = True
