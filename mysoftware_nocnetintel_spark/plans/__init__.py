from .queries import QUERIES as _CORE, flagship_report  # noqa: F401
from .queries_relational import RELATIONAL_QUERIES as _REL
from .queries_timeseries import TIMESERIES_QUERIES as _TS
from .queries_text import TEXT_QUERIES as _TXT
from .queries_ml import ML_QUERIES as _ML, ML_ORACLES as _O_ML
from .queries_extra import EXTRA_QUERIES as _EXTRA
from .queries_r4 import R4_QUERIES as _R4
from .queries_r5 import R5_QUERIES as _R5
from .queries_r6 import R6_QUERIES as _R6
from .queries_r7 import R7_QUERIES as _R7
from .queries_r8 import R8_QUERIES as _R8
from .queries_r9 import R9_QUERIES as _R9
from .queries_r10 import R10_QUERIES as _R10
from .oracles import ORACLES as _O_CORE
from .oracles_r6 import ORACLES_R6 as _O_R6
from .oracles_r7 import ORACLES_R7 as _O_R7
from .oracles_r8 import ORACLES_R8 as _O_R8
from .oracles_r9 import ORACLES_R9 as _O_R9
from .oracles_r10 import ORACLES_R10 as _O_R10
from .oracles_ext import ORACLES_EXT as _O_EXT
from .oracles_extra import ORACLES_EXTRA as _O_EXTRA
from .oracles_r4 import ORACLES_R4 as _O_R4
from .oracles_r5 import ORACLES_R5 as _O_R5

_ALL = {
    **_CORE, **_REL, **_TS, **_TXT, **_ML, **_EXTRA, **_R4, **_R5,
    **_R6, **_R7, **_R8, **_R9, **_R10,
}

# The driver's CORRECTNESS gate grades the FIRST 50 dict entries in insertion
# order, so ordering here is load-bearing. ROTATION RULE (apply every round):
# (1) every registry query with no driver signal yet goes in first; (2) then
# every query whose implementation or oracle changed this round (space
# permitting); (3) fill the remainder with the queries whose last green
# signal is oldest. ROUND 9 (per VERDICT r8 task 1, derived from merged
# CORRECTNESS_r01-r08 latest signals — r8:50 / r7:49 / r6:50 / r5:8 /
# never:1): rule (1) admits q156_media_index (the only never-graded
# entry — the persisted Hamming media index + ingestion gate, displaced
# from the r8 window by its nine rule-1 siblings); rule (3)-first
# admits q138-q145 (the eight r5-signal holdovers, now the oldest
# signals in the registry); rule (2) admits q147/q152/q153/q154 (their
# index scratch paths moved to the atexit-cleaned `_scratch_index_path`
# helper this round, and q147 additionally gained the PIL/JPEG
# capability gate in operators/multimodal.py); rule (3) fills the
# remaining 37 slots with the head of the r6-signal block in numeric
# order (q46-q49, q51-q83). The r6-signal tail (q84-q90, q93,
# q100-q102, q106, q146 — 13 queries) keeps its r6 signal and is due
# first in the round-10 window. Outside the window: everything graded
# green in r7/r8.
_WINDOW = [
    # --- rule 1: never graded ---
    "q156_media_index",
    # --- rule 3 (first): the eight oldest signals (r5) ---
    "q138_regression_aggs",
    "q139_exact_percentiles",
    "q140_psi_drift",
    "q141_doc_lm_score",
    "q142_embedding_cohesion",
    "q143_snapshot_diff",
    "q144_span_scrub",
    "q145_embedding_decontam",
    # --- rule 2: implementation changed this round ---
    "q147_image_neardup",
    "q152_incremental_neardup",
    "q153_ann_index",
    "q154_text_semantic_search",
    # --- rule 3: the 37 oldest r6-signal queries (q84+ due round 10) ---
    "q46_sliding_window",
    "q47_session_window",
    "q48_ann_ivf",
    "q49_forecast_score",
    "q51_dispatch_plan",
    "q52_model_metrics",
    "q53_multimodal_features",
    "q54_scalar_subquery",
    "q55_in_subquery",
    "q56_lead_window",
    "q57_first_last_value",
    "q58_ntile_percent_rank",
    "q59_time_range_frame",
    "q60_union_distinct",
    "q61_except_all",
    "q62_like_filter",
    "q63_date_arithmetic",
    "q64_resample_asof",
    "q65_conditional_agg",
    "q66_salted_agg",
    "q67_tfidf",
    "q68_variance_corr",
    "q69_array_ops",
    "q70_null_handling",
    "q71_pandas_udf_score",
    "q72_variant_json",
    "q73_rmse",
    "q74_auc",
    "q75_sequence_assembly",
    "q76_ann_pq",
    "q77_funnel",
    "q78_hll_rollup",
    "q79_repetition_signals",
    "q80_scrub_sample",
    "q81_root_cause_lift",
    "q82_burst_detection",
    "q83_chunking",
]

assert len(_WINDOW) == 50, len(_WINDOW)
_missing = [k for k in _WINDOW if k not in _ALL]
assert not _missing, _missing

QUERIES = {k: _ALL[k] for k in _WINDOW}
QUERIES.update({k: v for k, v in _ALL.items() if k not in QUERIES})
ORACLES = {
    **_O_CORE, **_O_EXT, **_O_ML, **_O_EXTRA, **_O_R4, **_O_R5,
    **_O_R6, **_O_R7, **_O_R8, **_O_R9, **_O_R10,
}


# Opt-in SERVING-MODE plan cache (the DataFrame analogue of a prepared
# statement): repeated invocations of the same (query, sf_dir) on one
# session reuse the built DataFrame instead of re-running plan
# construction through py4j (~40 ms/query, GIL-serialized in a concurrent
# batch — measured ~0.1 s of bench's 10-query batch wall). DataFrames are
# immutable, so reuse is thread-safe; the cache is keyed by session like
# the table cache and is OFF by default (the driver's correctness path
# always builds fresh plans). Only zero-kwarg invocations are cached.
_PLAN_CACHE_ENABLED = False
_PLAN_CACHE: dict = {}

# Builds that materialize state at construction time (iterative
# localCheckpoint chains, driver-side k-means/model fits, collected Bloom
# bitmaps): excluded from the plan cache so every invocation is an honest
# end-to-end recompute (see the wrapper comment below).
_NO_PLAN_CACHE = {
    "q37_minhash_neardup",
    "q48_ann_ivf",
    "q49_forecast_score",
    "q51_dispatch_plan",
    "q76_ann_pq",
    "q90_ann_ivfpq",
    "q91_dedup_clusters",
    "q92_ann_opq",
    "q93_dedup_keep_one",
    "q99_neardup_clusters",
    "q103_bloom_prune",
    "q107_decontamination",
    "q110_pagerank",
    "q123_semdedup",
    "q125_mllib_pipeline",
    "q146_bpe_pipeline",  # trains the BPE merge loop at build time
    # round-8 media/index tiers: localCheckpoint'd base media (result
    # state, not a plan) and/or index builds + driver-collected probe
    # rows at build time — caching the DataFrame would pin stale state
    "q147_image_neardup",
    "q149_audio_neardup",
    "q151_video_neardup",
    "q152_incremental_neardup",  # rebuilds the signature index per call
    "q153_ann_index",
    "q154_text_semantic_search",
    "q156_media_index",  # rebuilds the hamming index per call
}


def enable_plan_cache(on: bool = True) -> None:
    """Caveats (cache is OFF by default): a cached DataFrame pins the file
    listing captured when the plan was built — if the parquet under sf_dir
    is REGENERATED mid-session, call ``clear_plan_cache()`` (or toggle off/
    on) or cached plans will read the stale index. Entries for other
    (stopped) sessions are evicted lazily on the next cache insert."""
    global _PLAN_CACHE_ENABLED
    _PLAN_CACHE_ENABLED = on
    if not on:
        _PLAN_CACHE.clear()


def clear_plan_cache() -> None:
    _PLAN_CACHE.clear()


def _plan_cached(name, fn):
    import functools

    @functools.wraps(fn)
    def wrapper(spark, sf_dir, **kwargs):
        # Queries whose BUILD embeds materializable state (localCheckpoint
        # of an iteration/intermediate, a driver-side centroid fit / model
        # fit / collected bitmap) are excluded: reusing their built
        # DataFrame would short-circuit recompute into a result-cache read
        # — benchmarks over them would silently measure block reads, not
        # query execution.
        if not _PLAN_CACHE_ENABLED or kwargs or name in _NO_PLAN_CACHE:
            return fn(spark, sf_dir, **kwargs)
        from ..sources.registry import _session_key

        sk = _session_key(spark)
        key = (sk, sf_dir, name)
        if key not in _PLAN_CACHE:
            # Lazy cross-session eviction: plans built on a stopped session
            # are unusable (their py4j refs are dead), so drop every entry
            # keyed to a different session before inserting. Bounds the
            # cache at one session x registry size.
            for k in [k for k in _PLAN_CACHE if k[0] != sk]:
                del _PLAN_CACHE[k]
            _PLAN_CACHE[key] = fn(spark, sf_dir)
        return _PLAN_CACHE[key]

    return wrapper


QUERIES = {k: _plan_cached(k, v) for k, v in QUERIES.items()}
