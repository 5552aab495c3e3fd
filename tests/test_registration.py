"""Driver-window registration guards.

The grading driver's CORRECTNESS gate covers exactly the first 50 registered
queries (r02/r03: entries == list(queries())[:50]). These tests pin the
invariants that make that window worth its slots (VERDICT r3 #1): every
window entry is oracle-backed, and the window spans every SURVEY §2 operator
family plus every training-data pipeline op.
"""

from __future__ import annotations

from palimpzest_spark.plans.queries import DRIVER_WINDOW, ORACLE_SQL, QUERIES
from palimpzest_spark.plans.queries_suites import SUITES


def test_first_50_are_the_window_and_all_oracle_backed():
    names = list(QUERIES)
    assert names[:50] == DRIVER_WINDOW
    missing = [n for n in DRIVER_WINDOW if n not in ORACLE_SQL]
    assert not missing, f"window entries without oracles: {missing}"


def test_window_covers_every_operator_family():
    # one representative per §2 family / training-data op; a rename or
    # reshuffle that drops a family from the window fails here, not at
    # round-end grading
    required = {
        "q1_pricing_summary",        # scan+filter+groupBy agg
        "join_inner_right_rename",   # relational join + rename contract
        "join_outer_suite",          # left/right/full outer
        "join_semi_anti_suite",      # semi/anti
        "asof_join_click_view",      # as-of join
        "range_join_event_windows",  # range join
        "map_convert_suite",         # NonLLMConvert expr + pandas UDF
        "flat_map_ordinality",       # flat_map + _cardinality_idx
        "set_ops_except_intersect",  # set ops
        "grouping_sets_suite",       # rollup/cube/distinct-agg
        "window_running_sum",        # analytic windows
        "pivot_percentile_suite",    # pivot + quantiles
        "events_window_suite",       # tumbling/sliding/session windows
        "text_metrics_suite",        # text analysis + scalar fn library (json)
        "source_roundtrip_suite",    # jsonl/csv/orc file sources
        "dedup_exact_docs",
        "dedup_pairs_suite",         # ngram-jaccard + simhash + winnowing
        "dedup_minhash_oracle",
        "dedup_cluster_canonical",   # connected components
        "embedding_neardup_oracle",
        "ann_topk_suite",            # exact + LSH + IVF top-k tiers
        "sem_topk_attach_oracle",    # per-record TopKOp
        "sem_embedding_join_oracle", # embedding join
        "bm25_search_docs",          # retrieval
        "sem_filter_map_oracle",     # LLMFilter + LLMConvert
        "sem_join_oracle",
        "sem_rag_oracle",
        "sem_split_convert_oracle",
        "sem_mixture_oracle",
        "sem_critique_oracle",
        "sem_aggregate_oracle",
        "lineage_flat_map_oracle",   # lineage columns
        "sampling_suite",
        "pack_sequences_oracle",
        "quality_audit_events",
        "cdc_lww_replay_events",     # CDC flagship block
        "cdc_schema_evolution_replay",
        "cdc_stream_kill_resume",
        "cdc_cdf_between_versions",
        "cdc_rollup_view_incremental",
        "cdc_point_lookup_convs",
        "cdc_ts_range_read",
        "cdc_extras_suite",          # full-replay final state + transcript render
        "multimodal_media_suite",    # WAV + PNG decode vs codec-free oracles
        "training_export_pipeline",  # end-to-end export pipeline
    }
    in_window = set(DRIVER_WINDOW)
    assert required <= in_window, f"families missing: {sorted(required - in_window)}"


def test_suite_components_stay_individually_registered():
    # suites compress evidence, they don't replace the per-variant queries —
    # those keep their own catalog entries (slots > 50) and parity gates
    for suite, parts in SUITES.items():
        assert suite in QUERIES
        for p in parts:
            assert p in QUERIES and p in ORACLE_SQL, (suite, p)


def test_rows_only_queries_registered_after_all_oracle_backed():
    names = list(QUERIES)
    first_rows_only = next(i for i, n in enumerate(names) if n not in ORACLE_SQL)
    assert all(n not in ORACLE_SQL for n in names[first_rows_only:]), (
        "oracle-backed query registered after a rows-only one"
    )


def test_every_rows_only_query_justifies_itself():
    """VERDICT r4 #5: each rows-only query's docstring must either name its
    registered oracle-backed twin (`oracle twin: \\`name\\``) or state why no
    SQL oracle can exist (`no SQL oracle`). This keeps the weaker rows-only
    check an explicit, reviewed decision rather than a silent omission."""
    import re

    for n, fn in QUERIES.items():
        if n in ORACLE_SQL:
            continue
        doc = fn.__doc__ or ""
        m = re.search(r"oracle\s+twin:\s*`(\w+)`", doc)
        if m:
            twin = m.group(1)
            assert twin in ORACLE_SQL, (
                f"{n}: claimed oracle twin {twin!r} is not oracle-backed"
            )
        else:
            assert "no SQL oracle" in doc, (
                f"rows-only query {n!r} has neither an oracle-twin line nor "
                f"a 'no SQL oracle' justification in its docstring"
            )
