"""The driver contract: entry() runs, queries()/oracle_sql() keys line up,
every query executes at sf0.001 and returns a stable schema."""

import __spark_entry__ as entry_mod


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"r_name", "n_name", "n_orders", "rev"}


def test_queries_have_oracles(spark):
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert qs, "queries() must not be empty"
    missing = set(os_) - set(qs)
    assert not missing, f"oracle_sql keys without queries: {missing}"


def test_all_queries_run(spark, sf_dir):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()


def test_registry_hygiene_full_surface():
    """Every declared query has an oracle, every oracle has a query, all
    oracle strings are non-trivial SQL, and the rotation set (queries
    rewired most recently, sampled by the driver's first-50 CORRECTNESS
    window) stays at the head of the registry. Update the pinned head
    DELIBERATELY whenever the rotation changes — the pin exists so a
    refactor can't silently reorder the window."""
    import __spark_entry__ as m

    q = m.queries()
    o = m.oracle_sql()
    assert set(q) == set(o)
    assert len(q) >= 185
    for name, sql in o.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
    head = list(q)[:50]
    assert head == [
        # r12 rotation (VERDICT r11 #7): the two NEW queries first
        # (dest-compaction + _LATEST pointer; quantizer retrain), then
        # the two queries rewired by the Bm25Index v4 per-doc
        # membership table, then the cohort least recently
        # driver-sampled (last seen r2-r6), oldest first. 48 of this
        # 50-query window are NOT in the r11 window.
        "bm25_pointer_compact", "ivf_retrain_topk",
        "bm25_incremental", "bm25_delete_compact",
        # stale cohort: r2
        "term_frequency", "stupid_backoff", "mean_avg_precision",
        "window_range_frame", "percentiles",
        # r3
        "fuzzy_name_pairs", "heavy_hitters", "funnel",
        # r4
        "jaccard_prefix_pairs", "supplier_reliability",
        "cross_source_dups", "label_coherence", "event_transitions",
        "session_stats", "funnel_latency", "twap_hourly",
        "table_profile", "snapshot_diff", "target_encoding",
        "quantile_normalize", "rolling_median", "retention_cohorts",
        "anomaly_flags", "first_touch",
        # r5
        "weighted_sample", "hashed_tf", "scd2_lookup",
        "triangle_count", "dq_checks", "hll_union", "binned_range",
        "assoc_rules", "pagerank_ranks", "gap_interpolate",
        # r6
        "repetition_signals", "contamination", "line_dedup",
        "cdc_upsert", "lm_score", "gopher_rules", "bm25_search",
        "url_stats", "ewma_smooth", "winsorized_stats", "bpe_tokens",
        "semantic_clusters",
    ]


def test_plan_audit_covers_every_declared_query():
    """PLAN_AUDIT.md regenerates with the registry (VERDICT r5 #7): one
    audit row per declared query, so the committed audit can't silently
    go stale when queries are added or rewired."""
    import os
    import re

    import __spark_entry__ as entry_mod

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLAN_AUDIT.md")) as f:
        text = f.read()
    rows = set(re.findall(r"^\| (\w+) \|", text, flags=re.M)) - {"query"}
    declared = set(entry_mod.queries())
    assert rows == declared, (
        f"PLAN_AUDIT.md stale: missing {sorted(declared - rows)}, "
        f"extra {sorted(rows - declared)} — regenerate with "
        "`python tools/plan_audit.py > PLAN_AUDIT.md`"
    )
