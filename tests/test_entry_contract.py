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
        # r14 rotation (VERDICT r13 #8): the eight NEW queries first
        # (filtered ANN both families + the exact value-hashed
        # baseline, MMR re-rank, embedding decontamination, SQ8
        # quantized search, within-group top-k, token-budget
        # selection), then window_nav (spilled to 51 in r13), then the
        # stalest cohort — the r10 window minus its four youngest
        # (top_supplier, unpivot_long, variant_json, window_pct spill
        # to 51+ and lead the r15 rotation). ZERO of this 50-query
        # window are in the r13 window (computed from
        # CORRECTNESS_r*.json history).
        "ivf_filtered_topk", "cosine_filtered_topk",
        "mmr_rerank", "embedding_decontamination",
        "sq8_topk", "group_cosine_topk", "ivfpq_filtered_topk",
        "token_budget_select",
        # r9 spill
        "window_nav",
        # r10 cohort (45)
        "approx_distinct", "approx_percentile", "argmin_part",
        "array_fns2", "augmented_eval", "binary_metrics",
        "conditional_agg", "covar_corr", "disjunctive_pred",
        "embedding_neardup", "event_sliding_window", "excess_shipments",
        "exists_subquery", "funnel_completions", "grouped_ols",
        "histogram_bins", "idle_customers", "important_stock",
        "ivf_topk", "kmv_distinct", "lang_id", "large_orders",
        "local_supplier_volume", "map_fns", "market_share", "null_fns",
        "ohlc_rollup", "pivot_counts", "pq_topk", "promo_revenue",
        "regr_fns", "reservoir_sample", "returned_items",
        "revenue_predicate", "scalar_subquery", "scd2_intervals",
        "shipping_priority", "simhash_pairs", "supplier_part_counts",
        "token_packing", "token_packing_greedy",
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
