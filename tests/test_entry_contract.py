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
        # r13 rotation (VERDICT r12 #8): the two NEW queries first (the
        # fold-triggered auto-retrain loop; the streaming BM25 ingest
        # fold under the full-corpus SQL oracle), then the cohort
        # least recently driver-sampled, oldest first: pii_redact
        # (r7), collect_agg (r8), and the r9-window members
        # (window_nav spills to 51 and leads the r14 rotation). 50 of
        # this 50-query window are NOT in the r12 window.
        "ivf_stream_autoretrain_topk", "bm25_stream_ingest",
        # r7, r8
        "pii_redact", "collect_agg",
        # r9 cohort
        "phash_neardup", "ordered_funnel", "source_similarity",
        "psi_drift", "oov_rate", "dedup_savings", "doc_chunks",
        "url_dedup", "mixture_weights", "key_skew_profile", "top_paths",
        "mad_outliers", "duplicate_spans", "dsir_weights",
        "top_boilerplate_spans", "dsir_resample", "strip_spans",
        "equidepth_hist", "revenue_concentration", "doc_fingerprint",
        "minhash_dedup", "dedup_clusters", "monthly_trend",
        "abc_classes", "repeat_purchase_curve", "activity_heatmap",
        "chi_square_test", "token_entropy", "rfm_segments", "brand_hhi",
        "group_mode", "interarrival_stats", "twoway_effects",
        "value_autocorr", "cusum_drift", "vocab_growth", "zipf_curve",
        "order_gaps", "dup_rate_by_source", "gap_fill",
        "udtf_sentences", "nation_trade", "nation_profit",
        "late_shipments", "order_distribution", "waiting_suppliers",
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
