"""Physical-plan audit over every declared query.

Emits a markdown table (one row per ``__spark_entry__.queries()`` entry):
scan pushdown, read-schema width, exchange count, join strategies, Python
stages, and whole-stage-codegen presence — the per-operator ``.explain``
discipline, mechanized. Run:

    python tools/plan_audit.py [sf_dir] > PLAN_AUDIT.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit(plan: str) -> dict:
    joins = sorted(
        {
            m
            for m in re.findall(
                r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                r"BroadcastNestedLoopJoin|CartesianProduct)",
                plan,
            )
        }
    )
    read_widths = [s.count(",") + 1 for s in re.findall(r"ReadSchema: struct<([^>]*)>", plan)]
    return {
        "pushed": "Y" if re.search(r"PushedFilters: \[.+\]", plan) else "-",
        "read_cols": "/".join(str(w) for w in read_widths) or "-",
        "exchanges": len(re.findall(r"\bExchange\b|\(\d+\) Exchange", plan)) or
                     plan.count("Exchange "),
        "joins": ",".join(j.replace("Join", "").replace("Broadcast", "BC")
                          .replace("SortMerge", "SMJ").replace("ShuffledHash", "SHJ")
                          .replace("NestedLoop", "NLJ").replace("CartesianProduct", "CARTESIAN")
                          for j in joins) or "-",
        "python": ",".join(sorted({m for m in re.findall(
            r"(MapInPandas|ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas)", plan)})) or "-",
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry_mod
    from keystone_spark import get_session

    from keystone_spark import session as sess

    # static plans expose codegen only with AQE off; results are not run
    # here. load_table() re-applies RUNTIME_CONFS on every call, so the
    # override must go into the map, not just the live conf.
    sess.RUNTIME_CONFS["spark.sql.adaptive.enabled"] = "false"
    spark = get_session("plan_audit")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    qs = entry_mod.queries()

    print(f"# Physical-plan audit ({sf_dir}, AQE off for static inspection)\n")
    print("| query | pushdown | read cols | exchanges | joins | python stages | codegen |")
    print("|---|---|---|---|---|---|---|")
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            qe = df._jdf.queryExecution()
            plan = spark._jvm.PythonSQLUtils.explainString(qe, "formatted")
            cg = spark._jvm.PythonSQLUtils.explainString(qe, "codegen")
            n_cg = int(cg.split("Found ")[1].split(" WholeStageCodegen")[0])
            a = audit(plan)
            n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
            print(
                f"| {name} | {a['pushed']} | {a['read_cols']} | {n_ex} "
                f"| {a['joins']} | {a['python']} | {n_cg} |"
            )
        except Exception as exc:  # pragma: no cover
            print(f"| {name} | ERROR: {str(exc)[:60]} | | | | | |")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    print(
        "\nNotes: pushdown '-' is expected where the query scans the whole"
        " table (aggregations without predicates). embedding_neardup's BCNLJ"
        " is the deliberate exact-pairwise form on a bounded id range — the"
        " unbounded scale path is lsh_bucket_topk/ivf_topk (hash joins)."
        " Python stages appear exactly where numeric kernels run as Arrow"
        " batches. With AQE on (production), exchanges further coalesce and"
        " skewed joins split at runtime."
    )


if __name__ == "__main__":
    main()
