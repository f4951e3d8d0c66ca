"""Full-registry physical-plan audit (optimization round; guide §7.2).

Builds EVERY registered query at --sf-dir (default sf0.01) and greps
the pre-execution physical plan for optimization red flags:

  - BatchEvalPython            row-at-a-time Python on a query path
  - CartesianProduct           accidental cross join
  - BroadcastNestedLoopJoin    non-equi fallback (sometimes intended)
  - SortMergeJoin              info only (AQE may convert at runtime)
  - exchanges=N                Exchange node count (shuffle inventory)

Streaming builders EXECUTE their stream; pass --skip-streaming to
leave them to the dedicated streaming measurements. Builders that
train models (ann_ivf_kmeans) also execute jobs at build time — the
audit tolerates that (one-off cost).

Usage: python tools/plan_audit.py [--sf-dir D] [--out F] [--skip-streaming]
Emits one line per query:  <name>  exchanges=N  [FLAGS...]
and a summary of flagged queries at the end.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLAGS = [
    ("BatchEvalPython", "PY_ROW_UDF"),
    ("CartesianProduct", "CARTESIAN"),
    ("BroadcastNestedLoopJoin", "BNLJ"),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-streaming", action="store_true")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from presto_0_235_spark.session import build_session
    from presto_0_235_spark.queries.registry import all_queries

    spark = build_session(
        app_name="plan-audit", master="local[8]", shuffle_partitions=8
    )
    queries = all_queries()
    names = (
        [n.strip() for n in args.only.split(",")]
        if args.only
        else sorted(queries)
    )
    lines, flagged = [], []
    for name in names:
        if args.skip_streaming and name.startswith("stream_"):
            continue
        q = queries[name]
        try:
            df = q.builder(spark, args.sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # pragma: no cover - audit robustness
            lines.append(f"{name}  ERROR {type(exc).__name__}: {exc}")
            flagged.append(name)
            continue
        n_ex = len(re.findall(r"\bExchange (hash|range|Single|rangep)", plan)) + plan.count(
            "Exchange SinglePartition"
        )
        n_ex = plan.count("+- Exchange") + plan.count(":- Exchange")
        n_smj = plan.count("SortMergeJoin")
        hits = [tag for pat, tag in FLAGS if pat in plan]
        extra = f" smj={n_smj}" if n_smj else ""
        line = f"{name}  exchanges={n_ex}{extra}"
        if hits:
            line += "  " + " ".join(hits)
            flagged.append(name)
        lines.append(line)
    out = "\n".join(lines)
    print(out)
    print(f"\naudited={len(lines)} flagged={len(flagged)}")
    if flagged:
        print("flagged:", ", ".join(flagged))
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
