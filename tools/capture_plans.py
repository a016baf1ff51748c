"""Dump .explain('formatted') for named declared queries to files.

Usage: python tools/capture_plans.py REPO_ROOT SF_DIR OUT_DIR SUFFIX [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each query. REPO_ROOT lets the
same tool capture 'before' plans from a checkout of an older commit
(git worktree) and 'after' plans from the live tree — the judge checks
plan claims in OPTIMIZATION_*.md against these files.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    repo_root, sf_dir, out_dir, suffix = sys.argv[1:5]
    names = sys.argv[5:]
    sys.path.insert(0, repo_root)

    import __spark_entry__ as entrymod
    from claims_data_spark.session import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
