"""Capture .explain('formatted') for named gate queries into
plans/r08/<name>_<tag>.txt (judge evidence for plan-shape claims).

Usage: python scripts/capture_plans.py <tag> <gate> [<gate> ...]
       python scripts/capture_plans.py <tag> --entry
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    from spatialsketch_spark.config import get_spark
    from spatialsketch_spark.gate import GATE_QUERIES
    spark = get_spark("plans", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(ROOT, "plans", "r08")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = GATE_QUERIES[name][0](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange, "
              f"{plan.count('BatchEvalPython')} BatchEvalPython)")
    spark.stop()


if __name__ == "__main__":
    main()
