"""Dump .explain("formatted") for named queries to plans/r07/<q>_<tag>.txt.

Usage: python tools/dump_plans_r07.py before q1 q2 ...
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from common_crawl___autumn_2025_spark.session import get_spark  # noqa: E402
from common_crawl___autumn_2025_spark.plans.catalog import QUERIES  # noqa: E402

def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump_plans", cores=8)
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print("wrote", name, tag)
    spark.stop()

if __name__ == "__main__":
    main()
