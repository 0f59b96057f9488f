"""Isolation bench + plan capture for optimization work (guide §1.1/§1.4).

NOT the frozen driver harness (bench.py is frozen for measurement): this
tool times individual queries in isolation, with the driver's own
methodology (`.count()`) by default or the guide §1.4 noop sink
(`MODE=noop`), and captures `.explain("formatted")` output to
`$PLANDIR/<query>_$PLANSUFFIX.txt` so plan-shape claims in
OPTIMIZATION_r*.md are checkable.

Usage:
  python bench_extra.py q1 q2 ...          # time named queries
  REPS=4 MODE=noop PLANDIR=plans/r07 PLANSUFFIX=before \
      python bench_extra.py qa_compare_designation
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dle import queries as q  # noqa: E402
from dle.session import get_spark  # noqa: E402


def explain_str(df) -> str:
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    reps = int(os.environ.get("REPS", "3"))
    mode = os.environ.get("MODE", "count")
    plandir = os.environ.get("PLANDIR")
    suffix = os.environ.get("PLANSUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("dle-bench-extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = q.queries()
    # warm both execution paths once, like bench.py
    qs["spatial_rollup_counts"](spark, sf_dir).count()
    qs["overlay_dissolve_area_1d"](spark, sf_dir).count()
    out = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(name)
        samples, build_s = [], None
        for i in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            build = time.perf_counter() - t0
            if mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = time.perf_counter() - t0
            samples.append(round(dt, 2))
            if build_s is None:
                build_s = round(build, 2)
            if i == 0 and plandir:
                Path(plandir).mkdir(parents=True, exist_ok=True)
                (Path(plandir) / f"{name}_{suffix}.txt").write_text(
                    explain_str(df))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(samples), "samples": samples,
                     "build_s": build_s}
        print(name, json.dumps(out[name]), flush=True)
    print("TOTAL_MIN", round(sum(v["min"] for v in out.values()), 2))
    spark.stop()


if __name__ == "__main__":
    main()
