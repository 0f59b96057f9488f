"""spark-submit entry point for the full vector pipeline.

    python tools/make_pyfiles.py
    spark-submit --master <cluster> --py-files dist/dle.zip \
        jobs/process_vector_job.py <sf_dir> <out_dir> [depth]

Runs A4 -> A5/A6 precedence -> A7 planarize with the checkpoint
manifest (resume-safe: re-running skips completed cells), writes the
planarized faces + qa rollup JSON to <out_dir>.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

# local runs without --py-files: repo root on path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import SparkSession  # noqa: E402


def main():
    # --config FILE: reference-format INI merged over defaults
    # (designatedlands.py:265-285); positional args still win
    from dle.config import pop_config
    argv = sys.argv[1:]
    cfg = pop_config(argv)
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.001"
    out_dir = argv[1] if len(argv) > 1 else cfg["out_path"]
    depth = int(argv[2]) if len(argv) > 2 else cfg["depth"]

    spark = SparkSession.builder.appName("dle-process-vector") \
        .getOrCreate()
    from dle.plans.pipeline import process_vector, qa_rollups
    from dle.plans.checkpoint import Manifest, run_stage
    from dle.sources.io import dump

    from dle import telemetry
    telemetry.enable(spark)  # lossy-fallback counter in qa output

    man = Manifest(f"{out_dir}/manifest")
    # ckpt_root => the precedence loop commits each layer to reliable
    # storage (resume-safe on executor loss; no localCheckpoint).
    out = process_vector(spark, sf_dir, depth=depth,
                         ckpt_root=f"{out_dir}/stages")
    fingerprint = f"{sf_dir}|depth={depth}"
    planar = run_stage(
        spark, man, "planarized", fingerprint,
        lambda skip: out.planarized, out_dir)
    dump(out.designatedlands, f"{out_dir}/designatedlands")
    qa = qa_rollups(out)
    qa_flat = {
        "total_land_ha": qa["total_land_ha"],
        "total_planarized_ha": qa["total_planarized_ha"],
        "n_faces": planar.count(),
        "lossy_fragments": qa["lossy_fragments"],
    }
    with open(f"{out_dir}/qa.json", "w") as f:
        json.dump(qa_flat, f, indent=2)
    print(json.dumps(qa_flat))


if __name__ == "__main__":
    main()
