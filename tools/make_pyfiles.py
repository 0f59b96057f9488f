"""Package the engine for `spark-submit --py-files` (north rule).

    python tools/make_pyfiles.py            # -> dist/dle.zip
    spark-submit --py-files dist/dle.zip jobs/process_vector_job.py

The zip contains only the `dle` package (pure Python, no native deps),
so it ships to executors unchanged on any cluster.
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def build(out: Path | None = None) -> Path:
    out = out or REPO / "dist" / "dle.zip"
    out.parent.mkdir(exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((REPO / "dle").rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    return out


if __name__ == "__main__":
    print(build())
