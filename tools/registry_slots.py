"""Print the queries() registry in driver-sample order: which gates sit
inside the driver's first-50 correctness window (CORE) and which ride
the rotation tail. Run after any registry edit — VERDICT r3 #1 exists
because a silent reorder pushed the raster gates out of the window.

    python tools/registry_slots.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dle import queries as q  # noqa: E402

WINDOW = 50


def main():
    keys = list(q.QUERIES)
    print(f"{len(keys)} registered; driver samples the first {WINDOW}\n")
    for i, k in enumerate(keys):
        mark = "CORE" if i < WINDOW else "tail"
        print(f"{i + 1:3d} {mark} {k}")
    if len(keys) < WINDOW:
        print("\nwindow not full")
    else:
        print(f"\ntail ({len(keys) - WINDOW}): rotate these into CORE "
              "over coming rounds so no gate's last driver-green row "
              "ages more than ~2 rounds")


if __name__ == "__main__":
    main()
