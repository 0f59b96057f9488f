"""Source registry handling (SURVEY §2 C6/C7) — the engine's analogue
of sources_designations.csv parsing + validation
(/root/reference/designatedlands.py:354-483).

The registry drives plan construction (which layers, what precedence,
what restriction stamps); it is driver-side data, loaded to a list of
dicts and optionally to a broadcast-able DataFrame for joins (E8).
"""

from __future__ import annotations

from dataclasses import dataclass, field

RESTRICTION_COLS = ("forest_restriction", "og_restriction",
                    "mine_restriction")
VALID_LEVELS = set(range(6))
VALID_PREPROCESS = {"", "clip", "union"}


@dataclass
class Source:
    process_order: int
    designation: str
    source_id_col: str = "src_id"
    source_name_col: str = "src_name"
    forest_restriction: int = 0
    og_restriction: int = 0
    mine_restriction: int = 0
    exclude: str = ""
    preprocess_operation: str = ""
    preprocess_args: str = ""
    extras: dict = field(default_factory=dict)


# Restriction class names -> raster levels
# (/root/reference/designatedlands.py:291-298).
RESTRICTION_LOOKUP = {
    "PROTECTED": 5, "FULL": 4, "HIGH": 3,
    "MEDIUM": 2, "LOW": 1, "NONE": 0,
}

_CORE_FIELDS = {"process_order", "designation", "source_id_col",
                "source_name_col", "exclude", "preprocess_operation",
                "preprocess_args"}


def from_csv(path: str) -> list[Source]:
    """Parse a sources CSV in the reference's format
    (sources_designations.csv header: process_order, exclude,
    designation, source_id_col, source_name_col,
    forest/og/mine_restriction as CLASS NAMES, preprocess_*, plus
    download-metadata columns kept as extras). Restriction names map
    through RESTRICTION_LOOKUP (designatedlands.py:400-407); unknown
    names raise like the reference's validation (:464-483). Registry
    parsing is driver-side (a few dozen rows), like the reference."""
    import csv

    out = []
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            if not (row.get("process_order") or "").strip():
                continue
            levels = {}
            for c in RESTRICTION_COLS:
                name = (row.get(c) or "").strip().upper()
                if name not in RESTRICTION_LOOKUP:
                    raise ValueError(
                        f"Invalid {c} value {row.get(c)!r} for source "
                        f"{row.get('designation')!r} "
                        "(designatedlands.py:464-483)")
                levels[c] = RESTRICTION_LOOKUP[name]
            extras = {k: v for k, v in row.items()
                      if k not in _CORE_FIELDS
                      and k not in RESTRICTION_COLS}
            out.append(Source(
                process_order=int(row["process_order"]),
                designation=row.get("designation", ""),
                source_id_col=row.get("source_id_col") or "src_id",
                source_name_col=row.get("source_name_col") or "src_name",
                exclude=(row.get("exclude") or "").strip(),
                preprocess_operation=(
                    row.get("preprocess_operation") or "").strip(),
                preprocess_args=(
                    row.get("preprocess_args") or "").strip(),
                extras=extras,
                **levels))
    return out


def validate(sources: list[Source]) -> list[Source]:
    """Reference validation semantics:
      * excluded rows dropped first (designatedlands.py:358-362)
      * process_order must be contiguous 1..n (:456-463)
      * restriction levels in 0..5 (:465-483)
      * designations unique per process_order
      * preprocess_operation in the known set (:571-622)
    Returns the kept sources sorted by process_order; raises ValueError
    with the reference's error shapes otherwise."""
    kept = [s for s in sources if s.exclude != "T"]
    if not kept:
        raise ValueError("registry empty after exclusions")
    orders = sorted(s.process_order for s in kept)
    if orders != list(range(1, len(kept) + 1)):
        raise ValueError(
            f"process_order values are not contiguous 1..{len(kept)}: "
            f"{orders} (designatedlands.py:456-463)")
    for s in kept:
        for c in RESTRICTION_COLS:
            v = getattr(s, c)
            if v not in VALID_LEVELS:
                raise ValueError(
                    f"{s.designation}.{c}={v} not in 0..5 "
                    "(designatedlands.py:465-483)")
        if s.preprocess_operation not in VALID_PREPROCESS:
            raise ValueError(
                f"unknown preprocess_operation "
                f"{s.preprocess_operation!r} for {s.designation}")
    names = [s.designation for s in kept]
    if len(set(names)) != len(names):
        raise ValueError("duplicate designation names in registry")
    return sorted(kept, key=lambda s: s.process_order)


def to_dataframe(spark, sources: list[Source]):
    rows = [(s.process_order, s.designation, s.forest_restriction,
             s.og_restriction, s.mine_restriction) for s in sources]
    return spark.createDataFrame(
        rows, "process_order int, designation string, "
              "forest_restriction int, og_restriction int, "
              "mine_restriction int")
