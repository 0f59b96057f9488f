"""As-of (merge_asof) join — SURVEY §2 E-note: exposed because the
target input is timestamped (warc_ts latest-capture semantics) even
though the reference has no temporal joins.

Cogrouped pandas implementation with numpy searchsorted: both sides
shuffle once on the equi-key, then each group is a sorted-array binary
search — no window spill, no range-join blowup. The right side's
columns (minus key/ts) are appended; unmatched left rows get nulls
(left-outer semantics)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str,
              direction: str = "backward") -> DataFrame:
    """Directions (deterministic among equal right_ts values):

    * ``backward`` — latest right with right_ts <= left_ts; among
      equal right_ts the LAST row in (ts, payload) order wins.
    * ``forward`` — earliest right with right_ts >= left_ts; among
      equal right_ts the FIRST row in (ts, payload) order wins
      (the mirror of backward's rule).
    * ``nearest`` — whichever of the backward/forward matches has the
      smaller |right_ts - left_ts|; exact ties resolve BACKWARD.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction {direction!r}")
    extra = [c for c in right.columns if c not in (on,)]
    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}"
         for f in left.schema.fields]
        + [f"`{c}` {right.schema[c].dataType.simpleString()}"
           for c in extra])

    def merge(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame):
        if len(lpdf) == 0:
            return pd.DataFrame(columns=list(lpdf.columns) + extra)
        out = lpdf.copy()
        if len(rpdf) == 0:
            for c in extra:
                out[c] = None
            return out
        # Sort by (ts, payload...) — not ts alone — so the row chosen
        # among equal right_ts values is deterministic regardless of
        # the incoming partition-dependent row order (cross-engine
        # determinism rule; backward picks the LAST among equals,
        # forward the FIRST).
        cols = [right_ts] + [c for c in extra if c != right_ts]
        try:
            r = rpdf.sort_values(cols, kind="mergesort")
        except TypeError:  # unorderable payload type: ts-only order
            r = rpdf.sort_values(right_ts, kind="mergesort")
        rts = r[right_ts].to_numpy()
        lts = lpdf[left_ts].to_numpy()
        bi = np.searchsorted(rts, lts, side="right") - 1
        fi = np.searchsorted(rts, lts, side="left")
        if direction == "backward":
            idx = bi
        elif direction == "forward":
            idx = np.where(fi < len(rts), fi, -1)
        else:  # nearest: tie -> backward
            bd = np.where(bi >= 0,
                          lts - rts[np.clip(bi, 0, None)], np.inf)
            fd = np.where(fi < len(rts),
                          rts[np.clip(fi, None, len(rts) - 1)] - lts,
                          np.inf)
            use_f = (fd < bd) & np.isfinite(fd)
            idx = np.where(use_f, np.clip(fi, None, len(rts) - 1), bi)
            idx = np.where(np.isfinite(np.minimum(bd, fd)), idx, -1)
        for c in extra:
            vals = r[c].to_numpy()
            col = np.where(idx >= 0, vals[np.clip(idx, 0, None)], None)
            out[c] = col
        return out

    return (left.groupBy(on)
            .cogroup(right.groupBy(on))
            .applyInPandas(merge, schema))
