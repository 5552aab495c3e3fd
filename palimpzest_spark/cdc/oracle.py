"""Golden oracle: pure-pandas fold of the change feed over the base table
(FIXTURES.md §4). Deliberately engine-free — a different algorithm (ordered
replay) than the engine's (max-version reduce) so agreement is meaningful.
"""

from __future__ import annotations

import json

import pandas as pd

from palimpzest_spark.cdc.transform import normalize_text_series


def fold(base: pd.DataFrame, feed: pd.DataFrame) -> pd.DataFrame:
    """Apply events per key in (ts, event_seq) order: I/U upsert, D delete.

    Returns the expected public table state sorted by (conv_id, turn_idx).
    Text is normalized with the same shared routine the engine's pandas UDF
    uses, so equality is byte-exact.
    """
    state: dict[tuple, dict] = {}
    version: dict[tuple, tuple] = {}

    for row in base.itertuples(index=False):
        d = row._asdict()
        key = (d["conv_id"], int(d["turn_idx"]))
        state[key] = dict(d)
        version[key] = (d["ts"], -1)

    feed = feed.sort_values(["ts", "event_seq"], kind="mergesort")
    for row in feed.itertuples(index=False):
        d = row._asdict()
        key = (d["conv_id"], int(d["turn_idx"]))
        ver = (d["ts"], int(d["event_seq"]))
        if key in version and ver <= version[key]:
            continue  # stale (shouldn't happen when applied in order, but
            # duplicated events re-deliver the same version)
        version[key] = ver
        if d["op"] == "D":
            state[key] = None
            continue
        body = json.loads(d["payload"])
        body["conv_id"] = d["conv_id"]
        body["turn_idx"] = int(d["turn_idx"])
        state[key] = body

    rows = [v for v in state.values() if v is not None]
    out = pd.DataFrame(rows)
    if "text" in out.columns:
        out["text"] = normalize_text_series(out["text"].astype("string")).astype(object).where(
            out["text"].notna(), None
        )
    return out.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
