"""Deterministic transcript + change-feed generator (FIXTURES.md §2-3).

Everything derives from ``numpy.random.default_rng(seed)`` — no wall clock,
no external data. Generation is fully vectorized numpy + pyarrow (no Spark
needed, so tests/bench can synthesize inputs cheaply at any scale).

Properties (FIXTURES.md §3):
- base table: multi-turn conversations ``(conv_id, turn_idx, role, text,
  tool, ts)`` — the exact ``input_hint`` shape from BASELINE.json:15;
- change feed ``(op, conv_id, turn_idx, payload, ts, event_seq, partition,
  offset)`` with ~10% deletes, ~30% updates to existing keys, duplicated
  events (exactly-once test), Zipf hot-key skew (top conv_ids take ~30% of
  events — salting test), bounded out-of-order ts (LWW test), and an
  evolution segment midway that adds ``tool_args`` and widens ``turn_idx``
  int32→int64 in the payload (reconciliation test).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["", "search", "python", "browser", "calculator"])
WORDS = np.array(
    "the a spark merge turn reply tool call plan query state change event stream "
    "batch commit snapshot key value text hello world agent user model answer".split()
)

BASE_EPOCH = 1_700_000_000  # fixed epoch; no wall clock anywhere


def _texts(rng: np.random.Generator, n: int, lo: int = 4, hi: int = 14) -> np.ndarray:
    """Vectorized random sentences.

    Builds a pool of ≤200k unique sentences and indexes into it: the
    per-sentence ``join`` loop is the only non-vectorized step, and capping
    it keeps 16M-event fixture generation at ~1 min instead of ~15 (engine
    work is insensitive to text uniqueness — normalization/merge cost scales
    with length, and key-level dedup behavior comes from conv_id/turn_idx,
    not text)."""
    pool = min(n, 200_000)
    lens = rng.integers(lo, hi, pool)
    flat = rng.integers(0, len(WORDS), int(lens.sum()))
    words = WORDS[flat]
    uniq = np.empty(pool, dtype=object)
    pos = 0
    for i, ln in enumerate(lens):  # driver-side fixture synthesis, not engine path
        uniq[i] = " ".join(words[pos : pos + ln])
        pos += ln
    if pool == n:
        return uniq
    return uniq[rng.integers(0, pool, n)]


def gen_base_table(out_dir: str, n_convs: int = 200, max_turns: int = 12, seed: int = 42) -> str:
    """Write the base conversations table as parquet; returns its path."""
    rng = np.random.default_rng(seed)
    turns_per_conv = rng.integers(1, max_turns + 1, n_convs)
    conv_ids = np.repeat([f"conv-{i:08d}" for i in range(n_convs)], turns_per_conv)
    n = len(conv_ids)
    turn_idx = np.concatenate([np.arange(t) for t in turns_per_conv]).astype(np.int32)
    roles = ROLES[rng.integers(0, len(ROLES), n)]
    tools = TOOLS[rng.integers(0, len(TOOLS), n)]
    ts = (BASE_EPOCH + rng.integers(0, 86_400, n)).astype("datetime64[s]").astype("datetime64[us]")
    tbl = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(_texts(rng, n), pa.string()),
            "tool": pa.array(np.where(tools == "", None, tools), pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "conversations.parquet")
    pq.write_table(tbl, path)
    return path


def gen_change_feed(
    out_dir: str,
    n_events: int = 20_000,
    n_convs: int = 200,
    max_turns: int = 12,
    n_partitions: int = 8,
    n_files: int = 8,
    seed: int = 42,
    delete_frac: float = 0.10,
    dup_frac: float = 0.05,
    hot_frac: float = 0.01,
    hot_share: float = 0.30,
    disorder_sec: int = 600,
    evolve_at: float = 0.5,
) -> list[str]:
    """Write the change feed as ``n_files`` parquet files (ordered by
    event_seq range, so a file-based stream replays in feed order).

    Hot-key skew: ``hot_frac`` of conv_ids receive ``hot_share`` of events.
    After ``evolve_at`` of the feed, payloads add ``tool_args`` and emit
    ``turn_idx`` as int64-range values (widening test) — the *envelope*
    schema is unchanged (payload is a JSON string), as in a real binlog.
    """
    rng = np.random.default_rng(seed + 1)
    n_hot = max(1, int(n_convs * hot_frac))
    hot_ids = rng.choice(n_convs, n_hot, replace=False)
    is_hot = rng.random(n_events) < hot_share
    conv_nums = np.where(
        is_hot,
        hot_ids[rng.integers(0, n_hot, n_events)],
        rng.integers(0, n_convs, n_events),
    )
    conv_ids = np.array([f"conv-{i:08d}" for i in conv_nums], dtype=object)
    turn_idx = rng.integers(0, max_turns, n_events).astype(np.int64)

    u = rng.random(n_events)
    ops = np.where(u < delete_frac, "D", np.where(u < delete_frac + 0.30, "U", "I"))

    # event time: monotone base + bounded disorder
    base_ts = BASE_EPOCH + 100_000 + np.arange(n_events) * 3
    ts = base_ts + rng.integers(-disorder_sec, disorder_sec, n_events)
    event_seq = np.arange(n_events, dtype=np.int64)

    evolved = np.arange(n_events) >= int(n_events * evolve_at)
    roles = ROLES[rng.integers(0, len(ROLES), n_events)]
    tools = TOOLS[rng.integers(0, len(TOOLS), n_events)]
    texts = _texts(rng, n_events)

    # vectorized payload assembly (all values come from a safe vocabulary —
    # letters/digits/spaces — so plain concatenation IS valid JSON; verified
    # against json.loads in tests)
    if evolved.any():
        turn_idx = np.where(
            evolved & (np.arange(n_events) % 50 == 0), turn_idx + 2**31, turn_idx
        )
    s = pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx,
            "role": roles,
            "text": texts,
            "tool": tools,
            "seq": event_seq,
        }
    )
    tool_json = np.where(s["tool"] == "", "null", '"' + s["tool"].astype(str) + '"')
    body = (
        '{"conv_id": "' + s["conv_id"].astype(str)
        + '", "turn_idx": ' + s["turn_idx"].astype(str)
        + ', "role": "' + s["role"].astype(str)
        + '", "text": "' + s["text"].astype(str)
        + '", "tool": ' + pd.Series(tool_json, index=s.index)
    )
    evolve_extra = ', "tool_args": "{\\"q\\": ' + (s["seq"] % 97).astype(str) + '}"'
    body = body + np.where(evolved, evolve_extra, "") + "}"
    payloads = np.where(ops == "D", None, body.to_numpy(dtype=object))

    partition = (conv_nums % n_partitions).astype(np.int32)
    # per-partition monotonically increasing offsets
    offset = np.zeros(n_events, dtype=np.int64)
    for p in range(n_partitions):
        mask = partition == p
        offset[mask] = np.arange(mask.sum())

    # inject duplicates (same event re-delivered later — at-least-once source)
    n_dup = int(n_events * dup_frac)
    dup_src = rng.integers(0, n_events, n_dup)

    def _col(a, typ):
        return pa.array(a, typ)

    cols = {
        "op": _col(ops.astype(object), pa.string()),
        "conv_id": _col(conv_ids, pa.string()),
        "turn_idx": _col(turn_idx, pa.int64()),
        # large_string: >2GB of payload bytes overflows int32 offsets during
        # the sort/take at 10M+ events; parquet stores it as plain UTF8
        "payload": _col(payloads, pa.large_string()),
        "ts": _col(ts.astype("datetime64[s]").astype("datetime64[us]"), pa.timestamp("us")),
        "event_seq": _col(event_seq, pa.int64()),
        "partition": _col(partition, pa.int32()),
        "offset": _col(offset, pa.int64()),
    }
    tbl = pa.table(cols)
    dup_tbl = tbl.take(pa.array(dup_src, pa.int64()))
    full = pa.concat_tables([tbl, dup_tbl])
    # keep feed ordered by event_seq ranges across files (dups land in the
    # file of their original seq → re-delivery within/after the original)
    order = pa.compute.sort_indices(full, sort_keys=[("event_seq", "ascending")])
    full = full.take(order)

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    total = full.num_rows
    step = (total + n_files - 1) // n_files
    for i in range(n_files):
        chunk = full.slice(i * step, step)
        if chunk.num_rows == 0:
            break
        p = os.path.join(out_dir, f"feed-{i:05d}.parquet")
        pq.write_table(chunk, p)
        paths.append(p)
    return paths
