"""Structured Streaming sketch aggregation.

Two shapes, matching how the mergeable-state protocol meets streams:

1. **Global streaming build** (`sketch_stream_agg`): every micro-batch builds
   per-partition partials exactly like the batch path, merges them into one
   delta state, and folds that into a persisted global state under
   ``state_dir``. Batch-id high-water-marking makes the fold idempotent, so
   Spark's checkpoint/replay semantics (foreachBatch is at-least-once) yield
   exactly-once state: a replayed batch id is skipped. Restart = reopen the
   same checkpoint + state dir and keep going; the state file IS the sketch
   (read it any time with ``read_stream_state``).

2. **Keyed stateful operator** (`keyed_sketch_stream`): per-key CMS top-n via
   ``applyInPandasWithState`` — the custom-stateful-operator form for keyed
   heavy hitters with Spark-managed state. Emits the current top-1 per key on
   every update.

Merge commutativity/associativity is what makes both correct under Spark's
unordered micro-batch parallelism (SURVEY.md §2.3 protocol contract).
"""

from __future__ import annotations

import os
from typing import Callable, Iterator

import pandas as pd
import pyarrow as pa

from ..core.base import merge_serialized, sketch_from_bytes
from ..operators.build import build_partials, default_ingest

COMMIT_FILE = "committed_batch_id"
STATE_FILE = "state.bin"


def _read_committed(state_dir: str) -> int:
    p = os.path.join(state_dir, COMMIT_FILE)
    if not os.path.exists(p):
        return -1
    with open(p) as f:
        return int(f.read().strip())


def read_stream_state(state_dir: str):
    """Deserialize the current global sketch (None before the first batch)."""
    p = os.path.join(state_dir, STATE_FILE)
    if not os.path.exists(p):
        return None
    with open(p, "rb") as f:
        return sketch_from_bytes(f.read())


def _commit_state(state_dir: str, batch_id: int, state: bytes) -> None:
    # write-then-rename so readers never see a torn state
    tmp = os.path.join(state_dir, f".{STATE_FILE}.tmp")
    with open(tmp, "wb") as f:
        f.write(state)
    os.replace(tmp, os.path.join(state_dir, STATE_FILE))
    tmp = os.path.join(state_dir, f".{COMMIT_FILE}.tmp")
    with open(tmp, "w") as f:
        f.write(str(batch_id))
    os.replace(tmp, os.path.join(state_dir, COMMIT_FILE))


def sketch_stream_agg(
    stream_df,
    factory: Callable[[], object],
    state_dir: str,
    checkpoint_dir: str,
    ingest=default_ingest,
    trigger_available_now: bool = True,
):
    """Start a streaming query folding the stream into one mergeable state."""
    os.makedirs(state_dir, exist_ok=True)

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_id <= _read_committed(state_dir):
            return  # replayed batch after restart — already folded
        states = build_partials(batch_df, factory, ingest)
        acc = None
        for r in states.collect():
            if r["state"] is not None:
                acc = merge_serialized(acc, bytes(r["state"]))
        prev = None
        p = os.path.join(state_dir, STATE_FILE)
        if os.path.exists(p):
            with open(p, "rb") as f:
                prev = f.read()
        merged = merge_serialized(prev, acc)  # NULL-identity handles empty batches
        if merged is not None:
            _commit_state(state_dir, batch_id, merged)

    writer = stream_df.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_sketch_stream(
    stream_df,
    ts_col: str,
    value_col: str,
    state_dir: str,
    checkpoint_dir: str,
    factory: Callable[[], object],
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Event-time windowed sketch build: one mergeable state PER WINDOW.

    Late rows (within the watermark) fold into their window's existing state
    — merges are commutative, so late data needs no reprocessing. State files
    are ``state_dir/w=<window_start_unix>.bin``; the same batch-id high-water
    mark makes replays idempotent. Read any window any time with
    :func:`read_window_states`."""
    import pyspark.sql.functions as F

    os.makedirs(state_dir, exist_ok=True)

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_id <= _read_committed(state_dir):
            return
        win = batch_df.withColumn(
            "_w", F.window(F.col(ts_col), window).start.cast("long")
        ).select("_w", value_col)
        states = (
            win.repartition("_w")
            .groupBy("_w")
            .applyInPandas(_window_partial(factory, value_col), "_w long, state binary")
            .collect()
        )
        for r in states:
            path = os.path.join(state_dir, f"w={r['_w']}.bin")
            prev = None
            if os.path.exists(path):
                with open(path, "rb") as f:
                    prev = f.read()
            merged = merge_serialized(prev, bytes(r["state"]))
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(merged)
            os.replace(tmp, path)
        tmp = os.path.join(state_dir, f".{COMMIT_FILE}.tmp")
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, os.path.join(state_dir, COMMIT_FILE))

    return (
        stream_df.withWatermark(ts_col, watermark)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _window_partial(factory, value_col: str):
    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = factory()
        vals = pdf[value_col].dropna()
        if len(vals):
            sk.add_batch(vals.astype(str).tolist())
        return pd.DataFrame({"_w": [pdf["_w"].iloc[0]], "state": [sk.to_bytes()]})

    return run


def read_window_states(state_dir: str) -> dict[int, object]:
    """window_start_unix → deserialized sketch."""
    out = {}
    for f in os.listdir(state_dir):
        if f.startswith("w=") and f.endswith(".bin"):
            with open(os.path.join(state_dir, f), "rb") as fh:
                out[int(f[2:-4])] = sketch_from_bytes(fh.read())
    return out


def keyed_sketch_stream(
    stream_df,
    key_col: str,
    value_col: str,
    n: int = 5,
    eps: float = 0.001,
    conf: float = 0.99,
):
    """Per-key CMS top-n as a custom stateful streaming operator.

    Output per update: (key, total, top_item, top_freq). State: the serialized
    CmsTopn. Uses applyInPandasWithState (update mode, no timeout)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..core.cms_topn import CmsTopn
    from ..core import encoding as enc

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            sk = sketch_from_bytes(bytes(state.get[0]))
        else:
            sk = CmsTopn(n, eps, conf, update="linear")
        for pdf in pdfs:
            vals = pdf[value_col].dropna().astype(str).tolist()
            if vals:
                sk.add_batch(vals, type_tag=enc.TYPE_STRING)
        state.update((sk.to_bytes(),))
        top = sk.topn_list()
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "total": [sk.total],
                "top_item": [top[0][0] if top else None],
                "top_freq": [top[0][1] if top else None],
            }
        )

    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType="key string, total long, top_item string, top_freq long",
            stateStructType="state binary",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
