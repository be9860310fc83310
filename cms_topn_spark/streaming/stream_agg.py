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
import struct
from typing import Callable, Iterator

import pandas as pd
import pyarrow as pa

from ..core.base import SketchError, merge_serialized, sketch_from_bytes
from ..operators.build import build_partials, default_ingest

COMMIT_FILE = "committed_batch_id"
STATE_FILE = "state.bin"

# Every persisted state is one self-describing frame written with a single
# atomic rename: | magic "STR1" | version u32 | batch_id i64 | sketch bytes |.
# The batch id travels INSIDE the same file as the state it reflects, so there
# is no window in which the state is folded but the commit record isn't (the
# torn-commit failure mode of a separate marker file). The standalone
# COMMIT_FILE below is only a whole-batch fast-skip hint; correctness never
# depends on it.
_FRAME = struct.Struct("<4sIq")
_FRAME_MAGIC = b"STR1"


def _write_frame(path: str, batch_id: int, state: bytes | None) -> None:
    tmp = os.path.join(os.path.dirname(path), f".{os.path.basename(path)}.tmp")
    with open(tmp, "wb") as f:
        f.write(_FRAME.pack(_FRAME_MAGIC, 1, batch_id))
        if state:
            f.write(state)
        f.flush()
        os.fsync(f.fileno())  # frame durable BEFORE it becomes visible
    os.replace(tmp, path)  # the commit point: one atomic rename
    # fsync the directory so the rename itself survives power loss — without
    # this the commit is atomic only against process crashes, not OS crashes
    dfd = os.open(os.path.dirname(path) or ".", os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _read_frame(path: str) -> tuple[int, bytes | None]:
    """(batch_id, state bytes) — (-1, None) if the file doesn't exist."""
    if not os.path.exists(path):
        return -1, None
    with open(path, "rb") as f:
        raw = f.read()
    if len(raw) < _FRAME.size:
        raise SketchError("corrupt stream state frame (short header)")
    magic, _version, batch_id = _FRAME.unpack_from(raw, 0)
    if magic != _FRAME_MAGIC:
        if raw[:4] == b"SKS1":  # a bare serialized sketch = pre-frame layout
            raise SketchError(
                "stream state file uses the pre-frame layout (raw sketch "
                "bytes); this version embeds the batch id in the state frame "
                "— delete or migrate the state directory to restart"
            )
        raise SketchError("corrupt stream state frame (bad magic)")
    payload = raw[_FRAME.size :]
    return batch_id, payload if payload else None


def _read_committed(state_dir: str) -> int:
    """Highest batch id folded into the global state (from the state frame)."""
    batch_id, _ = _read_frame(os.path.join(state_dir, STATE_FILE))
    return batch_id


def read_stream_state(state_dir: str):
    """Deserialize the current global sketch (None before the first batch)."""
    _, payload = _read_frame(os.path.join(state_dir, STATE_FILE))
    return sketch_from_bytes(payload) if payload is not None else None


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
        p = os.path.join(state_dir, STATE_FILE)
        committed, prev = _read_frame(p)
        if batch_id <= committed:
            return  # replayed batch after restart — already folded
        states = build_partials(batch_df, factory, ingest)
        acc = None
        for r in states.collect():
            if r["state"] is not None:
                acc = merge_serialized(acc, bytes(r["state"]))
        merged = merge_serialized(prev, acc)  # NULL-identity handles empty batches
        # state + batch id land in ONE rename — fold and commit are atomic
        _write_frame(p, batch_id, merged)

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
    are ``state_dir/w=<window_start_unix>.bin``, each a frame carrying the
    batch id that last folded into it: on a replay after a crash that folded
    only SOME windows of a batch, the already-at-this-batch windows are
    skipped per-file, so no window ever double-counts (exactly-once without a
    cross-file transaction). The separate COMMIT_FILE is only a fast-skip for
    fully-committed batches. Read any window with :func:`read_window_states`."""
    import pyspark.sql.functions as F

    os.makedirs(state_dir, exist_ok=True)
    value_type = dict(stream_df.dtypes)[value_col]

    def _committed_marker() -> int:
        p = os.path.join(state_dir, COMMIT_FILE)
        if not os.path.exists(p):
            return -1
        with open(p) as f:
            return int(f.read().strip())

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_id <= _committed_marker():
            return
        # rows without an event time cannot be assigned a window; letting
        # them through yields a NULL _w group whose key cannot be cast back
        # to `_w long` — the query would fail AND WEDGE (the same batch
        # replays into the same failure on every restart)
        win = (
            batch_df.where(F.col(ts_col).isNotNull())
            .withColumn("_w", F.window(F.col(ts_col), window).start.cast("long"))
            .select("_w", value_col)
        )
        states = (
            win.repartition("_w")
            .groupBy("_w")
            .applyInPandas(
                _window_partial(factory, value_col, value_type), "_w long, state binary"
            )
            .collect()
        )
        _fold_windows(state_dir, batch_id, [(r["_w"], bytes(r["state"])) for r in states])
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


def _fold_windows(state_dir: str, batch_id: int, states: list[tuple[int, bytes]]) -> None:
    """Fold per-window batch deltas into their persisted frames, idempotently:
    a window whose frame already carries this batch id is skipped, so a crash
    replay that re-delivers the batch can never double-count any window."""
    for w, delta in states:
        path = os.path.join(state_dir, f"w={w}.bin")
        folded_at, prev = _read_frame(path)
        if folded_at >= batch_id:
            continue  # this window already folded this batch (crash replay)
        _write_frame(path, batch_id, merge_serialized(prev, delta))


_SPARK_TO_ARROW = {
    "tinyint": pa.int32(),
    "smallint": pa.int32(),
    "int": pa.int32(),
    "bigint": pa.int64(),
    "float": pa.float64(),
    "double": pa.float64(),
    "string": pa.string(),
    "binary": pa.binary(),
}


def _typed_arrow(vals: pd.Series, spark_dtype: str) -> pa.Array:
    """pandas → Arrow preserving the column's DECLARED Spark type.

    pandas delivers nullable int columns as float64; re-casting to the
    declared type keeps streaming-built sketches hash-compatible with
    batch-built sketches over the same data (a string-ified or float-ified
    item encodes — and therefore hashes — differently). Types outside the
    sketch encoding table (boolean, timestamp, decimal, ...) fall back to
    their string form — the documented contract for exotic item types."""
    target = _SPARK_TO_ARROW.get(spark_dtype)
    if target is None:
        return pa.Array.from_pandas(vals.astype(str))
    arr = pa.Array.from_pandas(vals)
    if arr.type != target:
        if pa.types.is_integer(target) and pa.types.is_floating(arr.type):
            # a float64-ified int column loses bits above 2^53 BEFORE we see
            # it (pandas converts at the Arrow boundary when NULLs exist) —
            # values that large would silently count toward the wrong key
            import numpy as np

            if np.any(np.abs(arr.to_numpy(zero_copy_only=False)) > 2.0**53):
                raise ValueError(
                    f"{spark_dtype} values above 2^53 arrived as float64 "
                    "(NULL-bearing batch) and cannot be recovered exactly; "
                    "filter NULLs upstream or cast the column to string"
                )
        arr = arr.cast(target)
    return arr


def _window_partial(factory, value_col: str, value_type: str):
    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = factory()
        vals = pdf[value_col].dropna()
        if len(vals):
            arr = _typed_arrow(vals, value_type)
            default_ingest(sk, pa.RecordBatch.from_arrays([arr], ["v"]))
        return pd.DataFrame({"_w": [pdf["_w"].iloc[0]], "state": [sk.to_bytes()]})

    return run


def read_window_states(state_dir: str) -> dict[int, object]:
    """window_start_unix → deserialized sketch."""
    out = {}
    for f in os.listdir(state_dir):
        if f.startswith("w=") and f.endswith(".bin"):
            _, payload = _read_frame(os.path.join(state_dir, f))
            if payload is not None:
                out[int(f[2:-4])] = sketch_from_bytes(payload)
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
    CmsTopn, built with the value column's NATIVE type — so it merges and
    probes hash-compatibly with batch-built sketches over the same column
    (top_item is rendered as string for the fixed output schema only). Uses
    applyInPandasWithState (update mode, no timeout)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..core.cms_topn import CmsTopn

    value_type = dict(stream_df.dtypes)[value_col]

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            sk = sketch_from_bytes(bytes(state.get[0]))
        else:
            sk = CmsTopn(n, eps, conf, update="linear")
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            if len(vals):
                arr = _typed_arrow(vals, value_type)
                default_ingest(sk, pa.RecordBatch.from_arrays([arr], ["v"]))
        state.update((sk.to_bytes(),))
        top = sk.topn_list()
        yield pd.DataFrame(
            {
                # str() like top_item below: the output schema declares
                # `key string`, and a bigint key would fail the
                # pandas→Arrow conversion inside applyInPandasWithState
                "key": [str(key[0])],
                "total": [sk.total],
                "top_item": [str(top[0][0]) if top else None],
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


def keyed_quantile_stream(
    stream_df,
    key_col: str,
    value_col: str,
    qs: tuple = (0.25, 0.5, 0.75),
    q_names: tuple = ("q25", "q50", "q75"),
    k: int = 200,
):
    """Per-key streaming quantiles as a custom stateful operator — the
    NUMERIC-sketch companion to :func:`keyed_sketch_stream`: Spark manages
    one serialized KLL sketch per key through ``applyInPandasWithState``
    (update mode, no timeout), each micro-batch folds its rows into the
    key's state shuffle-free-within-the-batch, and every update emits the
    current (key, n, quantiles). ``n`` is monotone per key, so the final
    state's readout is the emission with the largest ``n`` (read it with
    ``max_by(q, n)`` over the sink). In the exact regime (``k`` ≥ any
    per-key count) the final quantiles equal ``quantile_cont`` bitwise —
    same interpolation the batch grouped form gates on; beyond it the KLL
    rank-error bound applies per key. NULL values arrive as NaN and are
    dropped inside ``add_batch``, mirroring the aggregate's NULL skip."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..core.kll import KllSketch

    if len(qs) != len(q_names):
        raise ValueError("qs and q_names must have the same length")
    qs = tuple(float(q) for q in qs)

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            sk = sketch_from_bytes(bytes(state.get[0]))
        else:
            sk = KllSketch(k)
        for pdf in pdfs:
            vals = pdf[value_col].to_numpy(dtype="float64", na_value=float("nan"))
            if len(vals):
                sk.add_batch(vals)
        state.update((sk.to_bytes(),))
        quants = sk.quantiles(qs)
        yield pd.DataFrame(
            {
                # str() key for the fixed output schema, like keyed_sketch_stream
                "key": [str(key[0])],
                "n": [sk.n],
                **{name: [v] for name, v in zip(q_names, quants)},
            }
        )

    out_schema = "key string, n long, " + ", ".join(f"{n} double" for n in q_names)
    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType="state binary",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def near_dup_stream(
    stream_df,
    index_root: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_available_now: bool = True,
):
    """Streaming NEAR-dup dedup against a growing MinHash index — the
    foreachBatch composition of the batch lifecycle (round 7): each
    micro-batch of (doc_id, text) rows

    1. computes its features ONCE (band keys + gram sets, batch-sized),
    2. emits near-dup pairs against the index built from all COMMITTED
       prior batches (operators/dedup.py incremental_near_dup — the prior
       corpus text is never re-read), and
    3. appends its own features, so the next batch dedups against
       prior ∪ this.

    The accumulated pair set equals ALL near-dup pairs of the whole corpus
    regardless of how documents were batched: the later side of every pair
    finds the earlier side in the index (or in its own batch), and no pair
    can emit twice — the earlier batch could not see the later document.
    That batching-invariance is what the gate's exact all-corpus oracle
    checks.

    Replay safety (foreachBatch is at-least-once) and multi-run growth: a
    batch's pairs and features land in a subdirectory named by (checkpoint
    lineage, batch id) with overwrite semantics, and the committed marker
    holds the MANIFEST of finished subdirectories (atomic-rename frame, as
    the fold shapes). A replayed batch (same lineage, same id) is already
    in the manifest and skips; a crashed attempt's partial subdirectory is
    not in the manifest, so it stays invisible and is overwritten on
    replay. A NEW stream run feeding the same index (fresh checkpoint over
    new files — the growing-corpus lifecycle) gets a different lineage
    key, so its restarted batch ids cannot collide with or be mistaken for
    the earlier run's — new data is never silently skipped. At scale the
    manifest becomes a table format's snapshot log (Iceberg); same idea.

    Ids must be unique across ALL runs feeding one index (the crawl
    invariant) — re-feeding already-indexed documents self-pairs are
    excluded by id, but their features would double in the index."""
    import hashlib

    from ..operators.dedup import incremental_near_dup, minhash_doc_features

    feat_root = os.path.join(index_root, "features")
    pairs_root = os.path.join(index_root, "pairs")
    os.makedirs(feat_root, exist_ok=True)
    os.makedirs(pairs_root, exist_ok=True)
    marker = os.path.join(index_root, "committed.frame")
    run_key = hashlib.md5(
        os.path.abspath(checkpoint_dir).encode()
    ).hexdigest()[:10]

    def process_batch(batch_df, batch_id: int) -> None:
        sub = f"{run_key}-b{batch_id}"
        committed = _read_manifest(marker)
        if sub in committed:
            return  # replayed after restart — pairs/features already final
        spark = batch_df.sparkSession
        feats = minhash_doc_features(
            batch_df.select(id_col, text_col), id_col, text_col
        ).localCheckpoint(eager=True)
        prior = [
            os.path.join(feat_root, d)
            for d in sorted(os.listdir(feat_root))
            if d in committed
        ]
        if prior:
            idx = spark.read.parquet(*prior)
        else:
            idx = spark.createDataFrame(
                [], "doc_id long, keys array<long>, grams array<long>"
            )
        pairs = incremental_near_dup(
            batch_df, idx, threshold, id_col, text_col, batch_feats=feats
        )
        pairs.write.mode("overwrite").parquet(os.path.join(pairs_root, sub))
        feats.write.mode("overwrite").parquet(os.path.join(feat_root, sub))
        # the commit point: manifest gains the subdir in one atomic rename
        _write_manifest(marker, batch_id, committed + [sub])

    writer = stream_df.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _write_manifest(marker: str, batch_id: int, subdirs: list[str]) -> None:
    _write_frame(marker, batch_id, "\n".join(sorted(set(subdirs))).encode())


def _read_manifest(marker: str) -> list[str]:
    """Committed subdirectory names ((lineage, batch)-keyed) — [] if no
    stream has committed on this root yet."""
    _, payload = _read_frame(marker)
    if not payload:
        return []
    return [s for s in payload.decode().split("\n") if s]


def read_near_dup_pairs(spark, index_root: str):
    """All pairs emitted by :func:`near_dup_stream` so far (committed
    batches only)."""
    pairs_root = os.path.join(index_root, "pairs")
    committed = set(_read_manifest(os.path.join(index_root, "committed.frame")))
    try:
        names = sorted(os.listdir(pairs_root))
    except OSError:
        names = []  # no stream has run on this root yet — empty, not a crash
    dirs = [os.path.join(pairs_root, d) for d in names if d in committed]
    if not dirs:
        return spark.createDataFrame([], "a_id long, b_id long")
    # distinct: a re-fed document (id-uniqueness contract violation, or a
    # deliberate reprocess) may re-emit a pair into a later run's subdir
    return spark.read.parquet(*dirs).distinct()
