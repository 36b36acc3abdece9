"""Custom stateful streaming operator: gap-based sessionization.

The reference has no stream processing (SURVEY.md §2.9); this is the
engine's template for custom stateful operators the north star requires
(``applyInPandasWithState``): per-key state lives in the state store,
events arrive as Arrow batches, and the operator decides what to emit and
what to carry — the same shape used for streaming entity resolution or
incremental advisory correlation.

Semantics: events for a key belong to one session while consecutive events
are ≤ ``gap_seconds`` apart. Closed sessions are emitted; the open tail
session is carried in state across micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = ("user_id bigint, session_start timestamp, "
                 "session_end timestamp, n_events bigint")
STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint"


def sessionize(events: DataFrame, gap_seconds: int = 60,
               key_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Streaming DataFrame of (key, ts, …) → closed-session rows."""
    gap_us = gap_seconds * 1_000_000

    def update(key, pdfs, state):
        import pandas as pd

        times = []
        for pdf in pdfs:
            times.extend(int(t.value // 1000)
                         for t in pd.to_datetime(pdf[ts_col])
                         if not pd.isna(t))  # NaT.value is -2^63: skip
        times.sort()
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = None
            n = 0
        closed = []
        for t in times:
            if last_us is None:
                start_us, last_us, n = t, t, 1
            elif t >= last_us:
                if t - last_us <= gap_us:
                    last_us, n = t, n + 1
                else:
                    closed.append((start_us, last_us, n))
                    start_us, last_us, n = t, t, 1
            elif last_us - t <= gap_us:
                # cross-batch LATE event inside the open session's gap:
                # count it (extending start backwards if needed) but
                # never move last_us backwards — that would mis-split
                # the session on the next on-time event
                n += 1
                if t < start_us:
                    start_us = t
            # else: later than the state horizon (older than gap before
            # the open session) — watermark semantics, dropped
        if start_us is not None:
            state.update((start_us, last_us, n))
        if closed:
            yield pd.DataFrame({
                "user_id": [key[0]] * len(closed),
                "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                "n_events": [c[2] for c in closed],
            })

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            update, OUTPUT_SCHEMA, STATE_SCHEMA, "append",
            GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming sequence packing — the stateful twin of llm.curate.pack_sequences
# ---------------------------------------------------------------------------

PACK_OUTPUT_SCHEMA = ("stream string, seq_id bigint, doc_id bigint, "
                      "tok_begin bigint, tok_end bigint")
PACK_STATE_SCHEMA = "next_off bigint"


def pack_sequences_stream(docs: DataFrame, seq_len: int = 128,
                          stream_col: str = "source",
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Streaming concat-and-chunk packing: each stream's running token
    offset is the ONLY state carried across micro-batches, so manifest
    rows stream out as documents arrive instead of waiting for a corpus
    snapshot. Docs are packed in ``id_col`` order within each trigger;
    when documents arrive in id order across triggers the emitted
    manifest is row-identical to the batch ``llm.curate.pack_sequences``
    (asserted in tests/test_streaming.py).

    State is one bigint per stream — bounded by stream count, not corpus
    size — hash-partitioned across executors by the group key.
    """
    ln = int(seq_len)

    def update(key, pdfs, state):
        import pandas as pd

        off = state.get[0] if state.exists else 0
        incoming = []
        for pdf in pdfs:
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if not isinstance(text, str):
                    # NULL text: the batch twin's size(split(NULL)) is
                    # NULL → explode emits nothing and the window sum
                    # skips it — emitting a 1-token 'None' row here
                    # would shift every later offset off the batch
                    # manifest
                    continue
                incoming.append((int(doc_id), len(text.split(" "))))
        incoming.sort()
        rows = []
        for doc_id, n_tok in incoming:
            first, last = off // ln, (off + n_tok - 1) // ln
            for s in range(first, last + 1):
                rows.append((key[0], s, doc_id, max(s * ln - off, 0),
                             min((s + 1) * ln, off + n_tok) - off - 1))
            off += n_tok
        state.update((off,))
        if rows:
            yield pd.DataFrame(
                rows, columns=["stream", "seq_id", "doc_id",
                               "tok_begin", "tok_end"])

    return (
        docs.groupBy(stream_col)
        .applyInPandasWithState(
            update, PACK_OUTPUT_SCHEMA, PACK_STATE_SCHEMA, "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def stream_pack(spark, source_dir: str, out_dir: str, checkpoint_dir: str,
                seq_len: int = 128) -> None:
    """File-stream harness: JSON doc records → packed-sequence manifest
    parquet, offsets carried in the checkpointed state store across
    AvailableNow runs."""
    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("multiLine", "true")
        .json(source_dir)
    )
    manifest = pack_sequences_stream(stream, seq_len=seq_len)
    (
        manifest.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
