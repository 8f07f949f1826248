"""Streaming exact deduplication with cross-batch state.

Training-pipeline shape: a document firehose where the same content
(mirrors, re-crawls, retries) arrives across micro-batches, and only
the first occurrence should reach the index / training set.

Two implementations, picked by durability needs:

- :func:`dedup_stream` — `dropDuplicates` on the content digest with a
  watermark bounding the state store: exactly-once within the
  watermark horizon, state evicted past it (the standard bounded-state
  streaming dedup; Spark's own dedup operator keeps one row per key in
  the state store).
- :func:`dedup_stream_stateful` — `applyInPandasWithState` with an
  explicit seen-digest set per key-group: the custom-stateful-operator
  form (GroupState timeout NoTimeout → unbounded horizon), used when
  the dedup horizon must outlive any watermark. Digests are md5 hex
  (32 B/doc of state); at web scale the state store shards by the
  digest prefix group key, so no executor holds the full set.

Both emit the SAME schema as the input plus ``content_md5`` — and both
are batch-testable with ``trigger(availableNow=True)`` + memory sink
(tests/test_dedup_stream.py proves stream ≡ batch `dropDuplicates`).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["dedup_stream", "dedup_stream_stateful"]


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-occurrence pass-through by content digest.

    State is bounded by the watermark: a duplicate arriving later than
    `watermark` after the original may pass (documented horizon).
    """
    src = docs.withColumn("content_md5", F.md5(F.col(text_col)))
    if src.isStreaming:
        src = src.withColumn("_ts", F.col(ts_col).cast("timestamp")).withWatermark(
            "_ts", watermark
        )
        return src.dropDuplicates(["content_md5"]).drop("_ts")
    return src.dropDuplicates(["content_md5"])


_N_STATE_GROUPS = 64


def dedup_stream_stateful(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unbounded-horizon streaming dedup via `applyInPandasWithState`.

    Key-groups = digest prefix buckets (so state shards evenly); each
    group's state is the set of digests seen so far. Within one batch,
    the lowest id wins (deterministic, layout-independent).
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("content_md5", T.StringType()),
        ]
    )
    state_schema = T.StructType([T.StructField("seen", T.ArrayType(T.StringType()))])

    def fn(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        # materialize the whole group before sorting: Arrow chunk
        # boundaries are arbitrary, and lowest-id-wins must hold across
        # chunks, not per chunk
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            all_rows = pd.concat(chunks, ignore_index=True).sort_values("doc_id")
            fresh = all_rows[~all_rows["content_md5"].isin(seen)]
            first = fresh.drop_duplicates(subset=["content_md5"], keep="first")
            if len(first):
                seen.update(first["content_md5"].tolist())
                state.update((sorted(seen),))
                yield first[["doc_id", "content_md5"]]
                return
        state.update((sorted(seen),))

    src = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(F.col(text_col)).alias("content_md5"),
    ).withColumn(
        "_grp",
        F.conv(F.substring("content_md5", 1, 4), 16, 10).cast("long")
        % _N_STATE_GROUPS,
    )
    return (
        src.groupBy("_grp")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
