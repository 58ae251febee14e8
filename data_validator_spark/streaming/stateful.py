"""Custom stateful streaming operator: cross-batch clip_id uniqueness.

The batch path's uniqueness check (operators/dedup.flag_duplicates)
sees the whole table; the incremental path (incremental.py) scopes
windows to one micro-batch, so a duplicate arriving in a LATER batch
than its first occurrence was only catchable by the next full batch
run. This module closes that gap with `applyInPandasWithState`: state
keyed on clip_id carries (n_seen, first_seen order) across
micro-batches AND across availableNow restarts (state lives in the
streaming checkpoint), so re-ingested duplicates are flagged the
moment they arrive.

Scale notes: state is one tiny row per distinct clip_id, partitioned
by the grouping key across executors (RocksDB/HDFS state store on a
real cluster); the payload column must be dropped before this stage —
only (clip_id, order_col) enter the state operator.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType()),
        T.StructField("ingest_seq", T.LongType()),
        T.StructField("dup_rank", T.IntegerType()),  # 0 = first occurrence
        T.StructField("dup_label", T.StringType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_seen", T.LongType()),
        T.StructField("first_seq", T.LongType()),
    ]
)


def streaming_dedup_flags(
    stream: DataFrame,
    key_col: str = "clip_id",
    order_col: str = "ingest_seq",
) -> DataFrame:
    """-> streaming (clip_id, ingest_seq, dup_rank, dup_label): rows
    beyond a key's first occurrence get `duplicate_clip_id(<rank>)`,
    matching the batch dedup label family. State survives restarts via
    the query checkpoint, so uniqueness is global across every batch
    ever processed under that checkpoint."""

    def flag(key, pdfs, state: GroupState):
        (clip_id,) = key
        if state.exists:
            n_seen, first_seq = state.get
        else:
            n_seen, first_seq = 0, None
        # applyInPandasWithState may deliver one group's micro-batch
        # rows across MULTIPLE chunks; ranking per chunk would follow
        # chunk-arrival order, not order_col. Accumulate and sort ONCE
        # (a group's rows within one micro-batch are few — state and
        # groups are tiny; the 10^12-row table has ~1 row per clip_id).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            state.update((n_seen, first_seq))
            return
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values(order_col)
        seqs = pdf[order_col].tolist()
        ranks, labels = [], []
        for s in seqs:
            if first_seq is None:
                first_seq = int(s)
            if n_seen == 0:
                ranks.append(0)
                labels.append(None)
            else:
                ranks.append(n_seen)
                labels.append(f"duplicate_clip_id({n_seen})")
            n_seen += 1
        yield pd.DataFrame(
            {
                "clip_id": clip_id,
                "ingest_seq": seqs,
                "dup_rank": pd.array(ranks, dtype="int32"),
                "dup_label": labels,
            }
        )
        state.update((n_seen, first_seq))

    proj = stream.select(
        F.col(key_col).cast("string").alias("clip_id"),
        F.col(order_col).cast("long").alias("ingest_seq"),
    )
    return proj.groupBy("clip_id").applyInPandasWithState(
        flag,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
