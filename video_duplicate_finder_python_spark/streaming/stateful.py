"""Custom stateful streaming operator: incremental exact-duplicate group
tracking over a page stream (``applyInPandasWithState``).

The batch pipeline's exact-collapse stage (operators/exact.py) groups
byte-identical texts and picks the min-url representative — the Spark
analog of the reference's duplicate-group build
(/root/reference/src/core/database.py:177-214, group rows keyed by a
content digest). This operator maintains the same groups *continuously*
over a stream: per content hash it keeps ``(rep_url, n_members)`` in
Spark state and emits a row whenever a group changes (new content seen,
member added, or a smaller url takes over as representative — keeping the
deterministic ``rep = min(url)`` invariant the batch path guarantees).

Built-in streaming ``dropDuplicates`` cannot express this: it keeps an
arbitrary first row per key and no count; here the state is the chosen
representative plus group size, i.e. the reference's duplicate-group
table as live streaming state.

Scale shape:
- groups are sharded by ``pmod(xxhash64(content_hash), n_shards)`` so
  state partitions stay balanced regardless of content skew (the hot
  boilerplate hash lands in one shard but is ONE state entry there);
- state per shard is a dict hash→(rep_url, count): 16-byte keys + a url —
  the same payload the batch SignatureStore keeps per row, held by the
  streaming state store (RocksDB-backed on a real cluster, with
  checkpointed recovery — exercised by the restart test);
- output mode is "update": only changed groups are emitted per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.exact import content_hash_col

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("content_hash", T.BinaryType(), False),
        T.StructField("rep_url", T.StringType(), False),
        T.StructField("n_members", T.LongType(), False),
    ]
)

# state = parallel arrays (hash, rep, count) — applyInPandasWithState state
# rows are flat tuples of Spark-SQL values, so a map is encoded as arrays
STATE_SCHEMA = T.StructType(
    [
        T.StructField("hashes", T.ArrayType(T.BinaryType(), False), True),
        T.StructField("reps", T.ArrayType(T.StringType(), False), True),
        T.StructField("counts", T.ArrayType(T.LongType(), False), True),
    ]
)


def _track_groups(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        hashes, reps, counts = state.get
        groups = {
            bytes(h): [r, int(c)] for h, r, c in zip(hashes, reps, counts)
        }
    else:
        groups = {}

    changed: dict[bytes, list] = {}
    for pdf in batches:
        for url, h in zip(pdf["url"], pdf["content_hash"]):
            hb = bytes(h)
            g = groups.get(hb)
            if g is None:
                groups[hb] = [url, 1]
            else:
                g[1] += 1
                if url < g[0]:  # min-url representative, as in batch
                    g[0] = url
            changed[hb] = groups[hb]

    state.update(
        (
            [h for h in groups],
            [g[0] for g in groups.values()],
            [g[1] for g in groups.values()],
        )
    )
    if changed:
        yield pd.DataFrame(
            {
                "content_hash": list(changed.keys()),
                "rep_url": [g[0] for g in changed.values()],
                "n_members": [g[1] for g in changed.values()],
            }
        )


def track_duplicate_groups(
    pages_stream: DataFrame, n_shards: int = 32
) -> DataFrame:
    """``pages_stream(url, html, ...)`` (streaming) → updates
    ``(content_hash, rep_url, n_members)``, one row per group changed in
    the micro-batch. Write with ``outputMode("update")``."""
    from ..functions.text import extract_text_col

    docs = pages_stream.select(
        "url",
        content_hash_col(extract_text_col(F.col("html"))).alias("content_hash"),
    ).withColumn("_shard", F.pmod(F.xxhash64("content_hash"), F.lit(n_shards)).cast("int"))
    return docs.groupBy("_shard").applyInPandasWithState(
        _track_groups,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
