"""Sequence packing: assign documents to fixed-token-budget packs (context
windows) — the sample-packing step of an LLM training pipeline.

Greedy contiguous packing is inherently sequential (each assignment depends
on the running total), so the scalable rendering is DETERMINISTIC CHUNKING:
docs are grouped into buckets by ``id // bucket_size`` and packed greedily
within each bucket in id order. Buckets are independent work units — the
only shuffle carries (id, token_count) pairs on the bucket key, and each
bucket is an Arrow-batched applyInPandas group (vectorized transfer, tiny
per-group Python loop over a few hundred ints). Boundary waste is at most
one under-filled pack per bucket, bounded and tunable via bucket_size.

Because the chunking is a pure function of the id (not of Spark's physical
partitioning), the full assignment is reproducible across reruns, cluster
sizes, AND engines — the DuckDB oracle replays it with a recursive CTE.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

PACK_SCHEMA = (
    "doc_id long, bucket long, pack_idx long, n_tokens long"
)


def _pack_bucket(window_tokens: int):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        packs = []
        acc = 0
        k = 0
        # Mirrors the oracle's recursive CTE exactly: the FIRST row of a
        # bucket is always pack 0 with acc=t (even if oversize), and every
        # later row applies `acc + t > window` UNCONDITIONALLY — no
        # `acc > 0` guard, so leading zero-token docs followed by an
        # oversize doc still roll to a new pack, bit-exact across engines.
        first = True
        for t in pdf["n_tokens"]:
            t = int(t)
            if first:
                acc = t
                first = False
            elif acc + t > window_tokens:
                k += 1
                acc = t
            else:
                acc += t
            packs.append(k)
        pdf["pack_idx"] = packs
        return pdf[["doc_id", "bucket", "pack_idx", "n_tokens"]]

    return fn


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col,
    window_tokens: int = 2048,
    bucket_size: int = 10000,
) -> DataFrame:
    """(doc_id, bucket, pack_idx, n_tokens): greedy pack assignment within
    deterministic id buckets. A doc larger than the window gets its own
    pack (downstream truncation/splitting is a separate policy)."""
    base = df.select(
        F.col(id_col).alias("doc_id"),
        # integer floor division (`div`), not double division truncated
        # toward zero: agrees with the oracle's `//` for negative ids and
        # is precision-safe for ids above 2^53
        F.expr(f"{id_col} div {bucket_size}").cast("long").alias("bucket"),
        token_count_col.cast("long").alias("n_tokens"),
    )
    return base.groupBy("bucket").applyInPandas(
        _pack_bucket(window_tokens), PACK_SCHEMA
    )
