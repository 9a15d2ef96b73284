"""Training-sequence packing: assign documents to fixed-length context
windows (GPT-style concat-and-chunk) — the step between a cleaned corpus
and a tokenized training shard.

Semantics: within each shard, documents are concatenated in deterministic
(id) order and the token stream is chunked into ``ctx_len``-token windows.
Each document reports its start offset in the shard's stream, the window
(pack) its first token lands in, and how many windows it spans.

Scale design: the running sum is a window function partitioned by
``shard_col`` — shards pack independently and in parallel, so there is no
global single-partition sort at 100 TB (one shard = one training-data file,
the same parallel unit a tokenizer fleet uses). A None shard packs the
whole input as one shard and is for small/verification use only."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datalakefoundation_spark.ext.text import token_count


def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str | None = "source",
    ctx_len: int = 2048,
) -> DataFrame:
    """(id, shard, n_tokens, start_offset, pack_id, packs_spanned)."""
    n = token_count(text_col)
    part = [shard_col] if shard_col else [F.lit(1)]
    w = (
        Window.partitionBy(*part)
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    out = df.select(
        F.col(id_col),
        *([F.col(shard_col)] if shard_col else []),
        n.cast("long").alias("n_tokens"),
    ).withColumn("start_offset", start)
    first_pack = F.floor(F.col("start_offset") / ctx_len)
    last_pack = F.floor(
        (F.col("start_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1) / ctx_len
    )
    return (
        out.withColumn("pack_id", first_pack.cast("long"))
        .withColumn("packs_spanned", (last_pack - first_pack + 1).cast("long"))
    )
