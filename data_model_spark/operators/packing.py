"""Training-sequence packing: concat-and-chunk over sharded document streams.

Pretraining pipelines do not feed documents one-per-row; they CONCATENATE
the tokenized stream and cut fixed-capacity training sequences (the
GPT/T5 "packing" step — every token lands in exactly one sequence, and a
document may straddle a boundary).  This operator computes, per document,
its placement in that packed stream: which sequences it touches and at
what offset it starts.

Spark shape: documents are hash-sharded (``md5_60(doc_id) % n_shards``,
the cross-engine hash primitive — the packing unit a 10^12-doc corpus needs anyway: shards pack
independently and in parallel, shard count scales with the corpus), then
ONE window cumulative sum per shard ordered by ``doc_id`` turns packing
into pure integer arithmetic:

    cum_end   = sum(n_tok) over (shard order by doc_id)
    start_seq = (cum_end - n_tok) div capacity
    end_seq   = (cum_end - 1)     div capacity

Pure INTEGER division (``div``), not a double divide + floor: the cumsum
is an int64 and stays exact at any corpus size, whereas a double round
trip loses exactness once a shard's token stream passes 2^53 (~9e15
tokens — within 100x of a 10^12-doc corpus at 8 shards).

No Python, no iteration, one shuffle (the window's shard partitioning);
map-side token counting reuses the whitespace tokenizer convention of
``operators/text.py``.  Deterministic at any parallelism — the order is
(shard, doc_id), not partition order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .dedup import MD5_60_SQL, md5_60
from .registry import register

N_SHARDS = 8
CAPACITY = 256  # tokens per packed training sequence


def pack_sequences(
    docs: DataFrame, capacity: int = CAPACITY, n_shards: int = N_SHARDS
) -> DataFrame:
    """Per-document placement in the packed token stream of its shard."""
    toks = docs.select(
        "doc_id",
        F.pmod(md5_60(F.col("doc_id").cast("string")), F.lit(n_shards)).alias("shard"),
        F.size(F.split(F.trim("text"), " +")).alias("n_tok"),
    ).filter(F.col("n_tok") > 0)
    w = Window.partitionBy("shard").orderBy("doc_id")
    cum_end = F.sum("n_tok").over(w)
    return (
        toks.withColumn("_cum_end", cum_end)
        .select(
            "shard",
            "doc_id",
            "n_tok",
            F.expr(f"(_cum_end - n_tok) div {capacity}").alias("start_seq"),
            F.pmod(F.col("_cum_end") - F.col("n_tok"), F.lit(capacity)).alias(
                "start_off"
            ),
            F.expr(f"(_cum_end - 1) div {capacity}").alias("end_seq"),
        )
        .withColumn("n_seqs", F.col("end_seq") - F.col("start_seq") + F.lit(1))
    )


_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id,
         {MD5_60_SQL.format(col="CAST(doc_id AS VARCHAR)")} % {N_SHARDS} AS shard,
         len(string_split_regex(trim(text), ' +')) AS n_tok
  FROM documents WHERE len(string_split_regex(trim(text), ' +')) > 0
), c AS (
  SELECT shard, doc_id, n_tok,
         SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id) AS cum_end
  FROM t
)
SELECT shard, doc_id, n_tok,
       CAST((cum_end - n_tok) // {CAPACITY} AS BIGINT) AS start_seq,
       CAST((cum_end - n_tok) % {CAPACITY} AS BIGINT) AS start_off,
       CAST((cum_end - 1) // {CAPACITY} AS BIGINT) AS end_seq,
       CAST((cum_end - 1) // {CAPACITY} AS BIGINT)
         - CAST((cum_end - n_tok) // {CAPACITY} AS BIGINT) + 1 AS n_seqs
FROM c"""


@register("pack_sequences", _PACK_SQL)
def pack_sequences_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing placements over the documents table."""
    return pack_sequences(load_table(spark, sf_dir, "documents"))
