package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Training-data export: the last stage of a corpus pipeline — hand
  * the cleaned/deduped/packed corpus to a training job as sharded,
  * compressed JSONL (the lingua franca of LLM data loaders).
  *
  * Shard discipline matters at 100 TB: loaders stream shards
  * round-robin across workers and checkpoint "finished shard k", so
  * shard MEMBERSHIP must be a pure function of the data — which rules
  * out `repartitionByRange` (its split points come from seeded
  * sampling; a re-export can move boundary rows between shards and a
  * resuming loader would skip or double-read them). Instead the shard
  * id is computed: fixed-width ranges of the unique numeric key, so
  * every row's shard follows from (min, max, n) alone.
  */
object Export {

  /** Write `df` as gzip JSONL under `dir/shard=k/`, each shard a
    * contiguous range of `keyCol`, ordered within the shard.
    * Returns the shard count.
    *
    * Contract: `keyCol` is a unique numeric key (doc_id, pack_id) —
    * uniqueness makes the per-shard row bound hold; DENSE keys (the
    * shape a packed/renumbered corpus has) additionally make shards
    * balanced. The input plan is persisted across the two passes
    * (bounds aggregate + write) so an expensive upstream pipeline
    * runs once, not twice.
    */
  def exportJsonl(df: DataFrame, keyCol: String, dir: String,
      maxPerShard: Long): Int = {
    require(maxPerShard > 0, s"maxPerShard must be positive: $maxPerShard")
    df.persist()
    try {
      val r = df.agg(min(col(keyCol)).cast("long"),
        max(col(keyCol)).cast("long"), count(lit(1))).collect().head
      if (r.isNullAt(0)) return 0 // empty corpus: nothing to write
      val (lo, hi, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val shards = math.max(1, math.ceil(n.toDouble / maxPerShard).toInt)
      val width = math.max(1L, (hi - lo) / shards + 1)
      // integer `div`, not `/` (long / long is double division in Spark SQL)
      df.withColumn("shard",
          expr(s"CAST((CAST($keyCol AS BIGINT) - $lo) div $width AS INT)"))
        .repartition(shards, col("shard"))
        .sortWithinPartitions(col("shard"), col(keyCol))
        .write.mode(SaveMode.Overwrite)
        .option("compression", "gzip")
        .partitionBy("shard")
        .json(dir)
      shards
    } finally df.unpersist()
  }
}
