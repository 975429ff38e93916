package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Training-data export: the last stage of a corpus pipeline — hand
  * the cleaned/deduped/packed corpus to a training job as sharded,
  * compressed JSONL (the lingua franca of LLM data loaders).
  *
  * Shard discipline matters at 100 TB: loaders stream shards
  * round-robin across workers, so shards must be (a) bounded in size,
  * (b) deterministic for a given corpus, and (c) balanced. Rows are
  * range-partitioned by the sort key into ceil(n / maxPerShard)
  * shards — range, not hash, so each shard is a contiguous key run
  * and a resumable loader can checkpoint "finished shard k".
  */
object Export {

  /** Write `df` as gzip JSONL shards of at most ~maxPerShard rows,
    * ordered by `keyCol` within and across shards. Returns the shard
    * count. Exact per-shard row caps would need a global row-number
    * (one-task bottleneck); range partitioning gives the same
    * contract probabilistically via sampled split points — the
    * documented trade for a shuffle-free-scalable export.
    */
  def exportJsonl(df: DataFrame, keyCol: String, dir: String,
      maxPerShard: Long): Int = {
    val n = df.count()
    val shards = math.max(1, math.ceil(n.toDouble / maxPerShard).toInt)
    df.repartitionByRange(shards, col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .write.mode(SaveMode.Overwrite)
      .option("compression", "gzip")
      .json(dir)
    shards
  }
}
