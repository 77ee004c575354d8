package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shard assignment + packing offsets: the prep step for writing
  * fixed-budget training shards (sequence packing).
  *
  * A document's shard is a deterministic hash of its id — embarrassingly
  * parallel, reproducible, and size-balanced in expectation (caller sizes
  * `nShards` from corpus stats: total_budget / budget_per_shard; keeping
  * it a parameter keeps the operator lazy — no driver-side action).
  * Within a shard, documents get a deterministic order and a cumulative
  * start offset of the budget column, so a downstream writer can lay
  * out each shard's token stream without coordination. The running sum
  * is a window per shard — parallel across shards, and a shard's rows
  * are ~corpus/nShards, so no single-partition hazard.
  */
object Packing {

  /** (id, budget, shard_id, start_offset) — `start_offset` is the sum of
    * the budget column over all earlier docs of the shard (id order). */
  def assignShards(
      docs: DataFrame,
      idCol: String,
      budgetCol: String,
      nShards: Int): DataFrame = {
    val shard = Sampling.hashBucket(col(idCol), nShards).as("shard_id")
    val w = Window.partitionBy("shard_id").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), col(budgetCol), shard)
      .withColumn("start_offset", coalesce(sum(col(budgetCol)).over(w), lit(0L)))
  }
}
