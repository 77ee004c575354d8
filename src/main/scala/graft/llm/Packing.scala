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

  /** Cross-document sequence packing spans — the "concatenate the corpus,
    * split every `seqLen` tokens" layout pretraining loaders use (docs
    * flow into sequences back-to-back; a document can straddle a
    * boundary). Per document: its token count, global start offset in the
    * concatenated stream (id order), and the first/last sequence it
    * touches — everything a writer needs to emit its slice of any
    * sequence without coordination, and everything an auditor needs to
    * count boundary-crossing documents.
    *
    * The global running offset uses [[graft.scale.Prefix]]'s two-phase
    * range-parallel prefix sum — a bare `sum over (order by doc_id)`
    * window would move the whole corpus to one partition. The span
    * arithmetic is then pure integer DIV, engine-exact. The tokenizer
    * never yields zero tokens (empty text still tokenizes to one empty
    * token), so every document spans at least one sequence.
    *
    * @return (doc_id, n_tokens, start_offset, first_seq, last_seq, n_seqs)
    */
  def sequenceSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      seqLen: Int = 128): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val toks = docs.select(col(idCol).as("doc_id"),
      size(graft.llm.TextHash.wordTokens(col(textCol))).cast("long").as("n_tokens"))
    graft.scale.Prefix.exclusiveRunningTotal(toks, "doc_id", "n_tokens", "start_offset")
      .withColumn("first_seq", expr(s"start_offset DIV $seqLen"))
      .withColumn("last_seq", expr(s"(start_offset + n_tokens - 1) DIV $seqLen"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1)
  }
}
