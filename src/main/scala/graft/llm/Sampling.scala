package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling and split assignment.
  *
  * Training-data pipelines must sample *reproducibly*: `df.sample()` draws
  * from a per-partition RNG, so results change with partitioning, retries,
  * and cluster size — unusable for a train/val/test split that has to stay
  * stable across reruns and engines. These operators derive the sampling
  * decision from the row's own id with pure integer arithmetic
  * (multiply-mod a 30-bit prime, same family as [[TextHash]]), so a row's
  * split is a function of the row alone: portable to the DuckDB oracle,
  * stable under repartitioning, and embarrassingly parallel (a projection,
  * no shuffle).
  */
object Sampling {

  /** Pseudo-random bucket in [0, buckets) from an integer id. */
  def hashBucket(id: Column, buckets: Int): Column =
    pmod((id * 1000003L + 17L) % TextHash.Prime, lit(buckets.toLong))

  /** Deterministic fractional sample: keeps ~`pct`% of rows. */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(idCol), 100) < pct)

  /** Train/val/test split assignment: (id, bucket, split) where split is
    * 'train' for the first `trainPct` buckets, 'val' for the next
    * `valPct`, 'test' for the rest. */
  def split(df: DataFrame, idCol: String, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct + valPct < 100, "train + val must leave room for test")
    val b = hashBucket(col(idCol), 100)
    df.select(
      col(idCol),
      b.as("bucket"),
      when(b < trainPct, lit("train"))
        .when(b < trainPct + valPct, lit("val"))
        .otherwise(lit("test")).as("split"))
  }
}
