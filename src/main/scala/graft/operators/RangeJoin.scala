package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join: match each point row with
  * every interval row of the same key whose `[start, end]` (inclusive)
  * contains the point.
  *
  * Spark plans a raw `p BETWEEN s AND e` theta join as a per-key nested
  * loop — quadratic in rows per key. This operator makes it an EQUI join:
  * intervals explode into the coarse time buckets they cover, points map
  * to their single bucket, both sides hash-join on (keys..., bucket), and
  * an exact containment filter finishes. Replication factor is
  * `len/bucketWidth + 1` per interval — pick `bucketWidth` near the
  * typical interval length so most intervals land in 1–2 buckets and
  * every bucket's population stays bounded (the equi-join then shuffles
  * O(rows), never O(rows²/key)).
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("__bucket", floor(col(pointCol) / bucketWidth).cast("long"))
    // inverted intervals can never contain a point, but Spark's sequence()
    // would happily generate a DESCENDING bucket list for them — drop them
    // before the explode rather than after the join
    val ib = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn(
      "__bucket",
      explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor(col(endCol) / bucketWidth).cast("long"))))
    pb.join(ib, keys :+ "__bucket")
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__bucket")
  }
}
