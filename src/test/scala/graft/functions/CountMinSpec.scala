package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min guarantees against exact counts: never-underestimate, the
  * additive error bound, bit-identical grids under any partitioning, and
  * point estimates through the Column surface. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val Depth = 4
  private val Width = 64

  private def grid(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.agg(CountMin(col("item"), Depth, Width).as("sk"))
      .head().getSeq[Long](0)

  test("never underestimates, and exact when an item's buckets are collision-free") {
    // seeded random multiset over a vocabulary small enough to verify
    val rnd = new scala.util.Random(42)
    val items = Seq.fill(5000)(s"tok${rnd.nextInt(300)}")
    val df = items.toDF("item")
    val sk = grid(df)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = items.size.toLong
    for ((item, t) <- exact) {
      val h = GraftHashOps.polyHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(item))
      val est = (0 until Depth).map(r => sk(r * Width + CountMin.bucket(h, r, Width))).min
      assert(est >= t, s"$item: est $est < true $t")
      // CM bound: est <= true + n/width per row in expectation; assert the
      // hard worst case est <= n (sanity) and the min-row bound loosely
      assert(est <= t + n, item)
    }
    // grid mass: every row sums to n
    for (r <- 0 until Depth)
      assert((0 until Width).map(b => sk(r * Width + b)).sum == n)
  }

  test("grid is bit-identical under any partitioning (merge = elementwise add)") {
    val items = (0 until 2000).map(i => s"w${i % 97}")
    val df1 = items.toDF("item")
    assert(grid(df1) == grid(df1.repartition(13)))
    assert(grid(df1) == grid(df1.repartition(1)))
  }

  test("estimateCol matches the hand min-of-rows and is exact on a sparse vocab") {
    val items = Seq.fill(50)("alpha") ++ Seq.fill(7)("beta") ++ Seq("gamma")
    val df = items.toDF("item")
    val sketch = df.agg(CountMin(col("item"), Depth, Width).as("sk"))
    val probes = Seq("alpha", "beta", "gamma", "absent").toDF("item")
    val got = probes.crossJoin(broadcast(sketch))
      .select(col("item"), CountMin.estimateCol(col("sk"), col("item"), Depth, Width).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3 distinct items in 4x64 buckets: near-certainly collision-free,
    // but assert only the guaranteed direction plus the known seeds
    assert(got("alpha") >= 50 && got("beta") >= 7 && got("gamma") >= 1)
    assert(got("absent") >= 0)
    // min-of-rows by hand
    val sk = sketch.head().getSeq[Long](0)
    for ((item, est) <- got) {
      val h = GraftHashOps.polyHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(item))
      val hand = (0 until Depth).map(r => sk(r * Width + CountMin.bucket(h, r, Width))).min
      assert(est == hand, item)
    }
  }

  test("nulls are ignored; empty input yields the zero grid") {
    val df = Seq(Some("x"), None, Some("x"), None).toDF("item")
    val sk = grid(df)
    assert(sk.sum == 2L * Depth)
    val empty = grid(Seq.empty[String].toDF("item"))
    assert(empty.forall(_ == 0L) && empty.size == Depth * Width)
  }
}
