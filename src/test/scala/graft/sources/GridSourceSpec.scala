package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GridSourceSpec extends SparkSpec {
  import spark.implicits._

  private def grid(parts: Int = 4) = spark.read
    .format(classOf[GridSource].getName)
    .option("latMin", "-6").option("latMax", "-4")
    .option("lonMin", "28").option("lonMax", "31")
    .option("resolution", "0.05")
    .option("numPartitions", parts.toString)
    .load()

  test("generates every cell center of the configured grid, distributed") {
    val df = grid()
    assert(df.count() == 40L * 60L) // 2° × 3° at 0.05°
    assert(df.rdd.getNumPartitions == 4)
    val expected = (for (i <- 0 until 40; j <- 0 until 60)
      yield (math.rint((-6.0 + (i + 0.5) * 0.05) * 1000) / 1000,
        math.rint((28.0 + (j + 0.5) * 0.05) * 1000) / 1000)).toSet
    assert(df.as[(Double, Double)].collect().toSet == expected)
  }

  test("range predicates push into the generator's index bounds") {
    val filtered = grid().filter(
      col("latitude") >= -5.0 && col("latitude") < -4.5 &&
        col("longitude").between(29.0, 30.0))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("GridScan(latIdx="), s"expected pruned scan:\n$plan")
    assert(!plan.contains("latIdx=[0,40)"), s"lat bounds were not pruned:\n$plan")
    // pruned scan result == unpruned scan + post-filter
    val brute = grid().collect().filter(r =>
      r.getDouble(0) >= -5.0 && r.getDouble(0) < -4.5 &&
        r.getDouble(1) >= 29.0 && r.getDouble(1) <= 30.0)
    assert(filtered.count() == brute.length)
    assert(filtered.count() == 10L * 20L) // 0.5° × 1.0° of cells, inclusive lon bounds
  }

  test("an empty pruned range yields zero rows, not an error") {
    assert(grid().filter(col("latitude") > 100.0).count() == 0)
  }

  test("reported statistics are pruning-exact and make a small ROI grid broadcastable") {
    val small = grid().filter(col("latitude") >= -5.0 && col("latitude") < -4.5)
    val rel = small.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }
    assert(rel.head.stats.rowCount.contains(BigInt(600))) // 10 lat × 60 lon cells
    assert(rel.head.stats.sizeInBytes == BigInt(600 * 16))
    // a 20M-cell grid joined with the 600-cell ROI: the reported sizes must
    // put the ROI side under the broadcast threshold (without statistics a
    // DSv2 relation defaults to Long.Max bytes → sort-merge join)
    val big = spark.read.format(classOf[GridSource].getName)
      .option("latMin", "-20").option("latMax", "20")
      .option("lonMin", "0").option("lonMax", "50")
      .option("resolution", "0.01").option("numPartitions", "8")
      .load()
    val plan = big.join(small, Seq("latitude", "longitude"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }
}
