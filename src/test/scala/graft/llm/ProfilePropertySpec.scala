package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Property fuzz for [[Profile.profile]]: random frames (numeric +
  * string columns, random NULL patterns, sub-capacity cardinalities so
  * the KMV path is exact) checked against plain Scala collection stats
  * under randomized repartitioning. */
class ProfilePropertySpec extends SparkSpec {

  test("random frames match naive per-column stats") {
    val rnd = new scala.util.Random(424242)
    for (trial <- 1 to 8) {
      val n = 20 + rnd.nextInt(60)
      val rows = (0 until n).map { i =>
        Row(
          if (rnd.nextInt(5) == 0) null else java.lang.Long.valueOf(rnd.nextInt(30).toLong),
          if (rnd.nextInt(4) == 0) null else s"s${rnd.nextInt(20)}",
          java.lang.Double.valueOf(rnd.nextInt(40) / 4.0)) // < 64 distinct: KMV exact
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1 + rnd.nextInt(7)),
        StructType(Seq(
          StructField("v", LongType, nullable = true),
          StructField("s", StringType, nullable = true),
          StructField("d", DoubleType, nullable = false))))
      val got = Profile.profile(df).collect().map(r => r.getString(0) -> r).toMap

      val vs = rows.map(_.get(0)).filter(_ != null).map(_.asInstanceOf[Long])
      val ss = rows.map(_.get(1)).filter(_ != null).map(_.asInstanceOf[String])
      val ds = rows.map(_.get(2)).map(_.asInstanceOf[Double])

      val v = got("v")
      assert(v.getLong(1) == n && v.getLong(2) == n - vs.size)
      assert(v.getLong(3) == vs.distinct.size && v.getBoolean(4))
      assert(v.getDouble(5) == vs.min.toDouble && v.getDouble(6) == vs.max.toDouble)

      val s = got("s")
      assert(s.getLong(2) == n - ss.size && s.getLong(3) == ss.distinct.size)
      assert(s.getString(7) == ss.min && s.getString(8) == ss.max)
      assert(s.getLong(9) == ss.map(_.length.toLong).sum)

      val d = got("d")
      assert(d.getLong(2) == 0 && d.getLong(3) == ds.distinct.size && d.getBoolean(4))
      assert(d.getDouble(5) == ds.min && d.getDouble(6) == ds.max)
    }
  }
}
