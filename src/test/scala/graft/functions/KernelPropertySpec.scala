package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-fuzz for the hand-rolled aggregation/vector kernels — the
  * example-based equivalence specs ([[ArgMaxRowSpec]], [[VecFunctionsSpec]])
  * pin the known edge cases; these generate the NaN/null/±0.0/tie lattice
  * at random and assert the kernels stay value-identical to the built-in
  * formulations they replace. Raw ScalaCheck generators with a fixed seed
  * (scalatestplus bridge is not on the classpath), so failures reproduce.
  *
  * Each generated frame is `repartition(5)`ed so partial buffers always
  * cross an exchange (serialize/deserialize/merge paths run), and value
  * domains are kept tiny so full-tuple ties occur constantly — ties are
  * exactly where a hand-rolled comparison rots.
  */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private def gen[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).getOrElse(sys.error("generator failed"))

  // ---------- ArgMaxRow / ArgMaxRowAny vs max(struct(...)) ----------

  /** doubles biased to collide: specials + a 5-value lattice */
  private val doubleGen: Gen[Double] = Gen.frequency(
    3 -> Gen.oneOf(0.0, -0.0, 1.5, -1.5, 2.0),
    1 -> Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      Double.MinPositiveValue, Double.MaxValue))

  private val intOrNullGen: Gen[java.lang.Integer] = Gen.frequency(
    4 -> Gen.chooseNum(-2, 2).map(Int.box),
    1 -> Gen.const(null: java.lang.Integer))

  private val strOrNullGen: Gen[String] = Gen.frequency(
    4 -> Gen.oneOf("a", "b", "zz", "", "é"),
    1 -> Gen.const(null: String))

  private val rowGen: Gen[(Int, java.lang.Integer, Double, String)] = for {
    g <- Gen.chooseNum(0, 40)
    a <- intOrNullGen
    b <- doubleGen
    p <- strOrNullGen
  } yield (g, a, b, p)

  private def randomFrame(seed: Long): DataFrame =
    gen(Gen.chooseNum(150, 400).flatMap(n => Gen.listOfN(n, rowGen)), seed)
      .toDF("g", "a", "b", "p").repartition(5)

  /** null-safe, NaN-safe, −0.0-normalizing view of one result row: a
    * FULL-tuple tie is partition-order dependent only in b's sign bit
    * (Spark orders −0.0 = 0.0), so zeros normalize before comparing */
  private def norm(r: Row): (Int, Any, Any, Any) = {
    val m = r.getStruct(1)
    (r.getInt(0),
      if (m.isNullAt(0)) null else m.getInt(0),
      if (m.isNullAt(1)) null
      else {
        val x = m.getDouble(1)
        if (x.isNaN) "NaN"
        else java.lang.Double.doubleToLongBits(if (x == 0.0) 0.0 else x)
      },
      if (m.isNullAt(2)) null else m.getString(2))
  }

  private def viaMaxStruct(df: DataFrame): Set[(Int, Any, Any, Any)] =
    df.groupBy("g")
      .agg(max(struct(col("a"), col("b"), col("p"))).as("m"))
      .collect().map(norm).toSet

  test("ArgMaxRow == max(struct) on random null/NaN/±0.0/tie-heavy frames") {
    for (seed <- Seq(1L, 2L, 3L, 4L)) {
      val df = randomFrame(seed)
      val got = df.groupBy("g")
        .agg(ArgMaxRow(Seq(col("a"), col("b"), col("p")),
          Seq("a" -> 0, "b" -> 1, "p" -> 2)).as("m"))
        .collect().map(norm).toSet
      assert(got == viaMaxStruct(df), s"seed $seed diverged")
    }
  }

  test("ArgMaxRowAny == max(struct) on random null/NaN/±0.0/tie-heavy frames") {
    for (seed <- Seq(11L, 12L, 13L, 14L)) {
      val df = randomFrame(seed)
      val got = df.groupBy("g")
        .agg(ArgMaxRowAny(Seq(col("a"), col("b"), col("p")),
          Seq("a" -> 0, "b" -> 1, "p" -> 2)).as("m"))
        .collect().map(norm).toSet
      assert(got == viaMaxStruct(df), s"seed $seed diverged")
    }
  }

  // ---------- nearestSqDist / bestCosine vs built-in argmin/argmax ----------

  /** vector components: mostly small lattice values (tie-prone), plus NaN
    * and ±0.0; infinities excluded only for cosine (inf/inf = NaN there in
    * BOTH formulations, but inf*0 ordering inside dot differs by no fold —
    * kept for sqDist where the fold orders are pinned identical) */
  private def compGen(specials: Seq[Double]): Gen[Double] = Gen.frequency(
    6 -> Gen.oneOf(0.0, -0.0, 0.5, -1.0, 2.0),
    1 -> Gen.oneOf(specials))

  private def vecsOf(seed: Long, dim: Int, n: Int, specials: Seq[Double]): Seq[Seq[Double]] =
    gen(Gen.listOfN(n, Gen.listOfN(dim, compGen(specials)).map(_.toSeq)), seed)

  test("nearestSqDist == least(struct(dist, idx)) on random vectors incl NaN/±0.0/inf") {
    val dim = 6
    val specials = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)
    for (seed <- Seq(21L, 22L, 23L)) {
      val cents = vecsOf(seed * 100 + 1, dim, 4, specials)
      val flat = cents.flatten.toArray
      val vecs = vecsOf(seed, dim, 120, specials).zipWithIndex
        .map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "v").repartition(5)
      val perCent = cents.zipWithIndex.map { case (c, i) =>
        struct(HashFunctions.sqDist(col("v"), typedLit(c.toArray)).as("d"),
          lit(i).as("i")).as(s"s$i")
      }
      val bad = vecs.select(col("vec_id"),
          least(perCent: _*).getField("i").as("ri"),
          least(perCent: _*).getField("d").as("rd"),
          HashFunctions.nearestSqDist(col("v"), typedLit(flat), dim).as("nd"))
        .filter(col("ri") =!= col("nd").getItem(0).cast("int") ||
          not(col("rd") === col("nd").getItem(1)))
        .count()
      assert(bad == 0, s"seed $seed: $bad vectors diverged")
    }
  }

  test("bestCosine == greatest(struct(cos, -idx)) on random vectors incl NaN/±0.0") {
    val dim = 6
    // no infinities: cosine normalization makes inf/inf NaN identically in
    // both formulations, but all-zero centroids (norm 0) are the realistic
    // degenerate — include them via the lattice's zero bias
    val specials = Seq(Double.NaN, Double.MinPositiveValue)
    for (seed <- Seq(31L, 32L, 33L)) {
      // production filters norm > 0 on both sides (Similarity's documented
      // contract) and ANSI mode turns a zero divisor into an error, so
      // all-zero rows are excluded here too: zero-norm centroids get a
      // unit first component, zero-norm corpus vectors are dropped
      val cents = vecsOf(seed * 100 + 7, dim, 4, specials)
        .map(c => if (c.forall(_ == 0.0)) 1.0 +: c.tail else c)
      val flat = cents.flatten.toArray
      val ncs = cents.map(c => math.sqrt(c.map(x => x * x).sum)).toArray
      val vecs = vecsOf(seed, dim, 120, specials)
        .filter(v => !v.forall(_ == 0.0)).zipWithIndex
        .map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "v").repartition(5)
      val norm: Column = sqrt(HashFunctions.dot(col("v"), col("v")))
      val perCent = cents.zipWithIndex.map { case (c, i) =>
        struct(
          (HashFunctions.dot(col("v"), typedLit(c.toArray)) / (norm * ncs(i))).as("cos"),
          lit(-i).as("ni")).as(s"s$i")
      }
      val bad = vecs.select(col("vec_id"),
          (-greatest(perCent: _*).getField("ni")).as("ri"),
          greatest(perCent: _*).getField("cos").as("rc"),
          HashFunctions.bestCosine(col("v"), norm, typedLit(flat), typedLit(ncs), dim).as("bc"))
        .filter(col("ri") =!= col("bc").getItem(0).cast("int") ||
          not(col("rc") === col("bc").getItem(1)))
        .count()
      assert(bad == 0, s"seed $seed: $bad vectors diverged")
    }
  }
}
