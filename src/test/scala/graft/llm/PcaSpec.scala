package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PCA: eigensolver correctness, model invariants on the real corpus,
  * bit-reproducibility under repartitioning, projection math. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEigen solves a known 2x2 symmetric system") {
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = vals.sorted.reverse
    assert(math.abs(sorted(0) - 3.0) < 1e-12 && math.abs(sorted(1) - 1.0) < 1e-12)
    // eigenvector for lambda=3 is (1,1)/sqrt(2) up to sign
    val i3 = vals.indexWhere(v => math.abs(v - 3.0) < 1e-12)
    val v3 = Array(vecs(0)(i3), vecs(1)(i3))
    assert(math.abs(math.abs(v3(0)) - 1 / math.sqrt(2)) < 1e-12)
    assert(math.abs(v3(0) - v3(1)) < 1e-12) // same sign, equal components
  }

  private def modelOf(df: org.apache.spark.sql.DataFrame) =
    Pca.pcaModel(df, "vec_id", "embedding", dim = 64, k = 4)

  test("model invariants on the real corpus: orthonormal, descending, sign-normalized") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = modelOf(embs).collect()
    val loads = (0 until 4).map(c =>
      m.filter(r => r.getInt(0) == c).sortBy(_.getInt(1)).map(_.getDouble(2)))
    for (a <- 0 until 4; b <- 0 until 4) {
      val d = loads(a).zip(loads(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(d - (if (a == b) 1.0 else 0.0)) < 1e-9, s"VtV($a,$b)=$d")
    }
    val evs = (0 until 4).map(c => m.find(_.getInt(0) == c).get.getDouble(3))
    assert(evs.zip(evs.tail).forall { case (a, b) => a >= b - 1e-12 })
    assert(evs.forall(_ >= -1e-9))
    // sign normalization: the largest-|.| component is positive
    loads.foreach { v =>
      assert(v(v.indices.maxBy(i => math.abs(v(i)))) > 0)
    }
    assert(m.count(_.getInt(0) == -1) == 64)
  }

  test("model is bit-reproducible under repartitioning") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def bits(df: org.apache.spark.sql.DataFrame): Set[(Int, Int, Long, Long)] =
      modelOf(df).collect().map(r => (r.getInt(0), r.getInt(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    assert(bits(embs) == bits(embs.repartition(13)))
  }

  test("state/merge: drop states fold to the bit-identical direct model, via parquet") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def bits(df: org.apache.spark.sql.DataFrame): Set[(Int, Int, Long, Long)] =
      df.collect().map(r => (r.getInt(0), r.getInt(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    val direct = bits(Pca.pcaModel(embs, "vec_id", "embedding", dim = 64, k = 8))

    // any split, any merge order — and states survive a parquet round trip
    val tmp = java.nio.file.Files.createTempDirectory("pcastate").toString
    val drops = Seq(
      embs.filter(pmod(col("vec_id"), lit(4)) <= 1),
      embs.filter(pmod(col("vec_id"), lit(4)) === 2),
      embs.filter(pmod(col("vec_id"), lit(4)) === 3))
    drops.zipWithIndex.foreach { case (d, i) =>
      Pca.state(d, "embedding", dim = 64).write.parquet(s"$tmp/drop=$i")
    }
    val loaded = (0 until 3).map(i => spark.read.parquet(s"$tmp/drop=$i"))
    assert(bits(Pca.pcaModelFromStates(loaded, 64, 8)) == direct)
    assert(bits(Pca.pcaModelFromStates(loaded.reverse, 64, 8)) == direct)
    assert(bits(Pca.pcaModelFromStates(Seq(Pca.state(embs, "embedding", 64)), 64, 8)) == direct)
  }

  test("projection matches the hand fold and concentrates variance on comp 0") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = modelOf(embs)
    val proj = Pca.pcaProject(embs, "vec_id", "embedding", model)
    assert(proj.count() == embs.count() * 4)
    // hand-compute one row
    val mrows = model.collect()
    val mu = mrows.filter(_.getInt(0) == -1).sortBy(_.getInt(1)).map(_.getDouble(2))
    val v0 = mrows.filter(_.getInt(0) == 0).sortBy(_.getInt(1)).map(_.getDouble(2))
    val x = embs.filter(col("vec_id") === 0).select("embedding")
      .as[Seq[Float]].head().map(_.toDouble)
    val expected = math.round(
      x.indices.foldLeft(0.0)((acc, i) => acc + (x(i) - mu(i)) * v0(i)) * 1e6)
    val got = proj.filter(col("vec_id") === 0 && col("comp") === 0)
      .select("proj_micros").as[Long].head()
    assert(got == expected)
    // comp variances follow the eigenvalues (top component dominates)
    val variances = proj.groupBy("comp")
      .agg(variance(col("proj_micros") / 1e6).as("s2"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(variances(0) >= variances(1) - 1e-6 && variances(1) >= variances(3) - 1e-6)
  }

  test("pcaWhiten: every kept component has ~unit variance") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val white = Pca.pcaWhiten(embs, "vec_id", "embedding", modelOf(embs))
    val variances = white.groupBy("comp")
      .agg(variance(col("white_micros") / 1e6).as("s2"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1))
    assert(variances.nonEmpty)
    variances.foreach { case (c, s2) =>
      // population eigval vs sample variance: n/(n-1) correction + micros
      // rounding keep it within a percent at 500 vectors
      assert(math.abs(s2 - 1.0) < 0.05, s"comp $c whitened variance $s2")
    }
  }
}
