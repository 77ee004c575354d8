package graft.functions

import graft.SparkSpec
import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** Pins the compiled vector kernels to the HOF reference semantics over
  * the REAL embeddings table — bit-exact, not approximate: the DuckDB
  * oracle relies on identical fold order. */
class VecFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))

  test("dot kernel is bit-identical to the HOF fold on every vector") {
    val bad = embs.select(
      (HashFunctions.dot(col("v"), col("v")) === Similarity.dot(col("v"), col("v"))).as("ok"))
      .filter(not(col("ok"))).count()
    assert(bad == 0)
  }

  test("sqDist kernel is bit-identical to the HOF fold on every vector pair") {
    // pair each vector with a shifted copy of itself so distances are
    // non-trivial; HOF reference = aggregate(zip_with((x,y)=>(x-y)^2))
    val shifted = embs.select(col("v"),
      transform(col("v"), x => x * 1.5 - 0.25).as("w"))
    val hof = aggregate(
      zip_with(col("v"), col("w"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, p) => acc + p)
    val bad = shifted.select(
      (HashFunctions.sqDist(col("v"), col("w")) === hof).as("ok"))
      .filter(not(col("ok"))).count()
    assert(bad == 0)
  }

  test("vector kernels reject mismatched lengths loudly (no out-of-bounds read)") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(HashFunctions.sqDist(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("equal-length") ||
      Option(e.getCause).exists(_.getMessage.contains("equal-length")))
  }

  test("hyperplaneBucket kernel equals the HOF bucket on every vector") {
    val bad = embs.select(
      (HashFunctions.hyperplaneBucket(col("v"), 6) ===
        Similarity.hyperplaneBucket(col("v"), 64, 6)).as("ok"))
      .filter(not(col("ok"))).count()
    assert(bad == 0)
  }

  test("multiprobe lshTopK candidate set contains the single-probe set per query") {
    val raw = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // k beyond any candidate count: inclusion holds for candidate SETS;
    // a smaller k legitimately drops low-cosine single-probe candidates
    // once multiprobe widens the pool
    def pairs(mp: Int) =
      Similarity.lshTopK(raw, "vec_id", "embedding", Seq(0L, 1L, 2L), k = 10000, nPlanes = 4,
        multiprobe = mp)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
    val single = pairs(0)
    val multi = pairs(2)
    assert(single.subsetOf(multi))
    assert(multi.size >= single.size)
  }

  test("lshTopK returns a subset of brute-force candidates, exactly ranked per bucket") {
    val raw = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val lsh = Similarity.lshTopK(raw, "vec_id", "embedding", Seq(0L, 1L), k = 5, nPlanes = 4)
      .select("query_id", "neighbor_id", "rank").collect()
    assert(lsh.nonEmpty)
    // ranks are 1..n consecutive per query
    lsh.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to rows.length))
    }
  }

  test("nearestSqDist kernel equals the min(struct(dist, idx)) argmin on real vectors") {
    // centroid matrix = the first 4 embeddings, in vec_id order
    val cents = embs.orderBy(col("vec_id")).limit(4).collect().map(_.getSeq[Double](1))
    val dim = cents.head.length
    val flat = cents.flatten.toArray
    val perCent = cents.zipWithIndex.map { case (c, i) =>
      struct(HashFunctions.sqDist(col("v"), typedLit(c.toArray)).as("d"),
        lit(i).as("i")).as(s"s$i")
    }
    val reference = embs.select(col("vec_id"),
      least(perCent: _*).getField("i").as("ri"), least(perCent: _*).getField("d").as("rd"))
    val kernel = embs.select(col("vec_id"),
      HashFunctions.nearestSqDist(col("v"), typedLit(flat), dim).as("nd"))
      .select(col("vec_id"),
        col("nd").getItem(0).cast("int").as("ki"), col("nd").getItem(1).as("kd"))
    val bad = reference.join(kernel, "vec_id")
      .filter(col("ri") =!= col("ki") || not(col("rd") === col("kd"))).count()
    assert(bad == 0)
  }

  test("bestCosine kernel equals the greatest(struct(cos, -idx)) argmax on real vectors") {
    val rows = embs.orderBy(col("vec_id")).limit(4).collect().map(_.getSeq[Double](1))
    val dim = rows.head.length
    val flat = rows.flatten.toArray
    val ncs = rows.map(c => math.sqrt(c.map(x => x * x).sum)).toArray
    val norm = sqrt(HashFunctions.dot(col("v"), col("v")))
    val perCent = rows.zipWithIndex.map { case (c, i) =>
      struct(
        (HashFunctions.dot(col("v"), typedLit(c.toArray)) / (norm * ncs(i))).as("cos"),
        lit(-i).as("ni")).as(s"s$i")
    }
    val reference = embs.select(col("vec_id"),
      (-greatest(perCent: _*).getField("ni")).as("ri"),
      greatest(perCent: _*).getField("cos").as("rc"))
    val kernel = embs.select(col("vec_id"),
      HashFunctions.bestCosine(col("v"), norm, typedLit(flat), typedLit(ncs), dim).as("bc"))
      .select(col("vec_id"),
        col("bc").getItem(0).cast("int").as("ki"), col("bc").getItem(1).as("kc"))
    val bad = reference.join(kernel, "vec_id")
      .filter(col("ri") =!= col("ki") || not(col("rc") === col("kc"))).count()
    assert(bad == 0)
  }
}
