package graft.sources

import java.io.File
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The `indexCacheDir` sidecar: a second scan of an immutable GRIB drop
  * must read the persisted message index instead of re-walking headers,
  * results must be byte-identical either way, and a corrupt or stale
  * sidecar must fall back to a fresh walk — the cache can skip RPCs but
  * never poison a scan. */
class GribIndexCacheSpec extends SparkSpec {

  private val fixture = new File("data/grib/forecast.grib2").getAbsolutePath
  private val expected = new File("data/grib/forecast_expected.parquet").getAbsolutePath

  private def freshCacheDir(): String =
    Files.createTempDirectory("gribidx").toString

  private def grib(cacheDir: String) = spark.read
    .format(classOf[GribSource].getName)
    .option("path", fixture)
    .option("numPartitions", "3")
    .option("indexCacheDir", cacheDir)
    .load()

  private def asTuples(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getDouble(0), r.getDouble(1), Option(r.get(2)),
      r.getInt(3), r.getLong(4), Option(r.get(5)))).toSet

  private def counters(): (Long, Long) =
    (GribIndexCache.hits.get(), GribIndexCache.misses.get())

  test("cold scan writes the sidecar; warm scan hits it; rows identical") {
    val dir = freshCacheDir()
    val (h0, m0) = counters()
    val cold = asTuples(grib(dir))
    val (h1, m1) = counters()
    assert(m1 == m0 + 1, "cold scan must miss exactly once (one file)")
    assert(h1 == h0, "cold scan must not hit")
    val sidecars = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".gribidx"))
    assert(sidecars.length == 1, s"expected one sidecar, got ${sidecars.toSeq}")

    val warm = asTuples(grib(dir))
    val (h2, m2) = counters()
    assert(h2 == h1 + 1, "warm scan must hit the sidecar")
    assert(m2 == m1, "warm scan must not re-walk")
    assert(warm == cold)
    assert(warm == asTuples(spark.read.parquet(expected)))
  }

  test("plan-time pruning still works from a cached index") {
    val dir = freshCacheDir()
    grib(dir).count() // populate
    val pruned = grib(dir).filter(col("step_hours") === 24)
    assert(pruned.count() == pruned.filter(col("step_hours") === 24).count())
    assert(asTuples(pruned) ==
      asTuples(spark.read.parquet(expected).filter(col("step_hours") === 24)))
  }

  test("a corrupt sidecar falls back to a fresh walk and is repaired") {
    val dir = freshCacheDir()
    grib(dir).count() // populate
    val sidecar = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".gribidx")).head
    Files.write(Paths.get(sidecar), Array[Byte](1, 2, 3, 4, 5)) // truncate+garbage
    val (h0, m0) = counters()
    val rows = asTuples(grib(dir))
    val (h1, m1) = counters()
    assert(m1 == m0 + 1 && h1 == h0, "corrupt sidecar must count as a miss")
    assert(rows == asTuples(spark.read.parquet(expected)))
    // and the repaired sidecar now hits
    grib(dir).count()
    assert(counters()._1 == h1 + 1)
  }

  test("a prior-VERSION sidecar falls back to a fresh walk and is repaired") {
    // the r20 format bump (v5 -> v6: +ieeePrecision) makes this the live
    // upgrade path: a stale v5 sidecar from the previous build must be
    // re-walked and rewritten, never misparsed field-by-field
    val dir = freshCacheDir()
    grib(dir).count() // populate at the current version
    val sidecar = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".gribidx")).head
    val b = Files.readAllBytes(Paths.get(sidecar))
    // header = magic(4) + version(4), both big-endian DataOutputStream ints
    b(7) = (b(7) - 1).toByte // version - 1: a previous round's sidecar
    Files.write(Paths.get(sidecar), b)
    val (h0, m0) = counters()
    val rows = asTuples(grib(dir))
    val (h1, m1) = counters()
    assert(m1 == m0 + 1 && h1 == h0, "stale-version sidecar must count as a miss")
    assert(rows == asTuples(spark.read.parquet(expected)))
    grib(dir).count()
    assert(counters()._1 == h1 + 1, "repaired sidecar must hit again")
  }

  test("same directory, different mtime/len key: no stale read across files") {
    val dir = freshCacheDir()
    // copy the fixture so (path, len, mtime) differs from the original
    val copy = Files.createTempDirectory("gribcopy").resolve("forecast.grib2")
    Files.copy(Paths.get(fixture), copy)
    grib(dir).count() // sidecar for the original
    val (_, m0) = counters()
    val viaCopy = spark.read.format(classOf[GribSource].getName)
      .option("path", copy.toString)
      .option("indexCacheDir", dir)
      .load()
    assert(asTuples(viaCopy) == asTuples(spark.read.parquet(expected)))
    assert(counters()._2 == m0 + 1, "the copy must key its own sidecar (miss)")
  }
}
