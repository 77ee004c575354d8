package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: raw scan throughput of the binary raster sources (not part of
  * the driver contract). The committed fixtures are deliberately tiny, so
  * the bench never exercises the per-cell emit loop at volume; this main
  * scans a LARGE file (generate one with the tools/make_*_fixture.py
  * writers scaled up) and reports cells/second for the three shapes that
  * matter at GloFAS scale (≈985 M cells/day):
  *  - full decode (all columns, value payload decoded),
  *  - metadata-only (value pruned → payload never read),
  *  - aggregation over the decoded field (the pipeline's first real op).
  *
  * Usage: sbt 'runMain graft.ProfileScan /tmp/big.grib2 grib [runs] [indexCacheDir]'
  *
  * With the 4th arg (GRIB only), scans pass `indexCacheDir`: the first
  * cold count pays the header walk AND writes the sidecars; the re-index
  * line then re-plans a FRESH scan so its driver indexing goes through the
  * sidecar-hit path — the delta between the two isolates what the sidecar
  * saves a warm repeated query (the stream path shares it per batch).
  */
object ProfileScan {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfileScan <path> grib|netcdf [runs] [indexCacheDir]")
    val (path, kind) = (args(0), args(1))
    val runs = if (args.length > 2) args(2).toInt else 3
    val idxCache = if (args.length > 3) Some(args(3)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val fmt = kind match {
      case "grib" => classOf[graft.sources.GribSource].getName
      case "netcdf" => classOf[graft.sources.NetcdfSource].getName
      case other => throw new IllegalArgumentException(s"unknown kind $other")
    }
    def scan = {
      val r = spark.read.format(fmt)
        .option("path", path).option("numPartitions", cpus)
      idxCache.filter(_ => kind == "grib")
        .fold(r)(d => r.option("indexCacheDir", d)).load()
    }
    val valueCol = if (kind == "grib") "value" else scan.columns.last

    // the cold count pays driver indexing (header walk of every file) +
    // first-job overhead — time it separately so the indexing cost of a
    // multi-file day is visible, not buried
    val tCold = System.nanoTime()
    val total = scan.count()
    println(f"cold count (incl. driver index)  ${(System.nanoTime() - tCold) / 1e9}%6.2f s  $total%,12d cells")
    if (idxCache.isDefined && kind == "grib") {
      // fresh plan → driver re-index, now through the sidecars just written
      val t = System.nanoTime()
      scan.count()
      val (h, m) = (graft.sources.GribIndexCache.hits.get(),
        graft.sources.GribIndexCache.misses.get())
      println(f"re-plan count (sidecar hit)      ${(System.nanoTime() - t) / 1e9}%6.2f s  " +
        f"(cache hits=$h misses=$m)")
    }
    def time(label: String)(f: => Unit): Unit = {
      val best = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$label%-24s $best%6.2f s  $total%,12d cells  " +
        f"${total / best / 1e6}%6.1f M cells/s")
    }

    // count() prunes every column — the I/O-free metadata walk
    time("metadata only (count)")(scan.count())
    // one aggregated column — payload decode without full row emit
    time("decode value (sum)")(scan.agg(sum(col(valueCol))).collect())
    // every column emitted — the shape the pipeline's first stage consumes
    time("all columns (agg)")(
      scan.agg(
        scan.columns.map(c => sum(col(c).cast("double")).as(s"s_$c")).head,
        scan.columns.map(c => sum(col(c).cast("double")).as(s"s_$c")).tail: _*
      ).collect())
    println(s"driver peak RSS ${ScaleSmoke.peakRssMb()} MB")
    spark.stop()
  }
}
