package graft.sources

import java.io.File

import graft.SparkSpec

import scala.util.Random

/** Property-style fuzzing of the two binary readers: random grids, packing
  * parameters, bitmaps, types, and fill values go through the Scala test
  * writers and must decode to the values computed directly from the spec
  * formulas. Fixed seed → deterministic; 40 rounds each cover the
  * parameter space the fixed fixtures can't (nbits that straddle byte
  * boundaries, negative/positive E and D, odd grid shapes, every numeric
  * NetCDF type, CDF-1 vs CDF-2 offsets). */
class RasterPropertySpec extends SparkSpec {

  private def tmp(n: String) =
    new File(System.getProperty("java.io.tmpdir"), n).getAbsolutePath

  test("GRIB simple packing decodes arbitrary (R, E, D, nbits, bitmap) exactly") {
    val rnd = new Random(20260812L)
    (0 until 40).foreach { round =>
      val ni = 1 + rnd.nextInt(6)
      val nj = 1 + rnd.nextInt(5)
      val npts = ni * nj
      val nbits = 1 + rnd.nextInt(20)
      val e = rnd.nextInt(9) - 4
      val d = rnd.nextInt(5) - 2
      val r = math.round(rnd.nextFloat() * 1000f) / 8f
      val jAsc = rnd.nextBoolean()
      val mask = if (rnd.nextBoolean()) None
                 else Some(Seq.fill(npts)(rnd.nextDouble() > 0.3))
      val present = mask.getOrElse(Seq.fill(npts)(true))
      val xs = Seq.fill(present.count(identity))(
        (rnd.nextLong() & Long.MaxValue) % (1L << nbits))
      val latF = 10000000 + rnd.nextInt(100) * 50000
      val lonF = -5000000 + rnd.nextInt(100) * 50000
      val f = GribTestWriter.write(tmp(s"prop$round.grib2"), ni, nj,
        latF, lonF, 50000, scanMode = if (jAsc) 0x40 else 0,
        timeUnit = 1, forecastTime = 1 + rnd.nextInt(100), member = Some(1),
        r = r, e = e, d = d, nbits = nbits, xs = xs, bitmap = mask)

      val got = spark.read.format(classOf[GribSource].getName)
        .option("path", f).option("numPartitions", (1 + rnd.nextInt(3)).toString).load()
        .select("latitude", "longitude", "value").collect()
        .map(row => (row.getDouble(0), row.getDouble(1), Option(row.get(2)))).toSet

      // expected, straight from the spec: Y = (R + X·2^E) / 10^D
      val twoE = math.pow(2.0, e)
      val tenD = math.pow(10.0, d)
      var pi = 0
      val want = (0 until npts).map { c =>
        val j = c / ni
        val i = c % ni
        val lat = (if (jAsc) latF + j.toLong * 50000 else latF - j.toLong * 50000) / 1e6
        val lon = (lonF + i.toLong * 50000) / 1e6
        val v = if (!present(c)) None
                else { val x = xs(pi); pi += 1; Some((r.toDouble + x * twoE) / tenD) }
        (lat, lon, v.map(_.asInstanceOf[Any]))
      }.toSet
      assert(got == want, s"round $round: ni=$ni nj=$nj nbits=$nbits e=$e d=$d")
    }
  }

  test("NetCDF classic decodes arbitrary (dims, types, fills, version) exactly") {
    val rnd = new Random(4242L)
    val types = Seq(1, 3, 4, 5, 6) // byte short int float double
    (0 until 40).foreach { round =>
      val na = 1 + rnd.nextInt(5)
      val nb = 1 + rnd.nextInt(4)
      val version = if (rnd.nextBoolean()) 1 else 2
      val nVars = 1 + rnd.nextInt(3)
      val vars = (0 until nVars).map { vi =>
        val t = types(rnd.nextInt(types.size))
        val lim = t match {
          case 1 => 127; case 3 => 32767; case _ => 100000
        }
        val data = Seq.fill(na * nb)((rnd.nextInt(2 * lim + 1) - lim).toDouble)
        val fill = if (rnd.nextBoolean()) Some(data(rnd.nextInt(data.size))) else None
        CdfTestWriter.V(s"v$vi", Seq(0, 1), t, data, fill)
      }
      // coordinate var for dim a only — dim b falls back to indices
      val coords = CdfTestWriter.V("a", Seq(0), 6, (0 until na).map(i => 5.0 + i * 0.25))
      val f = CdfTestWriter.write(tmp(s"prop$round.nc"), version,
        Seq("a" -> na, "b" -> nb), coords +: vars)

      val df = spark.read.format(classOf[NetcdfSource].getName)
        .option("path", f).option("numPartitions", (1 + rnd.nextInt(3)).toString).load()
      val got = df.collect().map { row =>
        (row.getDouble(0), row.getDouble(1),
          (0 until nVars).map(vi => Option(row.get(2 + vi)).map(_.toString)))
      }.toSet

      val want = (for (i <- 0 until na; j <- 0 until nb) yield {
        val cell = i * nb + j
        val vals = vars.map { v =>
          val raw = v.data(cell)
          if (v.fill.contains(raw)) None
          else Some(v.ncType match {
            case 1 => raw.toByte.toString
            case 3 => raw.toShort.toString
            case 4 => raw.toInt.toString
            case 5 => raw.toFloat.toString
            case 6 => raw.toString
          })
        }
        (5.0 + i * 0.25, j.toDouble, vals)
      }).toSet
      assert(got == want, s"round $round: dims=${na}x$nb version=$version " +
        s"types=${vars.map(_.ncType)}")
    }
  }

  test("GRIB message pruning is equivalent to an unpruned scan + post-filter") {
    import org.apache.spark.sql.functions._
    val rnd = new Random(20260813L)
    // one multi-message file: GRIB messages are self-delimiting, so
    // concatenating single-message files is a valid multi-message file
    val members: Seq[Option[Int]] = None +: (1 to 5).map(Some(_))
    val steps = Seq(24, 48, 72, 96)
    val parts = for ((m, i) <- members.zipWithIndex; s <- steps) yield {
      val xs = Seq.fill(4)((rnd.nextLong() & Long.MaxValue) % (1L << 10))
      val p = GribTestWriter.write(tmp(s"prune_${i}_$s.grib2"), 2, 2,
        10000000, 5000000, 50000, scanMode = 0, timeUnit = 1, forecastTime = s,
        member = m, r = 0f, e = 0, d = 0, nbits = 10, xs = xs)
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    }
    val f = tmp("prune_all.grib2")
    java.nio.file.Files.write(java.nio.file.Paths.get(f), parts.flatten.toArray)

    val df = spark.read.format(classOf[GribSource].getName)
      .option("path", f).option("numPartitions", "4").load()
    val full = df.collect().map(r => (Option(r.get(2)).map(_.asInstanceOf[Int]),
      r.getInt(3), r.getDouble(5))).toSeq

    // random predicates over the pushable columns; expected result derived
    // by applying the same SQL three-valued logic to the full collect
    (0 until 30).foreach { round =>
      val k = 1 + rnd.nextInt(6)
      val s = steps(rnd.nextInt(steps.size))
      val (pred, keep): (org.apache.spark.sql.Column, ((Option[Int], Int)) => Boolean) =
        rnd.nextInt(7) match {
          case 0 => (col("number") === k, t => t._1.contains(k))
          case 1 => (col("number") >= k, t => t._1.exists(_ >= k))
          case 2 => (col("number") < k, t => t._1.exists(_ < k))
          case 3 => (col("number").isNotNull, t => t._1.isDefined)
          case 4 => (col("step_hours") === s, t => t._2 == s)
          case 5 => (col("step_hours") <= s, t => t._2 <= s)
          case 6 => (col("number") === k && col("step_hours") === s,
            t => t._1.contains(k) && t._2 == s)
        }
      val got = df.filter(pred).collect()
        .map(r => (Option(r.get(2)).map(_.asInstanceOf[Int]), r.getInt(3), r.getDouble(5)))
        .sorted.toSeq
      val want = full.filter(t => keep((t._1, t._2))).sorted
      assert(got == want, s"round $round: predicate $pred")
    }
  }
}
