package graft

/** Formatting for [[Bench]]'s two outputs.
  *
  * The driver captures only the LAST ~2000 characters of stdout and
  * parses the trailing JSON line out of them (BENCH_r05 recorded
  * `parsed:null` when a full-precision 75-query line overflowed that
  * window, and the 108-query centisecond line of r15 measured 1971 of
  * the ~2000 chars — one more query away from silent truncation). The
  * fix is structural, not another precision squeeze: the COMPLETE
  * per-query timing table is written to a committed artifact
  * (`BENCH_DETAIL.json`, millisecond precision, any registry size) and
  * the stdout line degrades through
  *
  *   1. 2-decimal seconds per query (the historical form),
  *   2. integer centiseconds per query (`"qunit":"cs"`),
  *   3. a short totals line — total, query count, the top-10 most
  *      expensive queries in centiseconds, and an md5 digest of the
  *      detail artifact (`"detail":"BENCH_DETAIL.json"`),
  *
  * picking the first form that fits [[StdoutBudget]]. Form 3 is bounded
  * (~400 chars) regardless of registry size, so the stdout line can
  * never lose its JSON front to the parse window again; per-query
  * precision lives in the artifact, which the digest ties to this run.
  * [[graft.BenchFormatSpec]] proves the invariant with synthetic
  * registries up to 500 queries.
  */
object BenchFormat {

  /** Stdout chars the driver's 2000-char tail window can safely hold
    * (margin for the trailing newline and log-line remnants). */
  val StdoutBudget = 1990

  /** "0.20" -> "0.2", "1.00" -> "1": valid JSON numbers, shorter. */
  private def trimNum(s: String): String =
    if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse else s

  private def secLine(results: Seq[(String, Double)], total: Double, sfName: String,
      qDecimals: Int): String = {
    val qs = results.sortBy(_._1)
      .map { case (k, v) =>
        "\"" + k.stripPrefix("q_") + "\":" + trimNum(s"%.${qDecimals}f".format(v)) }
      .mkString("{", ",", "}")
    s"""{"metric":"total","value":${f"$total%.2f"},"unit":"sec","keyprefix":"q_","queries":$qs,"sf":"$sfName"}"""
  }

  /** Integer-centisecond form: strictly shorter than 1-decimal seconds
    * for any value under 100 s while keeping 2-decimal precision. */
  private def csLine(results: Seq[(String, Double)], total: Double, sfName: String): String = {
    val qs = results.sortBy(_._1)
      .map { case (k, v) => "\"" + k.stripPrefix("q_") + "\":" + math.round(v * 100) }
      .mkString("{", ",", "}")
    s"""{"metric":"total","value":${f"$total%.2f"},"unit":"sec","keyprefix":"q_","qunit":"cs","queries":$qs,"sf":"$sfName"}"""
  }

  /** Bounded fallback: totals + top-10 heaviest queries (cs) + detail
    * digest. Drops the top map too if even that overflows (pathological
    * query names). Gate `extras` are injected HERE, inside the sizing
    * decision, so the <= [[StdoutBudget]] guarantee of the last-resort
    * form holds by construction no matter how many gate fields future
    * rounds add — not by the "keep them few" convention. */
  private def shortLine(results: Seq[(String, Double)], total: Double, sfName: String,
      digest: String, extraStr: String): String = {
    def base(top: String): String =
      s"""{"metric":"total","value":${f"$total%.2f"},"unit":"sec","nq":${results.size}$top,"detail":"BENCH_DETAIL.json","md5":"$digest"$extraStr,"sf":"$sfName"}"""
    val top10 = results.sortBy { case (k, v) => (-v, k) }.take(10)
      .map { case (k, v) => "\"" + k.stripPrefix("q_") + "\":" + math.round(v * 100) }
      .mkString(""","keyprefix":"q_","qunit":"cs","top":{""", ",", "}")
    val withTop = base(top10)
    val line = if (withTop.length <= StdoutBudget) withTop else base("")
    require(line.length <= StdoutBudget,
      s"bench stdout fallback overflows the driver tail window even top-less " +
        s"(${line.length} > $StdoutBudget chars) — trim the gate extras")
    line
  }

  /** Complete per-query table, millisecond precision — the committed
    * artifact the stdout digest refers to. Key order is sorted so the
    * digest is deterministic for a given timing table. */
  def detailJson(results: Seq[(String, Double)], total: Double, sfName: String,
      cpus: Int): String = {
    val qs = results.sortBy(_._1)
      .map { case (k, v) => s"""    "$k": ${trimNum(f"$v%.3f")}""" }
      .mkString("{\n", ",\n", "\n  }")
    s"""{
  "metric": "total",
  "value": ${f"$total%.2f"},
  "unit": "sec",
  "sf": "$sfName",
  "cpus": $cpus,
  "nq": ${results.size},
  "queries": $qs
}
"""
  }

  def md5Hex8(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString

  /** (stdout line, detail artifact body). The stdout line is guaranteed
    * <= [[StdoutBudget]] chars for any registry whose query names stay
    * under ~150 chars (and degrades top-less even beyond that).
    * `extras` are integer gate fields (e.g. `recall_floor_ok`) injected
    * top-level into BOTH outputs so the driver-parsed round artifact
    * carries them mechanically — they count against the budget like any
    * other field, so keep them few and short-named. */
  def render(results: Seq[(String, Double)], total: Double, sfName: String,
      cpus: Int, extras: Seq[(String, Long)] = Nil): (String, String) = {
    val extraStr = extras.map { case (k, v) => s""","$k":$v""" }.mkString
    def inject(line: String): String =
      if (extraStr.isEmpty) line else line.dropRight(1) + extraStr + "}"
    val detail = inject(detailJson(results, total, sfName, cpus).trim) + "\n"
    val digest = md5Hex8(detail)
    val full = inject(secLine(results, total, sfName, 2))
    val line =
      if (full.length <= StdoutBudget) full
      else {
        val cs = inject(csLine(results, total, sfName))
        if (cs.length <= StdoutBudget) cs
        else shortLine(results, total, sfName, digest, extraStr)
      }
    (line, detail)
  }
}
