package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Proves the Bench stdout line can never outgrow the driver's parse
  * window again: the r15 registry sat at 1,971 of ~2,000 chars and the
  * next query added would have truncated the JSON front (the r05
  * failure mode, `parsed:null`). [[BenchFormat]] now degrades to a
  * bounded totals+digest line and ships full precision in
  * BENCH_DETAIL.json — asserted here against synthetic registries well
  * past any plausible size (the judge's asked-for 120-query proof,
  * plus 200 and 500). */
class BenchFormatSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  /** Deterministic synthetic registry of n queries with realistic names
    * and a spread of magnitudes (sub-cs to minutes). */
  private def registry(n: Int): Seq[(String, Double)] =
    (0 until n).map { i =>
      (s"q_op${i}_${"abcdefgh".drop(i % 7)}", (i % 97) * 0.37 + 0.004 * i)
    }

  private def parse(line: String) = mapper.readTree(line)

  test("historical sizes keep the full per-query stdout form") {
    for (n <- Seq(1, 40, 75)) {
      val rs = registry(n)
      val (line, _) = BenchFormat.render(rs, rs.map(_._2).sum, "sf0.1", 32)
      assert(line.length <= BenchFormat.StdoutBudget)
      val j = parse(line)
      assert(j.get("queries").size() == n)
      assert(j.get("metric").asText() == "total")
    }
  }

  test("120/200/500-query registries stay under budget and parse as JSON") {
    for (n <- Seq(108, 120, 200, 500)) {
      val rs = registry(n)
      val total = rs.map(_._2).sum
      val (line, detail) = BenchFormat.render(rs, total, "sf0.1", 32)
      assert(line.length <= BenchFormat.StdoutBudget,
        s"n=$n stdout line ${line.length} chars > ${BenchFormat.StdoutBudget}")
      val j = parse(line)
      assert(math.abs(j.get("value").asDouble() - total) < 0.01)
      // the detail artifact always carries EVERY query at ms precision
      val d = parse(detail)
      assert(d.get("nq").asInt() == n)
      assert(d.get("queries").size() == n)
      if (j.has("queries")) assert(j.get("queries").size() == n)
      else {
        // degraded form: digest ties the line to the artifact; top map
        // carries the heaviest queries in centiseconds
        assert(j.get("md5").asText() == BenchFormat.md5Hex8(detail))
        assert(j.get("detail").asText() == "BENCH_DETAIL.json")
        assert(j.get("top").size() == 10)
        // heaviest query is present in the top map at centiseconds
        val heaviest = rs.maxBy(_._2)
        assert(j.get("top").has(heaviest._1.stripPrefix("q_")),
          s"top map missing heaviest query ${heaviest._1}")
        assert(j.get("top").get(heaviest._1.stripPrefix("q_")).asLong() ==
          math.round(heaviest._2 * 100))
      }
    }
  }

  test("gate extras land top-level in both the line and the artifact") {
    val extras = Seq("recall_r10_ad" -> 993L, "recall_floor_ok" -> 1L)
    for (n <- Seq(40, 200)) { // full and degraded stdout forms
      val rs = registry(n)
      val (line, detail) = BenchFormat.render(rs, rs.map(_._2).sum, "sf0.1",
        32, extras)
      assert(line.length <= BenchFormat.StdoutBudget)
      for (j <- Seq(parse(line), parse(detail))) {
        assert(j.get("recall_r10_ad").asLong() == 993L)
        assert(j.get("recall_floor_ok").asLong() == 1L)
      }
      // degraded form's digest must tie to the INJECTED artifact
      val j = parse(line)
      if (j.has("md5")) assert(j.get("md5").asText() == BenchFormat.md5Hex8(detail))
    }
  }

  test("degraded line is bounded even with pathological query names") {
    val rs = (0 until 300).map(i => (s"q_${"x" * 200}_$i", i * 0.1))
    val (line, _) = BenchFormat.render(rs, rs.map(_._2).sum, "sf0.1", 32)
    assert(line.length <= BenchFormat.StdoutBudget)
    assert(parse(line).get("nq").asInt() == 300)
  }

  test("degraded form sizes the gate extras by construction, not convention") {
    // ~1.7k chars of future gate fields on a 500-query registry: the
    // top map must be DROPPED to honor the budget — extras count inside
    // shortLine's sizing now, not injected after it
    val extras = (0 until 38).map(i =>
      s"future_gate_metric_with_a_long_name_$i" -> (1000L + i))
    val rs = registry(500)
    val (line, detail) = BenchFormat.render(rs, rs.map(_._2).sum, "sf0.1", 32, extras)
    assert(line.length <= BenchFormat.StdoutBudget,
      s"${line.length} > ${BenchFormat.StdoutBudget}")
    val j = parse(line)
    assert(!j.has("top"), "top map should be dropped to make room for extras")
    assert(j.get("future_gate_metric_with_a_long_name_37").asLong() == 1037L)
    assert(j.get("md5").asText() == BenchFormat.md5Hex8(detail))
    // and truly pathological extras fail LOUDLY instead of overflowing
    val huge = (0 until 200).map(i => s"pathologically_long_gate_field_name_$i" -> i.toLong)
    val ex = intercept[IllegalArgumentException] {
      BenchFormat.render(rs, rs.map(_._2).sum, "sf0.1", 32, huge)
    }
    assert(ex.getMessage.contains("tail window"))
  }

  test("detail artifact round-trips values at millisecond precision") {
    val rs = Seq(("q_a", 1.2345), ("q_b", 0.0004), ("q_c", 61.5))
    val (_, detail) = BenchFormat.render(rs, rs.map(_._2).sum, "sf0.01", 8)
    val d = parse(detail)
    assert(d.get("queries").get("q_a").asDouble() == 1.234 ||
      d.get("queries").get("q_a").asDouble() == 1.235) // %.3f half-even vs half-up
    assert(d.get("queries").get("q_c").asDouble() == 61.5)
    assert(d.get("sf").asText() == "sf0.01")
    assert(d.get("cpus").asInt() == 8)
  }
}
