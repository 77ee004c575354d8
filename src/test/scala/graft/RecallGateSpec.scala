package graft

/** The bench-side ANN recall gate: floors are regression pins (measured
  * band minus slack) at the default 20k-vector bench scale, and the gate
  * must agree with its own floor fields. */
class RecallGateSpec extends SparkSpec {

  test("recall gate passes its pinned floors at the bench scale") {
    val (metrics, ok) = RecallGate.measure(spark, 20000L)
    val m = metrics.toMap
    assert(m.keySet == Set("recall_r10_ad", "recall_r100_ad",
      "recall_r10_p16", "recall_r100_p16"))
    assert(ok, s"recall gate breached its floors: $m (floors: ad " +
      s"${RecallGate.FloorR10Adaptive}/${RecallGate.FloorR100Adaptive}, " +
      s"p16 ${RecallGate.FloorR10Adc16}/${RecallGate.FloorR100Adc16})")
    // the adaptive production shape must beat the ADC-only path at k=100
    // (the float re-rank exists to fix ADC ordering)
    assert(m("recall_r100_ad") >= m("recall_r100_p16"), m.toString)
    println(s"[recall-gate] $m")
  }

  test("the 1M scale pin gates on the SCALE floors, not the bench floors") {
    // measureScale at a small corpus: the metrics are the same
    // measurement; only the floor set differs (the 20k numbers clear the
    // looser scale floors, so the verdict must be ok=true even where the
    // bench r100_ad floor of 900 would... also pass — so additionally
    // pin the floor CONSTANTS' ordering: every scale floor is at most
    // its bench counterpart, because coverage binds at scale)
    val (metrics, ok) = RecallGate.measureScale(spark, 20000L)
    assert(ok, metrics.toString)
    assert(RecallGate.ScaleFloorR10Adaptive <= RecallGate.FloorR10Adaptive)
    assert(RecallGate.ScaleFloorR100Adaptive <= RecallGate.FloorR100Adaptive)
    assert(RecallGate.ScaleFloorR10Adc16 <= RecallGate.FloorR10Adc16)
    assert(RecallGate.ScaleFloorR100Adc16 <= RecallGate.FloorR100Adc16)
  }
}
