package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Latest-wins snapshot merge semantics. */
class SnapshotMergeSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String, Long, Boolean)*) =
    rows.toDF("id", "payload", "version", "deleted")

  test("insert, update, keep, delete, and stale-update resolution") {
    val current = snap((1L, "a", 1L, false), (2L, "b", 5L, false), (3L, "c", 1L, false))
    val updates = snap(
      (1L, "a2", 2L, false), // newer version: update wins
      (2L, "b-stale", 2L, false), // older than current 5: current kept
      (3L, "c", 2L, true), // tombstone: dropped
      (9L, "new", 1L, false)) // insert
    val out = SnapshotMerge.merge(current, updates, "id", "version", Some("deleted"))
      .as[(Long, String, Long, Boolean)].collect().map(r => r._1 -> r._2).toMap
    assert(out == Map(1L -> "a2", 2L -> "b", 9L -> "new"))
  }

  test("equal versions go to the update (idempotent re-delivery)") {
    val current = snap((1L, "old", 3L, false))
    val updates = snap((1L, "redelivered", 3L, false))
    val once = SnapshotMerge.merge(current, updates, "id", "version", Some("deleted"))
    assert(once.as[(Long, String, Long, Boolean)].collect().toSeq ==
      Seq((1L, "redelivered", 3L, false)))
    // merging the same batch into the result changes nothing
    val twice = SnapshotMerge.merge(once, updates, "id", "version", Some("deleted"))
    assert(twice.as[(Long, String, Long, Boolean)].collect().toSeq ==
      Seq((1L, "redelivered", 3L, false)))
  }

  test("multi-version batch: per-key latest wins, tombstone not resurrected") {
    // one batch carrying BOTH the insert and the later tombstone of key 3
    // (the AvailableNow crash-replay shape) — the stale insert must not
    // fan the join out and resurrect the deleted key
    val current = snap((1L, "a", 1L, false))
    val updates = snap(
      (3L, "c", 1L, false), (3L, "c", 2L, true), // insert then delete
      (4L, "d1", 1L, false), (4L, "d2", 3L, false), (4L, "d-mid", 2L, false))
    val out = SnapshotMerge.merge(current, updates, "id", "version", Some("deleted"))
      .as[(Long, String, Long, Boolean)].collect().map(r => r._1 -> r._2).toMap
    assert(out == Map(1L -> "a", 4L -> "d2"))
  }

  test("version-tie between an update row and its tombstone: tombstone wins") {
    val updates = snap((5L, "e", 2L, false), (5L, "e", 2L, true))
    val out = SnapshotMerge.merge(snap(), updates, "id", "version", Some("deleted"))
    assert(out.count() == 0)
  }

  test("null tombstone flag is treated as not-deleted") {
    val current = Seq((1L, "a", 1L, Some(false)), (2L, "b", 1L, None))
      .toDF("id", "payload", "version", "deleted")
    val updates = current.limit(0)
    val out = SnapshotMerge.merge(current, updates, "id", "version", Some("deleted"))
    assert(out.count() == 2) // NULL flag must not delete the live row
  }

  test("retainTombstones keeps the winning tombstone row in the output") {
    val current = snap((1L, "a", 1L, false), (3L, "c", 1L, false))
    val updates = snap((3L, "c", 2L, true))
    val out = SnapshotMerge.merge(current, updates, "id", "version", Some("deleted"),
      retainTombstones = true)
      .as[(Long, String, Long, Boolean)].collect().map(r => r._1 -> r._4).toMap
    assert(out == Map(1L -> false, 3L -> true))
    // a LATER stale insert loses to the retained tombstone
    val next = SnapshotMerge.merge(
      SnapshotMerge.merge(current, updates, "id", "version", Some("deleted"),
        retainTombstones = true),
      snap((3L, "c-stale", 1L, false)), "id", "version", Some("deleted"),
      retainTombstones = true)
    assert(next.filter(col("id") === 3L && !col("deleted")).count() == 0)
  }

  test("NULL update versions fail loudly instead of sorting to the bottom") {
    val updates = Seq((1L, "x", None: Option[Long], false), (1L, "y", Some(2L), false))
      .toDF("id", "payload", "version", "deleted")
    val ex = intercept[Exception] {
      SnapshotMerge.merge(snap(), updates, "id", "version", Some("deleted")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("NULL version")))
  }

  test("without a tombstone column every winner survives") {
    val current = snap((1L, "a", 1L, true))
    val out = SnapshotMerge.merge(current, snap(), "id", "version", None)
    assert(out.count() == 1)
  }

  test("mismatched schemas are rejected") {
    val bad = Seq((1L, "x")).toDF("id", "payload")
    intercept[IllegalArgumentException] {
      SnapshotMerge.merge(snap((1L, "a", 1L, false)), bad, "id", "version", None)
    }
  }

  test("snapshotDiff classifies added/removed/changed/unchanged, null-safe") {
    val oldS = Seq(
      (1L, Some("a"), "en"),   // unchanged
      (2L, Some("b"), "en"),   // changed (text)
      (3L, None, "en"),        // changed: NULL -> value
      (4L, Some("d"), "en"),   // removed
      (6L, None, "fr")         // unchanged with NULL text (NULL <=> NULL)
    ).toDF("id", "text", "lang")
    val newS = Seq(
      (1L, Some("a"), "en"),
      (2L, Some("b2"), "en"),
      (3L, Some("c"), "en"),
      (5L, Some("e"), "en"),   // added
      (6L, None, "fr")
    ).toDF("id", "text", "lang")
    val got = SnapshotMerge.snapshotDiff(oldS, newS, "id", Seq("text", "lang"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added", 6L -> "unchanged"))
    intercept[IllegalArgumentException] {
      SnapshotMerge.snapshotDiff(oldS, newS, "id", Seq("nope"))
    }
  }
}
