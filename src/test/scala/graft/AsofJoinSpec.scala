package graft

import org.apache.spark.sql.functions._
import graft.ext.AsofJoin

/** As-of join semantics + plan shape. */
class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  test("asofJoin: latest at-or-before match, null when no prior, max tie-break") {
    val l = Seq(
      (1L, 10L, "u1"), // before any right row -> null payload
      (2L, 20L, "u1"), // exactly at right ts 20 -> matches it (<=)
      (3L, 35L, "u1"), // between 30-tie and 40 -> the ts-30 winner
      (4L, 50L, "u1"), // after everything -> ts 40
      (5L, 50L, "u2")  // other key: isolated
    ).toDF("event_id", "ts", "user_id")
    val r = Seq(
      (100L, 20L, "u1", 1.0),
      (101L, 30L, "u1", 2.0), // tie on ts=30:
      (102L, 30L, "u1", 3.0), //   max tieBreak (102) must win
      (103L, 40L, "u1", 4.0),
      (104L, 60L, "u2", 5.0)  // after u2's event -> no match
    ).toDF("rid", "ts", "user_id", "amount")
    val out = AsofJoin.asofJoin(l, r, Seq("user_id"), "ts",
      Seq("rid" -> "last_rid", "amount" -> "last_amount"), "rid")
      .orderBy("event_id")
      .collect()
      .map(x => (x.getLong(0),
        if (x.isNullAt(3)) None else Some(x.getLong(3)),
        if (x.isNullAt(4)) None else Some(x.getDouble(4))))
    assert(out.toSeq == Seq(
      (1L, None, None),
      (2L, Some(100L), Some(1.0)),
      (3L, Some(102L), Some(3.0)),
      (4L, Some(103L), Some(4.0)),
      (5L, None, None)))
  }

  test("asofJoin: a NULL-ts right row matches nothing; NULL-ts left rows get null payloads") {
    val l = Seq((1L, Some(10L), "u1"), (2L, None: Option[Long], "u1"))
      .toDF("event_id", "ts", "user_id")
    val r = Seq(
      (100L, None: Option[Long], "u1", 9.0), // NULL ts: never "at or before"
      (101L, Some(5L), "u1", 1.0)
    ).toDF("rid", "ts", "user_id", "amount")
    val out = AsofJoin.asofJoin(l, r, Seq("user_id"), "ts",
      Seq("rid" -> "last_rid"), "rid")
      .orderBy("event_id").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(3)) None else Some(x.getLong(3))))
    assert(out.toSeq == Seq(
      (1L, Some(101L)), // the real prior row, NOT the NULL-ts one
      (2L, None)),      // SQL: nothing is <= a NULL timestamp
      out.toSeq.toString)
  }

  test("asofJoin: one hash exchange per input, no nested-loop join") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val df = AsofJoin.asofJoin(
      ev.select("event_id", "ts", "user_id"),
      ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("value")),
      Seq("user_id"), "ts",
      Seq("event_id" -> "purchase_id", "value" -> "purchase_value"),
      "event_id")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"as-of must not theta-join:\n$p")
    // union feeds ONE window: a single hash exchange on the join keys
    val exchanges = p.linesIterator.count(x =>
      x.contains("Exchange hashpartitioning") && !x.contains("Reused"))
    assert(exchanges == 1, s"expected exactly one shuffle, got $exchanges:\n$p")
  }
}
