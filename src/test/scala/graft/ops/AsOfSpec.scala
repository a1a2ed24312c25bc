package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("backward as-of: basic match, tie inclusivity, no-match null, key isolation") {
    // left: (key, ts, tag)
    val left = Seq(
      (1L, 10L, "a"), // after right@5  -> p5
      (1L, 5L, "b"),  // ties right@5   -> p5 (inclusive)
      (1L, 4L, "c"),  // before any     -> null
      (2L, 10L, "d"), // key 2 has its own history -> p2_7
      (3L, 10L, "e")  // key with no right rows    -> null
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 5L, "p5"), (1L, 20L, "p20"), (2L, 7L, "p2_7")
    ).toDF("k", "ts", "payload")

    val out = AsOf.joinBackward(left, right, "k", "ts")
      .select(col("tag"), col("asof.payload").as("payload"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toMap

    assert(out === Map(
      "a" -> Some("p5"), "b" -> Some("p5"), "c" -> None,
      "d" -> Some("p2_7"), "e" -> None))
  }

  test("backward as-of: latest of several right rows wins; left columns pass through") {
    val left = Seq((1L, 100L, 42.0)).toDF("k", "ts", "v")
    val right = Seq((1L, 1L, "old"), (1L, 50L, "mid"), (1L, 99L, "new"), (1L, 101L, "future"))
      .toDF("k", "ts", "payload")
    val row = AsOf.joinBackward(left, right, "k", "ts")
      .select(col("v"), col("asof.payload")).head()
    assert(row.getDouble(0) === 42.0 && row.getString(1) === "new")
  }

  test("plan has exactly one shuffle per input side (no range-join explosion)") {
    val left = Seq((1L, 10L, "a")).toDF("k", "ts", "tag")
    val right = Seq((1L, 5L, "p")).toDF("k", "ts", "payload")
    val plan = AsOf.joinBackward(left, right, "k", "ts")
      .queryExecution.executedPlan.toString
    // union-merge: one Exchange feeding the window sort; never a join node
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin")
      && !plan.contains("BroadcastNestedLoopJoin"))
  }
}
