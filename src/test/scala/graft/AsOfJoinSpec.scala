package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** AsOfJoin.backward must equal the naive per-row argmax formulation
  * on any input — including equal-time ties (right-before-left "≤"
  * semantics, largest tiebreak wins among right rows) and left rows
  * with no preceding right row (null payload).
  */
class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of equals the naive argmax, ties and misses included") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2020-01-01 10:00:00"), "a"), // before any right row
      (1L, ts("2020-01-01 12:00:00"), "b"), // equal-time: matches r2
      (1L, ts("2020-01-01 15:00:00"), "c"),
      (2L, ts("2020-01-01 09:00:00"), "d"), // key with no right rows
      (3L, ts("2020-01-01 23:00:00"), "e")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2020-01-01 11:00:00"), 100L, 1.0),
      (1L, ts("2020-01-01 12:00:00"), 101L, 2.0), // tie on ts with next
      (1L, ts("2020-01-01 12:00:00"), 102L, 3.0), // larger tb wins
      (3L, ts("2020-01-01 08:00:00"), 103L, 4.0)
    ).toDF("k", "rt", "rid", "price")

    val got = AsOfJoin.backward(left, right, "k", "t", "rt",
      payload = Seq("price"), rightTieBreak = "rid")
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))

    // naive: for each left row, the right row with max (rt, rid), rt <= t
    val expected = Seq(
      (1L, ts("2020-01-01 10:00:00"), "a", null),
      (1L, ts("2020-01-01 12:00:00"), "b", 3.0: java.lang.Double),
      (1L, ts("2020-01-01 15:00:00"), "c", 3.0: java.lang.Double),
      (2L, ts("2020-01-01 09:00:00"), "d", null),
      (3L, ts("2020-01-01 23:00:00"), "e", 4.0: java.lang.Double))
    assert(got.toSeq === expected)
  }

  test("forward as-of equals the naive argmin, ties and misses included") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2020-01-01 10:00:00"), "a"), // next is r1 at 11:00
      (1L, ts("2020-01-01 12:00:00"), "b"), // equal-time: matches r2 (SMALLEST tb)
      (1L, ts("2020-01-01 15:00:00"), "c"), // after every right row → null
      (2L, ts("2020-01-01 09:00:00"), "d"), // key with no right rows
      (3L, ts("2020-01-01 07:00:00"), "e")  // right row follows at 08:00
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2020-01-01 11:00:00"), 100L, 1.0),
      (1L, ts("2020-01-01 12:00:00"), 101L, 2.0), // tie on ts with next
      (1L, ts("2020-01-01 12:00:00"), 102L, 3.0), // smaller tb (101) wins
      (3L, ts("2020-01-01 08:00:00"), 103L, 4.0)
    ).toDF("k", "rt", "rid", "price")

    val got = AsOfJoin.forward(left, right, "k", "t", "rt",
      payload = Seq("price"), rightTieBreak = "rid")
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))

    val expected = Seq(
      (1L, ts("2020-01-01 10:00:00"), "a", 1.0),
      (1L, ts("2020-01-01 12:00:00"), "b", 2.0),
      (1L, ts("2020-01-01 15:00:00"), "c", null),
      (2L, ts("2020-01-01 09:00:00"), "d", null),
      (3L, ts("2020-01-01 07:00:00"), "e", 4.0))
    assert(got.toSeq === expected)
  }

  test("payload is atomic: a null field in the matched right row stays null") {
    import spark.implicits._
    val left = Seq((1L, ts("2020-01-01 12:00:00"), "x")).toDF("k", "t", "tag")
    // latest right row has price=null — it must NOT be back-filled
    // from the older row; tiebreak is a STRING id (no long cast)
    val right = Seq(
      (1L, ts("2020-01-01 10:00:00"), "r1", Some(5.0), 1L),
      (1L, ts("2020-01-01 11:00:00"), "r2", None, 2L)
    ).toDF("k", "rt", "rid", "price", "qty")
    val row = AsOfJoin.backward(left, right, "k", "t", "rt",
      payload = Seq("price", "qty"), rightTieBreak = "rid").head()
    assert(row.isNullAt(row.fieldIndex("price")),
      "null field back-filled from an older right row")
    assert(row.getLong(row.fieldIndex("qty")) === 2L)
  }

  test("colliding payload names are rejected up front") {
    import spark.implicits._
    val l = Seq((1L, ts("2020-01-01 00:00:00"), 5.0)).toDF("k", "t", "price")
    val r = Seq((1L, ts("2020-01-01 00:00:00"), 1L, 6.0)).toDF("k", "rt", "rid", "price")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(l, r, "k", "t", "rt", Seq("price"), "rid")
    }
    assert(e.getMessage.contains("collide"))
  }
}
