package graft

import org.apache.spark.sql.functions._
import graft.llm.Selection
import graft.marts.{AnalyticsMarts, EventMarts}

/** Fixture specs for the data-selection operators (Moore–Lewis, DSIR)
  * and the LOCF gap-fill / CUBE rollup — the semantic behavior the
  * oracle gate can't state directly (WHICH docs get selected, WHAT a
  * gap carries, WHICH grouping sets appear). */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  // a corpus where src0 speaks "alpha" and the rest speak "omega":
  // selection must pull the alpha-speaking outsider, not the omega one
  private def docs = Seq(
    (1L, "alpha alpha beta alpha", "src0"),
    (2L, "alpha beta alpha alpha", "src0"),
    (3L, "alpha alpha alpha beta", "src9"), // in-domain-ish outsider
    (4L, "omega omega gamma omega", "src9"),
    (5L, "omega gamma omega omega", "src9"))
    .toDF("doc_id", "text", "source")
    .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))

  test("mooreLewis selects in-domain-looking docs, rejects off-domain") {
    val got = Selection.mooreLewis(docs)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L))
    // the alpha docs (in-domain language) must be selected — including
    // doc 3, which is NOT in src0 but looks like it
    for (d <- Seq(1L, 2L, 3L)) assert(got(d)._2, s"doc $d should be selected")
    for (d <- Seq(4L, 5L)) assert(!got(d)._2, s"doc $d should be rejected")
    // ce_diff orders the same way: alpha docs strictly below omega docs
    assert(Seq(1L, 2L, 3L).map(got(_)._1).max < Seq(4L, 5L).map(got(_)._1).min)
  }

  test("dsirWeights: importance keeps target-like docs, drops the rest") {
    // big enough that feature counts dominate the +1/B smoothing
    // (B=256 buckets vs a ~35-token corpus would drown the signal)
    val big = (1L to 40L).map(i => (i, "alpha alpha beta alpha", "src0")) ++
      (41L to 60L).map(i => (i, "alpha beta alpha alpha", "src9")) ++
      (61L to 100L).map(i => (i, "omega omega gamma omega", "src9"))
    val df = big.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
    val got = Selection.dsirWeights(df)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // target-LOOKING docs keep (including the src9 alpha speakers the
    // source filter never saw); omega docs drop
    for (d <- 1L to 60L) assert(got(d), s"doc $d should keep")
    for (d <- 61L to 100L) assert(!got(d), s"doc $d should drop")
  }

  test("locfHourly carries the last observed value across gaps, nulls before first") {
    import java.sql.Timestamp
    def ts(h: Int, m: Int = 0) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // clicks: high-value at hour 1 (v=460) and hour 4 (v=470+480);
    // low-value rows only define the spine bounds (hours 0..5)
    val events = Seq(
      (1L, ts(0), 10L, "click", 5.0), (2L, ts(1), 10L, "click", 460.0),
      (3L, ts(4, 10), 10L, "click", 470.0), (4L, ts(4, 20), 10L, "click", 480.0),
      (5L, ts(5), 10L, "click", 3.0),
      (6L, ts(0), 11L, "view", 2.0), (7L, ts(5), 11L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventMarts.locfHourly(events)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString.substring(11, 13),
        r.getLong(2), r.getBoolean(3),
        if (r.isNullAt(4)) null else java.lang.Double.valueOf(r.getDouble(4))))
    assert(got.length === 12) // 2 types × 6 hours
    val click = got.filter(_._1 == "click").sortBy(_._2).toSeq
    assert(click.map(_._3) === Seq(0L, 1L, 0L, 0L, 2L, 0L)) // n_events
    assert(click.map(_._4) === Seq(true, false, true, true, false, true)) // is_gap
    assert(click.map(_._5) === Seq(null, 460.0, 460.0, 460.0, 950.0, 950.0))
    // view never crosses the threshold: all gaps, all null
    val view = got.filter(_._1 == "view")
    assert(view.forall(v => v._4 && v._5 == null))
  }

  test("lineitemCube emits all four grouping sets with honest flags") {
    val li = Seq(
      ("A", "F", 10.0), ("A", "O", 20.0), ("R", "F", 30.0), ("A", "F", 5.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity")
    val got = AnalyticsMarts.lineitemCube(li)
      .collect().map(r => ((Option(r.getString(0)), Option(r.getString(1))),
        (r.getDecimal(2).doubleValue(), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.size === 8) // 3 detail + 2 rf-rollups + 2 ls-rollups + grand total
    assert(got((Some("A"), Some("F"))) === ((15.0, 2L, 0L, 0L)))
    assert(got((Some("A"), None)) === ((35.0, 3L, 0L, 1L)))
    assert(got((None, Some("F"))) === ((45.0, 3L, 1L, 0L)))
    assert(got((None, None)) === ((65.0, 4L, 1L, 1L)))
  }
}
