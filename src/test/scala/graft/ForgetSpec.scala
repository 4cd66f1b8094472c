package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Forget

/** Forget.forgetAudit: deletion propagates through the derived
  * sessionizer, residuals are zero, and the sketch row carries
  * rebuilt estimates. */
class ForgetSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("stage rows: counts, propagation, zero residuals, rebuilt sketches") {
    // users 5 and 102 are in the forget set (u % 97 = 5); user 1 has
    // TWO sessions (41-minute gap), user 2 and the forgotten ones one
    // each
    val events = Seq(
      (1L, ts(0), 1L, 1.0), (2L, ts(10), 1L, 1.0), (3L, ts(51), 1L, 1.0),
      (4L, ts(0), 2L, 1.0),
      (5L, ts(0), 5L, 1.0), (6L, ts(5), 5L, 1.0),
      (7L, ts(0), 102L, 1.0))
      .toDF("event_id", "ts", "user_id", "value")
    val rows = Forget.forgetAudit(events).collect()
      .map(r => r.getString(0) -> r).toMap
    val ev = rows("events")
    assert((ev.getLong(1), ev.getLong(2), ev.getLong(3), ev.getLong(4)) ===
      ((7L, 4L, 3L, 0L)))
    assert(ev.isNullAt(5) && ev.isNullAt(6))
    val se = rows("sessions")
    // before: user1 has 2 sessions + user2 1 + user5 1 + user102 1 = 5
    assert((se.getLong(1), se.getLong(2), se.getLong(3), se.getLong(4)) ===
      ((5L, 3L, 2L, 0L)))
    val du = rows("distinct_users")
    assert((du.getLong(1), du.getLong(2), du.getLong(3), du.getLong(4)) ===
      ((4L, 2L, 2L, 0L)))
    // sketch row: estimates exist on both sides and the rebuilt one
    // shrank or held (fewer distinct keys can't raise an HLL estimate
    // built from a register SUBSET)
    assert(!du.isNullAt(5) && !du.isNullAt(6))
    assert(du.getDouble(6) <= du.getDouble(5))
  }

  test("no forgotten user: scrub is the identity and removed is 0") {
    val events = Seq((1L, ts(0), 1L, 1.0), (2L, ts(1), 2L, 1.0))
      .toDF("event_id", "ts", "user_id", "value")
    val rows = Forget.forgetAudit(events).collect()
    rows.foreach { r =>
      assert(r.getLong(3) === 0L, s"removed in ${r.getString(0)}")
      assert(r.getLong(4) === 0L)
    }
  }
}
