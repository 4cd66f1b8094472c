package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.Snapshot

/** SCD2 snapshot runs must implement dbt's check-strategy semantics:
  * new keys open, changed keys close+reopen, unchanged keys carry,
  * deleted keys close; history is append-only across runs.
  */
class SnapshotSpec extends SparkSpec {

  import spark.implicits._

  private val t1 = Timestamp.valueOf("2020-01-01 00:00:00")
  private val t2 = Timestamp.valueOf("2020-02-01 00:00:00")
  private val t3 = Timestamp.valueOf("2020-03-01 00:00:00")

  test("init, change, delete, and re-add produce the dbt SCD2 history") {
    val s1 = Seq((1L, "alice", "basic"), (2L, "bob", "basic"),
      (3L, "carol", "pro")).toDF("id", "name", "plan")
    val snap1 = Snapshot.init(s1, t1)
    assert(snap1.filter(col(Snapshot.ValidTo).isNull).count() === 3)

    // run 2: bob upgrades, carol is deleted, dave appears
    val s2 = Seq((1L, "alice", "basic"), (2L, "bob", "pro"),
      (4L, "dave", "basic")).toDF("id", "name", "plan")
    val snap2 = Snapshot.run(snap1, s2, "id", Seq("name", "plan"), t2)

    val open2 = snap2.filter(col(Snapshot.ValidTo).isNull)
      .select("id", "plan").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(open2 === Map(1L -> "basic", 2L -> "pro", 4L -> "basic"))
    val closed2 = snap2.filter(col(Snapshot.ValidTo).isNotNull)
      .select("id", "plan", Snapshot.ValidTo).collect()
    // bob's old version and carol's deletion, both closed at t2
    assert(closed2.map(_.getLong(0)).sorted.toSeq === Seq(2L, 3L))
    assert(closed2.forall(_.getTimestamp(2) === t2))
    // alice carried through: still valid from t1
    assert(snap2.filter(col("id") === 1 && col(Snapshot.ValidTo).isNull)
      .head().getAs[Timestamp](Snapshot.ValidFrom) === t1)

    // run 3: carol returns (re-add after delete), nothing else changes
    val s3 = Seq((1L, "alice", "basic"), (2L, "bob", "pro"),
      (4L, "dave", "basic"), (3L, "carol", "enterprise")).toDF("id", "name", "plan")
    val snap3 = Snapshot.run(snap2, s3, "id", Seq("name", "plan"), t3)
    assert(snap3.filter(col(Snapshot.ValidTo).isNull).count() === 4)
    val carol = snap3.filter(col("id") === 3).orderBy(Snapshot.ValidFrom)
      .select("plan", Snapshot.ValidFrom, Snapshot.ValidTo).collect()
    assert(carol.length === 2)
    assert(carol(0).getString(0) === "pro" && carol(0).getTimestamp(2) === t2)
    assert(carol(1).getString(0) === "enterprise" && carol(1).getTimestamp(1) === t3
      && carol(1).isNullAt(2))
    // closed history is append-only: run 3 kept run 2's closures
    assert(snap3.filter(col(Snapshot.ValidTo) === t2).count() === 2)
  }

  test("timestamp strategy: only an advanced stamp changes; payload drift is trusted, not audited") {
    val u1 = Timestamp.valueOf("2020-01-15 00:00:00")
    val u2 = Timestamp.valueOf("2020-01-20 00:00:00")
    val s1 = Seq((1L, "alice", u1), (2L, "bob", u1), (3L, "carol", u1))
      .toDF("id", "plan", "updated_at")
    val snap1 = Snapshot.init(s1, t1)
    // run 2: bob's stamp advances (new version); alice's PAYLOAD
    // changes but her stamp does not (carried — dbt's documented
    // trade); carol vanishes (closed); dave appears (opened)
    val s2 = Seq((1L, "ALICE-DRIFTED", u1), (2L, "bob", u2), (4L, "dave", u2))
      .toDF("id", "plan", "updated_at")
    val snap2 = Snapshot.runTimestamp(snap1, s2, "id", "updated_at", t2)
    val open = snap2.filter(col(Snapshot.ValidTo).isNull)
      .select("id", "plan").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // alice keeps her ORIGINAL payload (stamp did not advance)
    assert(open === Map(1L -> "alice", 2L -> "bob", 4L -> "dave"))
    val closed = snap2.filter(col(Snapshot.ValidTo).isNotNull)
      .select("id", Snapshot.ValidTo).collect()
    assert(closed.map(_.getLong(0)).sorted.toSeq === Seq(2L, 3L))
    assert(closed.forall(_.getTimestamp(1) === t2))
    // bob's reopened row carries the new stamp and valid_from = t2
    val bobOpen = snap2.filter(col("id") === 2 && col(Snapshot.ValidTo).isNull).head()
    assert(bobOpen.getAs[Timestamp]("updated_at") === u2)
    assert(bobOpen.getAs[Timestamp](Snapshot.ValidFrom) === t2)
  }

  test("null-valued check columns do not collide with empty strings") {
    val a = Seq((1L, Some("x")), (2L, None: Option[String])).toDF("id", "v")
    val snap = Snapshot.init(a, t1)
    // v: null -> "" is a CHANGE (the null-safe hash must distinguish)
    val b = Seq((1L, Some("x")), (2L, Some(""))).toDF("id", "v")
    val out = Snapshot.run(snap, b, "id", Seq("v"), t2)
    assert(out.filter(col("id") === 2).count() === 2,
      "null->empty-string change was not detected")
  }
}
