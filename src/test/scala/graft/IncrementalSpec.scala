package graft

import java.sql.Date

import org.apache.spark.sql.functions._
import graft.operators.Incremental

/** Incremental (insert_overwrite) materialization must converge to the
  * full rebuild while physically touching ONLY the overwritten months.
  */
class IncrementalSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(df.columns.sorted.map(col): _*)

  test("dynamic month overwrite equals a full rebuild, old files untouched") {
    val full = Models.dailySummary(spark, sf)
    val cut = Date.valueOf("1998-01-01")
    // v1: history only — built as a normal Mat table
    val v1 = full.filter(col("order_date") < lit(cut))
    Mat.table(spark, sf, "inc_daily_spec", timeKey = Some("order_date"))(v1)
    // the overwrite targets the current PHYSICAL version table (the
    // stable name is a view since the versioned-swap layout); the
    // in-place partition overwrite is the cheap path that deliberately
    // does NOT create a new version.
    val table = Mat.currentTable(spark, sf, "inc_daily_spec")
    val loc = java.net.URI.create(
      spark.sql(s"DESCRIBE TABLE EXTENDED $table").collect()
        .find(_.getString(0) == "Location").get.getString(1)).getPath
    def fileState(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(loc))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.lastModified()).toMap
    }
    val before = fileState()
    assert(before.nonEmpty)
    // v2 delta: recompute Dec-1997 onward (whole months, overlapping
    // the last stored month) and overwrite just those partitions
    val delta = full.filter(col("order_date") >= lit(Date.valueOf("1997-12-01")))
    Incremental.overwriteMonths(spark, table, "order_date", delta)
    val after = fileState()
    // converged: table content == full rebuild
    val table2 = spark.table(table).drop("__p_month")
    assert(canon(table2).exceptAll(canon(full)).count() === 0)
    assert(canon(full).exceptAll(canon(table2)).count() === 0)
    // months before the window were not rewritten: same files, same mtimes
    val untouched = before.filter { case (p, _) =>
      p.contains("__p_month=") && p.split("__p_month=")(1).take(7) < "1997-12"
    }
    assert(untouched.nonEmpty)
    untouched.foreach { case (p, m) =>
      assert(after.get(p).contains(m), s"pre-window file rewritten: $p")
    }
    // the overlapping month WAS replaced (old file gone or new mtime)
    val dec = before.keys.filter(_.contains("__p_month=1997-12"))
    assert(dec.nonEmpty)
    assert(dec.exists(p => !after.get(p).exists(_ == before(p))),
      "overwritten month not rewritten")
  }
}
