package graft

import org.apache.spark.sql.functions._
import graft.expressions.Hilbert
import graft.marts.EventMarts

/** Hilbert curve: bijective over full grids, unit-step adjacency (the
  * locality property Morton lacks), codegen path = eval path, and the
  * zonemap/shoot-out invariants on gated data. */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  test("xy2d is a bijection onto 0..n²-1 on a 64x64 grid") {
    val n = 64
    val ds = for (x <- 0 until n; y <- 0 until n)
      yield Hilbert.xy2d(x.toLong, y.toLong)
    // for x,y < 64 every level above 6 contributes quadrant 0 (and an
    // even number of identity swaps), so the order-16 value IS the
    // subgrid's own order-6 curve: exactly 0..n²-1, each once
    assert(ds.distinct.size === n * n)
    assert(ds.min === 0L && ds.max === n * n - 1L)
  }

  test("consecutive positions are unit steps (the locality property)") {
    val n = 32
    val byD = (for (x <- 0 until n; y <- 0 until n)
      yield (Hilbert.xy2d(x.toLong, y.toLong), (x, y))).sortBy(_._1).map(_._2)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
  }

  test("column path (codegen) agrees with direct eval") {
    val df = Seq((0L, 0L), (1L, 2L), (65535L, 65535L), (12345L, 54321L))
      .toDF("x", "y")
      .select(col("x"), col("y"), Hilbert.hilbert_key(col("x"), col("y")).as("h"))
    df.as[(Long, Long, Long)].collect().foreach { case (x, y, h) =>
      assert(h === Hilbert.xy2d(x, y))
    }
  }

  test("hilbert zonemap day spans contract vs a value-sorted layout") {
    // the point of the curve: per-file day spans stay narrow even
    // though the sort key also clusters value
    val events = Tables.events(spark, sf)
    val zm = EventMarts.hilbertZonemaps(events)
      .select(col("max_day_bucket") - col("min_day_bucket"))
      .as[Long].collect()
    val full = EventMarts.hilbertKeys(events)
      .agg(max("day_bucket") - min("day_bucket")).as[Long].head()
    val avgSpan = zm.sum.toDouble / zm.length
    assert(avgSpan < full.toDouble / 2,
      s"avg per-file day span $avgSpan vs full range $full — no clustering")
  }

  test("layout shoot-out is exact-count sane on gated data") {
    val rows = EventMarts.layoutLocality(Tables.events(spark, sf))
      .select("box_id", "zorder_files", "hilbert_files", "n_files")
      .as[(Int, Long, Long, Int)].collect()
    assert(rows.length === 12)
    rows.foreach { case (id, z, h, n) =>
      assert(z >= 0 && z <= n, s"box $id zorder_files $z out of range")
      assert(h >= 0 && h <= n, s"box $id hilbert_files $h out of range")
    }
  }
}
