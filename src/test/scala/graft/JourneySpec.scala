package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import graft.marts.EventMarts

/** EventMarts.eventSeqSupport / eventMarkov: hand-computed pattern
  * supports on a planted journey fixture (greedy-earliest subsequence
  * semantics, strict-ts chaining), and the Markov chain against a
  * driver-side replication (dense row-stochastic matrix, uniform
  * dangling row, k-step distribution). */
class JourneySpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, String, String)]): DataFrame =
    rows.map { case (id, u, t, ts) => (id, u, t, Timestamp.valueOf(ts)) }
      .toDF("event_id", "user_id", "event_type", "ts")

  test("seq support: hand-computed subsequence counts, strict-ts chaining") {
    val df = ev(Seq(
      // user 1: view -> click -> purchase (all patterns of the chain)
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 1L, "click", "2024-01-01 11:00:00"),
      (3L, 1L, "purchase", "2024-01-01 12:00:00"),
      // user 2: view -> view -> click (has view->view, view->click,
      // view->view->click; no purchase)
      (4L, 2L, "view", "2024-01-02 10:00:00"),
      (5L, 2L, "view", "2024-01-02 11:00:00"),
      (6L, 2L, "click", "2024-01-02 12:00:00"),
      // user 3: click and view at the SAME timestamp — equal ts must
      // NOT chain in either direction
      (7L, 3L, "click", "2024-01-03 10:00:00"),
      (8L, 3L, "view", "2024-01-03 10:00:00")))
    val rows = EventMarts.eventSeqSupport(df)
      .select("pattern_len", "t1", "t2", "t3", "n_users", "support")
      .as[(Int, String, String, Option[String], Long, Double)].collect()
    val p2 = rows.filter(_._1 == 2)
      .map(r => (r._2, r._3) -> r._5).toMap
    assert(p2(("view", "click")) === 2L)   // users 1 and 2
    assert(p2(("view", "purchase")) === 1L)
    assert(p2(("click", "purchase")) === 1L)
    assert(p2(("view", "view")) === 1L)    // user 2 only
    // user 3's tied pair never chains
    assert(!p2.contains(("click", "view")) && !p2.contains(("view", "deleted")))
    val p3 = rows.filter(_._1 == 3)
      .map(r => (r._2, r._3, r._4.get) -> r._5).toMap
    assert(p3(("view", "click", "purchase")) === 1L)
    assert(p3(("view", "view", "click")) === 1L)
    assert(!p3.contains(("view", "click", "click")))
    // support divides by users with any event (3)
    assert(math.abs(rows.find(r => r._1 == 2 && r._2 == "view" &&
      r._3 == "click").get._6 - 2.0 / 3.0) < 1e-12)
  }

  test("markov: dense row-stochastic matrix, uniform dangling row, pi_k replication") {
    val df = ev(Seq(
      // journeys: a->b->a, a->b  => transitions a->b ×2, b->a ×1;
      // type c appears only as a journey END (user 6's single pair
      // b->c) so c has NO outgoing transitions — the dangling row
      (1L, 1L, "a", "2024-01-01 10:00:00"),
      (2L, 1L, "b", "2024-01-01 11:00:00"),
      (3L, 1L, "a", "2024-01-01 12:00:00"),
      (4L, 2L, "a", "2024-01-02 10:00:00"),
      (5L, 2L, "b", "2024-01-02 11:00:00"),
      (6L, 6L, "b", "2024-01-03 10:00:00"),
      (7L, 6L, "c", "2024-01-03 11:00:00")))
    val rows = EventMarts.eventMarkov(df)
      .select("prev_type", "next_type", "n_trans", "n_from", "p",
        "n_steps", "pi_k")
      .as[(String, String, Long, Long, Double, Int, Double)].collect()
    assert(rows.length === 9, "dense 3x3 matrix")
    val m = rows.map(r => (r._1, r._2) -> r).toMap
    assert(m(("a", "b"))._3 === 2L && m(("a", "b"))._5 === 1.0)
    assert(m(("b", "a"))._3 === 1L && m(("b", "a"))._4 === 2L)
    assert(m(("b", "c"))._5 === 0.5)
    // dangling c: uniform over 3 types
    Seq("a", "b", "c").foreach { nt =>
      assert(math.abs(m(("c", nt))._5 - 1.0 / 3.0) < 1e-15)
      assert(m(("c", nt))._3 === 0L && m(("c", nt))._4 === 0L)
    }
    // rows sum to 1
    Seq("a", "b", "c").foreach { pt =>
      val s = Seq("a", "b", "c").map(nt => m((pt, nt))._5).sum
      assert(math.abs(s - 1.0) < 1e-12, s"row $pt sums to $s")
    }
    // driver-side pi replication: uniform start, k steps over the
    // (prev asc, next asc) matrix
    val types = Seq("a", "b", "c")
    val pmat = types.map(pt => types.map(nt => m((pt, nt))._5))
    var pi = Array.fill(3)(1.0 / 3.0)
    for (_ <- 1 to EventMarts.MarkovSteps)
      pi = Array.tabulate(3)(j =>
        (0 until 3).foldLeft(0.0)((acc, i) => acc + pi(i) * pmat(i)(j)))
    types.zipWithIndex.foreach { case (nt, j) =>
      assert(math.abs(m(("a", nt))._7 - pi(j)) < 1e-12,
        s"pi_k($nt): ${m(("a", nt))._7} vs ${pi(j)}")
    }
    // pi_k is a distribution
    assert(math.abs(pi.sum - 1.0) < 1e-9)
  }

  test("markov: empty events yields zero rows, not a sequence(1,0) crash") {
    // ADVICE r16: the ungrouped pm agg regenerates an m=[] row on
    // empty input and the π fold's sequence(1, 0)=[1,0] on Spark
    // called element_at(pi, 0), which throws; DuckDB returns no rows
    assert(EventMarts.eventMarkov(ev(Seq.empty)).count() === 0L)
  }
}
