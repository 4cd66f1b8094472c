package graft

import org.apache.spark.sql.functions._
import graft.llm.{Decontam, Dedup, Mixture, Redaction, Repetition}
import graft.operators.Sketches

/** Unit coverage for the round-6 curation operators on fixtures the
  * driver corpus cannot provide: real PII shapes for the redaction
  * regexes, hand-checkable contamination/repetition/mixture cases, and
  * the CMS estimate-is-upper-bound property.
  */
class CurationOpsSpec extends SparkSpec {

  import spark.implicits._

  test("substring dedup removes cross-doc spans, keeps unique text verbatim") {
    val df = Seq(
      // docs 1+2 share the span "alpha beta gamma"; doc 3 is unique;
      // doc 4 is too short for any shingle
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "zeta alpha beta gamma eta"),
      (3L, "one two three four five"),
      (4L, "tiny doc")).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    val out = llm.Dedup.substringDedup(df)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1: positions 1-3 covered -> "delta epsilon" survives
    assert(out(1L).getAs[String]("cleaned_text") === "delta epsilon")
    assert(out(1L).getAs[Long]("n_kept") === 2L)
    // doc 2: positions 2-4 covered -> "zeta eta"
    assert(out(2L).getAs[String]("cleaned_text") === "zeta eta")
    // unique doc untouched
    assert(out(3L).getAs[String]("cleaned_text") === "one two three four five")
    assert(out(3L).getAs[Double]("removed_frac") === 0.0)
    // sub-shingle doc: no shingles, nothing removable
    assert(out(4L).getAs[String]("cleaned_text") === "tiny doc")
  }

  test("redaction scrubs emails, phones, IPs and SSNs; counts are per-pattern insertions") {
    val df = Seq(
      (1L, "contact alice.smith+x@example.co.uk or bob@test.org today"),
      (2L, "call +1 (555) 123-4567 or 555-987-6543 now"),
      (3L, "host 192.168.0.1 ssn 123-45-6789"),
      (4L, "nothing sensitive here")).toDF("doc_id", "text")
    val out = Redaction.redact(df, col("text"), Redaction.PiiPatterns)
      .select("doc_id", "n_email", "n_phone", "n_ip", "n_ssn", "redacted_text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) === 2) // both emails
    assert(out(1L).getString(5) === "contact [EMAIL] or [EMAIL] today")
    assert(out(2L).getLong(2) === 2) // both phone forms
    assert(!out(2L).getString(5).exists(_.isDigit))
    assert(out(3L).getLong(3) === 1 && out(3L).getLong(4) === 1)
    assert(out(3L).getString(5) === "host [IP] ssn [SSN]")
    assert(out(4L).getString(5) === "nothing sensitive here")
  }

  test("blocklist terms are redacted on word boundaries only") {
    val df = Seq((1L, "the customer saw customers and spark sparked")).toDF("doc_id", "text")
    val out = Redaction.redact(df, col("text"),
      Seq("TERM" -> Redaction.blocklistPattern(Seq("customer", "spark"))))
      .select("n_term", "redacted_text").head
    assert(out.getLong(0) === 2) // 'customers'/'sparked' do NOT match
    assert(out.getString(1) === "the [TERM] saw customers and [TERM] sparked")
  }

  test("decontamination flags exactly the documents sharing a 3-gram with the benchmark set") {
    // doc 0 is benchmark (0 % 20 == 0); doc 21 copies its text, doc 22
    // shares no 3-gram, doc 23 is too short to have any
    val df = Seq(
      (0L, "alpha beta gamma delta"),
      (21L, "alpha beta gamma epsilon"),
      (22L, "zeta eta theta iota"),
      (23L, "kappa lambda")).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    val keys = Dedup.docShingleKeys(Dedup.docShingles(df))
    val out = Decontam.contamination(df, keys)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sorted
    assert(out === Seq((21L, 1L, true), (22L, 0L, false), (23L, 0L, false)))
  }

  test("repetition stats count gram multiplicity and surface short docs with zeros") {
    val df = Seq(
      (1L, "a b c a b c a b c"), // grams: 7 total, 3 distinct, 'a b c' ×3
      (2L, "one two three four"), // 2 grams, all distinct
      (3L, "too short")).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    val out = Repetition.repetitionStats(df, Dedup.docShingles(df))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1L) === ((7L, 3L, 3L, 1.0 - 3.0 / 7.0)))
    assert(out(2L) === ((2L, 2L, 1L, 0.0)))
    assert(out(3L) === ((0L, 0L, 0L, 0.0)))
  }

  test("mixture rebalance downsamples only over-target domains and drops unlisted ones") {
    val rows = (1L to 400L).map(i => (i, "big")) ++
      (401L to 440L).map(i => (i, "small")) ++
      (441L to 450L).map(i => (i, "unlisted"))
    val df = rows.toDF("doc_id", "lang")
    // 50/50 target over 450 rows: big keeps 225/400 (5625 bp),
    // small needs 225 but has 40 → capped at 10000 bp (keep all)
    val out = Mixture.rebalance(df, "doc_id", "lang",
      Map("big" -> 5000L, "small" -> 5000L)).collect()
    val byLang = out.groupBy(_.getString(1))
    assert(!byLang.contains("unlisted"))
    assert(byLang("small").length === 40) // kept whole, keep_bp capped
    assert(byLang("small").forall(_.getLong(3) === 10000L))
    assert(byLang("big").forall(_.getLong(3) === 5625L))
    val kept = byLang("big").length
    // hash buckets are ~uniform: expect ~225 of 400
    assert(kept > 180 && kept < 270, s"kept $kept of 400")
    // determinism: same input → same rows
    val again = Mixture.rebalance(df, "doc_id", "lang",
      Map("big" -> 5000L, "small" -> 5000L)).collect()
    assert(out.map(_.getLong(0)).sorted.toSeq === again.map(_.getLong(0)).sorted.toSeq)
  }

  test("temperature mixture (T=2) flattens the head, keeps the tail whole, exact thresholds") {
    // 900 big + 100 small: weights isqrt → 30 and 10, shares 7500/2500 bp
    // big keep_bp  = min(10000, 7500*1000/900)  = 8333  (downsampled)
    // small keep_bp = min(10000, 2500*1000/100) = 10000 (kept whole)
    val rows = (1L to 900L).map(i => (i, "big")) ++
      (901L to 1000L).map(i => (i, "small"))
    val out = Mixture.temperatureRebalance(
      rows.toDF("doc_id", "lang"), "doc_id", "lang").collect()
    val byLang = out.groupBy(_.getString(1))
    assert(byLang("big").forall(r => r.getLong(2) === 7500L && r.getLong(4) === 8333L))
    assert(byLang("small").forall(r => r.getLong(2) === 2500L && r.getLong(4) === 10000L))
    assert(byLang("small").length === 100)
    val kept = byLang("big").length
    assert(kept > 700 && kept < 800, s"kept $kept of 900") // ~750 expected
  }

  test("unimax allocation: tails cap at MaxEpochs, head splits the rest, leftover reported") {
    // chars: a=100, b=200, c=1000; caps (C=2): 200, 400, 2000
    // budget = 1300*18//10 = 2340
    // ascending caps: a(200): 200*3+0=600 <= 2340 capped
    //                 b(400): 400*2+200=1000 <= 2340 capped
    //                 c(2000): 2000*1+600=2600 > 2340 uncapped
    // t = (2340-600) div 1 = 1740; leftover = 0
    val df = Seq(("a", 100L), ("b", 200L), ("c", 1000L))
      .toDF("lang", "n_chars")
    val out = Mixture.unimaxAllocation(df, "lang", "n_chars")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Long]("allocated_chars") === 200L)
    assert(out("a").getAs[Boolean]("is_capped"))
    assert(out("a").getAs[Long]("epochs_bp") === 20000L)
    assert(out("b").getAs[Long]("allocated_chars") === 400L)
    assert(out("c").getAs[Long]("allocated_chars") === 1740L)
    assert(!out("c").getAs[Boolean]("is_capped"))
    assert(out("c").getAs[Long]("epochs_bp") === 17400L)
    assert(out.values.forall(_.getAs[Long]("leftover_chars") === 0L))
    assert(out.values.forall(_.getAs[Long]("budget_chars") === 2340L))

    // all-capped regime: budget beyond every cap -> everyone trains C
    // epochs and the surplus is reported, not smeared.
    // chars: x=10, y=10 -> caps 20,20; budget = 20*18//10 = 36
    // x: 20*2+0=40 > 36 -> UNcapped both?? no: 40 > 36 means x uncapped
    // -> t = 36 div 2 = 18 each, leftover 0
    val even = Mixture.unimaxAllocation(
      Seq(("x", 10L), ("y", 10L)).toDF("lang", "n_chars"),
      "lang", "n_chars").collect().map(r => r.getString(0) -> r).toMap
    assert(even("x").getAs[Long]("allocated_chars") === 18L)
    assert(even("y").getAs[Long]("allocated_chars") === 18L)
    assert(even.values.forall(!_.getAs[Boolean]("is_capped")))

    // true all-capped: one lang, budget 18 > cap 10*... C=2 -> cap 20,
    // budget 10*18//10=18 < 20 -> uncapped, t=18, alloc 18.
    // To force all-capped the budget must exceed sum(caps): not
    // reachable with the registered 1.8x ratio and C=2 (1.8 < 2), so
    // assert the invariant instead: sum(alloc) + leftover == budget.
    for (m <- Seq(out, even)) {
      val alloc = m.values.map(_.getAs[Long]("allocated_chars")).sum
      assert(alloc + m.values.head.getAs[Long]("leftover_chars")
        === m.values.head.getAs[Long]("budget_chars"))
    }

    // integer remainder surfaces in leftover: chars p=7,q=9 -> caps
    // 14,18; budget = 16*18//10 = 28; p: 14*2+0=28 <= 28 capped;
    // q: 18*1+14=32 > 28 -> t = (28-14) div 1 = 14, leftover 0;
    // pick sizes that leave one: p=7,q=8 -> caps 14,16, budget=27;
    // p: 28 > 27 uncapped -> t = 27 div 2 = 13, leftover 1
    val rem = Mixture.unimaxAllocation(
      Seq(("p", 7L), ("q", 8L)).toDF("lang", "n_chars"),
      "lang", "n_chars").collect()
    assert(rem.forall(_.getAs[Long]("allocated_chars") === 13L))
    assert(rem.forall(_.getAs[Long]("leftover_chars") === 1L))
  }

  test("length-bucketed batches: longest-first cuts of 16, exact padding efficiency") {
    import graft.llm.Packing
    // expectations derive from the op's grouping invariants, which
    // hold for ANY salted sub-bucket assignment
    val docs = (1L to 100L).map(i => (i, 4L * (50 + i))) // 51..150 est tokens
      .toDF("doc_id", "n_chars")
    val out = Packing.lengthBucketedBatches(docs).collect()
    // every doc accounted for exactly once
    assert(out.map(_.getLong(3)).sum === 100L)
    // batches are ≤ 16 docs, and within a (bucket, sub) cell only the
    // LAST batch may be short
    val cells = out.groupBy(r => (r.getLong(0), r.getLong(1)))
    cells.values.foreach { rs =>
      val byIdx = rs.sortBy(_.getLong(2))
      byIdx.init.foreach(r => assert(r.getLong(3) === 16L))
      assert(byIdx.last.getLong(3) <= 16L)
    }
    // efficiency is exactly sum/(n*max) and within (0, 1]
    out.foreach { r =>
      val (n, mx, sm, eff) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))
      assert(eff === sm.toDouble / (n * mx).toDouble)
      assert(eff > 0.0 && eff <= 1.0)
      assert(mx <= r.getLong(0)) // bucket label is an upper bound on lengths
    }
  }

  test("chunking tiles each document exactly; the last chunk is short, not padded") {
    val df = Seq(
      (1L, (1 to 70).map(i => s"w$i").mkString(" ")), // 70 words, W=32 → 3 chunks
      (2L, "exactly one chunk"),
      (3L, "   ")).toDF("doc_id", "text") // no words → no chunks
    val out = llm.Chunking.chunks(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    assert(out.map(t => (t._1, t._2, t._3)) ===
      Seq((1L, 0L, 32L), (1L, 1L, 32L), (1L, 2L, 6L), (2L, 0L, 3L)))
    // reassembling the chunks reproduces the document's token stream
    val rejoined = out.filter(_._1 == 1L).map(_._4).mkString(" ")
    assert(rejoined === (1 to 70).map(i => s"w$i").mkString(" "))
    assert(out.find(_._1 == 2L).get._4 === "exactly one chunk")
  }

  test("boilerplateShare: cross-doc chunk dupes count, within-doc repeats don't") {
    // W=2 chunks; docs 1 and 2 share the chunk "a b" (boilerplate);
    // doc 3 repeats "z z" twice WITHIN itself only — not boilerplate;
    // doc 4 is all-unique
    val df = Seq(
      (1L, "a b c d"),   // chunks: "a b", "c d"
      (2L, "a b e f"),   // chunks: "a b", "e f"
      (3L, "z z z z"),   // chunks: "z z", "z z" (same doc twice)
      (4L, "p q r s")    // chunks: "p q", "r s"
    ).toDF("doc_id", "text")
    val got = llm.Chunking.boilerplateShare(llm.Chunking.chunks(df, w = 2))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got === Map(
      1L -> ((2L, 1L, 0.5)),
      2L -> ((2L, 1L, 0.5)),
      3L -> ((2L, 0L, 0.0)),
      4L -> ((2L, 0L, 0.0))))
  }

  test("decontamination's benchmark side joins as a broadcast, never a shuffle of the corpus") {
    val df = (1L to 200L).map(i => (i, s"w$i x$i y$i z$i q$i"))
      .toDF("doc_id", "text").withColumn("n_chars", length(col("text")))
    val keys = Dedup.docShingleKeys(Dedup.docShingles(df))
    val plan = Decontam.contamination(df, keys)
      .queryExecution.executedPlan.toString
    // the semi-join against benchmark shingles must be broadcast-hash
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("funnel stages require strictly ordered progress per user") {
    import java.sql.Timestamp
    def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val ev = Seq(
      // user 1 completes view -> click -> purchase in order
      (1L, "view", t(1)), (1L, "click", t(2)), (1L, "purchase", t(3)),
      // user 2 views and clicks, never purchases
      (2L, "view", t(1)), (2L, "click", t(5)),
      // user 3 purchases BEFORE viewing: must not count past stage 1
      (3L, "purchase", t(1)), (3L, "view", t(2)),
      // user 4 clicks at the SAME instant as the view: strict > excludes
      (4L, "view", t(7)), (4L, "click", t(7)),
      // user 5 never views
      (5L, "click", t(1)), (5L, "purchase", t(2))
    ).toDF("user_id", "event_type", "ts")
    val out = operators.Funnel.funnel(ev)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out("view") === ((4L, 1.0)))     // users 1-4
    assert(out("click") === ((2L, 0.5)))    // users 1, 2
    assert(out("purchase") === ((1L, 0.5))) // user 1 only
  }

  test("curation report: per-source shares sum to 1, counts cover the corpus") {
    import org.apache.spark.sql.functions._
    val report = llm.Curation.curationReport(
      Tables.documents(spark, sf), Models.corpusCuration(spark, sf)).collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(report.map(_.getLong(2)).sum === total)
    report.groupBy(_.getString(0)).values.foreach { rs =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-12)
    }
    assert(report.map(_.getString(1)).distinct.toSet.subsetOf(
      Set("kept", "low_quality", "exact_duplicate", "near_duplicate")))
  }

  test("funnel latency: exact first-completion deltas per transition") {
    import java.sql.Timestamp
    def t(s: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    val ev = Seq(
      // user 1: view@1 -> click@3 (2s) -> purchase@4 (1s)
      (1L, "view", t(1)), (1L, "click", t(3)), (1L, "purchase", t(4)),
      // user 2: view@1 -> click@5 (4s), never purchases
      (2L, "view", t(1)), (2L, "click", t(5)),
      // user 3: purchase precedes view — no transitions at all
      (3L, "purchase", t(1)), (3L, "view", t(2))
    ).toDF("user_id", "event_type", "ts")
    val out = operators.Funnel.funnelLatency(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    // view->click deltas {2s, 4s}: p50 = 3s, p90 = 3.8s interpolated
    assert(out(("view", "click")) == ((2L, 3.0, 3.8)))
    // click->purchase: one converting user, all percentiles = 1s
    assert(out(("click", "purchase")) == ((1L, 1.0, 1.0)))
  }

  test("sequence packing tiles each pack group contiguously in doc_id order") {
    import org.apache.spark.sql.functions._
    val packed = llm.Packing.packSequences(Tables.documents(spark, sf))
    // offsets reconstruct from the running total: offset = prefix % budget
    val bad = packed
      .withColumn("prefix", sum(col("n_tokens")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source", "bucket").orderBy("doc_id")
          .rowsBetween(Long.MinValue, -1)))
      .filter(coalesce(col("prefix"), lit(0L)) % llm.Packing.PackBudget =!= col("offset_in_seq"))
    assert(bad.count() === 0)
    // seq_index is non-decreasing in doc_id within a group, starts at 0
    val firstRows = packed.groupBy("source", "bucket")
      .agg(min(struct(col("doc_id"), col("seq_index"))).as("f"))
      .filter(col("f.seq_index") =!= 0)
    assert(firstRows.count() === 0)
    // every sequence's docs fit the budget except a possible straddler:
    // a doc's start offset is always < budget (offset_in_seq invariant)
    assert(packed.filter(col("offset_in_seq") >= llm.Packing.PackBudget).count() === 0)
    assert(packed.filter(col("offset_in_seq") < 0).count() === 0)
  }

  test("t-closeness: hand-computed TVD, threshold teeth, null sensitive excluded") {
    import graft.llm.Redaction
    // global sensitive distribution: A 5, B 5 (N = 10).
    // g1 holds 4A+1B, g2 1A+4B → TVD = ½(|0.8−0.5|+|0.2−0.5|) = 0.3 each.
    val rows = Seq.fill(4)(("g1", "A")) ++ Seq(("g1", "B")) ++
      Seq(("g2", "A")) ++ Seq.fill(4)(("g2", "B")) ++
      Seq(("g1", null.asInstanceOf[String])) // no label — excluded
    val df = rows.toDF("g", "s")
    val at = (t: Double) => Redaction.tClosenessAudit(df, Seq("g"), "s", t)
      .collect().head
    val r = at(0.2)
    assert(r.getDouble(0) == 0.2)
    assert(r.getLong(1) == 2L)         // n_groups
    assert(r.getLong(2) == 2L)         // both exceed t = 0.2
    assert(r.getLong(3) == 10L)        // risky rows exclude the null-label row
    assert(r.getDouble(4) == 0.3)      // max TVD exact (30 / (2·5·10))
    val loose = at(0.35)
    assert(loose.getLong(2) == 0L && loose.getLong(3) == 0L)
    // a value ABSENT from a group still contributes (closed-form term):
    // g3 all-C vs global — homogeneous groups score high
    val df2 = (Seq.fill(5)(("g3", "C")) ++ Seq.fill(5)(("g4", "D"))).toDF("g", "s")
    val r2 = Redaction.tClosenessAudit(df2, Seq("g"), "s", 0.2).collect().head
    assert(r2.getDouble(4) == 0.5)     // TVD(g3) = ½(|1−.5| + |0−.5|)
    assert(r2.getLong(2) == 2L)
  }

  test("CMS estimates are upper bounds and exact when collision-free") {
    val df = (1 to 100).flatMap(i => Seq.fill(if (i <= 3) 50 else 1)(s"k$i"))
      .toDF("k")
    val out = Sketches.cmsHeavyHitters(df, col("k"), "k", 10L).collect()
    // the three heavy keys are all reported (no false negatives)
    assert(out.map(_.getString(0)).toSet === Set("k1", "k2", "k3"))
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)}: estimate below exact count")
    }
  }
}
