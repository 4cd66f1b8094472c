package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

/** Randomized property checks (fixed seeds — deterministic CI) for the
  * operators whose guarantees are algebraic rather than data-shaped:
  * quantization error bounds and global-index permutation laws must
  * hold for ANY input, not just the driver's testdata.
  */
class PropertySpec extends SparkSpec {

  private def check(name: String, p: Prop, cases: Int = 20): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(cases)
        .withInitialSeed(org.scalacheck.rng.Seed(0xC0FFEE)), p)
    assert(res.passed, s"$name: $res")
  }

  test("quantize/dequantize error ≤ scale/254 for arbitrary float vectors") {
    import spark.implicits._
    val vecGen = Gen.nonEmptyListOf(Gen.chooseNum(-100f, 100f))
    check("sq8 bound", Prop.forAll(Gen.nonEmptyListOf(vecGen)) { vecs =>
      val df = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
      val bad = llm.Quantize.dequantize(llm.Quantize.quantize(df))
        .withColumnRenamed("embedding", "rec")
        .join(df, Seq("vec_id"))
        .select(
          array_max(transform(col("embedding"), x => abs(x))).cast("double").as("s"),
          aggregate(zip_with(col("embedding"), col("rec"),
            (a, b) => abs(a.cast("double") - b.cast("double"))),
            lit(0.0), (acc, x) => greatest(acc, x)).as("err"))
        .filter(col("err") > col("s") / lit(254.0) * lit(1.0000001)).count()
      bad == 0L
    })
  }

  test("BPE segmentation always rebuilds the word; merges shrink total pieces") {
    import spark.implicits._
    val wordGen = Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    val docGen = Gen.nonEmptyListOf(wordGen).map(_.mkString(" "))
    check("bpe roundtrip", Prop.forAll(Gen.nonEmptyListOf(docGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, t.length.toLong) }
        .toDF("doc_id", "text", "n_chars")
      val (merges, seg) = llm.Bpe.train(docs)
      val rows = seg.collect()
      val rebuilds = rows.forall(r => r.getString(3).replace(" ", "") == r.getString(0))
      // n_pieces never exceeds word length, and equals it only when no
      // merge touched the word
      val bounded = rows.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= r.getString(0).length)
      // merge ranks are dense from 1 (sentinel rounds only ever at the tail)
      val ranks = merges.select("merge_rank").as[Int].collect().sorted.toSeq
      rebuilds && bounded && ranks == (1 to ranks.length)
    }, cases = 6) // 6 corpora × MergeCount training rounds each
  }

  test("fuzzy nearest match equals the in-block DP-levenshtein argmin") {
    import spark.implicits._
    // two-token names over a small alphabet → multi-member blocks
    val tok = Gen.nonEmptyListOf(Gen.oneOf('x', 'y')).map(_.take(4).mkString)
    val nameGen = Gen.zip(tok, Gen.oneOf("n1", "n2")).map { case (a, b) => s"$a $b" }
    check("fuzzy argmin", Prop.forAll(Gen.nonEmptyListOf(nameGen)) { names =>
      val df = names.toDF("name")
      val out = operators.Fuzzy.nearestNameMatch(df, "name").collect()
        .map(r => (r.getString(0), r.getString(2), r.getLong(3)))
      val distinct = names.distinct
      out.forall { case (n, m, d) =>
        val block = distinct.filter(o => o != n &&
          o.split(" ").last == n.split(" ").last)
        val best = block.map(o => (StringUtilsLev.dist(n, o), o)).min
        (d, m) == best
      }
    })
  }

  test("degree-oriented triangle counts equal brute-force enumeration on random graphs") {
    import spark.implicits._
    val n = 8
    val pairGen = Gen.listOf(Gen.zip(Gen.chooseNum(0, n - 1), Gen.chooseNum(0, n - 1)))
      .map(_.collect { case (a, b) if a != b =>
        (math.min(a, b).toLong, math.max(a, b).toLong) }.distinct)
      .suchThat(_.nonEmpty)
    check("triangles", Prop.forAll(pairGen) { edges =>
      val got = operators.Graph.triangleCounts(edges.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val eset = edges.toSet
      def conn(a: Long, b: Long) = eset.contains((math.min(a, b), math.max(a, b)))
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = nodes.map { v =>
        val others = nodes.filter(_ != v)
        v -> (for (i <- others; j <- others
          if i < j && conn(v, i) && conn(v, j) && conn(i, j)) yield 1).size.toLong
      }.filter(_._2 > 0).toMap
      got == expected
    }, cases = 12)
  }

  test("bounded-heap top_k equals the window ranking under score ties") {
    import spark.implicits._
    val k = 3
    // narrow score range → dense ties; the payload tiebreak must decide
    val rowGen = Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0, 4), Gen.chooseNum(0L, 50L))
    check("topk ties", Prop.forAll(Gen.nonEmptyListOf(rowGen)) { rows0 =>
      val rows = rows0.map { case (q, s, p) => (q.toLong, s.toDouble, p) }
        .distinctBy(r => (r._1, r._3)) // unique payload per group = total order
      val df = rows.toDF("q", "score", "p")
      val heap = df.groupBy("q")
        .agg(graft.expressions.TopKAggregate.top_k(col("score"), col("p"), k).as("tk"))
        .select(col("q"), posexplode(col("tk")))
        .select(col("q"), (col("pos") + 1).cast("int").as("rank"),
          col("col.payload").as("p"), col("col.score").as("score"))
      val win = df.withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("q")
            .orderBy(col("score").desc_nulls_last, col("p"))))
        .filter(col("rank") <= k).select("q", "rank", "p", "score")
      heap.exceptAll(win).count() == 0 && win.exceptAll(heap).count() == 0
    }, cases = 12)
  }

  test("global index is a 0..n-1 permutation for arbitrary id sets") {
    import spark.implicits._
    val idsGen = Gen.nonEmptyListOf(Gen.chooseNum(0L, 1000000L)).map(_.distinct)
    check("permutation", Prop.forAll(idsGen) { ids =>
      val df = ids.toDF("doc_id")
      val pos = graft.operators.GlobalIndex.epochShuffle(df)
        .select("shuffle_pos").as[Long].collect().sorted.toSeq
      pos == (0L until ids.length.toLong)
    })
  }
}
