package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

/** Randomized property checks (fixed seeds — deterministic CI) for the
  * operators whose guarantees are algebraic rather than data-shaped:
  * quantization error bounds and global-index permutation laws must
  * hold for ANY input, not just the driver's testdata.
  */
class PropertySpec extends SparkSpec {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(20)
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
