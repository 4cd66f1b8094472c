package graft

import org.apache.spark.sql.functions._
import graft.sources.Corpus

/** JSONL corpus round-trip: parquet documents → JSONL (plain and gzip)
  * → read back with the explicit schema must be value-identical.
  */
class CorpusSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(df.columns.sorted.map(col): _*)

  test("documents round-trip through JSONL losslessly") {
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("corpus").toFile.getAbsolutePath
    Corpus.writeJsonl(docs, s"$dir/plain")
    val back = Corpus.readJsonl(spark, s"$dir/plain")
    assert(back.count() === docs.count())
    assert(canon(back).exceptAll(canon(docs)).count() === 0)
  }

  test("gzip JSONL reads back transparently") {
    val docs = Tables.documents(spark, sf).limit(50)
    val dir = java.nio.file.Files.createTempDirectory("corpus-gz").toFile.getAbsolutePath
    Corpus.writeJsonl(docs, s"$dir/gz", compression = Some("gzip"))
    assert(Corpus.readJsonl(spark, s"$dir/gz").count() === 50)
  }

  test("corrupt lines surface as null rows, not job failures") {
    val dir = java.nio.file.Files.createTempDirectory("corpus-bad").toFile
    val f = new java.io.File(dir, "bad.jsonl")
    java.nio.file.Files.writeString(f.toPath,
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}
        |this line is not json
        |{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}
        |""".stripMargin)
    val df = Corpus.readJsonl(spark, f.getAbsolutePath)
    assert(df.count() === 3)
    assert(df.filter(col("doc_id").isNotNull).count() === 2)
    assert(!df.columns.contains(Corpus.CorruptCol))
    // quarantine path: the raw offending line is retained verbatim
    // (ADVICE r3 #2), null for clean rows
    // collect full rows: Spark disallows scans whose pruned schema is
    // ONLY the corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    val raw = Corpus.readJsonlWithCorrupt(spark, f.getAbsolutePath).collect()
    val bad = raw.filter(r => !r.isNullAt(r.fieldIndex(Corpus.CorruptCol)))
    assert(bad.length === 1)
    assert(bad.head.getAs[String](Corpus.CorruptCol) === "this line is not json")
  }

  test("roundtrip audit: hostile text survives, exactly the injected shard quarantines") {
    import spark.implicits._
    // the JSON-escaping gauntlet: newlines, tabs, quotes, backslashes,
    // unicode (incl. astral), the separator char, and an empty string
    val docs = Seq(
      (1L, "line one\nline two\ttabbed", "en", "web", 24L),
      (2L, "she said \"hi\" \\ he left", "en", "web", 23L),
      (3L, "émoji é中😀 end", "zh", "books", 12L),
      (4L, "pipes | in | text", "en", "code", 17L),
      (5L, "", "en", "empty", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val scratch = java.nio.file.Files
      .createTempDirectory("corpus-audit").toFile.getAbsolutePath
    val got = Corpus.roundtripAudit(spark, docs, scratch).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // quarantine row: exactly the injected corrupt shard, counts only
    assert(got("__quarantine__") ==
      ((Corpus.CorruptLines.size.toLong, 0L, 0L)))
    // per-source rollup equals the same fold computed on the INPUT —
    // the roundtrip-fidelity claim (any mangled byte shifts the hash)
    val want = docs.groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("s"),
        sum(pmod(graft.llm.Dedup.hex60(concat_ws("|",
          col("doc_id").cast("string"), col("lang"), col("text"))),
          lit(Corpus.ChecksumMod))).as("c"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.removed("__quarantine__") == want)
  }
}
