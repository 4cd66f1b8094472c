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
}
