package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL corpus source/sink — the interchange format LLM training-data
  * pipelines actually exchange (one JSON object per line, splittable,
  * gzip-able per file). Schemas are ALWAYS explicit: at 100 TB, schema
  * inference is a second full pass over the corpus before the first
  * real one, and a silently inferred wrong type (long vs double)
  * corrupts every downstream hash. Readers accept a directory, a file,
  * or a glob; compressed files (.gz/.zst) decode transparently via the
  * line-record codecs.
  */
object Corpus {

  /** The documents-table shape (TESTDATA.md). */
  val documentsSchema: StructType = StructType.fromDDL(
    "doc_id bigint, text string, lang string, source string, n_chars bigint")

  def readJsonl(spark: SparkSession, path: String,
                schema: StructType = documentsSchema): DataFrame =
    spark.read
      .schema(schema)
      // corrupt lines surface as a row with all-null fields plus the
      // raw record, instead of killing a 100 TB job mid-flight
      .option("mode", "PERMISSIVE")
      .json(path)

  /** One JSON object per line; partition count controls file count. */
  def writeJsonl(df: DataFrame, path: String, compression: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
    compression.fold(w)(c => w.option("compression", c)).json(path)
  }
}
