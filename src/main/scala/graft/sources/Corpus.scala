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

  /** PERMISSIVE mode only retains the offending raw line when the read
    * schema carries the corrupt-record column (ADVICE r3 #2 — without
    * it, corrupt lines are indistinguishable all-null rows). */
  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(CorruptCol, "string")

  /** Clean read: corrupt lines become all-null rows (never a job kill
    * mid-flight at 100 TB); the raw-line diagnostic column is read but
    * dropped. Use [[readJsonlWithCorrupt]] to quarantine bad lines. */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType = documentsSchema): DataFrame =
    readJsonlWithCorrupt(spark, path, schema).drop(CorruptCol)

  /** Read keeping `_corrupt_record`: null for clean rows, the verbatim
    * input line for corrupt ones — filter on it to split the corpus
    * into a clean stream and a quarantine sink in one pass. Caveat
    * (Spark contract): a query whose pruned scan schema is ONLY the
    * corrupt column is rejected (QUERY_ONLY_CORRUPT_RECORD_COLUMN) —
    * keep at least one data column in the projection, as a quarantine
    * sink naturally does. */
  def readJsonlWithCorrupt(spark: SparkSession, path: String,
                           schema: StructType = documentsSchema): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** One JSON object per line; partition count controls file count. */
  def writeJsonl(df: DataFrame, path: String, compression: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
    compression.fold(w)(c => w.option("compression", c)).json(path)
  }
}
