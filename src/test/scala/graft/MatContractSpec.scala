package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** dbt model contracts on Mat materializations (restored per ADVICE r10:
  * these were dropped when ContractSpec was repurposed for query/oracle
  * key alignment): schema deviations
  * fail before anything is published; null-constraint violations kill
  * the write job itself with a named-column error.
  */
class MatContractSpec extends SparkSpec {

  import spark.implicits._

  private val contract = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true)))

  test("a conforming build publishes; the table matches the contract") {
    val out = Mat.table(spark, sf, "contract_ok_spec", contract = Some(contract))(
      Seq((1L, "a"), (2L, null)).toDF("id", "name"))
    assert(out.count() === 2)
  }

  test("schema deviations fail before publish, naming the difference") {
    val mistyped = intercept[Exception] {
      Mat.table(spark, sf, "contract_bad_type_spec", contract = Some(contract))(
        Seq((1, "a")).toDF("id", "name")) // id is int, contract says bigint
    }
    assert(mistyped.getMessage.contains("mistyped") ||
      mistyped.getCause != null && mistyped.getCause.getMessage.contains("mistyped"))
    val extra = intercept[Exception] {
      Mat.table(spark, sf, "contract_extra_spec", contract = Some(contract))(
        Seq((1L, "a", 5.0)).toDF("id", "name", "oops"))
    }
    assert(extra.getMessage.contains("undeclared") ||
      extra.getCause != null && extra.getCause.getMessage.contains("undeclared"))
  }

  test("a null in a NOT NULL column kills the write with a named error") {
    val e = intercept[Exception] {
      Mat.table(spark, sf, "contract_null_spec", contract = Some(contract))(
        Seq((Some(1L), "a"), (None, "b")).toDF("id", "name"))
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("id is NOT NULL")),
      s"expected named null-constraint error, got: ${messages(e).mkString(" | ")}")
  }
}
