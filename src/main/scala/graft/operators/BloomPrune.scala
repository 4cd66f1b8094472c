package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType

/** Explicit Bloom-filter join pruning — the runtime-filter pattern
  * (Spark's own `InjectRuntimeFilter`, here surfaced as an operator the
  * pipeline can apply deliberately): aggregate the build side's join
  * keys into a few-hundred-KB Bloom filter, ship it to every fact-scan
  * task as a literal, and drop non-matching fact rows BEFORE the join's
  * exchange.
  *
  * Why it matters at 100 TB: when the probe side is the corpus and the
  * build side is selective (a benchmark blocklist, the purchasing-user
  * subset, a canonical-id set), the join shuffles the whole probe side
  * only to discard most of it on match. The Bloom filter moves that
  * discard to the scan — false positives only (bounded by the bits/item
  * budget), never false negatives, so a downstream exact join keeps
  * results exact while the exchange carries ~selectivity × |fact| rows.
  * Uses Spark's native codegen'd `BloomFilterAggregate` /
  * `BloomFilterMightContain` expressions (xxhash64-keyed), not a UDF.
  */
object BloomPrune {

  /** Aggregate `key` (any type — hashed to long with xxhash64) of `dim`
    * into a Bloom filter's serialized bytes. None when `dim` is empty
    * (the aggregate yields NULL — distinguish "no keys" from "empty
    * filter"). A driver-side value, like a broadcast dim: ~1.2 bytes
    * per item at the default 8 bits/item budget. */
  def buildBloom(dim: DataFrame, key: Column, expectedItems: Long): Option[Array[Byte]] = {
    val agg = Bridge.column(
      new BloomFilterAggregate(Bridge.expression(xxhash64(key)),
        expectedItems).toAggregateExpression())
    Option(dim.agg(agg.as("bf")).head().getAs[Array[Byte]]("bf"))
  }

  /** `might_contain(bloom, xxhash64(key))` as a codegen'd Column. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal.create(bloom, BinaryType), Bridge.expression(xxhash64(key))))

  /** Fact rows whose `factKey` might be in the filter; every true
    * member survives (no false negatives). An empty build side prunes
    * everything — the exact join would drop every row anyway. */
  def prune(fact: DataFrame, factKey: Column, bloom: Option[Array[Byte]]): DataFrame =
    bloom.fold(fact.limit(0))(b => fact.filter(mightContain(b, factKey)))
}
