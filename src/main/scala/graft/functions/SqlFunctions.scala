package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.expressions.{HilbertIndex16, InterleaveBits16, TopKAggregate}
import graft.expressions.StringSim.JaroWinkler
import graft.expressions.TextExprs.Md5Prefix60
import graft.expressions.VectorExprs.DotProduct

/** SQL registration for the library's native Catalyst expressions — a
  * reference (dbt) user works in SQL, so the custom functions must be
  * callable there too, not only through the Scala Column API:
  *
  *   select g, top_k(score, id, 5)      -- bounded-heap grouped top-k
  *                                         (null score/payload rows
  *                                         are ignored — see TopKAgg)
  *   select zorder_key(xb, yb)          -- Morton layout key
  *   select hilbert_key(xb, yb)         -- Hilbert layout key (r14)
  *   select jaro_winkler(a, b)          -- record-linkage similarity
  *   select dot_product(a, b)           -- codegen'd float-vector dot
  *   select md5_prefix60(s)             -- 60-bit md5 (no hex round-trip)
  *
  * Registered as session temp functions through the analyzer's own
  * FunctionRegistry (the same seam SparkSessionExtensions
  * `injectFunction` feeds), so plans built from SQL text and plans
  * built from Columns resolve to the IDENTICAL expression nodes —
  * SqlSurfaceSpec asserts the two formulations return equal results.
  */
object SqlFunctions {

  private def arity(name: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n, s"$name expects $n arguments, got ${args.length}")

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("top_k", { args =>
      arity("top_k", args, 3)
      val k = args(2) match {
        case Literal(v: Int, IntegerType) => v
        case other => throw new IllegalArgumentException(
          s"top_k's k must be an integer literal, got $other")
      }
      TopKAggregate(args(0), args(1), k)
    }, "scala_udf")
    reg.createOrReplaceTempFunction("zorder_key", { args =>
      arity("zorder_key", args, 2)
      InterleaveBits16(args(0), args(1))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("hilbert_key", { args =>
      arity("hilbert_key", args, 2)
      HilbertIndex16(args(0), args(1))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("jaro_winkler", { args =>
      arity("jaro_winkler", args, 2)
      JaroWinkler(args(0), args(1))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("dot_product", { args =>
      arity("dot_product", args, 2)
      DotProduct(args(0), args(1))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("md5_prefix60", { args =>
      arity("md5_prefix60", args, 1)
      Md5Prefix60(args(0))
    }, "scala_udf")
  }
}
