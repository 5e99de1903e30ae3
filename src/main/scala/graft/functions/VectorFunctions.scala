package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float>` embedding columns.
  *
  * All folds are sequential left folds (Spark `aggregate` HOF), so results
  * are bit-identical to the DuckDB oracle's list_reduce and stable across
  * partitionings — no UDFs, stays in codegen.
  */
object VectorFunctions {

  /** float32 → float64 is exact, so both engines see identical operands. */
  def toDoubleVec(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (s, x) => s + x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Signed projection onto a constant hyperplane (for LSH bucketing). */
  def planeDot(v: Column, coefs: Seq[Double]): Column =
    aggregate(zip_with(v, typedlit(coefs), (x, c) => x * c), lit(0.0), (s, x) => s + x)
}
