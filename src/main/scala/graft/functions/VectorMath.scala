package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, built from
  * native higher-order expressions (`zip_with` + `aggregate`) — no UDFs, no
  * ML-library dependency, executes inside Catalyst.
  *
  * Determinism contract: every operation casts to double FIRST and then
  * folds strictly left-to-right, so the result is bit-identical to any other
  * engine doing sequential double accumulation (the DuckDB oracle mirrors
  * the same order with `list_reduce`). That makes threshold comparisons on
  * cosine values safe to verify across engines.
  */
object VectorMath {

  /** Sum of an array<double> column, strict left-to-right. */
  private def sumLtr(arr: Column): Column =
    aggregate(arr, lit(0.0d), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    sumLtr(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def norm2(a: Column): Column =
    sqrt(sumLtr(transform(a, x => x.cast("double") * x.cast("double"))))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))
}
