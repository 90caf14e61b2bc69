package graft.functions

import org.apache.spark.sql.Column

/** Dense-vector math over `array<float>` embedding columns, backed by the
  * codegen'd expressions in [[GraftExprs]] — no UDFs, no ML-library
  * dependency, one JVM loop per row.
  *
  * Determinism contract: every operation casts each element to double FIRST
  * and then folds strictly left-to-right, so the result is bit-identical to
  * any other engine doing sequential double accumulation (the DuckDB oracle
  * mirrors the same order with `list_reduce`). That makes threshold
  * comparisons on cosine values safe to verify across engines.
  *
  * Inputs must be `array<float>` (the embeddings' physical type).
  */
object VectorMath {

  def dot(a: Column, b: Column): Column = GraftColumns.dotF(a, b)

  def norm2(a: Column): Column = GraftColumns.normF(a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))
}
