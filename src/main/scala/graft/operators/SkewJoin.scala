package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-join salting: the standard remedy when one join key holds
  * a disproportionate share of the rows and a single reducer becomes the
  * straggler. AQE's skew-join split handles the sort-merge case at runtime;
  * this is the explicit form for planners that can't see the skew (or when
  * a deterministic layout is wanted).
  *
  * The skewed (big) side gets a per-row salt in [0, salts); the small side
  * is replicated once per salt value. Joining on (key, salt) fans each hot
  * key out across `salts` tasks. Inner-join results are identical to the
  * unsalted join.
  */
object SkewJoin {

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      saltFrom: Option[Column] = None): DataFrame = {
    require(salts > 0)
    // Salt from a hash: deterministic, no RNG state, and spreads a hot
    // key's rows as long as the hashed columns vary. ANY salt assignment
    // yields the identical join result (the small side carries every salt
    // value), so callers should pass `saltFrom` over one or two cheap
    // narrow columns — the full-row default is correct but pays a
    // hash-every-column cost per row on wide facts.
    val salt = saltFrom.map(c => hash(c)).getOrElse(hash(big.columns.map(col): _*))
    val bigSalted = big.withColumn("__salt", pmod(salt, lit(salts)))
    val smallExploded = small.withColumn(
      "__salt", explode(sequence(lit(0), lit(salts - 1))))
    bigSalted
      .join(smallExploded, Seq(key, "__salt"))
      .drop("__salt")
  }
}
