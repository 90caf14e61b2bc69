package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the custom expressions/aggregates: register them in a
  * session's FunctionRegistry so `spark.sql` queries can call them
  * (`graft_poly_hash`, `graft_dot`, `graft_norm`, `graft_minhash`,
  * `graft_simhash`). Two entry points:
  *
  *  - [[register]]: imperative, for an existing session.
  *  - [[GraftExtensions]]: a `SparkSessionExtensions` injector for
  *    `spark.sql.extensions=graft.functions.GraftExtensions` deployments.
  */
object GraftFunctions {

  private def intLit(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_poly_hash" -> (es => PolyHashExpr(es.head)),
    "graft_dot" -> (es => DotProductExpr(es(0), es(1))),
    "graft_norm" -> (es => L2NormExpr(es.head)),
    "graft_hyper_proj" -> (es => HyperProjExpr(es(0), intLit(es(1)))),
    "graft_minhash" -> (es => MinHashAgg(es(0), intLit(es(1)))),
    "graft_simhash" -> (es => SimHashAgg(es(0), intLit(es(1)))),
    "graft_shingle_hashes" -> (es => ShingleHashesExpr(es(0), intLit(es(1)))),
    "graft_minhash_arr" -> (es => MinHashArrExpr(es(0), intLit(es(1)))),
    "graft_simhash_text" -> (es => SimHashTextExpr(es(0), intLit(es(1)))),
    "graft_rep_stats" -> (es => RepStatsExpr(es.head)),
    "graft_winnow" -> (es => WinnowExpr(es(0), intLit(es(1)), intLit(es(2)))),
    "graft_nfc" -> (es => NfcNormalizeExpr(es.head)),
    "graft_jaro_winkler" -> (es => JaroWinklerExpr(es(0), es(1))),
    "graft_damerau_levenshtein" -> (es => DamerauLevenshteinExpr(es(0), es(1))))

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}

/** `spark.sql.extensions` injector (class form required by the config). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    ext.injectPlannerStrategy(_ => graft.operators.AsOfJoin.Strategy)
    // interval-overlap theta joins → bucketed equi-joins (O(n²) → shuffle)
    ext.injectOptimizerRule(_ => graft.plans.IntervalJoinRewrite)
    // rollup aggregates over registered base tables → materialized view
    ext.injectOptimizerRule(_ => graft.plans.MaterializedViewRewrite)
  }
}
