package graft.etl

import org.apache.spark.sql.SparkSession

/** The Spark catalog replaces Glue DB + crawlers (SURVEY.md §2.1 S9):
  * schemas are known at write time, so registration is immediate — no
  * inference phase, no "last job hogs the schema" drift (`README.md:501`;
  * we read with `mergeSchema` so every state's columns survive).
  *
  * Table naming preserves the reference's convention so its saved SQL
  * rewrites cleanly (`stack.ts:64-69`, `README.md:503`): per-state data
  * tables `{prefix}_state_{s}` and one metadata table `{prefix}_parquet`.
  */
object CatalogRegistry {

  def dataTableName(prefix: String, state: String): String =
    s"${prefix}_state_${state.toLowerCase}"

  def metadataTableName(prefix: String): String = s"${prefix}_parquet"

  def registerData(spark: SparkSession, path: String, prefix: String, state: String): String = {
    val name = dataTableName(prefix, state)
    spark.read.option("mergeSchema", "true").option("basePath", path).parquet(path)
      .createOrReplaceTempView(name)
    name
  }

  def registerMetadata(spark: SparkSession, path: String, prefix: String): String = {
    val name = metadataTableName(prefix)
    spark.read.option("mergeSchema", "true").parquet(path).createOrReplaceTempView(name)
    name
  }
}
