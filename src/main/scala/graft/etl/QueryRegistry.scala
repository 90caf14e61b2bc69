package graft.etl

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Named-query registry replacing Athena `CfnNamedQuery` (SURVEY.md §2.12):
  * parses the reference's saved-query file format — `-- label:` /
  * `-- description:` comment headers splitting a .sql file into named
  * statements (`stack.ts:450-466`) — substitutes `${placeholder}`s with
  * catalog table names (`stack.ts:478-490`, including the `/_ +/g → "_"`
  * cleanup), and executes by label via `spark.sql`.
  */
final case class NamedQuery(label: String, description: String, sql: String)

object QueryRegistry {

  /** Parse `-- label: X` / `-- description: Y` delimited statements. */
  def parse(text: String): Seq[NamedQuery] = {
    val lines = text.linesIterator.toSeq
    val out = scala.collection.mutable.ArrayBuffer.empty[NamedQuery]
    var label: Option[String] = None
    var desc = ""
    val sql = new StringBuilder
    def flush(): Unit = {
      label.foreach { l =>
        val stmt = sql.toString.trim.stripSuffix(";")
        if (stmt.nonEmpty) out += NamedQuery(l, desc, stmt)
      }
      label = None; desc = ""; sql.clear()
    }
    lines.foreach { line =>
      val t = line.trim
      if (t.startsWith("-- label:")) { flush(); label = Some(t.stripPrefix("-- label:").trim) }
      else if (t.startsWith("-- description:")) desc = t.stripPrefix("-- description:").trim
      else if (!t.startsWith("--")) sql.append(line).append("\n")
    }
    flush()
    out.toSeq
  }

  /** `${name}` substitution + the reference's `_ +` → `_` cleanup. */
  def substitute(sql: String, vars: Map[String, String]): String = {
    val replaced = vars.foldLeft(sql) { case (acc, (k, v)) =>
      acc.replace("${" + k + "}", v)
    }
    replaced.replaceAll("_ +", "_")
  }

  /** Load a registry: label → executable statement. */
  def load(text: String, vars: Map[String, String]): ListMap[String, NamedQuery] =
    ListMap(parse(text).map(q => q.label -> q.copy(sql = substitute(q.sql, vars))): _*)

  def run(spark: SparkSession, registry: Map[String, NamedQuery], label: String): DataFrame =
    spark.sql(registry(label).sql)
}
