package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A declared query from SURVEY.md §2: a DataFrame builder plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Determinism contract (SURVEY §0): every query ends in a total-order
  * ORDER BY (unique key or all output columns), derived doubles are
  * rounded identically on both sides, int32 outputs are cast to BIGINT,
  * and all date logic is UTC.
  */
final case class DeclaredQuery(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Registry {
  /** All operator modules contributing declared queries. Modules expose
    * Seq, not Map: a Map literal silently keeps the LAST entry on a
    * duplicated key, so an intra-module name collision would shadow an
    * existing query without any signal — the Seq spelling lets the
    * global check below catch every collision, same-module included.
    */
  def modules: Seq[Seq[(String, DeclaredQuery)]] = Seq(
    graft.operators.Scans.defs,
    graft.operators.Relational.defs,
    graft.operators.Joins.defs,
    graft.operators.Aggregates.defs,
    graft.operators.Windows.defs,
    graft.operators.TimeSeries.defs,
    graft.operators.Llm.defs,
    graft.operators.Multimodal.defs,
    graft.streaming.Streams.defs
  )

  lazy val all: Map[String, DeclaredQuery] = {
    val entries = modules.flatten
    val dupes = entries.map(_._1).groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    require(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(",")}")
    entries.toMap
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  def oracleSql: Map[String, String] =
    all.collect { case (k, q) if q.oracle.isDefined => k -> q.oracle.get }
}
