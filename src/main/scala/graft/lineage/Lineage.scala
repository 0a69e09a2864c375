package graft.lineage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType}
import java.io.{File, FileWriter}
import java.util.concurrent.atomic.AtomicInteger

/** Data-lineage + numeric-audit log (SURVEY.md §2.12). The reference writes one
  * DynamoDB item per operation keyed by execution id + monotonically
  * increasing sequence (datalineage.py:60-89); here a JSONL file.
  *
  * The numeric audit (A1) sums every float/double/decimal column; the
  * reference loops `collect()` per column (datalineage.py:140-143) — we fold
  * everything into ONE agg pass, which is the only form that survives at
  * 100 TB. */
class Lineage(executionId: String, sink: Option[String] = None) {
  private val seq = new AtomicInteger(0)
  private val entries = scala.collection.mutable.ListBuffer.empty[String]

  private def esc(s: String): String = graft.config.Specs.jsonEscape(s)

  def update(df: DataFrame, operation: String, detail: String = ""): Unit = {
    val n = seq.incrementAndGet()
    val line = s"""{"execution_id":"${esc(executionId)}","seq":$n,""" +
      s""""op":"${esc(operation)}","detail":"${esc(detail)}"}"""
    entries += line
    sink.foreach { path =>
      val w = new FileWriter(new File(path), true)
      try w.write(line + "\n") finally w.close()
    }
  }

  /** Single-pass numeric audit: row count + per-numeric-column sums. */
  def numericAudit(df: DataFrame, phase: String): Map[String, Double] = {
    val numCols = df.schema.fields.collect {
      case f if f.dataType == DoubleType || f.dataType == FloatType ||
        f.dataType.isInstanceOf[DecimalType] => f.name
    }.toSeq
    val aggs = count(lit(1)).cast(DoubleType).as("__rowcount") +:
      numCols.map(c => sum(col(c).cast(DoubleType)).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val metrics = ("rowcount" -> row.getDouble(0)) +: numCols.zipWithIndex.map {
      case (c, i) => c -> (if (row.isNullAt(i + 1)) 0.0 else row.getDouble(i + 1))
    }
    update(df, "numericaudit", s"$phase: " + metrics.map { case (k, v) => s"$k=$v" }.mkString(","))
    metrics.toMap
  }

  def log: Seq[String] = entries.toSeq
}
