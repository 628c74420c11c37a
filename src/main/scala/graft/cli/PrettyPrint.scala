package graft.cli

import org.apache.spark.sql.DataFrame

/** psql-style box rendering of result batches (reference default stdout
  * sink, `src/cli/mod.rs:682-696` `pretty_format_batches`).
  */
object PrettyPrint {

  def format(df: DataFrame, maxRows: Int = 100): String = {
    val cols = df.columns
    val rows = df.take(maxRows + 1)
    val truncated = rows.length > maxRows
    val shown = rows.take(maxRows).map(_.toSeq.map(cell))
    val widths = cols.indices.map { i =>
      (cols(i).length +: shown.map(_(i).length)).max
    }
    def sep = widths.map("-" * _).mkString("+-", "-+-", "-+")
    def line(vals: Seq[String]) =
      vals.zip(widths).map { case (v, w) => v.padTo(w, ' ') }
        .mkString("| ", " | ", " |")
    val sb = new StringBuilder
    sb.append(sep).append('\n')
    sb.append(line(cols.toSeq)).append('\n')
    sb.append(sep).append('\n')
    shown.foreach(r => sb.append(line(r)).append('\n'))
    sb.append(sep)
    if (truncated) sb.append(s"\n(first $maxRows rows)")
    sb.toString
  }

  private def cell(v: Any): String = v match {
    case null => ""
    case arr: Array[_] => arr.mkString("[", ", ", "]")
    case s: Seq[_] => s.mkString("[", ", ", "]")
    case other => other.toString
  }
}
