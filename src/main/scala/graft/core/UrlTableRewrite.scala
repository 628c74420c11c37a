package graft.core

/** URL-table support (reference `crates/datafusion-app/src/local.rs:101`
  * `enable_url_table`): lets SQL reference a bare file path as a table —
  * `SELECT * FROM 'data/file.parquet'`. Spark already supports
  * `parquet.`/path``, so this is a pre-parse rewrite of quoted-path
  * relations to Spark's format-qualified table syntax.
  */
object UrlTableRewrite {
  private val FromPath =
    """(?i)\b(FROM|JOIN)\s+'([^']+\.(parquet|csv|json))'""".r

  def apply(sql: String): String =
    FromPath.replaceAllIn(sql, m => {
      val kw = m.group(1)
      val path = m.group(2)
      val fmt = m.group(3).toLowerCase match {
        case "parquet" => "parquet"
        case "csv" => "csv"
        case "json" => "json"
      }
      // quoteReplacement: a '$' or '\' in the file path must not be treated
      // as a regex replacement-group reference.
      scala.util.matching.Regex.quoteReplacement(s"$kw $fmt.`$path`")
    })
}
