package graft.cli

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

/** `-o file.{csv,json,parquet,orc}` result writers with the reference's
  * single-file semantics (reference `src/cli/mod.rs:779-844` AnyWriter):
  * Spark writes a single-partition directory, then the part file is moved
  * to the requested path. ORC stands in for the reference's optional
  * Vortex format (SURVEY §2.1: no JVM Vortex exists; ORC is the closest
  * columnar substitute Spark ships).
  */
object Writers {

  def write(df: DataFrame, outPath: String): Unit = {
    val fmt = outPath.split('.').last.toLowerCase match {
      case "csv" => "csv"
      case "json" | "ndjson" => "json"
      case "parquet" => "parquet"
      case "orc" => "orc"
      case other => throw new IllegalArgumentException(
        s"unsupported output extension .$other (csv, json, parquet, orc)")
    }
    val tmp = Files.createTempDirectory("graft-out").resolve("d").toString
    val writer = df.coalesce(1).write.mode("overwrite")
    (fmt match {
      case "csv" => writer.option("header", "true")
      case _ => writer
    }).format(fmt).save(tmp)
    val part = new File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-")).getOrElse(
        throw new IllegalStateException(s"no part file produced in $tmp"))
    Files.createDirectories(Paths.get(outPath).toAbsolutePath.getParent)
    Files.move(part.toPath, Paths.get(outPath), StandardCopyOption.REPLACE_EXISTING)
  }
}
