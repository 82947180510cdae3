package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query-name filter (dev iteration)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt,
      GraftSession.CpuDenseMaxPartitionBytes).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Sink-query scratch lives INSIDE the harness-owned output tree (an
    // underscore-prefixed dir the parquet compare ignores): /tmp in the
    // gate container can be swept between a query's write and read-back,
    // and round 9's only red row was exactly that environment coupling.
    val scratch = new java.io.File(outDir, "_scratch")
    scratch.mkdirs()
    System.setProperty("graft.scratch.root", scratch.getAbsolutePath)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          // Write a one-row error marker so the driver records a FAILED
          // correctness row (schema/hash mismatch) instead of silently
          // omitting the query — an omission the gate can miss.
          try {
            import spark.implicits._
            Seq(Option(e.getMessage).getOrElse(e.getClass.getName).take(500))
              .toDF("graft_query_error")
              .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
          } catch { case _: Throwable => () }
        }
        // drain this query's shareLazily cache entries (rfm ranked frame,
        // triangle core) so a full 247-query dump never accretes
        // CacheManager entries for the rest of the run
        finally org.apache.spark.sql.graft.Bridge.releaseShared()
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Every query result is parquet-materialized by now; remove the scratch
    // tree so the driver's outDir walk sees exactly the query dirs + json.
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(scratch)
    spark.stop()
  }
}
