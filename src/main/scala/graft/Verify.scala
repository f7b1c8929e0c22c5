package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → a FLAT
  * `outDir/<name>.parquet` file, plus `oracle_sql.json` for the driver's
  * DuckDB compare and a streamed `MANIFEST.json` forensic record.
  *
  * Robustness contract (CORRECTNESS_r01/r02 were both `{}` despite the
  * full surface passing the same check run by hand — so this main is
  * written to leave evidence and partial results under ANY truncation):
  *  - `oracle_sql.json` is written FIRST, before any Spark job runs;
  *  - queries run cheapest-first, each flushed to its flat path as it
  *    completes — a wall-clock kill truncates the tail, never the head;
  *  - `MANIFEST.json` is rewritten after every query with
  *    {rows, schema, sha256, seconds, error} so a later empty gate still
  *    proves exactly what ran and what each output contained;
  *  - parallelism defaults to the machine (capped 32), not a fixed 4 —
  *    an unset SPARK_GRAFT_CPUS must not 8×-slow the gate run.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional third arg: comma-separated query subset (iteration speedup;
    // the driver always runs the full set)
    val subset = args.lift(2).map(_.split(",").toSet)
    val defaultCpus = math.min(Runtime.getRuntime.availableProcessors, 32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus.toString)
    new java.io.File(outDir).mkdirs()
    writeOracleSql(outDir) // before ANY Spark work — survives any timeout

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // GC-driven ContextCleaner cleanup may never fire under a big heap
      // across a ~50-query run; sweep shuffle/broadcast metadata regularly.
      .config("spark.cleaner.periodicGC.interval", "45s")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm every shared cache, snapshot the persisted-RDD ids, and release
    // per-query result/checkpoint blocks after each query — without this a
    // full gate run accumulates ~50 queries' blocks, evicts the shared
    // caches, and algorithms re-derive their input graph per superstep
    // (the r3 full-run degradation; see CacheHygiene).
    val keep = try {
      graft.queries.GraphQueries.warmShared(spark, sfDir)
      graft.core.CacheHygiene.persistedIds(spark)
    } catch { case e: Throwable =>
      System.err.println(s"[verify] warmup failed: ${e.getMessage}"); Set.empty[Int]
    }

    val manifest = scala.collection.mutable.LinkedHashMap[String, String]()
    def flushManifest(): Unit = {
      val body = manifest.map { case (k, v) => s"${q(k)}: $v" }
        .mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/MANIFEST.json"), body)
    }

    val ordered = SparkEntry.orderedQueryNames
      .flatMap(n => SparkEntry.queries.get(n).map(n -> _)) ++
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filterNot { case (n, _) => SparkEntry.orderedQueryNames.contains(n) }

    ordered
      .filter { case (name, _) => subset.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          // Contract: the result must land at exactly `outDir/<name>.parquet`.
          // Spark writes a directory, so write to a temp dir and move the
          // single part file to the flat path the driver's gate expects.
          val tmp = s"$outDir/_tmp_$name"
          fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(tmp)
          val part = new java.io.File(tmp).listFiles()
            .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
            .getOrElse(throw new IllegalStateException(s"no part file in $tmp"))
          val dest = Paths.get(s"$outDir/$name.parquet")
          Files.deleteIfExists(dest)
          Files.move(part.toPath, dest)
          deleteRecursively(new java.io.File(tmp))
          val sec = (System.nanoTime() - t0) / 1e9
          // row count from the written file's footer (metadata-only scan)
          val written = spark.read.parquet(dest.toString)
          val rows = written.count()
          val schema = written.schema.map(f => s"${f.name}:${f.dataType.simpleString}")
            .mkString(",")
          manifest(name) = s"""{"rows": $rows, "schema": ${q(schema)}, """ +
            s""""sha256": ${q(sha256(dest))}, "seconds": ${f"$sec%.2f"}}"""
          System.err.println(f"[verify] $name ok in $sec%.1fs ($rows rows)")
        } catch { case e: Throwable =>
          val sec = (System.nanoTime() - t0) / 1e9
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName).take(500)
          manifest(name) = s"""{"error": ${q(msg)}, "seconds": ${f"$sec%.2f"}}"""
          System.err.println(s"[verify] $name failed: $msg")
        }
        graft.core.CacheHygiene.releaseAllExcept(spark, keep): Unit
        flushManifest()
      }
    spark.stop()
  }

  private def sha256(p: java.nio.file.Path): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def writeOracleSql(outDir: String): Unit = {
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
