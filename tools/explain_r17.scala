// Round-17 plan evidence: spark-shell -i tools/explain_r17.scala
// with --driver-class-path target/scala-2.13/classes.
// Env: EXPLAIN_QUERIES=q_a,q_b  EXPLAIN_SF=/root/testdata/sf0.1
//      EXPLAIN_SUFFIX=before|after
// Writes plans/r17/<query>_<suffix>.txt with .explain("formatted") output.
import java.nio.file.{Files, Paths}

val sfDir = sys.env.getOrElse("EXPLAIN_SF", "/root/testdata/sf0.1")
val suffix = sys.env.getOrElse("EXPLAIN_SUFFIX", "before")
val names = sys.env.getOrElse("EXPLAIN_QUERIES", "q_pagerank").split(",").map(_.trim).filter(_.nonEmpty)

Files.createDirectories(Paths.get("plans/r17"))
for (q <- names) {
  try {
    val df = graft.SparkEntry.queries(q)(spark, sfDir)
    val txt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    Files.writeString(Paths.get(s"plans/r17/${q}_${suffix}.txt"), txt)
    println(s"[explain] wrote plans/r17/${q}_${suffix}.txt (${txt.length} chars)")
  } catch { case e: Throwable =>
    println(s"[explain] $q FAILED: ${e.toString.linesIterator.next()}")
  }
}
sys.exit(0)
