// Scenario sweep for the embstream soak's epoch leg: which shift variant
// (a) FIRES the epoch-0 gauge and (b) re-anchors BOTH signals under an
// epoch-1 retrain with accumulated mode mass, on the SYNTHETIC
// trueGrowthEmbeddings corpus at 1x and 10x. Run:
//   /opt/spark/bin/spark-shell --master 'local[32]' --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes -i tools/sweep_shift.scala
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.ops.Similarity
import graft.functions.VectorFunctions

spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.shuffle.partitions", 32)

val baseDir = "/root/testdata/sf0.01"
val nBase = graft.Tables.embeddings(spark, baseDir).count()

def stats(batch: DataFrame, cents: DataFrame): (Long, Long, Long) = {
  val assigned = Similarity.assignToCentroids(
      batch.select(col("vec_id"), col("embedding")), cents)
    .select(col("cluster").cast("long").as("cluster"),
      col("embedding"), col("nsq")).localCheckpoint(true)
  val f = assigned.join(broadcast(cents), col("cluster") === col("c_id"))
    .select(floor(
      (VectorFunctions.dot(col("embedding"), col("c_emb")) /
        sqrt(col("nsq") * col("c_nsq"))) * lit(1e9)).cast("long").as("p"))
    .agg(count(lit(1)).as("n"), sum(col("p")).as("s")).head()
  val mx = assigned.groupBy(col("cluster")).agg(count(lit(1)).as("c"))
    .agg(max(col("c"))).head().getLong(0)
  val n = f.getLong(0)
  (n, f.getLong(1) / n, mx * 1000000000L / n)
}

def trainOn(corpus: DataFrame, key: String): DataFrame = {
  val dir = s"target/sweep/$key"
  corpus.select(col("vec_id"), col("embedding"))
    .write.mode("overwrite").parquet(dir)
  val (c, _) = Similarity.ivfIndexPersisted(spark, dir,
    spark.read.parquet(dir), suffix = s"_sw_$key")
  c.localCheckpoint(true)
}

for (scale <- Seq(1, 10)) {
  val n = nBase * scale
  val emb = graft.Soak.trueGrowthEmbeddings(spark, baseDir, n)
    .localCheckpoint(true)
  val splitId = n * 3L / 5L
  val base = emb.filter(col("vec_id") < splitId)
  val arr = emb.filter(col("vec_id") >= n - nBase * 2L / 5L)
    .select(col("vec_id"), col("embedding")).localCheckpoint(true)
  val arrN = arr.count()
  val cents0 = trainOn(base, s"b$scale")

  for ((tag, mod, eps) <- Seq(("full", 1, 0.5), ("half", 2, 0.5),
      ("half1", 2, 1.0), ("threeq", 4, 0.75))) {
    def shift(src: DataFrame, off: Long, e: Double): DataFrame = src
      .select((col("vec_id") + lit(off)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i % mod =!= (mod - 1), (abs(x) + lit(e)).cast("float"))
            .otherwise(x)).as("embedding"))
    // epoch 0: ref = raw arrivals, new = shifted arrivals
    val (_, rf, rs) = stats(arr, cents0)
    val s1 = shift(arr, n + 1000000L, eps).localCheckpoint(true)
    val (_, nf, ns) = stats(s1, cents0)
    val fire = (rf - nf) > 50000000L || ns > 400000000L
    // accumulate mode mass >= corpus/4, retrain, probe
    val copies = math.max(1L, (splitId + arrN) / (4L * arrN)).toInt
    val mass = (1 until copies).foldLeft(s1)((acc, i) =>
      acc.unionByName(shift(
        base.filter(pmod(col("vec_id"), lit(math.max(1, copies - 1).toLong))
          === (i - 1).toLong).limit(arrN.toInt), n + 1000000L * (i + 1), eps)))
      .localCheckpoint(true)
    val corpus1 = base.select(col("vec_id"), col("embedding"))
      .unionByName(arr).unionByName(mass)
    val cents1 = trainOn(corpus1, s"c${scale}_$tag")
    val probe = shift(arr, n + 900000000L, eps + 0.0001).localCheckpoint(true)
    val (_, rf1, rs1) = stats(mass, cents1)
    val (_, pf1, ps1) = stats(probe, cents1)
    val quiet = !((rf1 - pf1) > 50000000L || ps1 > 400000000L)
    println(s"SWEEP scale=$scale tag=$tag fire=$fire quiet=$quiet " +
      s"e0[refFit=$rf newFit=$nf drift=${rf - nf} share=$ns] " +
      s"e1[refFit=$rf1 probeFit=$pf1 drift=${rf1 - pf1} share=$ps1] copies=$copies")
  }
}
sys.exit(0)
