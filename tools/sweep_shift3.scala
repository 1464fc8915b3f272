// eps sweep at the sf0.1 base (half-dim shift): fire at epoch 0 AND
// quiet at epoch 1 with mass ~ corpus/2, at 1x and 10x.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.ops.Similarity
import graft.functions.VectorFunctions

spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.shuffle.partitions", 32)

val baseDir = sys.env.getOrElse("SWEEP_BASE", "/root/testdata/sf0.1")
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
  val dir = s"target/sweep3/$key"
  corpus.select(col("vec_id"), col("embedding"))
    .write.mode("overwrite").parquet(dir)
  val (c, _) = Similarity.ivfIndexPersisted(spark, dir,
    spark.read.parquet(dir), suffix = s"_sw3_$key")
  c.localCheckpoint(true)
}

for (scale <- Seq(1, 10); eps <- Seq(1.0, 1.5, 2.0)) {
  val n = nBase * scale
  val emb = graft.Soak.trueGrowthEmbeddings(spark, baseDir, n)
    .localCheckpoint(true)
  val splitId = n * 3L / 5L
  val base = emb.filter(col("vec_id") < splitId)
  val arr = emb.filter(col("vec_id") >= n - nBase * 2L / 5L)
    .select(col("vec_id"), col("embedding")).localCheckpoint(true)
  val arrN = arr.count()
  val cents0 = trainOn(base, s"b${scale}")
  val stride = math.max(1000000L, 2L * arrN)
  def shift(src: DataFrame, off: Long, e: Double): DataFrame = src
    .select((col("vec_id") + lit(off)).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i % 2 === 0, (abs(x) + lit(e)).cast("float"))
          .otherwise(x)).as("embedding"))
  val (_, rf, _) = stats(arr, cents0)
  val s1 = shift(arr, n + stride, eps).localCheckpoint(true)
  val (_, nf, ns) = stats(s1, cents0)
  val fire = (rf - nf) > 50000000L || ns > 400000000L
  val copies = math.max(2L, (splitId + arrN) / (2L * arrN)).toInt
  val mass = (1 until copies).foldLeft(s1)((acc, i) =>
    acc.unionByName(shift(
      emb.filter(col("vec_id") >= (i - 1).toLong * arrN &&
        col("vec_id") < i.toLong * arrN),
      n + stride * (i + 1), eps))).localCheckpoint(true)
  val corpus1 = base.select(col("vec_id"), col("embedding"))
    .unionByName(arr).unionByName(mass)
  val cents1 = trainOn(corpus1, s"c${scale}_${(eps * 10).toInt}")
  val probe = shift(arr, n + stride * (copies + 2L), eps + 0.0001)
    .localCheckpoint(true)
  val (_, rf1, _) = stats(mass, cents1)
  val (_, pf1, ps1) = stats(probe, cents1)
  val quiet = !((rf1 - pf1) > 50000000L || ps1 > 400000000L)
  println(s"SWEEP scale=$scale eps=$eps fire=$fire quiet=$quiet " +
    s"e0[drift=${rf - nf} share=$ns] e1[drift=${rf1 - pf1} share=$ps1] " +
    s"copies=$copies")
}
sys.exit(0)
