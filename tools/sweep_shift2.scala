// Mass sweep for the half1 variant at 10x: copies divisor 4/3/2.
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
  val dir = s"target/sweep2/$key"
  corpus.select(col("vec_id"), col("embedding"))
    .write.mode("overwrite").parquet(dir)
  val (c, _) = Similarity.ivfIndexPersisted(spark, dir,
    spark.read.parquet(dir), suffix = s"_sw2_$key")
  c.localCheckpoint(true)
}

val scale = 10
val n = nBase * scale
val emb = graft.Soak.trueGrowthEmbeddings(spark, baseDir, n)
  .localCheckpoint(true)
val splitId = n * 3L / 5L
val base = emb.filter(col("vec_id") < splitId)
val arr = emb.filter(col("vec_id") >= n - nBase * 2L / 5L)
  .select(col("vec_id"), col("embedding")).localCheckpoint(true)
val arrN = arr.count()
val cents0 = trainOn(base, s"b$scale")
val eps = 1.0
def shift(src: DataFrame, off: Long, e: Double): DataFrame = src
  .select((col("vec_id") + lit(off)).as("vec_id"),
    transform(col("embedding"), (x, i) =>
      when(i % 2 === 0, (abs(x) + lit(e)).cast("float"))
        .otherwise(x)).as("embedding"))
val s1 = shift(arr, n + 1000000L, eps).localCheckpoint(true)

for (div <- Seq(4L, 3L, 2L)) {
  val copies = math.max(1L, (splitId + arrN) / (div * arrN)).toInt
  val mass = (1 until copies).foldLeft(s1)((acc, i) =>
    acc.unionByName(shift(
      base.filter(pmod(col("vec_id"), lit(math.max(1, copies - 1).toLong))
        === (i - 1).toLong).limit(arrN.toInt), n + 1000000L * (i + 1), eps)))
    .localCheckpoint(true)
  val corpus1 = base.select(col("vec_id"), col("embedding"))
    .unionByName(arr).unionByName(mass)
  val cents1 = trainOn(corpus1, s"c${scale}_$div")
  val probe = shift(arr, n + 900000000L, eps + 0.0001).localCheckpoint(true)
  val (_, rf1, rs1) = stats(mass, cents1)
  val (_, pf1, ps1) = stats(probe, cents1)
  println(s"SWEEP div=$div copies=$copies " +
    s"e1[refFit=$rf1 probeFit=$pf1 drift=${rf1 - pf1} share=$ps1]")
}
sys.exit(0)
