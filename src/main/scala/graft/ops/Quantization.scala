package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the storage/bandwidth path for ANN at
  * 100 TB.
  *
  * A 768-dim float32 embedding is 3 KB; symmetric int8 quantization (one
  * scale per vector, `q_i = round(x_i · 127 / max|x|)`) cuts it 4× with
  * ~0.999 cosine fidelity, which is what makes billion-vector indexes fit
  * in executor memory and shuffle budgets (same scheme as FAISS's
  * `SQ8` scalar quantizer; Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", IEEE TPAMI 2011 — the no-codebook corner).
  *
  * Everything here is Spark higher-order functions over the native array
  * column — per-row, no shuffle, whole-stage-codegen'd, so the quantizer
  * runs at scan speed and composes with any downstream op.
  *
  * Determinism: rounding is `floor(x + 0.5)` (identical on Spark and
  * DuckDB — each engine's own round() differs in half-way/negative
  * conventions), and the IEEE double expression `x · 127 / scale` is
  * written identically on both engines so the oracle hash-matches the
  * quantized integers exactly.
  */
object Quantization {

  /** max(|x_i|) of the float array `c`, as double (exact float→double). */
  def maxAbs(c: Column): Column =
    aggregate(c, lit(0.0d), (acc, x) => greatest(acc, abs(x.cast("double"))))

  /** Symmetric int8 quantization of float-array `c` given its `scale`
    * (= maxAbs). Zero vectors quantize to zeros. */
  def quantize(c: Column, scale: Column): Column =
    transform(c, x =>
      when(scale === 0.0d, lit(0))
        .otherwise(floor(x.cast("double") * lit(127.0d) / scale + lit(0.5d)).cast("int")))

  /** Per-vector quantization summary: `(vec_id, scale, q_sum, q_l1,
    * q_min, q_max)`. The integer aggregates are exact on any engine, so
    * they carry the full determinism of the quantized codes into a
    * hash-comparable frame without emitting the array itself. */
  def quantizeSummary(embeddings: DataFrame): DataFrame = {
    val scale = maxAbs(col("embedding"))
    val q = quantize(col("embedding"), col("scale"))
    embeddings
      .select(col("vec_id"), col("embedding"), scale.as("scale"))
      .select(col("vec_id"), col("scale"), q.as("q"))
      .select(
        col("vec_id"), col("scale"),
        aggregate(col("q"), lit(0L), (a, x) => a + x.cast("long")).as("q_sum"),
        aggregate(col("q"), lit(0L), (a, x) => a + abs(x).cast("long")).as("q_l1"),
        array_min(col("q")).as("q_min"),
        array_max(col("q")).as("q_max"))
      .orderBy(col("vec_id"))
  }

  /** Dequantized vector: `q_i · scale / 127` as float array. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => (x.cast("double") * scale / lit(127.0d)).cast("float"))

  /** Codes frame `(vec_id, scale, qv, qn)` for the quantized-scan kNN tier
    * ([[graft.ops.Similarity.int8TopK]]): per-vector int8 codes plus their
    * integer self-dot (‖q‖², exact). In production this frame is
    * materialized once next to the embeddings (4× smaller, so the ANN
    * scan reads a quarter of the bytes); deriving it inline as here costs
    * one extra pass over the float column. */
  def codes(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), maxAbs(col("embedding")).as("scale"), col("embedding"))
      .select(col("vec_id"), col("scale"), quantize(col("embedding"), col("scale")).as("qv"))
      .withColumn("qn", aggregate(
        zip_with(col("qv"), col("qv"), (x, y) => (x * y).cast("long")),
        lit(0L), (a, x) => a + x))

  /** Per-label class centroids in 2²⁰ fixed point — the per-class mean
    * vector a curriculum/quality pipeline tracks per source or cluster.
    * Each component is scaled by an exact power of two (float → double →
    * ·2²⁰ is EXACT, no rounding until the final integer round), summed as
    * BIGINT per (label, dimension) — order-independent, engine-exact where
    * a float mean never is — and divided back once at the end. Relational
    * output (label, pos, centroid): posexplode + grouped sum, map-side
    * combinable, no collect_list ordering hazards, |labels|·dim rows out. */
  def labelCentroids(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "comp")))
      .select(col("label"), col("pos"),
        round(col("comp").cast("double") * lit(1048576.0)).cast("long").as("q"))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("q")).as("q_sum"), count(lit(1)).as("n_vecs"))
      .withColumn("centroid", col("q_sum").cast("double") / col("n_vecs") / lit(1048576.0))
      .select(col("label"), col("pos"), col("centroid"), col("n_vecs"))
      .orderBy(col("label"), col("pos"))
}
