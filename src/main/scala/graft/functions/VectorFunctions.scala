package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, expressed with
  * Spark's higher-order functions (zip_with / aggregate) so the whole
  * computation stays inside Catalyst — no UDF serialization, no driver
  * round-trips.
  *
  * All arithmetic is double, folded left-to-right: element-by-element
  * products accumulated sequentially. That exact ordering is what DuckDB's
  * `list_dot_product`/`list_cosine_similarity` compute on DOUBLE[] inputs,
  * so results hash-match the oracle bit-for-bit (verified empirically:
  * sequential-fold dot and dot/(sqrt(na)*sqrt(nb)) reproduce DuckDB's
  * doubles exactly).
  */
object VectorFunctions {

  /** Dot product of two float arrays, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Squared L2 norm, accumulated in double. */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  /** Cosine similarity, matching DuckDB's `list_cosine_similarity` on
    * DOUBLE[] (dot / (sqrt(|a|²) * sqrt(|b|²))). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Cosine given a precomputed squared norm for each side — avoids
    * recomputing norms inside a pairwise join. */
  def cosinePrenormed(dotAB: Column, normSqA: Column, normSqB: Column): Column =
    dotAB / (sqrt(normSqA) * sqrt(normSqB))
}
