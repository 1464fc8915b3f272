package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, backed by the
  * [[VecDot]] native Catalyst expression — a fused, codegen'd loop rather
  * than interpreted `zip_with`/`aggregate` higher-order functions (which
  * cost two orders of magnitude more on pairwise workloads).
  *
  * All arithmetic is double, folded left-to-right: element-by-element
  * products accumulated sequentially. That exact ordering is what DuckDB's
  * `list_dot_product`/`list_cosine_similarity` compute on DOUBLE[] inputs,
  * so results hash-match the oracle bit-for-bit (verified empirically:
  * sequential-fold dot and dot/(sqrt(na)*sqrt(nb)) reproduce DuckDB's
  * doubles exactly).
  */
object VectorFunctions {

  /** Dot product of two float/double arrays, accumulated in double. */
  def dot(a: Column, b: Column): Column = VecDot.vecDot(a, b)

  /** Squared L2 norm, accumulated in double. */
  def normSq(a: Column): Column = VecDot.vecDot(a, a)

  /** Cosine similarity, matching DuckDB's `list_cosine_similarity` on
    * DOUBLE[] (dot / (sqrt(|a|²) * sqrt(|b|²))). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Cosine given a precomputed squared norm for each side — avoids
    * recomputing norms inside a pairwise join. */
  def cosinePrenormed(dotAB: Column, normSqA: Column, normSqB: Column): Column =
    dotAB / (sqrt(normSqA) * sqrt(normSqB))
}
