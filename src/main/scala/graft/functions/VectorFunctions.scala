package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns.
  *
  * Uses `zip_with`/`aggregate` higher-order functions (codegen'd, no UDF) so
  * brute-force similarity scans stay inside whole-stage codegen — the right
  * baseline before any ANN index at 100 TB scale.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0d, lit(0.0d)).otherwise(d / nn)
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, v) => acc + v))

  /** Unit-normalised copy of the vector (zero vector passes through). */
  def normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0d, a).otherwise(transform(a, v => (v / n).cast("float")))
  }

  /** Deterministic signed projection for LSH: sign of dot(v, pseudo-random
    * hyperplane seeded by `seed`). The hyperplane components are derived from
    * element index via a hash, so executors need no broadcast state. */
  def randomHyperplaneSign(a: Column, seed: Int): Column = {
    val proj = aggregate(
      zip_with(a, sequence(lit(0), size(a) - 1),
        (v, i) => v * (pmod(hash(i, lit(seed)).cast("double"), lit(1000.0d)) / lit(500.0d) - lit(1.0d))),
      lit(0.0d), (acc, v) => acc + v)
    when(proj >= 0.0d, lit(1)).otherwise(lit(0))
  }

  /** k-bit LSH signature for cosine similarity bucketing. */
  def lshSignature(a: Column, bits: Int): Column =
    concat((0 until bits).map(b => randomHyperplaneSign(a, b).cast("string")): _*)
}
