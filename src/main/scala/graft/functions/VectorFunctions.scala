package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns using codegen-safe
  * built-ins (`transform`/`zip_with`/`aggregate`), no UDFs.
  *
  * Cross-engine exactness strategy: floats are quantized to integer
  * milli-units (floor(x*1000) as long) before any arithmetic. Integer
  * sums are associative, so dot products and squared norms are exact and
  * independent of both aggregation order and engine float internals; the
  * single final division is one deterministic IEEE-double operation that
  * both Spark and the DuckDB oracle perform identically. This is what
  * makes similarity results hash-comparable across engines.
  */
object VectorFunctions {

  /** Quantize array<float> → array<long> milli-units. */
  def quantize(v: Column): Column =
    transform(v, x => floor(x.cast("double") * lit(1000.0)).cast("long"))

  /** Exact integer dot product of two quantized vectors (codegen'd
    * kernel — see [[Exprs.DotLongExpr]] for why not zip_with+aggregate).
    */
  def qdot(a: Column, b: Column): Column = Exprs.dotLong(a, b)

  /** Exact integer squared norm of a quantized vector. */
  def qnormSq(v: Column): Column = qdot(v, v)

  /** Cosine similarity in integer ppm: floor(1e6 * dot / (|a||b|)).
    * Inputs are the exact integer dot and squared norms.
    */
  def cosPpm(dot: Column, sqA: Column, sqB: Column): Column =
    floor(dot.cast("double") * lit(1000000.0) /
      (sqrt(sqA.cast("double")) * sqrt(sqB.cast("double")))).cast("long")
}
