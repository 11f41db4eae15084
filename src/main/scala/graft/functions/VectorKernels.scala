package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Vector kernels behind [[Exprs.DotLongExpr]]. */
object VectorKernels {
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }
}
