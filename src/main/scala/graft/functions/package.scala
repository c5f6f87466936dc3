package graft

import org.apache.spark.sql.Column

/** Public home of graft's native Catalyst expressions (implementations
  * live in the org.apache.spark.sql.graft shim package — see
  * CosineSim.scala for why). */
package object functions {
  /** Fused codegen cosine similarity over two ARRAY<FLOAT> columns. */
  object CosineSim {
    def apply(a: Column, b: Column): Column =
      org.apache.spark.sql.graft.CosineSimExpr(a, b)
  }
}
