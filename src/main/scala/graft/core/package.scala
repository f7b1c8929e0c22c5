package graft

import org.apache.spark.sql.DataFrame

package object core {
  /** `df.cutLineage()` — materialize + truncate lineage + strip carried
    * stats; the per-superstep barrier every iterative loop uses (see
    * [[core.Lineage]]). */
  implicit class DataFrameLineageOps(private val df: DataFrame) {
    def cutLineage(): DataFrame = Lineage.cut(df)
  }
}
