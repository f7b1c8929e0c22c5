package graft.core

import org.apache.spark.sql.{DataFrame, GraftShims}

/**
 * Lineage control for iterative jobs. `cut` eagerly materializes the frame
 * (the superstep barrier), truncates lineage so plans don't snowball, AND
 * strips the statistics that `localCheckpoint` would otherwise carry —
 * Catalyst's size-only join estimator multiplies child sizeInBytes, so
 * carried stats grow exponentially in bit length across supersteps and
 * eventually stall the driver inside BigInteger.multiply during planning
 * (observed: 53 CPU-minutes of stats estimation in a 9-node Louvain run).
 */
object Lineage {
  def cut(df: DataFrame): DataFrame = GraftShims.cutLineage(df)
}
