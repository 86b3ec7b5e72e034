package graft.operators

import org.apache.spark.sql.DataFrame

private[graft] object OpUtil {
  /** Re-balance a frame about to enter a CPU-bound expansion stage (shingle /
    * token / bucket explode multiplies rows ~tokens×): Spark's scan
    * partitioning is byte-based, so a few-MB documents file arrives as one
    * partition and the whole explode+hash pipeline runs serially. When the
    * input has fewer partitions than the session's parallelism, shuffle it
    * out; at cluster scale inputs already arrive with thousands of
    * partitions and this is a no-op. */
  def rebalance(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
