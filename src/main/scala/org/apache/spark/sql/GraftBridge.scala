package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column <-> Expression conversions
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Spark 4 routes Column
  * through ColumnNode; this is the supported-classic path extension
  * libraries use to wrap custom Catalyst expressions as user-facing
  * Columns.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a Hadoop Configuration for task-side shipping
    * (`org.apache.spark.util.SerializableConfiguration` is
    * `private[spark]`; tasks reading parquet footers/dictionaries need
    * the REAL session Hadoop conf — filesystem creds, etc. — not a
    * fresh default one).
    */
  def serializableConf(
      conf: org.apache.hadoop.conf.Configuration): org.apache.spark.util.SerializableConfiguration =
    new org.apache.spark.util.SerializableConfiguration(conf)

  /** `RDD.mapPartitionsInternal` (skips closure cleaning) is
    * `private[spark]`; physical operators use it for their hot path. */
  def mapPartitionsInternal[T, U: scala.reflect.ClassTag](
      rdd: org.apache.spark.rdd.RDD[T])(
      f: Iterator[T] => Iterator[U]): org.apache.spark.rdd.RDD[U] =
    rdd.mapPartitionsInternal(f, preservesPartitioning = true)

  /** `SparkSession.internalCreateDataFrame` is `private[sql]`; operators
    * that reshape an InternalRow RDD (e.g. an explicit identity
    * partitioner) need it to come back to a DataFrame without a
    * Row-codec round trip.
    */
  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)

  /** Drain the listener bus (`private[spark]`) — lets tests assert on
    * listener-observed job counts deterministically. */
  def waitListenerBusEmpty(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
