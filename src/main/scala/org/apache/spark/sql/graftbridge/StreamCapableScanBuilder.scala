package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns, SupportsPushDownVariantExtractions, VariantExtraction}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.execution.datasources.v2.FileScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** Wraps a file-source `ScanBuilder` (parquet) so the built `Scan` ALSO
  * serves a micro-batch stream. Every pushdown mixin FORWARDS to the
  * inner builder — batch plans keep the native parquet pushdown paths
  * (catalyst filter translation, column pruning, aggregate pushdown,
  * variant extraction) bit-for-bit, which is why this shim lives in the
  * sql package tree: `SupportsPushDownCatalystFilters` is an internal
  * trait (the [[ColumnBridge]] precedent — no Spark internals are
  * modified). `toMicroBatchStream` is supplied by the caller and
  * receives the pruned schema, so streaming reads honor column pruning.
  * Filters are NEVER pushed to the stream (Spark's streaming planner
  * does not consult filter pushdown for micro-batch sources; they stay
  * as post-scan Filter operators — the behavioral spec pins it). */
class StreamCapableScanBuilder(
    inner: FileScanBuilder,
    micro: (StructType, String) => MicroBatchStream)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with SupportsPushDownCatalystFilters
  with SupportsPushDownAggregates
  with SupportsPushDownVariantExtractions {

  private var pruned: Option[StructType] = None

  override def pruneColumns(s: StructType): Unit = {
    pruned = Some(s)
    inner.pruneColumns(s)
  }
  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    inner.pushFilters(filters)
  override def pushedFilters: Array[Predicate] = inner.pushedFilters
  override def pushAggregation(agg: Aggregation): Boolean = inner match {
    case a: SupportsPushDownAggregates => a.pushAggregation(agg)
    case _ => false
  }
  override def supportCompletePushDown(agg: Aggregation): Boolean = inner match {
    case a: SupportsPushDownAggregates => a.supportCompletePushDown(agg)
    case _ => false
  }
  override def pushVariantExtractions(v: Array[VariantExtraction]): Array[Boolean] =
    inner match {
      case x: SupportsPushDownVariantExtractions => x.pushVariantExtractions(v)
      case _ => Array.fill(v.length)(false)
    }

  override def build(): Scan = {
    val b = inner.build()
    new Scan {
      override def readSchema(): StructType = b.readSchema()
      override def toBatch: org.apache.spark.sql.connector.read.Batch = b.toBatch
      override def description(): String = b.description()
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        micro(pruned.getOrElse(b.readSchema()), checkpointLocation)
      override def supportedCustomMetrics():
          Array[org.apache.spark.sql.connector.metric.CustomMetric] =
        b.supportedCustomMetrics()
    }
  }
}
