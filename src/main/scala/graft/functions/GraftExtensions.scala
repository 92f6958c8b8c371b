package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions exposing the native functions to SQL:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions). ...
  * // or spark.sql.extensions=graft.functions.GraftExtensions
  * spark.sql("SELECT vec_dot(a.embedding, b.embedding) ...")
  * }}}
  *
  * For an already-running session, [[GraftExtensions.register]] installs
  * the same functions into its registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // SQL front door: `SELECT ... FROM graft.t`, time travel suffixes,
    // metadata tables, INSERT INTO/OVERWRITE (graft.meta.GraftSql).
    // Injected into the HINTS batch, which the analyzer runs BEFORE the
    // Resolution batch: Spark's own RelationResolution throws
    // REQUIRES_SINGLE_PART_NAMESPACE on three-part names like
    // `graft.t.branch_dev` before extendedResolutionRules would get a
    // look, so the front door must claim its relations first.
    e.injectHintResolutionRule(session => new graft.meta.GraftSql.SqlRule(session))
    // extension grammar Spark's parser lacks: ALTER TABLE ... ADD/DROP/
    // REPLACE PARTITION FIELD, WRITE ORDERED BY / WRITE UNORDERED —
    // Iceberg's SQL-extensions surface, so operational DDL ports verbatim
    e.injectParser((session, delegate) => new graft.meta.GraftSqlParser(session, delegate))
    // metadata-only count(*): ungrouped counts over deleteless graft
    // scans answer from manifest record counts, no scan job
    e.injectOptimizerRule(_ => graft.exec.MetadataOnlyCount)
    e.injectFunction(GraftExtensions.vecDotDescriptor)
    e.injectFunction(GraftExtensions.jaccardGeDescriptor)
    e.injectFunction(GraftExtensions.nfcDescriptor)
    e.injectFunction(GraftExtensions.icebergBucketDescriptor)
    e.injectFunction(GraftExtensions.minHashLanesDescriptor)
    e.injectFunction(GraftExtensions.vecHammingDescriptor)
    e.injectFunction(GraftExtensions.containmentGeDescriptor)
    e.injectFunction(GraftExtensions.hilbertD2Descriptor)
    e.injectFunction(GraftExtensions.thetaSketchDescriptor)
    e.injectFunction(GraftExtensions.thetaEstimateDescriptor)
  }
}

object GraftExtensions {
  private def buildVecDot(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"vec_dot expects 2 arguments, got ${exprs.length}")
    VecDot(exprs.head, exprs(1))
  }

  /** jaccard_ge(a, b, t): third argument must be a foldable double. */
  private def buildJaccardGe(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, s"jaccard_ge expects 3 arguments, got ${exprs.length}")
    val t = exprs(2) match {
      case lit: org.apache.spark.sql.catalyst.expressions.Literal =>
        lit.value match {
          case d: java.lang.Double  => d.doubleValue()
          case d: java.math.BigDecimal => d.doubleValue()
          case d: Decimal => d.toDouble
          case other => sys.error(s"jaccard_ge threshold must be numeric, got $other")
        }
      case other => sys.error(s"jaccard_ge threshold must be a literal, got $other")
    }
    SortedJaccardGe(exprs.head, exprs(1), t)
  }
  private type Decimal = org.apache.spark.sql.types.Decimal

  private[functions] val vecDotDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
    buildVecDot
  )

  private[functions] val jaccardGeDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("jaccard_ge"),
    new ExpressionInfo(classOf[SortedJaccardGe].getName, "jaccard_ge"),
    buildJaccardGe
  )

  private def buildNfc(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, s"nfc expects 1 argument, got ${exprs.length}")
    UnicodeNormalize(exprs.head, "NFC")
  }

  /** iceberg_bucket(col, n): second argument must be a foldable int. */
  private def buildIcebergBucket(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"iceberg_bucket expects 2 arguments, got ${exprs.length}")
    val n = exprs(1) match {
      case lit: org.apache.spark.sql.catalyst.expressions.Literal =>
        lit.value match {
          case i: java.lang.Integer => i.intValue()
          case i: java.lang.Long => i.intValue()
          case other => sys.error(s"iceberg_bucket count must be an int, got $other")
        }
      case other => sys.error(s"iceberg_bucket count must be a literal, got $other")
    }
    IcebergBucket(exprs.head, n)
  }

  private[functions] val nfcDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc"),
    new ExpressionInfo(classOf[UnicodeNormalize].getName, "nfc"),
    buildNfc
  )

  private[functions] val icebergBucketDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("iceberg_bucket"),
    new ExpressionInfo(classOf[IcebergBucket].getName, "iceberg_bucket"),
    buildIcebergBucket
  )

  /** min_hash_lanes(grams, seeds): second argument must be a foldable int. */
  private def buildMinHashLanes(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"min_hash_lanes expects 2 arguments, got ${exprs.length}")
    val seeds = exprs(1) match {
      case lit: org.apache.spark.sql.catalyst.expressions.Literal =>
        lit.value match {
          case i: java.lang.Integer => i.intValue()
          case i: java.lang.Long => i.intValue()
          case other => sys.error(s"min_hash_lanes seeds must be an int, got $other")
        }
      case other => sys.error(s"min_hash_lanes seeds must be a literal, got $other")
    }
    MinHashLanes(exprs.head, seeds)
  }

  private[functions] val minHashLanesDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("min_hash_lanes"),
    new ExpressionInfo(classOf[MinHashLanes].getName, "min_hash_lanes"),
    buildMinHashLanes
  )

  private def buildVecHamming(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"vec_hamming expects 2 arguments, got ${exprs.length}")
    VecHamming(exprs.head, exprs(1))
  }

  private[functions] val vecHammingDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_hamming"),
    new ExpressionInfo(classOf[VecHamming].getName, "vec_hamming"),
    buildVecHamming
  )

  /** containment_ge(a, b, t): third argument must be a foldable double. */
  private def buildContainmentGe(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, s"containment_ge expects 3 arguments, got ${exprs.length}")
    val t = exprs(2) match {
      case lit: org.apache.spark.sql.catalyst.expressions.Literal =>
        lit.value match {
          case d: java.lang.Double     => d.doubleValue()
          case d: java.math.BigDecimal => d.doubleValue()
          case d: Decimal              => d.toDouble
          case other => sys.error(s"containment_ge threshold must be numeric, got $other")
        }
      case other => sys.error(s"containment_ge threshold must be a literal, got $other")
    }
    SortedContainmentGe(exprs.head, exprs(1), t)
  }

  private[functions] val containmentGeDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("containment_ge"),
    new ExpressionInfo(classOf[SortedContainmentGe].getName, "containment_ge"),
    buildContainmentGe
  )

  /** hilbert_d2(x, y, bits): third argument must be a foldable int. */
  private def buildHilbertD2(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, s"hilbert_d2 expects 3 arguments, got ${exprs.length}")
    val bits = exprs(2) match {
      case lit: org.apache.spark.sql.catalyst.expressions.Literal =>
        lit.value match {
          case i: java.lang.Integer => i.intValue()
          case i: java.lang.Long    => i.intValue()
          case other => sys.error(s"hilbert_d2 bits must be an int, got $other")
        }
      case other => sys.error(s"hilbert_d2 bits must be a literal, got $other")
    }
    HilbertD2(exprs.head, exprs(1), bits)
  }

  private[functions] val hilbertD2Descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hilbert_d2"),
    new ExpressionInfo(classOf[HilbertD2].getName, "hilbert_d2"),
    buildHilbertD2
  )

  private def buildThetaSketch(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, s"theta_sketch expects 1 argument, got ${exprs.length}")
    ThetaSketchAgg(exprs.head)
  }
  private def buildThetaEstimate(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, s"theta_estimate expects 1 argument, got ${exprs.length}")
    ThetaEstimate(exprs.head)
  }

  private[functions] val thetaSketchDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("theta_sketch"),
    new ExpressionInfo(classOf[ThetaSketchAgg].getName, "theta_sketch"),
    buildThetaSketch
  )

  private[functions] val thetaEstimateDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("theta_estimate"),
    new ExpressionInfo(classOf[ThetaEstimate].getName, "theta_estimate"),
    buildThetaEstimate
  )

  /** Installs the functions into an existing session's registry. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", buildVecDot, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaccard_ge", buildJaccardGe, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc", buildNfc, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "iceberg_bucket", buildIcebergBucket, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "min_hash_lanes", buildMinHashLanes, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_hamming", buildVecHamming, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "containment_ge", buildContainmentGe, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hilbert_d2", buildHilbertD2, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "theta_sketch", buildThetaSketch, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "theta_estimate", buildThetaEstimate, "built-in")
  }
}
