package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-operator Catalyst extension — the (c) tier of the design doctrine:
  * a native as-of join as `LogicalPlan` + `SparkStrategy` + `SparkPlan`,
  * planned through `spark.experimental.extraStrategies`.
  *
  * Semantics (left as-of): every left row gains the right row with the
  * greatest `rightTime <= leftTime` for the same key, or nulls. SQL-null
  * key/time rows never match, mirroring equi-join semantics.
  *
  * Why a physical operator when `AsofJoin.asofLeft` (union + running-max
  * window) already works: the window idiom materializes a combined sorted
  * partition and drags a payload struct through a running max; this exec
  * declares `requiredChildDistribution`/`Ordering` so Catalyst plans ONE
  * hash shuffle + per-partition sort per side (identical to a sort-merge
  * join's cost model), then streams both sides in a single forward merge —
  * no combined buffer, no struct comparisons, and the right side is
  * consumed strictly once. At 100 TB both idioms scale, but the merge is
  * the one a native engine would run, and Catalyst still owns pruning,
  * AQE re-planning, and exchange reuse around it.
  */
object AsofJoinNative {

  /** Logical node. Keys/times are Attributes resolved against the children,
    * so the node enters analysis already resolved and the optimizer treats
    * it as an opaque barrier (safe, if conservative, for pruning).
    */
  case class AsofJoinNode(
      left: LogicalPlan, right: LogicalPlan,
      leftKey: Attribute, rightKey: Attribute,
      leftTime: Attribute, rightTime: Attribute,
      rightTiebreak: Option[Attribute],
      toleranceUnits: Option[Long] = None)
    extends BinaryNode {
    // Tolerance is a distance in the time column's PHYSICAL units (micros
    // for TIMESTAMP/NTZ, days for DATE, raw for integers) — only meaningful
    // on integral-backed time types.
    require(toleranceUnits.forall(_ >= 0), "as-of tolerance must be >= 0")
    require(toleranceUnits.isEmpty || (leftTime.dataType match {
      case LongType | TimestampType | TimestampNTZType | IntegerType |
           DateType | ShortType => true
      case _ => false
    }), s"as-of tolerance requires an integral-backed time type, got " +
      leftTime.dataType.catalogString)
    // The exec reads BOTH sides' key/time values through the LEFT types, so
    // mismatched physical types (e.g. DATE days-as-int vs NTZ micros-as-
    // long) would compare garbage — reject at construction, not at runtime.
    require(leftKey.dataType == rightKey.dataType,
      s"as-of join key types differ: ${leftKey.dataType.catalogString} vs " +
        rightKey.dataType.catalogString)
    require(leftTime.dataType == rightTime.dataType,
      s"as-of join time types differ: ${leftTime.dataType.catalogString} vs " +
        rightTime.dataType.catalogString)
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
      copy(left = newLeft, right = newRight)
  }

  object AsofJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsofJoinNode(l, r, lk, rk, lt, rt, tb, tol) =>
        AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb, tol) :: Nil
      case _ => Nil
    }
  }

  /** Total ordering on the physical (InternalRow) representation of the
    * supported key/time types — all atomic corpus types are Long-backed or
    * primitive. Nulls are handled by the merge itself, never compared here.
    */
  private def physicalOrdering(dt: DataType): Ordering[Any] = (dt match {
    case LongType | TimestampType | TimestampNTZType => Ordering.Long
    case IntegerType | DateType                      => Ordering.Int
    case ShortType                                   => Ordering.Short
    case DoubleType                                  => Ordering.Double.TotalOrdering
    case FloatType                                   => Ordering.Float.TotalOrdering
    case StringType => new Ordering[UTF8String] {
      def compare(a: UTF8String, b: UTF8String): Int = a.compareTo(b)
    }
    case other =>
      throw new IllegalArgumentException(
        s"as-of join key/time type not supported: ${other.catalogString}")
  }).asInstanceOf[Ordering[Any]]

  case class AsofJoinExec(
      left: SparkPlan, right: SparkPlan,
      leftKey: Attribute, rightKey: Attribute,
      leftTime: Attribute, rightTime: Attribute,
      rightTiebreak: Option[Attribute],
      toleranceUnits: Option[Long] = None)
    extends BinaryExecNode {

    private def timeAsLong(v: Any): Long = v match {
      case l: Long  => l
      case i: Int   => i.toLong
      case s: Short => s.toLong
      case other => throw new IllegalStateException(
        s"tolerance on non-integral time value: $other")
    }

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    // One hash exchange per side on the join key — exactly a sort-merge
    // join's distribution contract, so AQE/exchange-reuse apply unchanged.
    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(Seq(leftKey)) ::
        ClusteredDistribution(Seq(rightKey)) :: Nil

    // Per-partition (key, time) sort; Catalyst inserts SortExec only when
    // the child isn't already sorted (e.g. bucketed+sorted sources skip it).
    // The optional right tiebreak makes equal-time matches deterministic:
    // the merge keeps the LAST row <= leftTime, i.e. max(time, tiebreak).
    override def requiredChildOrdering: Seq[Seq[SortOrder]] =
      Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
        Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
          rightTiebreak.map(SortOrder(_, Ascending)))

    override def outputPartitioning: Partitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val lOut = left.output
      val rOut = right.output
      val lKeyIdx = lOut.indexWhere(_.exprId == leftKey.exprId)
      val lTimeIdx = lOut.indexWhere(_.exprId == leftTime.exprId)
      val rKeyIdx = rOut.indexWhere(_.exprId == rightKey.exprId)
      val rTimeIdx = rOut.indexWhere(_.exprId == rightTime.exprId)
      require(lKeyIdx >= 0 && lTimeIdx >= 0 && rKeyIdx >= 0 && rTimeIdx >= 0,
        "as-of join attributes must come from the respective child outputs")
      val keyDt = leftKey.dataType
      val timeDt = leftTime.dataType
      val rWidth = rOut.length

      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val keyOrd = physicalOrdering(keyDt)
        val timeOrd = physicalOrdering(timeDt)
        val rBuf = rIter.buffered
        val nullRight = new GenericInternalRow(rWidth)
        val joined = new JoinedRow
        // Physical-operator output contract: parents (Sort/Exchange/
        // getByteArrayRdd) cast rows to UnsafeRow — a raw JoinedRow would
        // ClassCastException the moment no Project sits above us.
        val toUnsafe = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
          .create(output.map(_.dataType).toArray)
        // last right row with rKey == matchKey and rTime <= current left
        // time; scan rows (and any values read from them, e.g. UTF8String
        // keys aliasing a reused buffer) are reused — both the row AND the
        // key must be deep-copied when retained across iterations
        var matchKey: Any = null
        var lastMatch: InternalRow = null
        var lastMatchTime: Any = null

        lIter.map { lRow =>
          val lk = if (lRow.isNullAt(lKeyIdx)) null else lRow.get(lKeyIdx, keyDt)
          val lt = if (lRow.isNullAt(lTimeIdx)) null else lRow.get(lTimeIdx, timeDt)
          if (lk == null || lt == null) {
            toUnsafe(joined(lRow, nullRight))
          } else {
            if (matchKey == null || keyOrd.compare(matchKey, lk) != 0) {
              matchKey = null; lastMatch = null; lastMatchTime = null
            }
            var advancing = true
            while (advancing && rBuf.hasNext) {
              val head = rBuf.head
              val rk = if (head.isNullAt(rKeyIdx)) null else head.get(rKeyIdx, keyDt)
              val rt = if (head.isNullAt(rTimeIdx)) null else head.get(rTimeIdx, timeDt)
              if (rk == null || rt == null) {
                rBuf.next() // null keys/times sort first and never match
              } else {
                val c = keyOrd.compare(rk, lk)
                if (c < 0) {
                  rBuf.next() // keys below current left key are exhausted
                } else if (c == 0 && timeOrd.compare(rt, lt) <= 0) {
                  lastMatch = rBuf.next().copy()
                  matchKey = InternalRow.copyValue(lk)
                  lastMatchTime = InternalRow.copyValue(rt)
                } else {
                  advancing = false // future key, or time beyond left row
                }
              }
            }
            // The cached match is the max rightTime <= leftTime; any other
            // candidate is older and therefore farther from leftTime, so the
            // tolerance bound only ever needs checking against lastMatch.
            val withinTol = toleranceUnits.forall(tol =>
              lastMatchTime != null &&
                timeAsLong(lt) - timeAsLong(lastMatchTime) <= tol)
            if (lastMatch != null && matchKey != null &&
              keyOrd.compare(matchKey, lk) == 0 && withinTol)
              toUnsafe(joined(lRow, lastMatch))
            else toUnsafe(joined(lRow, nullRight))
          }
        }
      }
    }
  }

  /** Public entry: left as-of join by column name. Registers the strategy
    * once per session (idempotent) and builds the node from the analyzed
    * child plans. Left and right must be distinct plans (self-as-of needs
    * an alias, same as any self-join).
    */
  def asofLeft(left: DataFrame, leftKeyCol: String, leftTimeCol: String,
               right: DataFrame, rightKeyCol: String, rightTimeCol: String,
               rightTiebreakCol: Option[String] = None,
               toleranceUnits: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    }
    val lPlan = GraftBridge.analyzed(left)
    val rPlan = GraftBridge.analyzed(right)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name).mkString(", ")}"))
    GraftBridge.dataset(spark,
      AsofJoinNode(lPlan, rPlan,
        attr(lPlan, leftKeyCol), attr(rPlan, rightKeyCol),
        attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol),
        rightTiebreakCol.map(attr(rPlan, _)), toleranceUnits))
  }
}
