package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

import graft.ops.Bucketing
import graft.ops.Bucketing.BucketConfig

/** Native Catalyst expression for `select_bucket`'s argmin
  * (SURVEY.md §2.9 U2 stretch, §7.2 step 8; reference
  * `dataruu/bucketing/bucket_manager.py:99-118`).
  *
  * Returns the 1-based index into the bucket grid: the exact (w,h) match
  * when the image is already a grid resolution (`:104-106`), else the
  * FIRST index minimizing |rw/rh − ar| (np.argmin tie semantics, `:108-110`).
  *
  * vs. the builtin expression tree in [[Bucketing.selectBucketUpscale]]
  * (array_min + array_position over a literal struct array): this compiles
  * to a tight primitive `for` loop inside whole-stage codegen — no per-row
  * array materialization, no boxing — and the grid ships once per plan as
  * a reference object (the in-plan analogue of a broadcast variable).
  * Value-equivalence with the builtin tree is proven in
  * `BucketArgMinSpec`; both argmins take the first minimum so ties agree.
  */
case class BucketArgMin(left: Expression, right: Expression,
    rws: Array[Int], rhs: Array[Int])
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (INT, INT), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = IntegerType
  override def prettyName: String = GraftFunctions.BucketArgMinName

  override protected def nullSafeEval(wv: Any, hv: Any): Any = {
    val w = wv.asInstanceOf[Int]
    val h = hv.asInstanceOf[Int]
    var i = 0
    while (i < rws.length) {
      if (rws(i) == w && rhs(i) == h) return i + 1
      i += 1
    }
    val ar = w.toDouble / h
    var best = 0
    var bestErr = Double.MaxValue
    i = 0
    while (i < rws.length) {
      val e = math.abs(rws(i).toDouble / rhs(i) - ar)
      if (e < bestErr) { bestErr = e; best = i }
      i += 1
    }
    best + 1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, h) => {
      val rwsRef = ctx.addReferenceObj("bucketRws", rws, "int[]")
      val rhsRef = ctx.addReferenceObj("bucketRhs", rhs, "int[]")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val bestErr = ctx.freshName("bestErr")
      val ar = ctx.freshName("ar")
      val e = ctx.freshName("err")
      s"""
         |int $best = -1;
         |for (int $i = 0; $i < $rwsRef.length; $i++) {
         |  if ($rwsRef[$i] == $w && $rhsRef[$i] == $h) { $best = $i; break; }
         |}
         |if ($best < 0) {
         |  double $ar = (double) $w / (double) $h;
         |  double $bestErr = Double.MAX_VALUE;
         |  $best = 0;
         |  for (int $i = 0; $i < $rwsRef.length; $i++) {
         |    double $e = Math.abs((double) $rwsRef[$i] / (double) $rhsRef[$i] - $ar);
         |    if ($e < $bestErr) { $bestErr = $e; $best = $i; }
         |  }
         |}
         |${ev.value} = $best + 1;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BucketArgMin =
    copy(left = newLeft, right = newRight)
}

/** Function registration for the native expressions — both paths:
  * programmatic ([[GraftFunctions.register]]) and config-driven via
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
object GraftFunctions {
  val BucketArgMinName = "graft_bucket_argmin"

  private def grid(cfg: BucketConfig): (Array[Int], Array[Int]) = {
    val resos = Bucketing.makeBucketResolutions(cfg)
    (resos.map(_._1).toArray, resos.map(_._2).toArray)
  }

  def bucketArgMinBuilder(cfg: BucketConfig = BucketConfig()): Seq[Expression] => Expression = {
    val (rws, rhs) = grid(cfg)
    args => BucketArgMin(args(0), args(1), rws, rhs)
  }

  private def info = new ExpressionInfo(classOf[BucketArgMin].getName, BucketArgMinName)

  /** A literal-int argument of a SQL function call (the gram/window size
    * of the chargram/winnow functions must be a constant, it is baked
    * into the expression). */
  private def litInt(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
      org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT, got $other")
  }

  /** The whole native-expression family as SQL functions — `spark.sql`
    * users get the codegen'd hot-path expressions without touching the
    * Scala API. */
  val vectorFunctions: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("graft_dot", classOf[DotProduct],
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("graft_sqdist", classOf[SqDistLong],
      (args: Seq[Expression]) => SqDistLong(args(0), args(1))),
    ("graft_simhash16", classOf[SimHash16],
      (args: Seq[Expression]) => SimHash16(args(0))),
    ("graft_hash31_array", classOf[ArrayHash31],
      (args: Seq[Expression]) => ArrayHash31(args(0))),
    ("graft_chargram_hash31", classOf[CharGramHash31],
      (args: Seq[Expression]) =>
        CharGramHash31(args(0), litInt(args(1), "graft_chargram_hash31"))),
    ("graft_winnow_min", classOf[WinnowMin],
      (args: Seq[Expression]) =>
        WinnowMin(args(0), litInt(args(1), "graft_winnow_min"))),
    ("graft_nfc_normalize", classOf[NfcNormalize],
      (args: Seq[Expression]) => NfcNormalize(args(0))))

  /** Register on an existing session (tests / driver queries). */
  def register(spark: SparkSession, cfg: BucketConfig = BucketConfig()): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(BucketArgMinName), info, bucketArgMinBuilder(cfg))
    vectorFunctions.foreach { case (name, cls, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), builder)
    }
  }
}

/** `spark.sql.extensions` entry point: the native functions, the
  * whole-operator strategy ([[TopKStrategy]]), and the rank-limit
  * optimizer rewrite ([[RankLimitRewrite]]). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier(GraftFunctions.BucketArgMinName),
      new ExpressionInfo(classOf[BucketArgMin].getName, GraftFunctions.BucketArgMinName),
      GraftFunctions.bucketArgMinBuilder()))
    GraftFunctions.vectorFunctions.foreach { case (name, cls, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(cls.getName, name), builder))
    }
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectOptimizerRule(_ => RankLimitRewrite)
    ext.injectOptimizerRule(_ => SnapshotMetadataOnlyCount)
  }
}
