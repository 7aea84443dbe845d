package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst polynomial string hash: fold over the string's Unicode
  * code points, `acc = (acc * base + codePoint) % mod`, starting at 0.
  *
  * Semantically identical (for ASCII inputs — all graft tokenizers emit
  * `[a-z0-9]+`) to the higher-order fold
  * `aggregate(transform(slice(split(s,""),1,length(s)), c -> ascii(c)),
  *            0L, (a,c) -> (a*base+c) % mod)`
  * which HOF-evaluates INTERPRETED per character (HOFs are
  * CodegenFallback): per char that walks a regex split, an array slice
  * and two lambda trees. This expression is one tight JVM loop, runs
  * inside whole-stage codegen when top-level, and — the hot case — has a
  * cheap compiled `eval` when referenced from inside a `transform`
  * lambda (where any expression is interpreted, so per-node cost is what
  * matters). It is the production form of the ORACLE-PARITY hash: the
  * DuckDB side keeps the equivalent list_reduce fold.
  *
  * Bit-identity with the HOF fold is asserted in TextAnalysisSpec.
  * Overflow-safe without ANSI concerns: acc < mod ≤ ~2^30 and
  * base ≤ ~2^8, so acc*base+cp < 2^40.
  */
case class PolyHash(str: Expression, base: Expression, mod: Expression)
    extends TernaryExpression {

  override def first: Expression = str
  override def second: Expression = base
  override def third: Expression = mod

  // Any integral type is accepted for base/mod and widened to long in
  // eval/codegen, so a SQL call with INT literals —
  // graft_polyhash(s, 131, 1000000007) — analyzes without explicit
  // BIGINT casts. (ImplicitCastInputTypes would be the idiomatic spelling
  // but AbstractDataType is private[sql] — unreachable from an extension
  // package.)
  private val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (str.dataType == StringType && integral(base.dataType) &&
        integral(mod.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash requires (STRING, integral, integral), got " +
      s"(${str.dataType.simpleString}, ${base.dataType.simpleString}, " +
      s"${mod.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override protected def nullSafeEval(s: Any, b: Any, m: Any): Any = {
    val st = s.asInstanceOf[UTF8String].toString
    val bb = b.asInstanceOf[Number].longValue
    val mm = m.asInstanceOf[Number].longValue
    if (mm <= 0L) throw new IllegalArgumentException(
      s"graft_polyhash: mod must be positive, got $mm")
    var acc = 0L
    var i = 0
    while (i < st.length) {
      val cp = st.codePointAt(i)
      i += Character.charCount(cp)
      acc = (acc * bb + cp) % mm
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, b, m) => {
      val st = ctx.freshName("st")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |if ($m <= 0L) throw new IllegalArgumentException(
         |  "graft_polyhash: mod must be positive, got " + $m);
         |java.lang.String $st = $s.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $st.length()) {
         |  int $cp = $st.codePointAt($i);
         |  $i += java.lang.Character.charCount($cp);
         |  $acc = ($acc * $b + $cp) % $m;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PolyHash =
    copy(str = newFirst, base = newSecond, mod = newThird)
}

object PolyHash {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PolyHash].getName, null, "graft_polyhash",
    "_FUNC_(s, base, mod) - polynomial code-point hash fold of a string.", "")
}
