package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fuzzy-decontamination match stats for ONE row against the whole
  * benchmark key set, as a native Catalyst expression:
  * `string → array<int>[2]` of (n_matches within `maxDist`, min
  * distance among them, −1 when none).
  *
  * Replaces the layered builtin form
  * `filter(transform(filter(keysLit, band), b -> levenshtein(key, b)),
  * d -> d <= maxDist)`: Spark evaluates higher-order-function lambdas
  * INTERPRETED, per element, with boxed dispatch — ~|keys| full
  * O(P²) DPs per row through the interpreter (measured 27 s for the
  * streaming serve at sf0.1 where the codegen batch join costs
  * 0.3 s — the `WinnowFingerprints` lesson on the distance family).
  * This compiles to one primitive loop in the enclosing codegen span
  * and calls `UTF8String.levenshteinDistance(other, threshold)` — the
  * engine's own bounded DP, which early-exits above the budget — after
  * a free length-band precheck. Semantics are pinned to the layered
  * form by NativeExprSpec on random strings and to the declared
  * BNLJ batch query row-for-row by CorpusSpec.
  *
  * The key set is model state (an eval suite — benchmark-sized,
  * never corpus-sized), shipped once per task as a plan reference
  * object, exactly like the iForest/LOF/centroid scorers. */
case class FuzzyMatchStats(child: Expression, keys: Seq[String], maxDist: Int)
    extends UnaryExpression {
  require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string key, got ${other.catalogString}")
  }

  @transient private lazy val keysU: Array[UTF8String] =
    keys.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any = {
    val key = input.asInstanceOf[UTF8String]
    val kl = key.numChars()
    var n = 0
    var mn = -1
    var i = 0
    while (i < keysU.length) {
      val b = keysU(i)
      val bl = b.numChars()
      if (bl - kl <= maxDist && kl - bl <= maxDist) {
        val d = key.levenshteinDistance(b, maxDist)
        if (d >= 0) { n += 1; if (mn < 0 || d < mn) mn = d }
      }
      i += 1
    }
    new GenericArrayData(Array(n, mn))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, k => {
      val ks = ctx.addReferenceObj("fuzzyKeys", keysU,
        "org.apache.spark.unsafe.types.UTF8String[]")
      val kl = ctx.freshName("kl"); val n = ctx.freshName("n")
      val mn = ctx.freshName("mn"); val i = ctx.freshName("i")
      val bl = ctx.freshName("bl"); val d = ctx.freshName("d")
      s"""
         |int $kl = $k.numChars();
         |int $n = 0;
         |int $mn = -1;
         |for (int $i = 0; $i < $ks.length; $i++) {
         |  int $bl = $ks[$i].numChars();
         |  if ($bl - $kl <= $maxDist && $kl - $bl <= $maxDist) {
         |    int $d = $k.levenshteinDistance($ks[$i], $maxDist);
         |    if ($d >= 0) { $n++; if ($mn < 0 || $d < $mn) $mn = $d; }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  new int[]{$n, $mn});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "fuzzy_match_stats"
}

object FuzzyMatch {
  /** (n_matches, min_dist|−1) of `key` against the benchmark key set. */
  def stats(key: Column, keys: Seq[String], maxDist: Int): Column =
    Bridge.column(FuzzyMatchStats(Bridge.expression(key), keys, maxDist))
}
