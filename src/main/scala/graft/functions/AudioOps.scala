package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for audio frame analysis over decoded
  * PCM sample columns (`array<double>`, from `multimodal.Codecs
  * .decodeWav`). Same rationale as `ArrayMath`: higher-order
  * functions have no codegen and box per element; these generate one
  * tight primitive loop inside whole-stage codegen, and the
  * interpreted `nullSafeEval` mirrors the generated arithmetic
  * operation-for-operation so both paths are bit-identical.
  *
  * Framing convention (both expressions): frames of `frameLen`
  * samples every `hop` samples, truncated — only FULL frames count,
  * so a clip shorter than one frame yields an empty array, loudly
  * visible downstream rather than a padded half-frame that skews
  * energies. */

/** Per-frame RMS energy: out[t] = sqrt(Σᵢ s[t·hop+i]² / frameLen) —
  * the standard short-time energy envelope (silence/voice activity
  * gating, loudness normalization). */
case class FrameEnergy(child: Expression, frameLen: Int, hop: Int)
    extends UnaryExpression {
  require(frameLen > 0 && hop > 0, s"frameLen=$frameLen hop=$hop must be > 0")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[ArrayData]
    val n = s.numElements()
    val nf = if (n < frameLen) 0 else (n - frameLen) / hop + 1
    val out = new Array[Double](nf)
    var t = 0
    while (t < nf) {
      var acc = 0.0
      var i = 0
      while (i < frameLen) {
        val x = s.getDouble(t * hop + i)
        acc += x * x
        i += 1
      }
      out(t) = java.lang.Math.sqrt(acc / frameLen)
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val n = ctx.freshName("n"); val nf = ctx.freshName("nf")
      val out = ctx.freshName("out"); val t = ctx.freshName("t")
      val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""
         |int $n = $s.numElements();
         |int $nf = $n < $frameLen ? 0 : ($n - $frameLen) / $hop + 1;
         |double[] $out = new double[$nf];
         |for (int $t = 0; $t < $nf; $t++) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $frameLen; $i++) {
         |    double $x = $s.getDouble($t * $hop + $i);
         |    $acc += $x * $x;
         |  }
         |  $out[$t] = java.lang.Math.sqrt($acc / $frameLen);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override def prettyName: String = "frame_energy"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-frame rectified spectral flux: each frame's magnitude spectrum
  * is a direct real DFT over bins k = 1..nBins (mag[k] =
  * |Σᵢ s[i]·e^(−2πj·k·i/frameLen)| / frameLen — DC excluded, it
  * carries offset not timbre), and
  * out[t] = Σₖ max(0, mag_t[k] − mag_{t−1}[k]) with mag_{−1} ≡ 0 —
  * the standard onset-strength signal (novelty/onset detection,
  * audio segmentation). The direct DFT is O(frameLen·nBins) per
  * frame: with the small bin counts flux needs (8–32) that is
  * cheaper than an FFT's bookkeeping and keeps the loop a
  * codegen-friendly straight line. */
case class SpectralFlux(child: Expression, frameLen: Int, hop: Int, nBins: Int)
    extends UnaryExpression {
  require(frameLen > 0 && hop > 0 && nBins > 0 && nBins <= frameLen / 2,
    s"frameLen=$frameLen hop=$hop nBins=$nBins invalid (need 0 < nBins <= frameLen/2)")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[ArrayData]
    val n = s.numElements()
    val nf = if (n < frameLen) 0 else (n - frameLen) / hop + 1
    val out = new Array[Double](nf)
    var prev = new Array[Double](nBins)
    var cur = new Array[Double](nBins)
    var t = 0
    while (t < nf) {
      var flux = 0.0
      var k = 0
      while (k < nBins) {
        var re = 0.0; var im = 0.0
        var i = 0
        while (i < frameLen) {
          val x = s.getDouble(t * hop + i)
          val ang = -2.0 * java.lang.Math.PI * (k + 1) * i / frameLen
          re += x * java.lang.Math.cos(ang)
          im += x * java.lang.Math.sin(ang)
          i += 1
        }
        cur(k) = java.lang.Math.sqrt(re * re + im * im) / frameLen
        val d = cur(k) - prev(k)
        if (d > 0) flux += d
        k += 1
      }
      out(t) = flux
      val tmp = prev; prev = cur; cur = tmp
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val n = ctx.freshName("n"); val nf = ctx.freshName("nf")
      val out = ctx.freshName("out"); val prev = ctx.freshName("prev")
      val cur = ctx.freshName("cur"); val tmp = ctx.freshName("tmp")
      val t = ctx.freshName("t"); val k = ctx.freshName("k")
      val i = ctx.freshName("i"); val re = ctx.freshName("re")
      val im = ctx.freshName("im"); val x = ctx.freshName("x")
      val ang = ctx.freshName("ang"); val flux = ctx.freshName("flux")
      val d = ctx.freshName("d")
      s"""
         |int $n = $s.numElements();
         |int $nf = $n < $frameLen ? 0 : ($n - $frameLen) / $hop + 1;
         |double[] $out = new double[$nf];
         |double[] $prev = new double[$nBins];
         |double[] $cur = new double[$nBins];
         |for (int $t = 0; $t < $nf; $t++) {
         |  double $flux = 0.0;
         |  for (int $k = 0; $k < $nBins; $k++) {
         |    double $re = 0.0; double $im = 0.0;
         |    for (int $i = 0; $i < $frameLen; $i++) {
         |      double $x = $s.getDouble($t * $hop + $i);
         |      double $ang = -2.0 * java.lang.Math.PI * ($k + 1) * $i / $frameLen;
         |      $re += $x * java.lang.Math.cos($ang);
         |      $im += $x * java.lang.Math.sin($ang);
         |    }
         |    $cur[$k] = java.lang.Math.sqrt($re * $re + $im * $im) / $frameLen;
         |    double $d = $cur[$k] - $prev[$k];
         |    if ($d > 0) $flux += $d;
         |  }
         |  $out[$t] = $flux;
         |  double[] $tmp = $prev; $prev = $cur; $cur = $tmp;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override def prettyName: String = "spectral_flux"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioOps {
  import org.apache.spark.sql.graft.Bridge.{column, expression}
  private def d(c: Column): Column = c.cast("array<double>")

  def frameEnergy(samples: Column, frameLen: Int, hop: Int): Column =
    column(FrameEnergy(expression(d(samples)), frameLen, hop))

  def spectralFlux(samples: Column, frameLen: Int, hop: Int, nBins: Int): Column =
    column(SpectralFlux(expression(d(samples)), frameLen, hop, nBins))
}
