package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML entity decode as a native Catalyst expression — ONE
  * left-to-right scan decoding named entities (`&lt; &gt; &quot;
  * &nbsp; &amp;`) and numeric character references (decimal
  * `&#NNN;` / hex `&#xNN;`, case-insensitive) in the Latin-1 range
  * 1..255; out-of-range references and non-entities pass through
  * verbatim, and each `&` is consumed at most once (true
  * single-decode: `&amp;#77;` → the literal text `&#77;`).
  *
  * Replaces the layered builtin form (five `replace`s plus two
  * `regexp_extract_all` + `aggregate` folds per block): Spark
  * evaluates higher-order-function lambdas INTERPRETED, and the
  * extraction operator references its block array from several output
  * columns, so the layered decode ran several times per row — the
  * r12 bench measured `q_web_pipeline` 4.4 → 13.7 s from exactly
  * this. The scan here is one pass of primitive char compares per
  * evaluation, inside the enclosing whole-stage-codegen span.
  *
  * The DuckDB oracle spells the SAME single-pass semantics as a
  * split-on-`&` segment decode (each segment after a `&` either
  * starts with a recognized entity body — emit the decoded char plus
  * the remainder — or is emitted verbatim behind its `&`), so both
  * engines decode each `&` at most once with identical range rules;
  * ExtractSpec pins the hand vectors, the extraction oracles pin it
  * end to end. */
case class EntityDecode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  /** Entity match at `s(i) == '&'`: returns `(consumed << 16) | char`,
    * or 0 for no match (out-of-range references deliberately do not
    * match — the lone `&` is emitted and the scan resumes at i+1, so
    * the reference text passes through verbatim). */
  private def tryEntity(s: String, i: Int): Int = {
    val n = s.length
    @inline def at(o: Int, c: Char): Boolean = i + o < n && s.charAt(i + o) == c
    // named: lt; gt; quot; nbsp; amp;
    if (at(1, 'l') && at(2, 't') && at(3, ';')) return (4 << 16) | '<'
    if (at(1, 'g') && at(2, 't') && at(3, ';')) return (4 << 16) | '>'
    if (at(1, 'q') && at(2, 'u') && at(3, 'o') && at(4, 't') && at(5, ';'))
      return (6 << 16) | '"'
    if (at(1, 'n') && at(2, 'b') && at(3, 's') && at(4, 'p') && at(5, ';'))
      return (6 << 16) | ' '
    if (at(1, 'a') && at(2, 'm') && at(3, 'p') && at(4, ';'))
      return (5 << 16) | '&'
    if (!at(1, '#')) return 0
    var j = i + 2
    var code = 0
    if (j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) {
      // hex, 1..6 digits then ';'
      j += 1
      val start = j
      var halt = false
      while (j < n && j - start < 6 && !halt) {
        val c = s.charAt(j)
        val d =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else -1
        if (d < 0) halt = true
        else { code = code * 16 + d; j += 1 }
      }
      if (j == start || j >= n || s.charAt(j) != ';') return 0
    } else {
      // decimal, 1..7 digits then ';'
      val start = j
      while (j < n && j - start < 7 && s.charAt(j) >= '0' && s.charAt(j) <= '9') {
        code = code * 10 + (s.charAt(j) - '0')
        j += 1
      }
      if (j == start || j >= n || s.charAt(j) != ';') return 0
    }
    if (code < 1 || code > 255) return 0
    ((j + 1 - i) << 16) | code
  }

  def decode(u: UTF8String): UTF8String = {
    val s = u.toString
    var i = s.indexOf('&')
    if (i < 0) return u
    val sb = new java.lang.StringBuilder(s.length)
    var p = 0
    while (i >= 0) {
      sb.append(s, p, i)
      val m = tryEntity(s, i)
      if (m != 0) {
        sb.append((m & 0xFFFF).toChar)
        p = i + (m >>> 16)
      } else {
        sb.append('&')
        p = i + 1
      }
      i = s.indexOf('&', p)
    }
    sb.append(s, p, s.length)
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(input: Any): Any =
    decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val ref = ctx.addReferenceObj("entityDecode", this,
        "graft.functions.EntityDecode")
      s"${ev.value} = $ref.decode($in);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "entity_decode"
}

object ExtractOps {
  /** Single-pass HTML entity decode (named + Latin-1 numeric). */
  def entityDecode(c: Column): Column =
    Bridge.column(EntityDecode(Bridge.expression(c)))
}
