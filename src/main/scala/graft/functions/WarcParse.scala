package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC file parse as a native Catalyst expression — the production
  * spelling of `operators.Warc.parseWarc`'s state machine: one
  * imperative offset walk per file (version-line magic, header block
  * up to CRLFCRLF, `Content-Length`-delimited payload, CRLF trailer),
  * emitting `struct<recs: array<record>, bad: int>`. A framing
  * violation counts in `bad` and the walk RESYNCS to the next
  * `WARC/1.0\r\n` magic strictly past the violation point — the
  * recovery rule production WARC readers apply, without which one
  * corrupt record silently costs every record behind it in the file
  * (at the planted 2-in-23 corruption density that truncated ~4/5 of
  * the corpus out of the crawl chain). `bad` is the violation COUNT;
  * 0 means a clean file. A violation with no recoverable magic keeps
  * the records parsed so far. The resync is a byte-level heuristic by
  * design: a payload that itself embeds a WARC file can cause a
  * post-violation resync to land inside the embedded record — the
  * accepted warcio behavior.
  *
  * Replaces the bounded `aggregate` HOF fold: interpreted lambdas
  * re-ran the O(file) substring/locate work per step AND per
  * referencing output column (~4 s for `q_parse_warc` at sf0.1); this
  * scan touches each byte of the file once per evaluation inside the
  * enclosing codegen span (the resync search only runs on violation
  * bytes). WarcSpec's framing fixtures and the recursive-CTE DuckDB
  * oracle pin the semantics. */
case class WarcParse(child: Expression, maxRecords: Int)
    extends UnaryExpression {
  require(maxRecords > 0, s"maxRecords must be positive, got $maxRecords")

  private val recType = StructType(Seq(
    StructField("ridx", IntegerType, nullable = false),
    StructField("typ", StringType, nullable = true),
    StructField("uri", StringType, nullable = true),
    StructField("wdate", StringType, nullable = true),
    StructField("clen", IntegerType, nullable = false),
    StructField("payload", StringType, nullable = true)))

  override def dataType: DataType = StructType(Seq(
    StructField("recs", ArrayType(recType, containsNull = false),
      nullable = false),
    StructField("bad", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  /** First header-field value (`name: value` up to CR/LF) inside
    * `header`, "" when absent — the `(?m)^`-anchored regexp_extract
    * contract: the field name must start a header LINE (every field
    * line in the block is preceded by CRLF — the version line is
    * first), so a field-name-shaped substring inside another field's
    * VALUE (an organic URI containing `Content-Length: `) can never
    * be mis-parsed as the field. The DuckDB oracle anchors its
    * extracts with `(?m)^` identically. */
  private def field(header: String, name: String): String = {
    val i = header.indexOf("\r\n" + name)
    if (i < 0) return ""
    var j = i + 2 + name.length
    val sb = new java.lang.StringBuilder()
    while (j < header.length &&
        header.charAt(j) != '\r' && header.charAt(j) != '\n') {
      sb.append(header.charAt(j)); j += 1
    }
    sb.toString
  }

  def parse(u: UTF8String): InternalRow = {
    val s = u.toString
    val n = s.length
    val recs = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var off = 0
    var bad = 0
    var done = false
    // On a framing violation: count it, then jump to the next record
    // magic strictly past the violation point (or finish if none).
    def resync(): Unit = {
      bad += 1
      val k = s.indexOf("WARC/1.0\r\n", off + 1)
      if (k < 0) done = true else off = k
    }
    while (!done && recs.length < maxRecords) {
      if (off >= n) done = true
      else if (!s.startsWith("WARC/1.0\r\n", off)) resync()
      else {
        val hpos = s.indexOf("\r\n\r\n", off)
        if (hpos < 0) resync()
        else {
          val header = s.substring(off, hpos)
          val clstr = field(header, "Content-Length: ")
          val clenOk = clstr.nonEmpty && clstr.length <= 9 &&
            clstr.forall(c => c >= '0' && c <= '9')
          if (!clenOk) resync()
          else {
            val clen = clstr.toInt
            val pstart = hpos + 4
            if (pstart + clen + 4 > n ||
                !s.startsWith("\r\n\r\n", pstart + clen)) {
              resync()
            } else {
              recs += new GenericInternalRow(Array[Any](
                recs.length + 1,
                UTF8String.fromString(field(header, "WARC-Type: ")),
                UTF8String.fromString(field(header, "WARC-Target-URI: ")),
                UTF8String.fromString(field(header, "WARC-Date: ")),
                clen,
                UTF8String.fromString(s.substring(pstart, pstart + clen))))
              off = pstart + clen + 4
            }
          }
        }
      }
    }
    // Hitting the record bound with bytes still unread is NOT a clean
    // parse: count it like any other framing stop (silent truncation
    // would violate the count-don't-crash contract and diverge from
    // the uncapped oracle recursion). Size files under the bound.
    if (!done && recs.length >= maxRecords && off < n) bad += 1
    new GenericInternalRow(Array[Any](
      new GenericArrayData(recs.toArray[Any]), bad))
  }

  override def nullSafeEval(input: Any): Any =
    parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val ref = ctx.addReferenceObj("warcParse", this,
        "graft.functions.WarcParse")
      s"${ev.value} = $ref.parse($in);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "warc_parse"
}

object WarcOps {
  /** Parse one WARC file string into (recs, bad). */
  def warcParse(c: Column, maxRecords: Int): Column =
    Bridge.column(WarcParse(Bridge.expression(c), maxRecords))
}
