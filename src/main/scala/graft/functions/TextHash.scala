package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Shared input contract for the token-array expressions: the child
  * must be `array<string>` (these are on the cluster-wide SQL surface,
  * so analysis-time rejection beats a runtime ClassCastException), and
  * NULL elements are skipped — the `concat_ws` semantics of the
  * layered builtin forms they replaced. */
trait TokenArrayExpression { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = self.child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} requires array<string>, got ${other.catalogString}")
  }
}

/** 64-bit SimHash of a token array (`array<string>` → long) as a
  * native Catalyst expression.
  *
  * Per token: FNV-1a 64-bit over the token's UTF-8 bytes (stable
  * across JVMs/engines, no Spark internals); each signature bit is the
  * majority vote of that hash bit across tokens. Replaces the former
  * Scala UDF (`Dedup.simhash64` r1): the UDF forced per-row
  * serialization into the Scala lambda and broke the enclosing
  * whole-stage-codegen span; this generates a primitive loop in the
  * same span as the surrounding projection — the signature pass over a
  * corpus is now pure scan-parallel codegen with zero boxing.
  */
case class SimHash64(child: Expression) extends UnaryExpression with TokenArrayExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bs = arr.getUTF8String(i).getBytes
        var h = 0xcbf29ce484222325L
        var j = 0
        while (j < bs.length) { h ^= (bs(j) & 0xffL); h *= 0x100000001b3L; j += 1 }
        var b = 0
        while (b < 64) { if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1; b += 1 }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i"); val bs = ctx.freshName("bs")
      val h = ctx.freshName("h"); val j = ctx.freshName("j")
      val b = ctx.freshName("b"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |int[] $acc = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) continue;
         |  byte[] $bs = $a.getUTF8String($i).getBytes();
         |  long $h = 0xcbf29ce484222325L;
         |  for (int $j = 0; $j < $bs.length; $j++) {
         |    $h ^= (long) ($bs[$j] & 0xff);
         |    $h *= 0x100000001b3L;
         |  }
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $acc[$b]++; else $acc[$b]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($acc[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** Winnowing fingerprints of a token array (`array<string>` →
  * `array<string>` of distinct window-min k-gram md5 hex digests) as
  * ONE native expression — semantically identical to the layered form
  * `array_distinct(transform(seq, j -> array_min(slice(kh, j, w))))`
  * over `kh = transform(seq, i -> md5(kgram_i))`, but evaluated as a
  * single per-row JVM pass instead of three nested HOFs, each of which
  * Spark interprets per ELEMENT with boxed dispatch (measured 8.5 s →
  * sub-second at sf0.1). Hex-string lexicographic min == byte-wise min
  * in both Spark and DuckDB, so the oracle SQL keeps the layered
  * formulation and still hash-matches. Returns an empty array (no
  * fingerprints) for docs with fewer than k + window − 1 tokens —
  * `explode` then drops them, matching the layered form's row filters. */
case class WinnowFingerprints(child: Expression, k: Int, window: Int)
    extends UnaryExpression with TokenArrayExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(k >= 1 && window >= 1)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val nGrams = n - k + 1
    val nWins = nGrams - window + 1
    if (nWins <= 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val md = WinnowFingerprints.mdLocal.get()
    val hex = "0123456789abcdef".toCharArray
    val kh = new Array[String](nGrams)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var appended = 0
      var j = 0
      while (j < k) {
        if (!arr.isNullAt(i + j)) { // concat_ws semantics: skip nulls
          if (appended > 0) sb.append(' ')
          sb.append(arr.getUTF8String(i + j).toString)
          appended += 1
        }
        j += 1
      }
      md.reset()
      val dg = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hc = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hc(2 * b) = hex((dg(b) >> 4) & 0xf); hc(2 * b + 1) = hex(dg(b) & 0xf)
        b += 1
      }
      kh(i) = new String(hc)
      i += 1
    }
    val out = new java.util.LinkedHashSet[Any]
    var w0 = 0
    while (w0 < nWins) {
      var m = kh(w0)
      var t = 1
      while (t < window) { if (kh(w0 + t).compareTo(m) < 0) m = kh(w0 + t); t += 1 }
      out.add(org.apache.spark.unsafe.types.UTF8String.fromString(m))
      w0 += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "winnow_fingerprints"
}

object WinnowFingerprints {
  /** Per-thread digest: `MessageDigest.getInstance` does a synchronized
    * JCA provider lookup — per ROW, that's measurable across a corpus
    * scan; per thread it's free. (Task threads each deserialize their
    * own expression tree, but a ThreadLocal is safe even if an
    * instance is ever shared.) */
  private[functions] val mdLocal: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}

/** Distinct k-word shingles of a token array (`array<string>` →
  * `array<string>`), one per-row JVM pass — replaces the interpreted
  * `transform(sequence(...), i -> concat_ws(...))` + `array_distinct`
  * layering (per-element boxed dispatch) in the dedup shingling paths.
  * First-occurrence order, matching `array_distinct` semantics.
  * Returns an empty array for docs shorter than k tokens. */
case class Shingles(child: Expression, k: Int, distinct: Boolean = true)
    extends UnaryExpression
    with TokenArrayExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(k >= 1)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = n - k + 1
    if (m <= 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    // distinct=false keeps the full multiset (repetition statistics);
    // LinkedHashSet vs ArrayList both preserve first-occurrence order
    val out: java.util.Collection[Any] =
      if (distinct) new java.util.LinkedHashSet[Any] else new java.util.ArrayList[Any](m)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var appended = 0
      var j = 0
      while (j < k) {
        if (!arr.isNullAt(i + j)) { // concat_ws semantics: skip nulls
          if (appended > 0) sb.append(' ')
          sb.append(arr.getUTF8String(i + j).toString)
          appended += 1
        }
        j += 1
      }
      out.add(org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "shingles"
}

/** Distinct 64-bit hashes of the k-word shingles (`array<string>` →
  * `array<long>`) — the shuffle-friendly form for the ngram-Jaccard
  * inverted index (8-byte keys instead of shingle strings). FNV-1a
  * over the shingle's UTF-8 bytes; the Jaccard arithmetic is
  * hash-function-agnostic (any injective-in-practice 64-bit hash
  * yields the same counts — the DuckDB oracle keeps the string
  * formulation and hash-matches). */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression
    with TokenArrayExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(k >= 1)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = n - k + 1
    if (m <= 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new java.util.LinkedHashSet[Any]
    var i = 0
    while (i < m) {
      var h = 0xcbf29ce484222325L
      var appended = 0
      var j = 0
      while (j < k) {
        if (!arr.isNullAt(i + j)) { // concat_ws semantics: skip nulls
          if (appended > 0) { h ^= ' '.toLong; h *= 0x100000001b3L }
          val bs = arr.getUTF8String(i + j).getBytes
          var b = 0
          while (b < bs.length) { h ^= (bs(b) & 0xffL); h *= 0x100000001b3L; b += 1 }
          appended += 1
        }
        j += 1
      }
      out.add(java.lang.Long.valueOf(h))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}

/** Strided window chunks of a token array, each joined by ' '
  * (`array<string>` → `array<string>`): chunk i starts at token
  * i·stride (0-based) and spans `window` tokens (clamped at the end);
  * nChunks = 1 when n ≤ window, else ⌈(n−window)/stride⌉+1.
  * stride = window is the span-dedup chop, stride < window the
  * overlapping RAG chop. One native pass replacing a four-deep
  * interpreted HOF stack (transform ∘ sequence ∘ slice ∘ concat_ws) —
  * the same single-pass trade as `Shingles`. */
case class ChunkSpans(child: Expression, window: Int, stride: Int)
    extends UnaryExpression
    with TokenArrayExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(window >= 1 && stride >= 1 && stride <= window,
    s"need 1 <= stride <= window, got window=$window stride=$stride")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = if (n <= window) 1 else (n - window + stride - 1) / stride + 1
    val out = new Array[Any](m)
    val sb = new java.lang.StringBuilder
    var ci = 0
    while (ci < m) {
      val start = ci * stride
      val end = math.min(start + window, n)
      sb.setLength(0)
      var appended = 0
      var j = start
      while (j < end) {
        if (!arr.isNullAt(j)) { // concat_ws semantics: skip nulls
          if (appended > 0) sb.append(' ')
          sb.append(arr.getUTF8String(j).toString)
          appended += 1
        }
        j += 1
      }
      out(ci) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      ci += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "chunk_spans"
}

/** MinHash-LSH band keys of a shingle array (`array<string>` →
  * `array<string>` md5-portable / `array<int>` fast), ONE per-row JVM
  * pass — r15 optimization of the minhash family's signature stage.
  *
  * Semantically identical to the former explode → 16× seeded-hash →
  * groupBy(doc_id).agg(min…) → band-concat-hash pipeline (DedupSpec
  * pins both variants value-for-value against that spelling), but
  * row-LOCAL: a doc's minhash signature is a min over its own shingle
  * array, so the per-call Exchange the hash aggregate forced — the
  * corpus's exploded shingles (≈250× the doc count) shuffled per
  * bandedKeys call — disappears from every minhash plan, and the md5
  * variant reuses one thread-local MessageDigest instead of paying
  * `DigestUtils` construction per md5() call (16 per exploded row).
  *
  * Hash-for-hash equivalences this relies on (both re-proven by the
  * spec, and by every md5-twin oracle downstream):
  *  - portable: `min(md5('i:'||s))` hex-string min == unsigned byte
  *    min of the 16-byte digests (lowercase-hex is order-preserving);
  *    band key = md5 of the UTF-8 of `concat_ws('|', b, mins…)`.
  *  - fast: Spark's `xxhash64(lit(i), s)` folds seed 42 → int literal
  *    → string, replicated via `XxHash64Function.hash` (the engine's
  *    own interpreted path, bit-identical to codegen); per-seed
  *    prefixes are folded once per expression instance. LongType min
  *    is SIGNED, as the aggregate's was. Band key = `hash(b, mins…)`
  *    via `Murmur3HashFunction.hash` with the same 42 seed fold.
  *
  * Empty or all-null shingle arrays return NULL (posexplode then
  * yields no rows — the explode-based spelling dropped such docs the
  * same way). */
case class MinhashBandKeys(child: Expression, numHashes: Int, bands: Int,
                           portableMd5: Boolean)
    extends UnaryExpression with TokenArrayExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(numHashes >= 1 && bands >= 1 && numHashes % bands == 0,
    s"numHashes=$numHashes must be a positive multiple of bands=$bands")
  private val rowsPerBand = numHashes / bands
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    if (portableMd5) StringType else org.apache.spark.sql.types.IntegerType, false)
  override def nullable: Boolean = true

  // seed 42 folded over the integer hash index once per instance —
  // per-shingle work is then a single string hash per signature slot
  @transient private lazy val xxSeeds: Array[Long] =
    Array.tabulate(numHashes)(i =>
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        i, org.apache.spark.sql.types.IntegerType, 42L))
  @transient private lazy val md5Prefixes: Array[Array[Byte]] =
    Array.tabulate(numHashes)(i =>
      (i.toString + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def digestLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    if (portableMd5) {
      val md = WinnowFingerprints.mdLocal.get()
      val mins = new Array[Array[Byte]](numHashes)
      var e = 0
      while (e < n) {
        if (!arr.isNullAt(e)) {
          val sb = arr.getUTF8String(e).getBytes
          var i = 0
          while (i < numHashes) {
            md.reset()
            md.update(md5Prefixes(i))
            md.update(sb)
            val d = md.digest()
            if (mins(i) == null || digestLess(d, mins(i))) mins(i) = d
            i += 1
          }
        }
        e += 1
      }
      if (mins(0) == null) return null // all elements null
      val hex = "0123456789abcdef".toCharArray
      def hexify(d: Array[Byte]): String = {
        val hc = new Array[Char](32)
        var b = 0
        while (b < 16) {
          hc(2 * b) = hex((d(b) >> 4) & 0xf); hc(2 * b + 1) = hex(d(b) & 0xf)
          b += 1
        }
        new String(hc)
      }
      val out = new Array[Any](bands)
      val sb = new java.lang.StringBuilder
      var b = 0
      while (b < bands) {
        sb.setLength(0)
        sb.append(b).append('|')
        var r = 0
        while (r < rowsPerBand) {
          if (r > 0) sb.append('|')
          sb.append(hexify(mins(b * rowsPerBand + r)))
          r += 1
        }
        md.reset()
        val d = md.digest(
          sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out(b) = org.apache.spark.unsafe.types.UTF8String.fromString(hexify(d))
        b += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    } else {
      val mins = new Array[Long](numHashes)
      var seen = false
      var e = 0
      while (e < n) {
        if (!arr.isNullAt(e)) {
          val s = arr.getUTF8String(e)
          var i = 0
          while (i < numHashes) {
            val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
              .hash(s, StringType, xxSeeds(i))
            if (!seen || h < mins(i)) mins(i) = h
            i += 1
          }
          seen = true
        }
        e += 1
      }
      if (!seen) return null // all elements null
      val out = new Array[Any](bands)
      var b = 0
      while (b < bands) {
        var h: Long = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
          .hash(b, org.apache.spark.sql.types.IntegerType, 42L)
        var r = 0
        while (r < rowsPerBand) {
          h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
            .hash(mins(b * rowsPerBand + r), LongType, h)
          r += 1
        }
        out(b) = h.toInt
        b += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_band_keys"
}

object TextHash {
  import org.apache.spark.sql.graft.Bridge.{column, expression, registerFunction}

  /** `array<string>` tokens → 64-bit SimHash signature. */
  def simhash64(tokens: Column): Column =
    column(SimHash64(expression(tokens.cast("array<string>"))))

  /** `array<string>` tokens → distinct winnow fingerprint digests. */
  def winnowFingerprints(tokens: Column, k: Int, window: Int): Column =
    column(WinnowFingerprints(expression(tokens.cast("array<string>")), k, window))

  /** `array<string>` tokens → distinct k-word shingle strings. */
  def shingles(tokens: Column, k: Int): Column =
    column(Shingles(expression(tokens.cast("array<string>")), k))

  /** `array<string>` tokens → ALL k-word shingles (multiset, in
    * position order) — for repetition statistics, where duplicate
    * shingles are the signal. */
  def shinglesAll(tokens: Column, k: Int): Column =
    column(Shingles(expression(tokens.cast("array<string>")), k, distinct = false))

  /** `array<string>` tokens → distinct 64-bit shingle hashes. */
  def shingleHashes(tokens: Column, k: Int): Column =
    column(ShingleHashes(expression(tokens.cast("array<string>")), k))

  /** `array<string>` shingles → minhash-LSH band keys (md5-portable
    * hex strings, or fast xxhash64/murmur ints). */
  def minhashBandKeys(shingles: Column, numHashes: Int, bands: Int,
                      portableMd5: Boolean): Column =
    column(MinhashBandKeys(expression(shingles.cast("array<string>")),
      numHashes, bands, portableMd5))

  /** `array<string>` tokens → strided window chunks joined by ' '. */
  def chunkSpans(tokens: Column, window: Int, stride: Int): Column =
    column(ChunkSpans(expression(tokens.cast("array<string>")), window, stride))

  /** Expose to the SQL surface: `SELECT simhash64(split(text, ' '))`. */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit =
    registerFunction(spark, "simhash64", es => SimHash64(es.head))
}
