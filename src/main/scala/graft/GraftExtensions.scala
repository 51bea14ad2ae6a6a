package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions._

/** Cluster-wide registration of the engine's native expressions: set
  * `spark.sql.extensions=graft.GraftExtensions` (spark-submit conf or
  * builder) and EVERY session on the cluster gets the SQL surface —
  * `array_dot`, `array_sqdiff_sum`, `simhash64`, `shingles`,
  * `shingles_all`, `shingle_hashes`, `winnow_fingerprints` — with no
  * per-session
  * `registerSql` calls. This is the standard extension-library
  * deployment path (`SparkSessionExtensions.injectFunction`); the
  * per-session `ArrayMath.registerSql` / `TextHash.registerSql`
  * helpers remain for ad-hoc notebook use.
  *
  * Int-valued shape parameters (k, window) must be integer literals in
  * SQL — they parameterize the expression instance, not per-row input.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v, IntegerType) => v.asInstanceOf[Int]
    case other =>
      throw new IllegalArgumentException(s"$name must be an integer literal, got: $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))

    inject("array_dot") { es => ArrayDotProduct(es(0), es(1)) }
    inject("array_sqdiff_sum") { es => ArraySquaredDiffSum(es(0), es(1)) }
    inject("simhash64") { es => SimHash64(es.head) }
    inject("shingles") { es => Shingles(es(0), intArg(es(1), "k")) }
    // full multiset (repetition statistics — duplicates are the signal)
    inject("shingles_all") { es => Shingles(es(0), intArg(es(1), "k"), distinct = false) }
    inject("shingle_hashes") { es => ShingleHashes(es(0), intArg(es(1), "k")) }
    inject("winnow_fingerprints") { es =>
      WinnowFingerprints(es(0), intArg(es(1), "k"), intArg(es(2), "window"))
    }
    inject("chunk_spans") { es =>
      ChunkSpans(es(0), intArg(es(1), "window"), intArg(es(2), "stride"))
    }
    inject("char_trigram_buckets") { es =>
      CharTrigramBuckets(es(0), intArg(es(1), "nBuckets"))
    }
  }
}
