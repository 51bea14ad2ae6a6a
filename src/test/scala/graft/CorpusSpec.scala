package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Corpus, Dedup}

class CorpusSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- Gopher quality stats -------------------------------------------

  test("gopherStats computes word stats exactly on a hand-checked doc") {
    // 6 tokens, 5 distinct, 'aa' twice, 14 chars total
    val df = Seq((1L, "aa bb aa cc dddd eee")).toDF("doc_id", "text")
    val r = Corpus.gopherStats(df, "doc_id", "text", minWords = 3,
      minMeanLen = 1.0, maxMeanLen = 10.0, minDistinctRatio = 0.5,
      maxTopWordFrac = 0.5).head
    assert(r.getAs[Int]("n_words") == 6)
    assert(math.abs(r.getAs[Double]("mean_word_len") - 15.0 / 6) < 1e-9)
    assert(math.abs(r.getAs[Double]("distinct_ratio") - 5.0 / 6) < 1e-6)
    assert(math.abs(r.getAs[Double]("top_word_frac") - 2.0 / 6) < 1e-6)
    assert(r.getAs[Int]("keep") == 1)
  }

  test("gopherStats keep flag rejects repetitive and short docs") {
    val df = Seq(
      (1L, Seq.fill(50)("spam").mkString(" ")),          // top_word_frac = 1
      (2L, "too short"),                                  // n_words < 30
      (3L, (1 to 50).map(i => s"word$i").mkString(" "))) // clean
      .toDF("doc_id", "text")
    val keep = Corpus.gopherStats(df, "doc_id", "text")
      .select("doc_id", "keep").as[(Long, Int)].collect().toMap
    assert(keep == Map(1L -> 0, 2L -> 0, 3L -> 1))
  }

  test("gopherStats splits the real corpus non-trivially") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val counts = Corpus.gopherStats(docs, "doc_id", "text")
      .groupBy("keep").count().as[(Int, Long)].collect().toMap
    assert(counts.getOrElse(1, 0L) > 0, "no doc passed the quality gate")
    assert(counts.getOrElse(0, 0L) > 0, "no doc failed the quality gate")
  }

  // ---- sampling --------------------------------------------------------

  test("stratifiedSample: exact n per stratum, deterministic across runs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val s1 = Corpus.stratifiedSample(docs, "doc_id", "lang", 10)
    val perLang = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    val langSizes = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    perLang.foreach { case (l, n) => assert(n == math.min(10L, langSizes(l))) }
    val ids1 = s1.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = Corpus.stratifiedSample(docs.repartition(7), "doc_id", "lang", 10)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2, "sample must not depend on partitioning")
  }

  test("hashFractionSample keeps roughly the requested fraction, deterministically") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val n = docs.count().toDouble
    val kept = Corpus.hashFractionSample(docs, "doc_id", 0.3)
    val k1 = kept.count()
    assert(math.abs(k1 / n - 0.3) < 0.08, s"kept ${k1 / n}, wanted ~0.3")
    assert(Corpus.hashFractionSample(docs, "doc_id", 0.3).count() == k1)
    // monotone: a larger fraction keeps a superset
    val k2 = Corpus.hashFractionSample(docs, "doc_id", 0.5)
    val sub = kept.select("doc_id").exceptAll(k2.select("doc_id")).count()
    assert(sub == 0, "0.3-sample must be a subset of the 0.5-sample")
  }

  // ---- domain rollup ---------------------------------------------------

  test("domainStats counts docs and exact-dup rate per source") {
    val df = Seq(
      (1L, "alpha beta", "s1"), (2L, "alpha beta", "s1"), (3L, "gamma", "s1"),
      (4L, "unique text", "s2"))
      .toDF("doc_id", "text", "source")
    val got = Corpus.domainStats(df, "doc_id", "text", "source",
        minDocs = 2, minUniqueRatio = 0.8)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("uniq_ratio"), r.getAs[Int]("keep"))).toMap
    assert(got("s1") == ((3L, 0.666667, 0)))  // 2 unique / 3 docs
    assert(got("s2") == ((1L, 1.0, 0)))       // too few docs
  }

  // ---- portable simhash ------------------------------------------------

  test("simhashPairsPortableMd5 candidates are COMPLETE at maxHamming=3 (brute force)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val got = Dedup.simhashPairsPortableMd5(docs, "doc_id", "text")
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    // brute-force reference: recompute the md5-bit signature per doc in
    // Scala, enumerate all pairs within Hamming 3
    val texts = docs.select("doc_id", "text").as[(Long, String)].collect()
    def sig(text: String): Long = {
      val toks = text.trim.split("\\s+")
      val sums = new Array[Int](64)
      val md = java.security.MessageDigest.getInstance("MD5")
      toks.foreach { w =>
        val h = md.digest(w.getBytes("UTF-8"))
        var p = 0
        while (p < 64) {
          val bit = (h(p / 8) >> (7 - p % 8)) & 1
          sums(p) += 2 * bit - 1
          p += 1
        }
      }
      (0 until 64).foldLeft(0L)((acc, p) =>
        if (sums(p) >= 0) acc | (1L << (63 - p)) else acc)
    }
    val sigs = texts.map { case (id, t) => id -> sig(t) }
    val expect = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ia, ib, h)).toSet
    assert(got == expect, s"got=$got expect=$expect")
  }

  test("simhashPairsPortableMd5 finds a planted near-duplicate") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = base.replace("tok20", "tok20x")
    val far = (1 to 40).map(i => s"other$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairsPortableMd5(df, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"planted near-dup not found: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("dupNgramStats: hand-checked repetition fractions") {
    // "a b a b c": bigrams = [a b, b a, a b, b c] → total 4,
    // dup (a b ×2) = 2/4, top = 2/4; trigrams all distinct → dup 0, top 1/3
    val df = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val out = operators.Corpus.dupNgramStats(df, "doc_id", "text", Seq(2, 3))
      .collect().map(r => r.getInt(1) -> (r.getInt(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out(2) == ((4, 0.5, 0.5)))
    assert(out(3)._1 == 3 && out(3)._2 == 0.0 && math.abs(out(3)._3 - 0.333333) < 1e-6)
  }

  test("unigramLogprob: repeated-word docs score higher, buckets cover 1..3") {
    val docs = (1L to 9L).map { i =>
      // three score tiers: all-common / half-common / all-unique words
      val words = if (i <= 3) Seq.fill(10)("common")
      else if (i <= 6) Seq.fill(5)("common") ++ (1 to 5).map(j => s"mid_${i}_$j")
      else (1 to 10).map(j => s"rare_${i}_$j")
      (i, words.mkString(" "))
    }
    val out = operators.Corpus.unigramLogprob(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getInt(3))).toMap
    (1L to 3L).foreach(i => assert(out(i)._2 == 1, s"doc $i: ${out(i)}"))
    (4L to 6L).foreach(i => assert(out(i)._2 == 2, s"doc $i: ${out(i)}"))
    (7L to 9L).foreach(i => assert(out(i)._2 == 3, s"doc $i: ${out(i)}"))
    // monotone: more common words → higher mean logprob
    assert(out(1L)._1 > out(4L)._1 && out(4L)._1 > out(7L)._1)
  }

  test("packSequences: boundary-spanning docs get the right seq interval") {
    val docs = Seq(
      (1L, "a b c", "A"),          // 3 tokens: seqs 0..0, offset 0
      (2L, "d e f g", "A"),        // 4 tokens at start 3: spans seqs 0..1, offset 3
      (3L, "h i j k l m", "B"))    // fresh shard: starts at 0 again, spans 0..1
      .toDF("doc_id", "text", "source")
    val out = operators.Corpus.packSequences(docs, "doc_id", "text", "source", seqLen = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(2), r.getLong(3), r.getInt(4), r.getInt(5), r.getInt(6))).toMap
    assert(out(1L) == ((3, 0L, 0, 0, 0)))
    assert(out(2L) == ((4, 3L, 0, 1, 3)))
    assert(out(3L) == ((6, 0L, 0, 1, 0)))
  }

  test("decontaminate flags docs quoting benchmark text, clears the rest") {
    val bench = Seq((900L, (1 to 20).map(i => s"b$i").mkString(" ")))
    val corpus = Seq(
      // quotes benchmark words 5..14 (a 10-word run ⊃ several 8-grams)
      (1L, "x1 x2 " + (5 to 14).map(i => s"b$i").mkString(" ") + " x3 x4"),
      (2L, (1 to 20).map(i => s"c$i").mkString(" ")),   // clean
      (3L, "short doc"))                                 // < 8 words
    val out = operators.Corpus.decontaminate(
        corpus.toDF("doc_id", "text"), bench.toDF("doc_id", "text"),
        "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(out(1L)._3 == 1 && out(1L)._2 == 3)  // 10-word run → 3 shared 8-grams
    assert(out(2L) == ((13, 0, 0)))             // 20 words → 13 8-grams, none shared
    assert(out(3L) == ((0, 0, 0)))              // too short: no shingles, clean
  }

  test("decontaminateFuzzy: paraphrase within budget flagged, exact copy dist 0, far doc clean") {
    val bench = Seq((900L, "The quick brown fox jumps over the lazy dog"))
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),   // exact after canon
      (2L, "The quick brown fax jumps over the lady dog!"),  // 2 edits
      (3L, "completely different words about spark plans"),  // far
      (4L, "quick brown fox"))                               // length band excludes
    val out = Corpus.decontaminateFuzzy(
        corpus.toDF("doc_id", "text"), bench.toDF("doc_id", "text"),
        "doc_id", "text", maxDist = 3, prefixChars = 64)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), Option(r.get(2)).map(_.asInstanceOf[Int]), r.getInt(3))).toMap
    assert(out(1L) == ((1, Some(0), 1)))
    assert(out(2L) == ((1, Some(2), 1)))
    assert(out(3L) == ((0, None, 0)))
    assert(out(4L) == ((0, None, 0)))
  }

  test("decontaminateFuzzy: min over several benchmark entries; non-ASCII stripped pre-distance") {
    val bench = Seq(
      (900L, "alpha beta gamma delta"),
      (901L, "alpha beta gamma delka"))   // 1 edit from the corpus doc's canon
    val corpus = Seq((1L, "Alpha—beta gamma délka"))  // é stripped → "alpha beta gamma d lka"
    val out = Corpus.decontaminateFuzzy(
        corpus.toDF("doc_id", "text"), bench.toDF("doc_id", "text"),
        "doc_id", "text", maxDist = 3, prefixChars = 64).head
    // canon corpus key "alpha beta gamma d lka": dist 2 to entry 900, 1 to 901
    assert(out.getInt(1) == 2 && out.getInt(2) == 1 && out.getInt(3) == 1)
  }

  // ---- NB quality classifier ------------------------------------------

  test("nbQualityScore separates planted class vocabularies; scores hand-checked") {
    val pos = Seq((1L, "good clean prose text"), (2L, "clean good text here"))
    val neg = Seq((3L, "spam junk noise garbage"), (4L, "junk spam garbage words"))
    val corpus = Seq(
      (10L, "good clean text"),      // pos-vocab only
      (11L, "spam junk garbage"),    // neg-vocab only
      (12L, "quantum flux widget"))  // unseen vocab → prior + base only
    val out = Corpus.nbQualityScore(
        corpus.toDF("doc_id", "text"), pos.toDF("doc_id", "text"),
        neg.toDF("doc_id", "text"), "doc_id", "text", nBuckets = 4096)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getInt(3))).toMap
    assert(out(10L)._3 == 1, s"pos-vocab doc must be kept: ${out(10L)}")
    assert(out(11L)._3 == 0, s"neg-vocab doc must be cut: ${out(11L)}")
    assert(out(10L)._2 > out(12L)._2 && out(12L)._2 > out(11L)._2)
    assert(out.values.forall(_._1 == 3))
    // hand-check doc 12 (features all unseen): N⁺=N⁻=2 ⇒ prior = 0;
    // per trained feature (8 distinct, each df=1 in its class, 0 in the
    // other): w_absent = ln(1−2/4) − ln(1−1/4) on the pos-only features
    // and the negation on neg-only ⇒ base = 0 by symmetry.
    assert(math.abs(out(12L)._2) < 1e-9,
      s"symmetric model must score unseen-vocab doc 0, got ${out(12L)._2}")
  }

  test("fit/serve splits reproduce the declared relational queries row-for-row") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val pos = docs.filter(col("lang") === "en")
    val neg = docs.filter(col("lang") =!= "en")
    val declaredNb = Corpus.nbQualityScore(docs, pos, neg, "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    val m = Corpus.fitNbQuality(pos, neg, "doc_id", "text")
    val servedNb = Corpus.nbScoreRows(docs, m, "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    assert(servedNb == declaredNb && declaredNb.nonEmpty)

    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val declaredFz = Corpus.decontaminateFuzzy(corpus, bench,
        "doc_id", "text", maxDist = 5, prefixChars = 32)
      .collect().map(_.toString).sorted.toSeq
    val keys = Corpus.fitFuzzyKeys(bench, "text", prefixChars = 32)
    val servedFz = Corpus.decontaminateFuzzyRows(corpus, keys,
        "doc_id", "text", maxDist = 5, prefixChars = 32)
      .collect().map(_.toString).sorted.toSeq
    assert(servedFz == declaredFz && declaredFz.nonEmpty)
  }

  test("nbQualityScore: repeated words count once (Bernoulli, not multinomial)") {
    val pos = Seq((1L, "good text"))
    val neg = Seq((2L, "bad text"))
    val once = Corpus.nbQualityScore(
      Seq((10L, "good extra")).toDF("doc_id", "text"),
      pos.toDF("doc_id", "text"), neg.toDF("doc_id", "text"),
      "doc_id", "text").head
    val many = Corpus.nbQualityScore(
      Seq((10L, "good good good good extra")).toDF("doc_id", "text"),
      pos.toDF("doc_id", "text"), neg.toDF("doc_id", "text"),
      "doc_id", "text").head
    assert(once.getDouble(2) == many.getDouble(2),
      "presence model must ignore token multiplicity")
    assert(once.getInt(1) == 2 && many.getInt(1) == 2)
  }

  // ---- chunking / sharding / overlap ----------------------------------

  test("chunkDocs: stride windows with clamped tail, short docs yield one chunk") {
    val df = Seq(
      (1L, (1 to 12).map(i => s"t$i").mkString(" ")),  // 2 chunks: 1-8, 5-12
      (2L, "a b c"),                                    // 1 short chunk
      (3L, (1 to 16).map(i => s"u$i").mkString(" ")))  // 3 chunks, last 9-16
      .toDF("doc_id", "text")
    val out = Corpus.chunkDocs(df, "doc_id", "text", window = 8, stride = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> ((r.getString(2), r.getInt(3)))).toMap
    assert(out.keys.count(_._1 == 1L) == 2)
    assert(out((1L, 1))._1 == (1 to 8).map(i => s"t$i").mkString(" "))
    assert(out((1L, 2))._1 == (5 to 12).map(i => s"t$i").mkString(" "))
    assert(out((2L, 1)) == (("a b c", 3)))
    assert(out.keys.count(_._1 == 3L) == 3)
    assert(out((3L, 3))._1 == (9 to 16).map(i => s"u$i").mkString(" "))
  }

  test("lengthBuckets: quartile cutoffs split distinct lengths 1..4") {
    val df = Seq((1L, "a"), (2L, "a b"), (3L, "a b c"), (4L, "a b c d"))
      .toDF("doc_id", "text")
    val out = Corpus.lengthBuckets(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out == Map(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4))
  }

  test("sourceOverlap counts shared shingle types per source pair") {
    val df = Seq(
      (1L, "A", "x y z w"),            // shingles: "x y z", "y z w"
      (2L, "B", "x y z q"),            // shares "x y z" with A
      (3L, "C", "p q r s"))            // shares nothing
      .toDF("doc_id", "source", "text")
    val out = Corpus.sourceOverlap(df, "doc_id", "text", "source", k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(out == Map(("A", "B") -> 1))
  }

  // ---- packing manifest ------------------------------------------------

  test("packManifest: hand-checked fills, every non-final sequence exactly full") {
    val df = Seq(
      (1L, "A", "t1 t2 t3 t4 t5"),       // 5 tokens: seqs 0 (4) + 1 (1)
      (2L, "A", "u1 u2 u3 u4"),          // 4 tokens: seqs 1 (3) + 2 (1)
      (3L, "B", "v1 v2"))                // 2 tokens: seq 0 (2)
      .toDF("doc_id", "shard", "text")
    val out = Corpus.packManifest(df, "doc_id", "text", "shard", seqLen = 4)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(("A", 0)) == ((1, 1L, 1L, 4L)))
    assert(out(("A", 1)) == ((2, 1L, 2L, 4L)), "boundary-spanning seq holds both docs")
    assert(out(("A", 2)) == ((1, 2L, 2L, 1L)))
    assert(out(("B", 0)) == ((1, 3L, 3L, 2L)))
    // invariant: within each shard every sequence but the last is full
    out.keys.map(_._1).foreach { sh =>
      val seqs = out.filter(_._1._1 == sh).toSeq.sortBy(_._1._2)
      seqs.dropRight(1).foreach { case (k, v) =>
        assert(v._4 == 4L, s"non-final sequence $k not full: $v") }
    }
  }

  // ---- held-out LM scoring ---------------------------------------------

  test("lmCrossEntropy: hand-checked add-one smoothing and OOV floor") {
    val ref = Seq((100L, "a a b")).toDF("doc_id", "text")     // N=3, V=2
    val corpus = Seq((1L, "a c"), (2L, "a a")).toDF("doc_id", "text")
    val out = Corpus.lmCrossEntropy(corpus, ref, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    // P(a) = 3/6, P(c OOV) = 1/6
    val exp1 = -(math.log(3.0 / 6) + math.log(1.0 / 6)) / 2
    val exp2 = -math.log(3.0 / 6)
    assert(out(1L)._1 == 2 && math.abs(out(1L)._2 - exp1) < 1e-6)
    assert(math.abs(out(2L)._2 - exp2) < 1e-6)
    assert(out(2L)._2 < out(1L)._2, "reference-like doc must score lower")
  }

  // ---- data mixing -----------------------------------------------------

  test("mixDomains: integer weights copy exactly, zero drops, default is 1") {
    val df = (1 to 10).map(i => (i.toLong, if (i <= 4) "A" else if (i <= 7) "C" else "D"))
      .toDF("doc_id", "source")
    val out = Corpus.mixDomains(df, "doc_id", "source",
        Map("A" -> 2.0, "C" -> 0.0), defaultWeight = 1.0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    (1 to 4).foreach(i => assert(byDoc(i.toLong) == Seq(1, 2), s"doc $i: ${byDoc.get(i.toLong)}"))
    (5 to 7).foreach(i => assert(!byDoc.contains(i.toLong), s"dropped source leaked doc $i"))
    (8 to 10).foreach(i => assert(byDoc(i.toLong) == Seq(1), s"doc $i: ${byDoc.get(i.toLong)}"))
  }

  test("mixDomains: fractional weight gives floor or floor+1 copies, deterministically") {
    val df = (1 to 200).map(i => (i.toLong, "B")).toDF("doc_id", "source")
    val run = () => Corpus.mixDomains(df, "doc_id", "source", Map("B" -> 1.5))
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSeq
    val out = run()
    val copies = out.groupBy(_._1).view.mapValues(_.size).toMap
    assert(copies.values.forall(c => c == 1 || c == 2))
    val frac = copies.values.count(_ == 2).toDouble / copies.size
    assert(frac > 0.3 && frac < 0.7, s"fractional keep ratio $frac far from 0.5")
    assert(run() == out, "mix must be bit-deterministic across runs")
    // epochs are contiguous from 1
    assert(out.groupBy(_._1).values.forall(es => es.map(_._2).sorted == (1 to es.size)))
  }

  // ---- cross-operator invariants on the real corpus --------------------

  test("packManifest ⟷ packSequences: fills conserve tokens, memberships agree") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val packed = Corpus.packSequences(docs, "doc_id", "text", "source", 512)
      .filter(col("n_tokens") > 0).collect()
    val manifest = Corpus.packManifest(docs, "doc_id", "text", "source", 512).collect()
    // token conservation: per shard, Σ seq fills == Σ doc token counts
    val tokByShard = packed.groupBy(_.getString(1)).view
      .mapValues(_.map(_.getInt(2).toLong).sum).toMap
    val fillByShard = manifest.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(5)).sum).toMap
    assert(fillByShard == tokByShard)
    // membership count: Σ n_docs == Σ (seq_last - seq_first + 1)
    val memberships = packed.map(r => r.getInt(5) - r.getInt(4) + 1L).sum
    assert(manifest.map(_.getInt(2).toLong).sum == memberships)
    // last sequence per shard is the only non-full one
    manifest.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      sorted.dropRight(1).foreach(r => assert(r.getLong(5) == 512L))
    }
  }

  test("dedupSpans on an all-unique corpus is the identity") {
    val df = (0 until 40).map(i =>
      (i.toLong, (0 until 13).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.dedupSpans(df, "doc_id", "text", spanLen = 5)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    val orig = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    orig.foreach { case (id, text) =>
      assert(out(id) == ((3, 3, text)), s"doc $id mutated: ${out(id)}") }
  }

  test("chunkDocs covers every token: first chunk at 1, last chunk reaches len") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val lens = docs.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = Corpus.chunkDocs(docs, "doc_id", "text", window = 8, stride = 4)
      .collect().groupBy(_.getLong(0))
    lens.foreach { case (id, len) =>
      val cs = chunks(id).sortBy(_.getInt(1))
      val expected = if (len <= 8) 1 else (len - 8 + 3) / 4 + 1
      assert(cs.length == expected, s"doc $id: ${cs.length} chunks for len $len")
      // token coverage: (nChunks-1)*stride + lastChunkTokens == len
      val lastTokens = cs.last.getInt(3)
      assert((cs.length - 1) * 4 + lastTokens == len,
        s"doc $id: coverage gap (chunks ${cs.length}, last $lastTokens, len $len)")
    }
  }

  // ---- heavy hitters ---------------------------------------------------

  // ---- PII redaction ---------------------------------------------------

  test("redactPii: hand-checked counts and masking for all four categories") {
    val df = Seq(
      (1L, "mail a@b.co and x.y+z@sub.example.org ssn 123-45-6789 " +
           "call 555-867-5309 or 303.555.1234 host 10.0.0.1"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val r = Corpus.redactPii(df, "doc_id", "text").collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Int]("n_emails") == 2)
    assert(r(1L).getAs[Int]("n_ssns") == 1)
    assert(r(1L).getAs[Int]("n_phones") == 2)
    assert(r(1L).getAs[Int]("n_ips") == 1)
    assert(r(1L).getAs[Int]("pii_total") == 6)
    assert(r(1L).getAs[String]("clean_text") ==
      "mail <EMAIL> and <EMAIL> ssn <SSN> call <PHONE> or <PHONE> host <IP>")
    assert(r(2L).getAs[Int]("pii_total") == 0)
    assert(r(2L).getAs[String]("clean_text") == "no pii here at all")
  }

  test("redactPii: SSN/phone/IP digit shapes never cross-match") {
    // 3-2-4 is only an SSN, 3-3-4 only a phone, dotted quad only an IP
    val df = Seq((1L, "987-65-4321 987-654-3210 192.168.001.255")).toDF("doc_id", "text")
    val r = Corpus.redactPii(df, "doc_id", "text").head
    assert(r.getAs[Int]("n_ssns") == 1 && r.getAs[Int]("n_phones") == 1 &&
           r.getAs[Int]("n_ips") == 1)
    assert(r.getAs[String]("clean_text") == "<SSN> <PHONE> <IP>")
  }

  // ---- repetition filter -------------------------------------------------

  test("repetitionFilter: boilerplate dropped, clean doc kept, short doc passes n-gram cuts vacuously") {
    val clean = (1 to 40).map(i => s"word$i").mkString(" ")
    val boiler = Seq.fill(20)("buy cheap pills now").mkString(" ")
    val df = Seq((1L, clean), (2L, boiler), (3L, "tiny doc")).toDF("doc_id", "text")
    val r = Corpus.repetitionFilter(df, "doc_id", "text").collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Int]("keep") == 1)
    assert(r(1L).getAs[Double]("dup_frac_2") == 0.0)
    // every 4-token phrase repeats 20x: dup_frac = 1 for n=2 and 3
    assert(r(2L).getAs[Double]("dup_frac_2") == 1.0)
    assert(r(2L).getAs[Double]("dup_frac_3") == 1.0)
    assert(r(2L).getAs[Int]("keep") == 0)
    // 2 tokens: no 3-grams exist — the n=3 cut must pass vacuously (0.0),
    // the verdict failing only on the gopher length gate
    assert(r(3L).getAs[Double]("dup_frac_3") == 0.0)
    assert(r(3L).getAs[Int]("gopher_keep") == 0 && r(3L).getAs[Int]("keep") == 0)
  }

  test("repetitionFilter splits the real corpus non-trivially") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val counts = Corpus.repetitionFilter(docs, "doc_id", "text")
      .groupBy("keep").count().as[(Int, Long)].collect().toMap
    assert(counts.getOrElse(1, 0L) > 0, "no doc survived the repetition filter")
    assert(counts.getOrElse(0, 0L) > 0, "no doc was dropped by the repetition filter")
  }

  // ---- BPE pair counting -------------------------------------------------

  test("bpePairs: hand-checked adjacent-pair counts, tie-break on pair text, k cap") {
    val df = Seq((1L, "a b a b c"), (2L, "b c d")).toDF("doc_id", "text")
    // pairs: doc1 = [a b, b a, a b, b c], doc2 = [b c, c d]
    val all = Corpus.bpePairs(df, "text", k = 10)
      .as[(String, Long)].collect().toSeq
    assert(all == Seq(("a b", 2L), ("b c", 2L), ("b a", 1L), ("c d", 1L)))
    val top2 = Corpus.bpePairs(df, "text", k = 2).as[(String, Long)].collect().toSeq
    assert(top2 == Seq(("a b", 2L), ("b c", 2L)), "cutoff tie must break on pair asc")
  }

  // ---- normalization -----------------------------------------------------

  test("normalizeText: case/punct/whitespace variants collapse to one digest") {
    val df = Seq((1L, "Hello, WORLD!"), (2L, "hello world"),
                 (3L, "  hello   world  "), (4L, "!!!")).toDF("doc_id", "text")
    val r = Corpus.normalizeText(df, "doc_id", "text").collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[String]("norm_text") == "hello world")
    assert(Seq(1L, 2L, 3L).map(r(_).getAs[String]("norm_digest")).distinct.size == 1)
    assert(r(1L).getAs[Int]("n_tokens") == 2)
    assert(r(4L).getAs[String]("norm_text") == "" && r(4L).getAs[Int]("n_tokens") == 0)
  }

  test("canonical dedup collapses case/punct/spacing variants to the first doc") {
    val df = Seq((1L, "Hello, World!"), (2L, "hello world"),
                 (3L, "  HELLO   world.  "), (4L, "different text")).toDF("doc_id", "text")
    val n = Corpus.normalizeText(df, "doc_id", "text")
    val keep = n.groupBy("norm_digest").agg(min("doc_id").as("doc_id")).select("doc_id")
    val survivors = n.join(keep, Seq("doc_id"), "left_semi")
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 4L),
      s"three variants must collapse to doc 1, got $survivors")
  }

  // ---- corpus profile ----------------------------------------------------

  test("corpusProfile: hand-checked per-source stats and exact percentiles") {
    val df = Seq((1L, "a b", "s1"), (2L, "a b c d", "s1"), (3L, "a", "s2"))
      .toDF("doc_id", "text", "source")
    val r = Corpus.corpusProfile(df, "text", "source").collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    assert(r("s1").getAs[Int]("n_docs") == 2)
    assert(r("s1").getAs[Long]("total_tokens") == 6L)
    assert(r("s1").getAs[Double]("avg_tokens") == 3.0)
    assert(r("s1").getAs[Double]("p50_tokens") == 3.0) // interpolated between 2 and 4
    assert(r("s2").getAs[Double]("p95_tokens") == 1.0)
  }

  // ---- Bloom decontamination ----------------------------------------------

  test("decontaminateBloom: superset of exact (no false negatives), FP docs bounded at fpp=1e-6") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val exact = Corpus.decontaminate(corpus, bench, "doc_id", "text", k = 8)
      .select(col("doc_id"), col("n_hits").as("eh"), col("contaminated").as("ec"))
    val bloom = Corpus.decontaminateBloom(corpus, bench, "doc_id", "text", k = 8)
      .select(col("doc_id"), col("n_hits").as("bh"), col("contaminated").as("bc"))
    val j = exact.join(bloom, "doc_id").collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      assert(r.getAs[Int]("bh") >= r.getAs[Int]("eh"),
        s"bloom lost a true hit on doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Int]("bc") >= r.getAs[Int]("ec"),
        s"bloom false negative on doc ${r.getAs[Long]("doc_id")}")
    }
    val fpDocs = j.count(r => r.getAs[Int]("bc") == 1 && r.getAs[Int]("ec") == 0)
    val cleanDocs = j.count(r => r.getAs[Int]("ec") == 0)
    assert(fpDocs <= math.max(1, cleanDocs / 100),
      s"$fpDocs false-positive docs out of $cleanDocs clean")
  }

  // ---- collocations (PMI) ------------------------------------------------

  test("collocations: a planted phrase dominates PMI; rare pairs suppressed by minCount") {
    // 'san francisco' always adjacent (PMI max); filler words pair randomly
    val phrase = Seq.fill(6)("san francisco").mkString(" ")
    val noise = (1 to 6).map(i => s"the of and in to at the of and in to at").mkString(" ")
    val df = Seq((1L, phrase), (2L, noise), (3L, noise)).toDF("doc_id", "text")
    val top = Corpus.collocations(df, "text", minCount = 5, k = 5).collect()
    assert(top.head.getAs[String]("w1") == "san" &&
           top.head.getAs[String]("w2") == "francisco",
      s"expected (san, francisco) first, got ${top.head}")
    // 'francisco san' occurs 5 times (interior adjacencies) — present;
    // nothing below minCount appears
    assert(top.forall(_.getAs[Long]("n_ab") >= 5))
  }

  // ---- weighted sampling ---------------------------------------------------

  test("weightedSample: deterministic across partitionings, k respected, heavy doc always in") {
    val df = (1 to 200).map(i => (i.toLong, if (i == 7) 1000000 else 1))
      .toDF("doc_id", "n_tokens")
    val s1 = Corpus.weightedSample(df, "doc_id", "n_tokens", k = 20)
      .select("doc_id").as[Long].collect().toSeq
    val s2 = Corpus.weightedSample(df.repartition(13), "doc_id", "n_tokens", k = 20)
      .select("doc_id").as[Long].collect().toSeq
    assert(s1.size == 20 && s1.sorted == s2.sorted,
      "sample must not depend on partitioning")
    assert(s1.contains(7L), "a 10^6-weight doc must dominate the top-20 keys")
    // generic id column names resolve (the coin reads the ORIGINAL
    // column; a rename-then-reference bug once broke any idCol ≠ doc_id)
    val renamed = Corpus.weightedSample(
      df.withColumnRenamed("doc_id", "vec_id"), "vec_id", "n_tokens", k = 20)
      .select("doc_id").as[Long].collect().toSeq
    assert(renamed.sorted == s1.sorted)
    // fractional weights survive in the output (no int truncation)
    val frac = Corpus.weightedSample(
      df.withColumn("n_tokens", col("n_tokens") * 0.5), "doc_id", "n_tokens", k = 5)
      .select("weight").as[Double].collect()
    assert(frac.forall(w => w > 0 && w != w.floor || w >= 1),
      s"fractional weights must not truncate to 0: ${frac.toSeq}")
    // zero-weight rows are excluded, never division-by-zero
    val withZero = Corpus.weightedSample(
      df.withColumn("n_tokens", when(col("doc_id") <= 100, 0).otherwise(col("n_tokens"))),
      "doc_id", "n_tokens", k = 200).select("doc_id").as[Long].collect()
    assert(withZero.forall(_ > 100) && withZero.length == 100)
  }

  // ---- DSIR importance resampling -------------------------------------------

  test("dsirSelect: target-like pool docs win the Gumbel-top-k, disjoint-vocab docs lose") {
    // target domain speaks one vocabulary, the pool carries 2 docs of
    // that vocabulary and 8 of a disjoint one — the log-likelihood
    // ratio gap (several nats) dwarfs Gumbel noise (std ~1.28), so the
    // 2 target-like docs must be exactly the k=2 selection
    val target = (0 until 5).map(i => (100L + i, "qubit lattice anneal decohere"))
      .toDF("doc_id", "text")
    val pool = (Seq(
      (1L, "qubit lattice anneal decohere qubit lattice"),
      (2L, "decohere anneal qubit qubit lattice anneal")) ++
      (3 until 11).map(i => (i.toLong, s"stock bond yield coupon tick$i")))
      .toDF("doc_id", "text")
    val top2 = Corpus.dsirSelect(pool, target, "doc_id", "text", k = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(top2 == Set(1L, 2L), s"selected $top2")
    // importance must separate the vocabularies with a wide margin
    val all = Corpus.dsirSelect(pool, target, "doc_id", "text", k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("importance")).toMap
    val minTargetLike = Seq(1L, 2L).map(all).min
    val maxOther = (3L until 11L).map(all).max
    assert(minTargetLike > maxOther + 2.0,
      s"importance gap too small: $minTargetLike vs $maxOther")
    // deterministic: same inputs, same selection and keys
    val again = Corpus.dsirSelect(pool, target, "doc_id", "text", k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("gumbel_key")).toMap
    val first = Corpus.dsirSelect(pool, target, "doc_id", "text", k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("gumbel_key")).toMap
    assert(again == first)
  }

  // ---- token-budget selection ------------------------------------------------

  test("selectTokenBudget: hand-checked boundary + equals the naive global cumsum") {
    // hand case: keys 1.0 (10 toks), 2.0 (20), 3.0 (30), budget 35 —
    // the third doc would overflow, so exactly the first two survive
    val small = Seq((1L, 10L, 3.0), (2L, 20L, 2.0), (3L, 10L, 1.0))
      .toDF("doc_id", "n_tokens", "key")
    val sel = Corpus.selectTokenBudget(small, "doc_id", "n_tokens", "key", 35L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cum_tokens")).toMap
    assert(sel == Map(3L -> 10L, 2L -> 30L), s"got $sel")
    // differential: bucketed two-level prefix sum == naive single
    // global cumsum on a 200-doc random frame (many quantile buckets)
    val rnd = new scala.util.Random(31)
    val docs = (0 until 200).map(i =>
      (i.toLong, (rnd.nextInt(50) + 1).toLong, rnd.nextDouble() * 10))
    val df = docs.toDF("doc_id", "n_tokens", "key")
    val got = Corpus.selectTokenBudget(df, "doc_id", "n_tokens", "key", 2000L)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cum_tokens"))).toSet
    val naive = docs.map { case (id, t, k) =>
      (id, t, BigDecimal(k).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, _, k) => (k, id) }
      .scanLeft((0L, 0L, 0.0)) { case ((_, acc, _), (id, t, k)) => (id, acc + t, k) }
      .drop(1).takeWhile(_._2 <= 2000L).map { case (id, cum, _) => (id, cum) }.toSet
    assert(got == naive, s"bucketed != naive:\nextra=${got -- naive}\nmissing=${naive -- got}")
  }

  // ---- BPE merge training ---------------------------------------------------

  test("bpeTrain: planted phrase merges first, later rounds chain onto merged tokens") {
    // 'new york' 8x dominates round 1; after merging, 'new_york city' 6x
    // is the top remaining pair — round 2 must chain onto the merged token
    val df = Seq(
      (1L, Seq.fill(8)("new york city").mkString(" a b ")),
      (2L, "c d c d")).toDF("doc_id", "text")
    val m = Corpus.bpeTrain(df, "text", nMerges = 2)
      .orderBy("merge_rank").collect()
    assert(m(0).getAs[String]("pair") == "new york")
    assert(m(0).getAs[String]("merged") == "new_york")
    assert(m(0).getAs[Long]("freq") == 8L)
    assert(m(1).getAs[String]("pair") == "new_york city",
      s"round 2 must see round 1's merge, got ${m(1)}")
  }

  test("bpeTrain: left-to-right non-overlap on runs; stops early when nothing repeats") {
    // 'a a a a' in two docs: pair 'a a' counted 3x per doc (overlapping),
    // merged as 2 non-overlapping occurrences per doc in round 1; round 2
    // then sees 'a_a a_a' twice (once per doc) and merges it; round 3 has
    // no repeating pair (one 'a_a_a_a' per doc) and must stop early
    val df = Seq((1L, "a a a a"), (2L, "a a a a")).toDF("doc_id", "text")
    val m = Corpus.bpeTrain(df, "text", nMerges = 5).orderBy("merge_rank").collect()
    assert(m(0).getAs[String]("pair") == "a a" && m(0).getAs[Long]("freq") == 6L)
    assert(m(1).getAs[String]("pair") == "a_a a_a" && m(1).getAs[Long]("freq") == 2L)
    assert(m.length == 2, s"no repeating pair remains after 2 merges: ${m.toSeq}")
  }

  test("bpeTrain: sampled fit reproduces the full fit's merge table on a skew-free corpus") {
    // 40 docs drawn from two homogeneous templates — pair-frequency
    // RANKS are identical in any uniform document sample, so fitting
    // merges on the md5-coin half must yield the same (rank, pair,
    // merged) sequence as the full fit (frequencies shrink, order
    // doesn't). This is the 100 TB posture: bounded-sample fit,
    // corpus-wide bpeApply serve.
    val docs = (0 until 40).map { i =>
      val base = if (i % 2 == 0) "new york city u" + i else "new york harbor v" + i
      (i.toLong, base + " new york w" + i)
    }.toDF("doc_id", "text")
    val full = Corpus.bpeTrain(docs, "text", nMerges = 3)
      .orderBy("merge_rank").collect()
      .map(r => (r.getAs[Int]("merge_rank"), r.getAs[String]("pair"), r.getAs[String]("merged")))
    val sampled = Corpus.bpeTrain(docs, "text", nMerges = 3, sampleFraction = 0.5)
      .orderBy("merge_rank").collect()
      .map(r => (r.getAs[Int]("merge_rank"), r.getAs[String]("pair"), r.getAs[String]("merged")))
    assert(sampled.nonEmpty && sampled.toSeq == full.toSeq,
      s"sampled-fit merges diverged:\nfull=${full.toSeq}\nsampled=${sampled.toSeq}")
    // the sample genuinely subsets: re-fit on the sampled docs only and
    // check the coin kept a strict, non-empty subset
    val coin = conv(substring(md5(col("text").cast("binary")), 1, 8), 16, 10)
      .cast("long") < lit((0.5 * 4294967296.0).toLong)
    val nSampled = docs.filter(coin).count()
    assert(nSampled > 0 && nSampled < 40, s"degenerate sample: $nSampled/40")
  }

  test("bpeApply: ordered merges, non-overlap on runs, idempotent on merged text") {
    val df = Seq((1L, "a b a b c"), (2L, "x a b y"), (3L, "a a a")).toDF("doc_id", "text")
    val merges = Seq("a b" -> "a_b", "a_b c" -> "a_b_c")
    val r = Corpus.bpeApply(df, "doc_id", "text", merges).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("bpe_text")).toMap
    // merge 2 chains onto merge 1's output: "a b a b c" → "a_b a_b c" → "a_b a_b_c"
    assert(r(1L) == "a_b a_b_c")
    assert(r(2L) == "x a_b y")
    assert(r(3L) == "a a a", "no pair 'a b' here — text untouched")
    // idempotent: the merged corpus contains no un-merged pair anymore
    val again = Corpus.bpeApply(
        Corpus.bpeApply(df, "doc_id", "text", merges)
          .withColumnRenamed("bpe_text", "text"), "doc_id", "text", merges)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("bpe_text")).toMap
    assert(again == r)
  }

  test("bpeApply replays bpeTrain's merge table to the trained end-state semantics") {
    val df = Seq((1L, "new york city new york"), (2L, "new york is big")).toDF("doc_id", "text")
    val table = Corpus.bpeTrain(df, "text", nMerges = 2).orderBy("merge_rank")
      .collect().map(r => r.getAs[String]("pair") -> r.getAs[String]("merged")).toSeq
    val applied = Corpus.bpeApply(df, "doc_id", "text", table).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("bpe_text")).toMap
    // 'new york' merges everywhere; the second round merged the next pair
    assert(applied(1L).contains("new_york") && applied(2L).startsWith("new_york"))
    assert(!applied.values.exists(_.matches(".*\\bnew york\\b.*")))
  }

  // ---- embedding centroids ---------------------------------------------------

  test("Embeddings.centroids: hand-checked per-label means, exploded shape") {
    val df = Seq((1L, Array(1.0f, 2.0f), 0), (2L, Array(3.0f, 6.0f), 0),
                 (3L, Array(10.0f, 20.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = graft.operators.Embeddings.centroids(df, "label", "embedding")
      .collect().map(x => (x.getAs[Int]("grp"), x.getAs[Int]("dim_idx")) -> x).toMap
    assert(r((0, 0)).getAs[Double]("centroid") == 2.0)
    assert(r((0, 1)).getAs[Double]("centroid") == 4.0)
    assert(r((1, 0)).getAs[Double]("centroid") == 10.0)
    assert(r((0, 0)).getAs[Int]("n_vectors") == 2 && r((1, 1)).getAs[Int]("n_vectors") == 1)
  }

  // ---- corpus diff -----------------------------------------------------

  test("corpusDiff classifies added/removed/changed/unchanged") {
    val prev = Seq((1L, "same"), (2L, "old body"), (3L, "goes away")).toDF("doc_id", "text")
    val cur = Seq((1L, "same"), (2L, "new body"), (4L, "brand new")).toDF("doc_id", "text")
    val r = Corpus.corpusDiff(prev, cur, "doc_id", "text").collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("status")).toMap
    assert(r == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  // ---- HLL domain rollup -------------------------------------------------

  test("domainStatsApprox tracks the exact distinct count within sketch error") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val exact = Corpus.domainStats(docs, "doc_id", "text", "source")
      .select("source", "n_docs").as[(String, Long)].collect().toMap
    val uniq = docs.groupBy("source")
      .agg(countDistinct(md5(col("text").cast("binary"))).as("u"))
      .as[(String, Long)].collect().toMap
    val approx = Corpus.domainStatsApprox(docs, "doc_id", "text", "source")
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_unique_approx"))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (s, (nd, nu)) =>
      assert(nd == exact(s), s"doc count must stay exact for $s")
      val ex = uniq(s).toDouble
      assert(math.abs(nu - ex) / ex <= 0.15,
        s"sketch error too large for $s: approx $nu vs exact ${uniq(s)}")
    }
  }

  test("domainStatsKmv: bottom-k estimate within estimator error on the real " +
       "corpus; small sources report exactly") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val k = 16
    val uniq = docs.groupBy("source")
      .agg(countDistinct(md5(col("text").cast("binary"))).as("u"))
      .as[(String, Long)].collect().toMap
    val kmv = Corpus.domainStatsKmv(docs, "doc_id", "text", "source", k = k)
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Double]("n_unique_kmv")).toMap
    assert(kmv.keySet == uniq.keySet)
    // k=16 -> rsd ~ 1/sqrt(k-2) ~ 27%; per-source bound loose (3 sigma),
    // the MEAN over 20 sources must be well inside one sigma
    val relErrs = kmv.map { case (s, est) =>
      val ex = uniq(s).toDouble
      val re = math.abs(est / ex - 1)
      assert(re <= 0.8, s"KMV estimate for $s off by $re: $est vs $ex")
      re
    }
    val mean = relErrs.sum / relErrs.size
    assert(mean <= 0.25, s"mean KMV relative error $mean too large")
    // a source with fewer than k distinct docs is the estimator's
    // small-set case: the count is reported exactly
    val tiny = Seq((1L, "a", "s"), (2L, "b", "s"), (3L, "a", "s"))
      .toDF("doc_id", "text", "source")
    val est = Corpus.domainStatsKmv(tiny, "doc_id", "text", "source", k = k)
      .collect()
    assert(est.length == 1 && est(0).getAs[Double]("n_unique_kmv") == 2.0 &&
      est(0).getAs[Long]("n_docs") == 3L)
  }

  test("decontaminateBloomMd5: one-sided error vs the exact join — no false " +
       "negatives, hits bounded below by exact hits") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val exact = Corpus.decontaminate(corpus, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3))).toMap
    val bloom = Corpus.decontaminateBloomMd5(corpus, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3))).toMap
    assert(bloom.keySet == exact.keySet)
    var extra = 0
    exact.foreach { case (id, (exHits, exFlag)) =>
      val (blHits, blFlag) = bloom(id)
      assert(blHits >= exHits,
        s"Bloom dropped a true hit for $id: $blHits < $exHits")
      if (exFlag == 1) assert(blFlag == 1, s"false negative on $id")
      extra += blHits - exHits
    }
    // 4x20-bit positions at bench density keep false positives ~1e-7
    // per shingle; the corpus-wide excess must stay marginal
    assert(extra <= 2, s"implausibly many Bloom false-positive hits: $extra")
    assert(exact.values.exists(_._2 == 1), "fixture must contain real hits")
  }

  test("langClassify: separable character distributions recover perfectly; " +
       "majority prior breaks featureless ties") {
    // three planted "languages" with disjoint trigram inventories
    val docs = (0 until 5).flatMap { i =>
      Seq((i * 3 + 0L, "aqua aqua ber aqua qua ber aqua", "aa"),
          (i * 3 + 1L, "zilk zolk zulk zilk zolk zulk zilk", "zz"),
          (i * 3 + 2L, "mnop mnopq mnop pqmn mnop mnopq", "mm"))
    }.toDF("doc_id", "text", "lang")
    val got = Corpus.langClassify(docs, "doc_id", "text", "lang", nBuckets = 256)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(3))).toMap
    assert(got.size == 15 && got.values.forall(_._2 == 1),
      s"separable languages must classify perfectly: $got")
    // determinism: identical scores and argmax across runs
    val again = Corpus.langClassify(docs, "doc_id", "text", "lang", nBuckets = 256)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(3))).toMap
    assert(again == got)
  }

  test("langClassify fit/serve: the native row-local scorer reproduces the " +
       "declared relational query row-for-row") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val tup = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3))
    val declared = Corpus.langClassify(docs, "doc_id", "text", "lang",
        nBuckets = 1024)
      .collect().map(tup).toSeq
    val m = Corpus.fitLangModel(docs, "doc_id", "text", "lang", nBuckets = 1024)
    val served = Corpus.langScoreRows(docs, m, "doc_id", "text", "lang")
      .orderBy("doc_id").collect().map(tup).toSeq
    assert(served == declared,
      "fit/serve must reproduce the declared lang classification exactly")
  }

  test("topTermsPerGroup ranks by count desc then term asc, capped at k") {
    val df = Seq(
      (1L, "en", "x x x y y z"),
      (2L, "en", "y z2 z2"),
      (3L, "fr", "le le la"))
      .toDF("doc_id", "lang", "text")
    val out = Corpus.topTermsPerGroup(df, "lang", "text", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      ("en", "x", 3L, 1), ("en", "y", 3L, 2),   // tie 3-3 → term asc
      ("fr", "le", 2L, 1), ("fr", "la", 1L, 2)))
  }
}
