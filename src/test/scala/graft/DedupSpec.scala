package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Planted near-duplicates: corpora where ground truth is known by
  * construction, so recall/precision of each dedup family is checkable
  * without an oracle. */
class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 40 distinct docs + 5 near-dup pairs (one word changed) + 1 exact dup. */
  private lazy val corpus = {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("spark", "query", "row", "table", "join", "filter",
      "agg", "window", "scan", "merge", "sort", "hash", "key", "column",
      "stream", "batch", "fast", "slow", "data", "plan")
    def doc(): String = Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (0 until 40).map(i => (i.toLong, doc()))
    val nearDups = (0 until 5).map { i =>
      val (id, text) = base(i)
      val words = text.split(" "); words(15) = "MUTATED"
      (100L + i, words.mkString(" "))
    }
    val exactDup = Seq((200L, base(10)._2))
    (base ++ nearDups ++ exactDup).toDF("doc_id", "text")
  }

  test("minhash finds the planted near-dup pairs with high jaccard") {
    val pairs = Dedup.minhashPairs(corpus, "doc_id", "text",
      numHashes = 32, bands = 16, threshold = 0.5)
    val found = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact dup (10, 200) must be found with jaccard 1.0
    assert(found.contains((10L, 200L)))
    // ≥4 of the 5 planted near-dup pairs (minhash banding is probabilistic)
    val planted = (0 until 5).map(i => (i.toLong, 100L + i)).count(found.contains)
    assert(planted >= 4, s"found only $planted/5 planted pairs: $found")
    val j = pairs.filter(col("doc_a") === 10 && col("doc_b") === 200)
      .head.getDouble(2)
    assert(j == 1.0)
  }

  test("winnowing: docs sharing a run of >= k+window-1 tokens share a fingerprint") {
    // planted pairs differ by ONE word at position 15 of 30 → both the
    // 15-token prefix and 14-token suffix runs are shared, far above
    // the k+window-1 = 6 guarantee threshold
    val fps = Dedup.winnowFingerprints(corpus, "doc_id", "text", k = 3, window = 4)
      .collect().groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.map(_.getString(1)).toSet }
    (0 until 5).foreach { i =>
      val shared = fps(i.toLong) & fps(100L + i)
      assert(shared.nonEmpty, s"planted pair ($i, ${100 + i}) shares no fingerprint")
    }
    // exact dup → identical fingerprint sets
    assert(fps(10L) == fps(200L))
    // density: winnowing keeps ~2/(window+1) of the 28 k-grams per doc,
    // never more than (#kgrams - window + 1) and never zero
    fps.values.foreach(s => assert(s.nonEmpty && s.size <= 25))
  }

  test("minhash signature: identical docs have identical signatures") {
    val sig = Dedup.withMinhashSignature(
      Dedup.shingleDocs(corpus, "doc_id", "text"), 32)
    val a = sig.filter(col("doc_id") === 10).drop("doc_id").head
    val b = sig.filter(col("doc_id") === 200).drop("doc_id").head
    assert(a == b)
  }

  test("minhash band keys: native row-local expression == legacy explode+agg spelling") {
    // r15: bandedKeys now computes signature mins + band keys in ONE
    // per-row expression. Pin it value-for-value (both hash variants)
    // against the legacy spelling it replaced: explode shingles →
    // seeded hash per slot → groupBy(doc_id) min-agg → band hash of
    // the joined mins.
    val sh = Dedup.shingleDocs(corpus, "doc_id", "text")
    for ((nh, bands, portable) <- Seq((16, 8, true), (32, 16, false))) {
      val rpb = nh / bands
      val sig = Dedup.withMinhashSignature(sh, nh, portable)
      val bandCols = (0 until bands).map { b =>
        val cols = (0 until rpb).map(r => col(s"mh_${b * rpb + r}"))
        if (portable) md5(concat_ws("|", lit(b) +: cols: _*).cast("binary")).as(s"band_$b")
        else hash(lit(b) +: cols: _*).as(s"band_$b")
      }
      val legacy = sig.select(col("doc_id") +: bandCols: _*)
        .select(col("doc_id"),
          posexplode(array((0 until bands).map(b => col(s"band_$b")): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.get(2))).toSet
      val native = Dedup.bandedKeys(sh, nh, bands, portable)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.get(2))).toSet
      assert(native == legacy,
        s"nh=$nh bands=$bands portable=$portable: " +
          s"missing=${(legacy -- native).take(3)} extra=${(native -- legacy).take(3)}")
      assert(native.nonEmpty)
    }
  }

  test("simhash: banding is complete — EVERY pair within maxHamming is found") {
    val h = 3
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = h)
    val found = pairs.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    // ground truth by brute force over the signatures themselves: the
    // pigeonhole guarantee (h+1 chunks) is exact, so found == truth
    val sigs = corpus
      .select(col("doc_id"), Dedup.simhash64(split(trim(col("text")), "\\s+")).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val truth = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      ham = java.lang.Long.bitCount(sa ^ sb) if ham <= h
    } yield ((ia, ib), ham)).toMap
    assert(found == truth,
      s"missing=${truth.keySet -- found.keySet} extra=${found.keySet -- truth.keySet}")
    assert(found.get((10L, 200L)).contains(0), "exact dup must be at hamming 0")
  }

  test("simhash: maxHamming = 0 (single 64-bit chunk) finds exact-signature dups") {
    // regression: the chunk mask was (1L << 64) - 1 == 0 here, which
    // collapsed every doc into one bucket instead of keying on the
    // full signature
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 0)
    val found = pairs.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(found.get((10L, 200L)).contains(0), s"exact dup missing: $found")
    assert(found.values.forall(_ == 0))
  }

  test("simhash: hot-bucket cap drops candidates but never errors") {
    // bucketCap = 1 drops every bucket with >1 member — output must be
    // a subset of the uncapped result (possibly empty), not a failure
    val capped = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3, bucketCap = 1)
    val uncapped = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3)
    val cs = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val us = uncapped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cs.subsetOf(us))
  }

  test("embedding near-dup: planted duplicate vector found at cosine ~1") {
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 50).map(i => (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    val withDup = vecs :+ (999L, vecs(7)._2.map(x => x * 1.001f))
    val df = withDup.toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(df, "vec_id", "embedding", minCosine = 0.95)
    val found = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((7L, 999L)), s"planted pair missing: $found")
  }

  test("exact dedup groups identical texts") {
    val grouped = corpus.groupBy(md5(col("text").cast("binary")).as("fp"))
      .agg(count(lit(1)).as("n"), min("doc_id").as("keeper"))
    // md5 grouping = text-equality grouping
    assert(grouped.count() == corpus.select("text").distinct().count())
    // the planted exact dup (200 copies doc 10) merges under keeper 10
    val dup10 = corpus.filter(col("doc_id").isin(10L, 200L))
      .select(md5(col("text").cast("binary")).as("fp")).distinct()
    assert(dup10.count() == 1)
    val g = grouped.join(dup10, "fp").head
    assert(g.getAs[Long]("n") >= 2 && g.getAs[Long]("keeper") == 10L)
  }

  test("connected components merge transitive chains and pick min-id survivors") {
    // chain 1-2-3-4 (no direct 1-3/1-4/2-4 edges), pair 10-11, singleton edge 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(cc.keySet == Set(1L, 2L, 3L, 4L, 10L, 11L, 20L, 21L))
    Seq(1L, 2L, 3L, 4L).foreach(n => assert(cc(n)._1 == 1L, s"node $n"))
    Seq(10L, 11L).foreach(n => assert(cc(n)._1 == 10L))
    Seq(20L, 21L).foreach(n => assert(cc(n)._1 == 20L))
    assert(cc.collect { case (n, (c, s)) if s == 1 => n }.toSet == Set(1L, 10L, 20L))
  }

  test("leakage-free split: no near-dup pair straddles train/test") {
    // planted near-dup pairs + singletons through the declared
    // q_leakage_split composition shape: pairs -> CC -> cluster-coin
    // split. The structural guarantee under test: any two docs sharing
    // a cluster get the SAME side, whatever the coin says.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = (Seq(
      (1L, base + " one"), (2L, base + " two"),             // near-dups
      (7L, base + " seven"),                                // third member
      (20L, "completely different text about other things entirely unrelated")) ++
      (30 until 40).map(i => (i.toLong, s"unique$i words nobody else has $i")))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      numHashes = 16, bands = 8, threshold = 0.1, portableMd5 = true)
    val cc = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .select(col("node").as("doc_id"), col("cluster_id"))
    val coin = conv(substring(
      md5(col("cluster_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val split = docs.select(col("doc_id")).join(cc, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split", when(coin % 10 < 8, "train").otherwise("test"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[String]("split")))).toMap
    // the planted trio clusters together and shares one side
    assert(Seq(1L, 2L, 7L).map(split(_)._1).distinct.size == 1)
    assert(Seq(1L, 2L, 7L).map(split(_)._2).distinct.size == 1,
      s"near-dups straddle the split: ${Seq(1L, 2L, 7L).map(split)}")
    // no verified pair crosses sides, ever
    pairs.collect().foreach { p =>
      val (a, b) = (p.getAs[Long]("doc_a"), p.getAs[Long]("doc_b"))
      assert(split(a)._2 == split(b)._2, s"pair ($a,$b) straddles")
    }
    // every doc got exactly one side; singletons keep their own cluster
    assert(split.size == docs.count())
    assert(split(20L)._1 == 20L)
  }

  test("adaptiveNlist: constant expected cell size, bounded both ends") {
    // tiny corpora keep the floor (k-means sample must cover nlist)
    assert(Dedup.adaptiveNlist(0) == 16)
    assert(Dedup.adaptiveNlist(8192) == 16)
    // growth regime: nlist tracks n / TargetCellSize, so expected cell
    // size — and with it the within-cell pair volume per row — is flat
    assert(Dedup.adaptiveNlist(104000) == 104000 / Dedup.TargetCellSize)
    assert(Dedup.adaptiveNlist(1 << 20) == (1 << 20) / Dedup.TargetCellSize)
    // ceiling: the centroid matrix stays a bounded reference object
    assert(Dedup.adaptiveNlist(Long.MaxValue) == 4096)
  }

  test("skew: semantic pairCap — dense cell stars through its representative, cluster stays whole") {
    // one dense near-identical cluster 4x over pairCap: the head is
    // all-pairs, the tail gets exactly one verified star edge each, so
    // edge volume is C(pairCap,2) + (members - pairCap) instead of
    // C(members, 2) — and the transitive closure still yields ONE
    // cluster because every member is near the representative
    val rnd = new scala.util.Random(23)
    val base = {
      val v = Array.fill(16)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x).sum).toFloat
      v.map(_ / n)
    }
    val members = 32
    val dense = (0 until members).map(i =>
      (100L + i, base.map(x => (x + rnd.nextGaussian() * 1e-5).toFloat)))
    // spread background so k-means gives the dense cluster ITS OWN
    // cell instead of bisecting it (cross-cell pairs are never
    // compared — the documented approximation, not under test here)
    val spread = (0 until 20).map { i =>
      val v = Array.fill(16)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x).sum).toFloat
      (i.toLong, v.map(_ / n))
    }
    val df = (dense ++ spread).toDF("vec_id", "embedding")
    val pairCap = 8
    val pairs = Dedup.semanticPairs(df, "vec_id", "embedding",
      nlist = 4, minCosine = 0.99, cellCap = 4096, sampleSize = 64,
      pairCap = pairCap)
      .filter(col("id_a") >= 100L && col("id_b") >= 100L)
    val n = pairs.count()
    val maxEdges = pairCap.toLong * (pairCap - 1) / 2 + (members - pairCap)
    assert(n <= maxEdges, s"dense cell not star-capped: $n edges")
    assert(n >= members - 1, s"too few edges to connect the cluster: $n")
    val out = Dedup.semanticDedup(df, "vec_id", "embedding",
      nlist = 4, minCosine = 0.99, sampleSize = 64, pairCap = pairCap)
      .filter(col("id") >= 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.toSet.size == 1, s"cluster split: ${out.values.toSet}")
    assert(out.values.head == 100L)
  }

  test("semantic dedup under ADAPTIVE nlist still clusters planted near-dups") {
    // same planted-group shape as the fixed-nlist case below, run
    // through the production default (nlist = 0 -> adaptive): near-
    // identical vectors quantize to the same centroid at ANY k, so
    // recall on true near-dups must not depend on the cell count
    val rnd = new scala.util.Random(11)
    def vec(): Array[Float] = {
      val v = Array.fill(16)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x).sum).toFloat
      v.map(_ / n)
    }
    val base = (0L until 60L).map(i => (i, vec()))
    val dups = Seq(
      (100L, base(5)._2.map(x => x * 1.0005f)),
      (101L, base(5)._2.map(x => x * 0.9995f)))
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(df, "vec_id", "embedding",
        minCosine = 0.99, sampleSize = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out.size == 62)
    Seq(5L, 100L, 101L).foreach(n => assert(out(n)._1 == 5L, s"node $n: ${out(n)}"))
    assert(out(5L)._2 == 1 && out(100L)._2 == 0 && out(101L)._2 == 0)
  }

  test("semantic dedup clusters planted near-identical vectors, keeps the rest") {
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = {
      val v = Array.fill(16)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x).sum).toFloat
      v.map(_ / n)
    }
    val base = (0L until 60L).map(i => (i, vec()))
    // two planted semantic-dup groups: {3, 100, 101} (chain via tiny
    // perturbations) and {9, 200}
    val dups = Seq(
      (100L, base(3)._2.map(x => x * 1.0005f)),
      (101L, base(3)._2.map(x => x * 0.9995f)),
      (200L, base(9)._2.map(x => x * 1.001f)))
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedup(df, "vec_id", "embedding",
        nlist = 4, minCosine = 0.99, sampleSize = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    // every input vector gets a verdict row
    assert(out.size == 63)
    Seq(3L, 100L, 101L).foreach(n => assert(out(n)._1 == 3L, s"node $n: ${out(n)}"))
    Seq(9L, 200L).foreach(n => assert(out(n)._1 == 9L, s"node $n: ${out(n)}"))
    // survivors: cluster minima only; all other vectors are singleton keepers
    assert(out.count(_._2._2 == 0) == 3)
    assert(out(3L)._2 == 1 && out(100L)._2 == 0 && out(101L)._2 == 0 && out(200L)._2 == 0)
  }

  test("connected components: 60-node chain converges in log rounds (pointer jumping)") {
    val chain = (0L until 59L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // maxRounds = 6: plain hash-min would need ~59 rounds and throw;
    // pointer doubling needs ~log2(59) ≈ 6. driverEdgeCap = 0 forces
    // the DISTRIBUTED loop — this test exists to prove the loop's
    // convergence rate, which the small-graph fast path would bypass.
    val cc = Dedup.connectedComponents(chain, "doc_a", "doc_b", maxRounds = 6,
        driverEdgeCap = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 60)
    cc.foreach { case (n, c) => assert(c == 0L, s"node $n labeled $c") }
  }

  test("connected components match a union-find reference on random graphs") {
    val rnd = new scala.util.Random(1234)
    (1 to 5).foreach { trial =>
      val n = 30 + rnd.nextInt(40)
      val m = 10 + rnd.nextInt(50)
      val pairs = Seq.fill(m) {
        val a = rnd.nextInt(n).toLong; var b = rnd.nextInt(n).toLong
        if (a == b) b = (a + 1) % n
        (math.min(a, b), math.max(a, b))
      }.distinct
      // driver-side union-find ground truth
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      pairs.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val touched = pairs.flatMap(p => Seq(p._1, p._2)).toSet
      val expect = touched.map { v =>
        val root = find(v.toInt)
        // canonical label = min node of the component
        v -> touched.filter(u => find(u.toInt) == root).min
      }.toMap
      // both paths must match the reference: the small-graph driver
      // fast path (default cap) AND the distributed loop (cap = 0)
      val got = Dedup.connectedComponents(
          pairs.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"trial $trial fast path (n=$n m=${pairs.size})")
      val gotLoop = Dedup.connectedComponents(
          pairs.toDF("doc_a", "doc_b"), "doc_a", "doc_b", driverEdgeCap = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotLoop == expect, s"trial $trial loop (n=$n m=${pairs.size})")
    }
  }

  test("connected components over minhash pairs cluster the planted dups") {
    val pairs = Dedup.minhashPairs(corpus, "doc_id", "text",
      numHashes = 32, bands = 16, threshold = 0.5)
    val cc = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    val clusters = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the exact dup (10, 200) must share a cluster labeled by the min id
    assert(clusters(200L) == clusters(10L) && clusters(10L) == 10L)
    // every node labels to a cluster id ≤ itself
    clusters.foreach { case (n, c) => assert(c <= n) }
  }

  // =====================================================================
  // Skew stress — the caps ARE the 100 TB story. Each test plants one
  // hot key (a boilerplate page / dense cell) at 10× its cap and
  // asserts the quadratic term stays bounded while recall degrades
  // gracefully (cold pairs are still found; clustering recall for
  // identical docs survives the minhash star expansion).
  // =====================================================================

  /** `hot` copies of one boilerplate page (ids 1000+), one cold exact-dup
    * pair (ids 1, 2), 20 distinct fillers (ids 10–29). */
  private def hotCorpus(hot: Int) = {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("spark", "query", "row", "table", "join", "filter",
      "agg", "window", "scan", "merge", "sort", "hash", "key", "column",
      "stream", "batch", "fast", "slow", "data", "plan")
    def doc(): String = Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val boiler = doc()
    val coldPage = doc()
    val hotDocs = (0 until hot).map(i => (1000L + i, boiler))
    val cold = Seq((1L, coldPage), (2L, coldPage))
    val fillers = (10L until 30L).map(i => (i, doc()))
    (hotDocs ++ cold ++ fillers).toDF("doc_id", "text")
  }

  test("skew: minhash bandBucketCap — 10×-cap hot bucket emits star edges, cluster stays whole") {
    val (cap, hot) = (8, 80)
    val pairs = Dedup.minhashPairs(hotCorpus(hot), "doc_id", "text",
      numHashes = 16, bands = 8, threshold = 0.5, bandBucketCap = cap)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hotPairs = got.filter { case (a, b) => a >= 1000L && b >= 1000L }
    // star expansion: hot−1 edges to the min member, NOT C(80,2) = 3160
    assert(hotPairs.size == hot - 1, s"expected ${hot - 1} star edges, got ${hotPairs.size}")
    assert(hotPairs.forall(_._1 == 1000L), "every hot edge must anchor at the bucket min")
    // cold exact dup unaffected by the hot bucket's cap
    assert(got.contains((1L, 2L)), s"cold pair missing from $got")
    // clustering recall for the identical docs is PRESERVED: the star
    // keeps the whole mirror set one component with the min survivor
    val cc = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .filter(col("node") >= 1000L).select("cluster_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(cc == Seq(1000L), s"hot docs split across clusters: $cc")
    // and the uncapped run really is quadratic on the same input —
    // the cap is what bounds it
    val uncapped = Dedup.minhashPairs(hotCorpus(hot), "doc_id", "text",
      numHashes = 16, bands = 8, threshold = 0.5)
      .filter(col("doc_a") >= 1000L && col("doc_b") >= 1000L).count()
    assert(uncapped == hot.toLong * (hot - 1) / 2, s"uncapped hot pairs: $uncapped")
  }

  test("stop-shingle df filter: universal boilerplate stops pairing docs; true dups survive") {
    // every doc = the SAME 22-word boilerplate + a unique 12-word tail:
    // raw shingle jaccard between any two docs ≈ 20/(34+34-20) ≈ 0.4 —
    // far above threshold, so the unfiltered pipeline calls ALL pairs
    // near-dups on boilerplate alone. One planted exact-dup tail
    // (ids 3, 103) and two pure-boilerplate docs (ids 500, 501).
    val rnd = new scala.util.Random(11)
    val vocab = Vector("spark", "query", "row", "table", "join", "filter",
      "agg", "window", "scan", "merge", "sort", "hash", "key", "column")
    val boiler = (0 until 22).map(i => s"bp${i}word").mkString(" ")
    def tail(): String = Seq.fill(12)(vocab(rnd.nextInt(vocab.size)) + rnd.nextInt(1000)).mkString(" ")
    val tails = (0 until 30).map(_ => tail())
    val docs = (0 until 30).map(i => (i.toLong, s"$boiler ${tails(i)}")) ++
      Seq((103L, s"$boiler ${tails(3)}"), (500L, boiler), (501L, boiler))
    val df = docs.toDF("doc_id", "text")
    val unfiltered = Dedup.minhashPairs(df, "doc_id", "text",
      numHashes = 32, bands = 16, threshold = 0.1).count()
    assert(unfiltered > 100, s"fixture broken: expected boilerplate to pair everything, got $unfiltered")
    val stopped = Dedup.minhashPairs(df, "doc_id", "text",
      numHashes = 32, bands = 16, threshold = 0.1,
      stopShingleDfFrac = Some(0.5))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    // only the true dup pair remains: boilerplate-only pairs vanish,
    // pure-boilerplate docs (zero informative shingles) drop out
    assert(stopped.map(_._1).toSet == Set((3L, 103L)), s"got ${stopped.toSeq}")
    // and its jaccard is over INFORMATIVE shingles: identical tails → 1.0
    assert(stopped.head._2 == 1.0)
  }

  test("skew: simhash bucketCap — 10×-cap hot chunk-buckets dropped, cold pair kept, output bounded") {
    val pairs = Dedup.simhashPairs(hotCorpus(80), "doc_id", "text",
      maxHamming = 3, bucketCap = 8)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got.exists { case (a, b) => a >= 1000L && b >= 1000L },
      "hot-bucket members must drop out of candidate generation")
    assert(got.contains((1L, 2L)), s"cold exact dup (hamming 0) missing from $got")
    assert(got.size <= 50, s"output not bounded: ${got.size} pairs")
  }

  test("skew: portable-md5 simhash bucketCap — same drop semantics as the production family") {
    val pairs = Dedup.simhashPairsPortableMd5(hotCorpus(80), "doc_id", "text",
      maxHamming = 3, bucketCap = 8)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got.exists { case (a, b) => a >= 1000L && b >= 1000L })
    assert(got.contains((1L, 2L)), s"cold exact dup missing from $got")
  }

  test("skew: vector-LSH bucketCap — 10×-cap hot bucket dropped, cold dup kept") {
    val rnd = new scala.util.Random(42)
    val base = Seq.fill(16)(rnd.nextGaussian())
    val hotVecs = (0 until 80).map(i => (1000L + i, base))
    val spread = (0 until 30).map(i => (i.toLong, Seq.fill(16)(rnd.nextGaussian())))
    val coldDup = (500L, spread(3)._2.map(_ * 1.0005))
    val df = (hotVecs ++ spread :+ coldDup).toDF("vec_id", "embedding")
    val pairs = graft.functions.VectorLsh.candidatePairs(
      df, "vec_id", "embedding", dim = 16, L = 8, r = 2, w = 0.3,
      seed = 42L, bucketCap = 8)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got.exists { case (a, b) => a >= 1000L && b >= 1000L },
      "identical hot vectors must fall out of every table's candidate set")
    assert(got.contains((3L, 500L)), s"cold planted dup missing from $got")
    assert(got.size <= 200, s"output not bounded: ${got.size} pairs")
  }

  test("skew: semantic cellCap — 10×-cap hot cell capped at nlist·C(cellCap,2) pairs") {
    val rnd = new scala.util.Random(1)
    val base = Seq.fill(16)(rnd.nextGaussian())
    val hot = (0 until 80).map(i =>
      (1000L + i, base.map(x => (x + rnd.nextGaussian() * 1e-4).toFloat)))
    val spread = (0 until 20).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    val df = (hot ++ spread).toDF("vec_id", "embedding")
    val pairs = Dedup.semanticPairs(df, "vec_id", "embedding",
      nlist = 4, minCosine = 0.95, cellCap = 8, sampleSize = 128)
    val n = pairs.count()
    // the deterministic cap keeps ≤ 8 members per cell: the quadratic
    // term is ≤ C(8,2) per cell regardless of how dense the hot cell is
    assert(n >= 1 && n <= 4L * 28L, s"got $n pairs")
    val hotPairs = pairs.filter(col("id_a") >= 1000L && col("id_b") >= 1000L).count()
    assert(hotPairs <= 28, s"hot cell not capped: $hotPairs pairs")
  }

  // ---- span-level dedup ------------------------------------------------

  test("dedupSpans drops repeated spans globally, keeps first occurrence") {
    val boiler = "nav home about contact legal"   // one exact 5-word span
    val df = Seq(
      (1L, boiler + " " + "u1 u2 u3 u4 u5"),
      (2L, boiler + " " + "v1 v2 v3 v4 v5"),      // boilerplate span repeated
      (3L, "w1 w2 w3 w4 w5 w6 w7"))               // 5 + 2-word tail spans
      .toDF("doc_id", "text")
    val out = Dedup.dedupSpans(df, "doc_id", "text", spanLen = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L) == ((2, 2, boiler + " u1 u2 u3 u4 u5")))
    assert(out(2L) == ((2, 1, "v1 v2 v3 v4 v5")), "doc 2 must lose the boilerplate span")
    assert(out(3L) == ((2, 2, "w1 w2 w3 w4 w5 w6 w7")), "short tail span is its own span")
  }

  // ---- exact repeated-substring removal (Lee et al. 2022) --------------

  test("dedupExactSubstrings cuts a repeated span at ANY offset; first kept") {
    val span = "s1 s2 s3 s4 s5"
    val df = Seq(
      (1L, "p1 p2 " + span),              // span at token offset 2
      (2L, "x1 x2 x3 " + span + " y1"))   // same span at offset 3
      .toDF("doc_id", "text")
    val out = Dedup.dedupExactSubstrings(df, "doc_id", "text", gramLen = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L) == ((7, 0, "p1 p2 " + span)), "first occurrence keeps the span")
    assert(out(2L) == ((9, 5, "x1 x2 x3 y1")),
      "misaligned repeat must be cut — the case q_span_dedup's disjoint chunks miss")
  }

  test("dedupExactSubstrings: shared runs shorter than gramLen survive") {
    val short = "c1 c2 c3 c4"                      // 4 < gramLen tokens
    val df = Seq((1L, short + " a1 a2"), (2L, short + " b1 b2")).toDF("doc_id", "text")
    val out = Dedup.dedupExactSubstrings(df, "doc_id", "text", gramLen = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out(1L) == 0 && out(2L) == 0, "no >= gramLen repeat, nothing cut")
  }

  test("dedupExactSubstrings: within-document repetition is cut too") {
    val span = "r1 r2 r3 r4 r5"
    val df = Seq((1L, span + " mid " + span)).toDF("doc_id", "text")
    val out = Dedup.dedupExactSubstrings(df, "doc_id", "text", gramLen = 5)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3))).head
    assert(out == ((11, 5, span + " mid")), "second in-doc occurrence cut")
  }

  test("dedupExactSubstrings: coverage union spans a repeat longer than gramLen") {
    val long = (1 to 8).map(i => s"a$i").mkString(" ")
    val df = Seq((1L, long), (2L, "z1 " + long + " z2")).toDF("doc_id", "text")
    val out = Dedup.dedupExactSubstrings(df, "doc_id", "text", gramLen = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L) == ((8, 0, long)))
    assert(out(2L) == ((10, 8, "z1 z2")),
      "all four overlapping duplicated windows union to the full 8-token repeat")
  }

  test("dedupExactSubstrings: later exact-dup doc reassembles to empty") {
    val text = (1 to 9).map(i => s"t$i").mkString(" ")
    val df = Seq((10L, text), (20L, text)).toDF("doc_id", "text")
    val out = Dedup.dedupExactSubstrings(df, "doc_id", "text", gramLen = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(10L) == ((9, 0, text)))
    assert(out(20L) == ((9, 9, "")))
  }

  test("incremental substring scrub: existing windows always win; batch repeats keep batch-first") {
    val span = "s1 s2 s3 s4 s5"
    val existing = Seq((100L, "e1 e2 " + span)).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, "a1 " + span + " a2"),            // covered by existing → cut
      (2L, "r1 r2 r3 r4 r5 q1"),             // batch-first of an in-batch repeat → kept
      (3L, "z9 r1 r2 r3 r4 r5"),             // later in-batch repeat → cut
      (4L, "c1 c2 c3 c4 d1 d2"))             // sub-L overlaps only → untouched
      .toDF("doc_id", "text")
    val out = Dedup.dedupExactSubstringsIncremental(
        existing, incoming, "doc_id", "text", gramLen = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L), "existing docs must not be emitted")
    assert(out(1L) == ((7, 5, "a1 a2")), "existing wins even though incoming id is smaller")
    assert(out(2L) == ((6, 0, "r1 r2 r3 r4 r5 q1")))
    assert(out(3L) == ((6, 5, "z9")))
    assert(out(4L) == ((6, 0, "c1 c2 c3 c4 d1 d2")))
  }

  test("incremental substring scrub matches batch restricted to incoming when existing ids precede") {
    // with every existing id < every incoming id, batch first-occurrence
    // == existing-wins, so the two variants must agree on incoming docs
    val rnd = new scala.util.Random(99)
    val vocab = Vector("x", "y", "z", "w")
    val all = (0 until 16).map { i =>
      (i.toLong, Seq.fill(6 + rnd.nextInt(14))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val (ex, inc) = (all.filter(_._1 < 10), all.filter(_._1 >= 10))
    val batch = Dedup.dedupExactSubstrings(all.toDF("doc_id", "text"),
        "doc_id", "text", gramLen = 4)
      .filter(col("doc_id") >= 10)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    val incr = Dedup.dedupExactSubstringsIncremental(
        ex.toDF("doc_id", "text"), inc.toDF("doc_id", "text"),
        "doc_id", "text", gramLen = 4)
      .collect().map(r => r.getLong(0) -> r.toSeq).toMap
    assert(incr == batch, s"incremental diverges from batch: $incr vs $batch")
  }

  test("dedupExactSubstrings == brute-force reference on 10 seeded random corpora") {
    // differential property check: tiny vocab forces heavy L-gram
    // collisions, ragged doc lengths cover the n<L / n==L boundaries
    def reference(docs: Seq[(Long, String)], L: Int): Map[Long, (Int, Int, String)] = {
      val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
      val occ = for {
        (id, w) <- toks; if w.length >= L
        p <- 0 to w.length - L
      } yield (w.slice(p, p + L).mkString(" "), id, p)
      val masked: Set[(Long, Int)] = occ.groupBy(_._1).values
        .filter(_.size > 1)
        .flatMap(_.sortBy(o => (o._2, o._3)).tail.map(o => (o._2, o._3)))
        .toSet
      toks.map { case (id, w) =>
        val cut = w.indices.map(t =>
          (math.max(0, t - L + 1) to t).exists(s => masked((id, s))))
        val kept = w.indices.filterNot(cut).map(w)
        id -> ((w.length, cut.count(identity), kept.mkString(" ")))
      }.toMap
    }
    val L = 3
    val vocab = Vector("a", "b", "c", "d", "e")
    val rnd = new scala.util.Random(20260813L)
    (1 to 10).foreach { trial =>
      val docs = (0 until 12).map { i =>
        val n = rnd.nextInt(25) // 0..24 tokens; 0 → empty-text edge
        (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val expect = reference(docs, L)
      val got = Dedup.dedupExactSubstrings(
          docs.toDF("doc_id", "text"), "doc_id", "text", gramLen = L)
        .collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
        .toMap
      assert(got == expect, s"trial $trial diverged: ${
        got.keySet.union(expect.keySet).toSeq.sorted
          .filter(k => got.get(k) != expect.get(k))
          .map(k => s"doc $k got=${got.get(k)} expect=${expect.get(k)}")
          .mkString("; ")}")
    }
  }

  test("skew: dedupExactSubstrings — boilerplate on 2000 docs stays bounded") {
    val boiler = "cookie banner accept all terms"
    val docs = (0 until 2000).map(i =>
      (i.toLong, boiler + s" u$i v$i w$i x$i y$i")).toDF("doc_id", "text")
    val out = Dedup.dedupExactSubstrings(docs, "doc_id", "text", gramLen = 5)
    val cut = out.agg(sum("n_cut")).collect()(0).getLong(0)
    assert(out.count() == 2000)
    assert(cut == (2000 - 1) * 5L, "every non-first boilerplate occurrence cut, tails kept")
  }

  test("dedupSpans: exact-dup doc loses every span; first doc keeps all") {
    val text = (1 to 12).map(i => s"t$i").mkString(" ")
    val df = Seq((10L, text), (20L, text)).toDF("doc_id", "text")
    val out = Dedup.dedupSpans(df, "doc_id", "text", spanLen = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(10L) == ((3, 3, text)))
    assert(out(20L) == ((3, 0, "")), "later exact dup must reassemble to empty")
  }

  test("skew: dedupSpans — one span repeated across 2000 docs stays bounded and exact") {
    val boiler = "cookie banner accept all terms"
    val docs = (0 until 2000).map(i =>
      (i.toLong, boiler + s" unique$i a$i b$i c$i d$i")).toDF("doc_id", "text")
    val out = Dedup.dedupSpans(docs, "doc_id", "text", spanLen = 5)
    assert(out.count() == 2000)
    // only doc 0 keeps the boilerplate span; everyone keeps their tail
    val kept = out.select("doc_id", "n_kept").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(kept(0L) == 2 && kept(1L) == 1 && kept(1999L) == 1)
    val d5 = out.filter(col("doc_id") === 5L).head.getString(3)
    assert(d5 == "unique5 a5 b5 c5 d5")
  }

  // ---- exact embedding pairs (proof twin) ------------------------------

  test("embeddingPairsExact finds exactly the >=threshold pairs") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.05f)),  // cos ≈ 0.99875
      (3L, Seq(0.0f, 1.0f)),                            // ⊥ to 1, 2
      (4L, Seq(-1.0f, 0.0f)))                           // cos(1,4) = −1
      .toDF("vec_id", "embedding")
    val got = Dedup.embeddingPairsExact(df, "vec_id", "embedding", minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("LSH embeddingPairs is a subset of exact pairs at the same threshold") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = Dedup.embeddingPairsExact(emb, "vec_id", "embedding", minCosine = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingPairs(emb, "vec_id", "embedding", minCosine = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"LSH emitted non-pairs: ${lsh.diff(exact).take(5)}")
    assert(lsh.nonEmpty, "LSH found nothing at the corpus' natural threshold")
  }

  test("semanticDedupGrid clusters planted near-identical vectors like the k-means path") {
    val rnd = new scala.util.Random(7)
    def unitish(): Seq[Float] = Seq.fill(16)(rnd.nextGaussian().toFloat)
    val base = unitish()
    val dups = (0 until 3).map(i =>
      (100L + i, base.map(x => x + (rnd.nextGaussian() * 1e-4).toFloat)))
    val rest = (0 until 30).map(i => (i.toLong, unitish()))
    val df = (dups ++ rest).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedupGrid(df, "vec_id", "embedding",
        gridDims = 2, gridSize = 0.25, minCosine = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val dupRows = out.filter(r => r._1 >= 100L)
    // near-identical vectors share a grid cell (1e-4 jitter cannot
    // cross a 0.25-wide bin except at a boundary — seed chosen clear)
    assert(dupRows.map(_._2).distinct.length == 1, s"planted dups split: ${dupRows.toSeq}")
    assert(dupRows.count(_._3 == 1) == 1, "exactly one survivor per cluster")
    assert(out.length == 33 && out.count(_._3 == 1) == 31)
  }

  // ---- incremental dedup ----------------------------------------------

  test("minhashEval: planted dup found, counts consistent, zero false positives") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = (Seq((1L, base), (2L, base)) ++                  // exact dup pair
      (3 to 30).map(i => (i.toLong, s"unique document number $i " +
        (1 to 12).map(j => s"tok${i}_$j").mkString(" "))))
      .toDF("doc_id", "text")
    val r = Dedup.minhashEval(docs, "doc_id", "text",
      numHashes = 16, bands = 8, threshold = 0.5).head
    val (ne, nf, nm, nx) = (r.getAs[Int]("n_exact"), r.getAs[Int]("n_found"),
      r.getAs[Int]("n_missed"), r.getAs[Int]("n_false"))
    assert(ne >= 1, "the planted exact dup must be an exact pair")
    assert(nf >= 1, "an exact dup collides in every band — it cannot be missed")
    assert(ne == nf + nm, "confusion counts must partition the exact set")
    assert(nx == 0, "verified candidates can never be false positives")
    assert(r.getAs[Double]("recall") >= nf.toDouble / ne - 1e-9)
  }

  test("dedupIncremental drops exact and near hits vs existing, keeps fresh docs") {
    val existing = corpus  // 40 distinct + planted dups, ids < 201
    val exactText = corpus.filter(col("doc_id") === 10L).head.getString(1)
    val nearWords = corpus.filter(col("doc_id") === 20L).head.getString(1).split(" ")
    nearWords(5) = "CHANGED"
    val incoming = Seq(
      (1000L, exactText),                      // exact dup of existing 10
      (1001L, nearWords.mkString(" ")),        // near dup of existing 20
      (1002L, (1 to 30).map(i => s"fresh$i").mkString(" ")), // novel
      (1003L, (1 to 30).map(i => s"fresh$i").mkString(" "))) // intra-batch dup: kept
      .toDF("doc_id", "text")
    val kept = Dedup.dedupIncremental(existing, incoming, "doc_id", "text",
        numHashes = 32, bands = 16, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1002L, 1003L), s"got $kept")
  }

  test("skew: dedupIncremental exBucketCap — hot stored-index bucket collapses to its representative, drops still verified") {
    val (cap, hot) = (8, 80)
    // existing side: an 80-member boilerplate cluster at 10× the cap,
    // plus distinct fillers; incoming: one cluster member (must drop via
    // the min-id representative), one fresh doc (must survive)
    val existing = hotCorpus(hot)
    val boiler = existing.filter(col("doc_id") === 1000L).head.getString(1)
    val incoming = Seq(
      (5000L, boiler + " tail5000"),  // near dup of the hot cluster
      (5001L, (1 to 30).map(i => s"novel$i").mkString(" ")))
      .toDF("doc_id", "text")
    val kept = Dedup.dedupIncremental(existing, incoming, "doc_id", "text",
        numHashes = 16, bands = 8, threshold = 0.5, exBucketCap = cap)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(5001L), s"got $kept")
    // and the cap really bounds the candidate side: capped run must
    // behave identically to uncapped on the DROP verdicts here
    val uncapped = Dedup.dedupIncremental(existing, incoming, "doc_id", "text",
        numHashes = 16, bands = 8, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(uncapped == kept, s"cap changed verdicts: $uncapped vs $kept")
  }

  test("crossmodalDedup: exact outranks semantic, paraphrases fall to the " +
       "embedding signal, docs without embeddings keep the text verdict") {
    // doc 1 is the original; doc 2 repeats its text verbatim (exact);
    // doc 3 is a PARAPHRASE — different text, near-identical embedding
    // (semantic); doc 4 is unrelated; doc 5 has no embedding row at all
    val docs = Seq(
      (1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "a fast auburn fox"), (4L, "completely different content"),
      (5L, "orphan without embedding"))
      .toDF("doc_id", "text")
    val base = Array(1.0, 0.2, 0.1, 0.05)
    val emb = Seq(
      (1L, base), (2L, Array(0.0, 1.0, 0.0, 0.0)),
      (3L, base.map(_ * 1.001)), (4L, Array(0.0, 0.0, -1.0, 0.3)))
      .toDF("vec_id", "embedding")
    val got = Dedup.crossmodalDedup(docs, emb, "doc_id", "text",
        "vec_id", "embedding", gridDims = 2, gridSize = 10.0,
        minCosine = 0.9, cellCap = 64)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(got(1L) == (1, "none"), s"original must survive: ${got(1L)}")
    // doc 2's EMBEDDING is unrelated (no semantic dup) but its text is
    // a verbatim copy — the exact signal must win
    assert(got(2L) == (0, "exact"))
    // doc 3 shares no digest but collapses in embedding space
    assert(got(3L) == (0, "semantic"))
    assert(got(4L) == (1, "none"))
    assert(got(5L) == (1, "none"), "no embedding -> text verdict only")
  }
}
