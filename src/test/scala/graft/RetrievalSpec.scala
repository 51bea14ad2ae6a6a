package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Retrieval

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rank(docs: Seq[(Long, String)], queries: Seq[(Long, String)],
                   k: Int = 10) =
    Retrieval.bm25TopK(docs.toDF("doc_id", "text"), "doc_id", "text",
      queries.toDF("query_id", "term"), k)
      .orderBy("query_id", "rank").collect()

  test("term frequency raises rank; absent term yields no candidate row") {
    val docs = Seq(
      (1L, "spark spark spark join"),
      (2L, "spark join filter scan"),
      (3L, "window agg sort merge"))
    val r = rank(docs, Seq((10L, "spark")))
    assert(r.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    assert(r.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2))
    assert(r(0).getAs[Double]("score") > r(1).getAs[Double]("score"))
  }

  test("idf: a rare term outweighs a ubiquitous one at equal tf") {
    val docs = Seq(
      (1L, "common rare pad1 pad2"),
      (2L, "common pad3 pad4 pad5"),
      (3L, "common pad6 pad7 pad8"),
      (4L, "common pad9 padA padB"))
    // query has both terms; doc1 matches both, others only 'common'
    val r = rank(docs, Seq((10L, "common"), (10L, "rare")))
    assert(r.head.getAs[Long]("doc_id") == 1L)
    // the rare-term contribution dominates: doc1's margin over doc2
    // exceeds doc2's whole score
    val s = r.map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("score")).toMap
    assert(s(1L) > 2 * s(2L))
  }

  test("length normalization: same tf, shorter doc wins") {
    val docs = Seq(
      (1L, "term a b c d e f g h i j k l m n o p q r s"),
      (2L, "term a b c"),
      (3L, "zz yy xx ww"))
    val r = rank(docs, Seq((10L, "term")))
    assert(r.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L, 1L))
  }

  test("multi-term scores add; k caps the list; ties break by doc_id") {
    val docs = (1L to 15L).map(i => (i, "same text here"))
    val r = rank(docs, Seq((10L, "same")), k = 10)
    assert(r.length == 10)
    // identical docs -> identical scores -> doc_id order
    assert(r.map(_.getAs[Long]("doc_id")).toSeq == (1L to 10L))
    assert(r.map(_.getAs[Double]("score")).distinct.length == 1)
  }

  test("postings: df/total exact, list ranked by tf desc then doc_id, " +
    "cap bounds the hot term") {
    val docs = Seq(
      (1L, "hot hot hot rare"),
      (2L, "hot cold"),
      (3L, "hot hot cold")).toDF("doc_id", "text")
    val p = Retrieval.postings(docs, "doc_id", "text", cap = 2)
      .collect().map(r => r.getAs[String]("term") ->
        ((r.getAs[Long]("df"), r.getAs[Long]("n_total"),
          r.getSeq[Long](r.fieldIndex("postings"))))).toMap
    assert(p("hot") == ((3L, 6L, Seq(1L, 3L)))) // tf 3,2 beat tf 1; cap=2
    assert(p("cold") == ((2L, 2L, Seq(2L, 3L)))) // tf tie -> doc_id order
    assert(p("rare") == ((1L, 1L, Seq(1L))))
  }

  test("hybridTopK: a doc in BOTH top lists out-fuses single-list docs; " +
    "rrf is the exact integer sum of the reciprocal ranks") {
    // doc 0 is the query (id%97==0). Text side: docs 0,1,2 share the
    // query terms; doc 3 shares none. Dense side: vectors put 0 and 3
    // closest to the query, 1 next, 2 orthogonal-ish.
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta other words"),
      (2L, "alpha filler pad pad2"),
      (3L, "nothing shared at all")).toDF("doc_id", "text")
    val embs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.44f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 0.01f))).toDF("vec_id", "embedding")
    val r = Retrieval.hybridTopK(docs, embs)
      .orderBy("rank").collect()
    // self-retrieval: doc 0 is rank 1 on BOTH sides -> rrf = 2 * (1e6 div 61)
    assert(r.head.getAs[Long]("doc_id") == 0L)
    assert(r.head.getAs[Long]("rrf") == 2L * (1000000L / 61L))
    // every fused doc's rrf is positive and ranks are 1..n contiguous
    assert(r.map(_.getAs[Int]("rank")).toSeq == (1 to r.length))
    // doc 3 appears via the dense list alone (no shared term)
    val d3 = r.find(_.getAs[Long]("doc_id") == 3L)
    assert(d3.isDefined && d3.get.getAs[Long]("rrf") > 0)
  }

  test("queryTerms: distinct first-4-token workload on the modulus") {
    val docs = Seq(
      (0L, "a b a c d e"), (1L, "x y z"), (97L, "k k k k j"))
      .toDF("doc_id", "text")
    val qt = Retrieval.queryTerms(docs, "doc_id", "text")
      .orderBy("query_id", "term").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[String]("term")))
    assert(qt.toSeq == Seq((0L, "a"), (0L, "b"), (0L, "c"), (97L, "k")))
  }

  test("self-retrieval on the planted workload: the query doc ranks first") {
    // unique terms per doc -> the query doc must top its own ranking
    val docs = (0L to 9L).map(i => (i * 97, s"u${i}a u${i}b u${i}c u${i}d"))
    val r = rank(docs, docs.flatMap { case (id, t) =>
      t.split(" ").take(4).distinct.map(id -> _) })
    val firsts = r.filter(_.getAs[Int]("rank") == 1)
      .map(x => x.getAs[Long]("query_id") -> x.getAs[Long]("doc_id"))
    assert(firsts.forall { case (q, d) => q == d })
  }

  test("bm25 serve: row-local index scan is bit-identical to the batch plan " +
       "on the real corpus, and dedupes repeated query terms") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
    val batch = Retrieval.bm25TopK(docs, "doc_id", "text",
        Retrieval.queryTerms(docs, "doc_id", "text"))
      .orderBy("query_id", "rank").collect()
    val ix = Retrieval.fitBm25Index(docs, "doc_id", "text")
    val serve = Retrieval.bm25ServeRows(
        Retrieval.queryTermArrays(docs, "doc_id", "text"), ix)
      .orderBy("query_id", "rank").collect()
    assert(serve.length == batch.length && serve.length > 0)
    serve.zip(batch).foreach { case (s, b) =>
      assert(s.getAs[Long]("query_id") == b.getAs[Long]("query_id"))
      assert(s.getAs[Int]("rank") == b.getAs[Int]("rank"))
      assert(s.getAs[Long]("doc_id") == b.getAs[Long]("doc_id"))
      assert(s.getAs[Double]("score") == b.getAs[Double]("score"))
    }
    // a repeated term must contribute once (the batch (query, term) key)
    val once = Retrieval.bm25ServeRows(
      Seq((1L, Seq("alpha"))).toDF("query_id", "terms"), ix).collect()
    val twice = Retrieval.bm25ServeRows(
      Seq((1L, Seq("alpha", "alpha"))).toDF("query_id", "terms"), ix).collect()
    assert(once.map(_.toSeq).toSeq == twice.map(_.toSeq).toSeq)
  }

  test("hybrid serve: row-local fusion is bit-identical to the batch " +
       "hybrid plan on the real corpus") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    import org.apache.spark.sql.functions.col
    val u = docs.join(emb.select(col("vec_id").as("doc_id"),
      col("embedding")), Seq("doc_id"))
    val batch = Retrieval.hybridTopK(docs, emb)
      .orderBy("query_id", "rank").collect()
    val serve = Retrieval.hybridServeRows(
        Retrieval.queryTermArrays(u, "doc_id", "text")
          .join(emb.select(col("vec_id").as("query_id"), col("embedding")),
            Seq("query_id")),
        Retrieval.fitBm25Index(u, "doc_id", "text"),
        operators.AnnServe.fitShard(u, "doc_id", "embedding"))
      .orderBy("query_id", "rank").collect()
    assert(serve.length == batch.length && serve.length > 0)
    serve.zip(batch).foreach { case (s, b) =>
      assert(s.getAs[Long]("query_id") == b.getAs[Long]("query_id") &&
        s.getAs[Int]("rank") == b.getAs[Int]("rank") &&
        s.getAs[Long]("doc_id") == b.getAs[Long]("doc_id") &&
        s.getAs[Long]("rrf") == b.getAs[Long]("rrf"),
        s"serve $s != batch $b")
    }
  }

  test("bm25 serve: unknown terms yield no rows; a ragged index fails at fit") {
    val docs = Seq((1L, "a b"), (2L, "b c")).toDF("doc_id", "text")
    val ix = Retrieval.fitBm25Index(docs, "doc_id", "text")
    val r = Retrieval.bm25ServeRows(
      Seq((9L, Seq("zzz")), (10L, Seq.empty[String]))
        .toDF("query_id", "terms"), ix).collect()
    assert(r.isEmpty)
    intercept[IllegalArgumentException] {
      graft.functions.Bm25Index(Array("a"), Array(1L), Array(0, 2),
        Array(1L), Array(1), Array(2), 2L, 2.0)
    }
    // df inconsistent with the CSR offsets: structurally valid arrays,
    // but every idf would silently skew — must fail at load (ADVICE r13)
    intercept[IllegalArgumentException] {
      graft.functions.Bm25Index(Array("a", "b"), Array(2L, 1L),
        Array(0, 1, 2), Array(1L, 2L), Array(1, 1), Array(2, 2), 2L, 2.0)
    }
  }

  test("one algebra: fitBm25Index is the termFreqs frame the postings " +
       "operator rolls up — df, mass, doc sets and doclens all agree") {
    val docs = Seq(
      (1L, "hot hot hot rare"),
      (2L, "hot cold"),
      (3L, "hot hot cold"),
      (4L, "")).toDF("doc_id", "text") // zero-token doc: in N, not in postings
    val ix = Retrieval.fitBm25Index(docs, "doc_id", "text")
    val p = Retrieval.postings(docs, "doc_id", "text", cap = 1000)
      .collect().map(r => r.getAs[String]("term") ->
        ((r.getAs[Long]("df"), r.getAs[Long]("n_total"),
          r.getSeq[Long](r.fieldIndex("postings"))))).toMap
    assert(ix.terms.toSeq == p.keys.toSeq.sorted)
    ix.terms.zipWithIndex.foreach { case (t, i) =>
      val (df, nTotal, docIds) = p(t)
      val range = ix.postOff(i) until ix.postOff(i + 1)
      assert(ix.df(i) == df, s"df($t)")
      assert(range.map(ix.postTf).sum == nTotal, s"mass($t)")
      assert(range.map(ix.postDoc).toSet == docIds.toSet, s"docs($t)")
    }
    // doclen in the CSR is the doc's whitespace token count
    val dls = Map(1L -> 4, 2L -> 2, 3L -> 3)
    ix.postDoc.indices.foreach(j =>
      assert(ix.postDl(j) == dls(ix.postDoc(j))))
    // corpus stats count the zero-token doc
    assert(ix.n == 4L && math.abs(ix.avgdl - 9.0 / 4.0) < 1e-12)
  }

  test("hybridTopKGrid: a grid-isolated query fuses BM25-only, " +
       "integer rrf hand-checked") {
    // query doc 0 sits in grid cell (4, 0); both other docs normalize
    // into cells around (-4, 0) — outside the +-1 probe window — so
    // the dense ranker contributes NOTHING and the full-outer fusion
    // must carry the BM25 side alone.
    val docs = Seq((0L, "alpha beta"), (1L, "alpha beta"),
      (2L, "gamma delta")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(-1.0f, 0.01f)),
      (2L, Seq(-1.0f, -0.01f))).toDF("vec_id", "embedding")
    val r = Retrieval.hybridTopKGrid(docs, emb)
      .orderBy("rank").collect()
      .map(x => (x.getAs[Int]("rank"), x.getAs[Long]("doc_id"),
        x.getAs[Long]("rrf")))
    // BM25 ties docs 0 and 1 (identical text), doc_id breaks the tie:
    // rrf = 10^6 div (60 + rank) alone -> 16393, 16129
    assert(r.toSeq == Seq((1, 0L, 16393L), (2, 1L, 16129L)))
  }

  test("hybridTopKGrid: a shared-cell neighbor's dense vote is fused " +
       "and reorders the BM25 tie") {
    // doc 1 normalizes into cell (3, 1), inside query 0's probe window
    // from cell (4, 0); doc 2 stays isolated at (-4, 0). Dense rank 1
    // for doc 1 (cos .96) adds 10^6 div 61 on top of its BM25 vote,
    // overtaking doc 0's BM25-only rank-1 vote.
    val docs = Seq((0L, "alpha beta"), (1L, "alpha beta"),
      (2L, "gamma delta")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.96f, 0.28f)),
      (2L, Seq(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Retrieval.hybridTopKGrid(docs, emb)
      .orderBy("rank").collect()
      .map(x => (x.getAs[Int]("rank"), x.getAs[Long]("doc_id"),
        x.getAs[Long]("rrf")))
    // doc 1: bm rank 2 (16129) + dense rank 1 (16393) = 32522
    // doc 0: bm rank 1 alone (16393) — self is EXCLUDED from dense
    assert(r.toSeq == Seq((1, 1L, 32522L), (2, 0L, 16393L)))
  }
}
