package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Cluster, Layout, Sketches}

class ClusterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def emb(rows: (Long, Seq[Double])*) =
    rows.toDF("vec_id", "embedding")

  // ---- quantization -----------------------------------------------------

  test("quantize: +1.0 shift, 10^-3 units, ties away from zero, nonnegative") {
    val q = emb((1L, Seq(-0.5, 0.0, 0.4375, -1.0)))
      .select(Cluster.quantize(org.apache.spark.sql.functions.col("embedding")))
      .head.getSeq[Long](0)
    // (-0.5+1)*1000 = 500; (0+1)*1000 = 1000; (0.4375+1)*1000 = 1437.5 → 1438
    assert(q == Seq(500L, 1000L, 1438L, 0L))
    assert(q.forall(_ >= 0L))
  }

  // ---- fit + assignment -------------------------------------------------

  test("two separated groups recover as two clusters with tight distances") {
    val a = (0L to 4L).map(i => (i, Seq(-0.4 + i * 0.001, -0.4)))
    val b = (10L to 14L).map(i => (i, Seq(0.4 + (i - 10) * 0.001, 0.4)))
    val r = Cluster.kmeansClusters(emb(a ++ b: _*), "vec_id", "embedding",
        k = 2, iters = 3)
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2))).toSeq
    val byCluster = r.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCluster.size == 2)
    assert(byCluster.values.toSet ==
      Set((0L to 4L).toSet, (10L to 14L).toSet))
    // after convergence every member sits near its own group's centroid
    assert(r.forall(_._3 < 100000L))
  }

  test("assignment ties break to the smallest centroid index") {
    // point exactly between two centroids (integer distances equal)
    val cent = Array(Array(400L, 1000L), Array(1600L, 1000L))
    val r = Cluster.assignClusters(emb((7L, Seq(0.0, 0.0))), "vec_id",
        "embedding", cent)
      .head
    assert(r.getInt(1) == 0)
    assert(r.getLong(2) == 600L * 600L)
  }

  test("an emptied cluster keeps its previous centroid") {
    // two identical seed vectors: every point ties to centroid 0, so
    // cluster 1 receives no members and must keep its seed centroid
    val pts = emb((1L, Seq(0.1, 0.1)), (2L, Seq(0.1, 0.1)), (3L, Seq(0.1, 0.1)))
    val cent = Cluster.fitKmeans(pts, "vec_id", "embedding", k = 2, iters = 2)
    assert(cent(0).toSeq == Seq(1100L, 1100L))
    assert(cent(1).toSeq == Seq(1100L, 1100L))
  }

  test("fit is deterministic across runs") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val c1 = Cluster.fitKmeans(e, "vec_id", "embedding", k = 4, iters = 2)
    val c2 = Cluster.fitKmeans(e, "vec_id", "embedding", k = 4, iters = 2)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
  }

  test("clusterStats counts partition the corpus; clusterSample respects cap") {
    val assigned = Cluster.kmeansClusters(
      Tables.embeddings(spark, "/root/testdata/sf0.001"),
      "vec_id", "embedding", k = 8, iters = 2)
    val stats = Cluster.clusterStats(assigned).collect()
    assert(stats.map(_.getAs[Long]("n")).sum == 500L)
    val sample = Cluster.clusterSample(assigned, cap = 10).collect()
    val perCluster = sample.groupBy(_.getAs[Int]("cluster"))
    assert(perCluster.values.forall(_.length <= 10))
    // every sampled cluster's ranks are contiguous from 1
    perCluster.values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq ==
        (1 to rows.length).toSeq)
    }
  }

  test("clusterMix: integer ppm shares over a hand-built assignment") {
    val cent = Array(Array(600L, 600L), Array(1400L, 1400L))
    val vecs = emb((1L, Seq(-0.4, -0.4)), (2L, Seq(-0.4, -0.4)),
      (3L, Seq(0.4, 0.4)))
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "f g h i j"))
      .toDF("doc_id", "text")
    val assigned = Cluster.assignClusters(vecs, "vec_id", "embedding", cent)
    val r = Cluster.clusterMix(assigned, docs, "doc_id", "text")
      .orderBy("cluster").collect()
    // cluster 0: docs 1,2 → 5 tokens; cluster 1: doc 3 → 5 tokens
    assert(r.map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      .toSeq == Seq((0, 2L, 5L, 500000L), (1, 1L, 5L, 500000L)))
  }

  test("clusterBudget: full budget keeps all, zero keeps none, prefixes nest") {
    val sf = "/root/testdata/sf0.001"
    val assigned = Cluster.kmeansClusters(
      Tables.embeddings(spark, sf), "vec_id", "embedding", k = 4, iters = 2)
    val docs = Tables.documents(spark, sf)
    def kept(b: Long): Set[Long] =
      Cluster.clusterBudget(assigned, docs, "doc_id", "text", b)
        .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(Cluster.clusterBudget(assigned, docs, "doc_id", "text", 0L)
      .count() == 0L)
    val all = kept(100000000L)
    assert(all.size == 500)
    val small = kept(10000L); val mid = kept(20000L)
    assert(small.nonEmpty && small.size < mid.size && mid.size < all.size)
    // a larger budget only ever EXTENDS each cluster's prefix
    assert(small.subsetOf(mid) && mid.subsetOf(all))
  }

  test("clusterPurity: modal label with count-desc label-asc tie-break") {
    val cent = Array(Array(600L, 600L), Array(1400L, 1400L))
    val vecs = emb((1L, Seq(-0.4, -0.4)), (2L, Seq(-0.4, -0.4)),
      (3L, Seq(0.4, 0.4)))
    val labels = Seq((1L, 4), (2L, 3), (3L, 5)).toDF("vec_id", "label")
    val r = Cluster.clusterPurity(
        Cluster.assignClusters(vecs, "vec_id", "embedding", cent),
        labels, "vec_id", "label")
      .orderBy("cluster").collect()
      .map(x => (x.getInt(0), x.getLong(1), x.getInt(2), x.getLong(3),
        x.getLong(4))).toSeq
    // cluster 0 has labels {4, 3} — a count tie, smaller label wins
    assert(r == Seq((0, 2L, 3, 1L, 500000L), (1, 1L, 5, 1L, 1000000L)))
  }

  // ---- epoch shuffle ----------------------------------------------------

  test("epochInterleave: dominated corpus still round-robins its sources") {
    val docs = ((0L until 10L).map(i => (i, "bulk")) ++
      Seq((100L, "rare"), (101L, "rare"))).toDF("doc_id", "source")
    val r = Layout.epochInterleave(docs, "doc_id", "source",
        epochs = 1, nShards = 1)
      .orderBy("pos").collect().map(_.getAs[String]("source")).toSeq
    // both rare docs surface in the first four positions (rank-major
    // order), never buried behind the bulk run
    assert(r.take(4) == Seq("bulk", "rare", "bulk", "rare"))
    assert(r.drop(4).forall(_ == "bulk"))
  }

  test("epochShuffle: exact cover, contiguous per-shard positions, epochs differ") {
    val docs = (0L until 200L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val r = Layout.epochShuffle(docs, "doc_id", epochs = 2, nShards = 8)
      .collect()
    // every (epoch, doc) exactly once
    assert(r.length == 400)
    assert(r.map(x => (x.getInt(0), x.getLong(3))).toSet ==
      (for (e <- 0 to 1; d <- 0L until 200L) yield (e, d)).toSet)
    // positions contiguous 1..n within each (epoch, shard)
    r.groupBy(x => (x.getInt(0), x.getInt(1))).values.foreach { g =>
      assert(g.map(_.getAs[Int]("pos")).sorted.toSeq == (1 to g.length).toSeq)
    }
    // the two epochs order a shard's docs differently (independent keys)
    val order = (e: Int) => r.filter(x => x.getInt(0) == e && x.getInt(1) == 0)
      .sortBy(_.getAs[Int]("pos")).map(_.getLong(3)).toSeq
    assert(order(0) != order(1))
    // deterministic across runs
    val r2 = Layout.epochShuffle(docs, "doc_id", epochs = 2, nShards = 8)
      .collect()
    assert(r.map(_.toSeq).toSet == r2.map(_.toSeq).toSet)
  }

  // ---- count-min heavy hitters ------------------------------------------

  test("cmsHeavyHitters: estimates never undercount and rank the planted hitter") {
    val docs = Seq(
      (1L, "alpha alpha alpha alpha beta"),
      (2L, "alpha alpha beta gamma delta"),
      (3L, "alpha beta gamma epsilon zeta")).toDF("doc_id", "text")
    val r = Sketches.cmsHeavyHitters(docs, "text", topK = 10).collect()
    assert(r.forall(x => x.getAs[Long]("err") >= 0L))
    assert(r.forall(x => x.getAs[Long]("est") >= x.getAs[Long]("exact")))
    val top = r.maxBy(_.getAs[Long]("est"))
    assert(top.getAs[String]("term") == "alpha")
    assert(top.getAs[Long]("exact") == 7L)
  }

  test("cmsHeavyHitters: a narrow sketch still never undercounts") {
    // width 2 forces collisions: over-estimates appear, undercounts never
    val docs = Seq((1L, "a b c d e f g h i j k l m n o p"))
      .toDF("doc_id", "text")
    val r = Sketches.cmsHeavyHitters(docs, "text", depth = 2, width = 2,
      topK = 50).collect()
    assert(r.nonEmpty)
    assert(r.forall(x => x.getAs[Long]("err") >= 0L))
    assert(r.exists(x => x.getAs[Long]("err") > 0L))
  }
}
