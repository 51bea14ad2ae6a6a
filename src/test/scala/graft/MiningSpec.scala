package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Mining

/** Training-pair mining contracts: margin-criterion bitext mining
  * (planted translation pair wins; hubness normalization does what
  * raw cosine can't) and label-safe hard negatives (no same-label
  * leak, in-window semantics, contiguous re-rank). */
class MiningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def vecDf(rows: Seq[(Long, Seq[Float], Int)]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  test("bitextMine: a planted identical vector across collections is " +
       "mined as the best-margin pair for its src") {
    // src 0 has an EXACT copy in tgt (id 101); the rest are near-noise
    val src = vecDf(Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0),
      (2L, Seq(0f, 1f, 0f, 0f), 0),
      (4L, Seq(0f, 0f, 1f, 0f), 0),
      (6L, Seq(0.7f, 0.7f, 0.1f, 0f), 0)))
    val tgt = vecDf(Seq(
      (101L, Seq(1f, 0f, 0f, 0f), 0),
      (103L, Seq(0.1f, 0.9f, 0.2f, 0.1f), 0),
      (105L, Seq(0.2f, 0.1f, 0.9f, 0.3f), 0),
      (107L, Seq(0.5f, 0.5f, 0.5f, 0.5f), 0)))
    val out = Mining.bitextMine(src, tgt, k = 3).orderBy("src_id").collect()
    assert(out.length == 4, "one mined pair per src row")
    val mined0 = out.find(_.getLong(0) == 0L).get
    assert(mined0.getLong(1) == 101L, s"src 0 must mine its exact copy: $mined0")
    assert(mined0.getDouble(2) == 1.0, s"exact copy cosine must be 1: $mined0")
    // the copy scores well above its neighborhood mean (margin > 1 is
    // the mining threshold regime); margins are neighborhood-RELATIVE
    // by design, so no cross-src comparison is asserted
    assert(mined0.getDouble(3) > 1.0,
      s"planted pair must clear the margin threshold: $mined0")
  }

  test("bitextMine is deterministic and emits exactly one row per src") {
    val sf = "/root/testdata/sf0.001"
    val run = () => SparkEntry.queries("q_bitext_mine")(spark, sf)
      .collect().map(_.toString)
    val a = run(); val b = run()
    assert(a.sameElements(b), "bitext mining must be deterministic")
    val out = SparkEntry.queries("q_bitext_mine")(spark, sf).collect()
    val srcIds = out.map(_.getLong(0))
    assert(srcIds.distinct.length == srcIds.length, "one pair per src")
    assert(srcIds.length == 200, "200 even ids under 400 at sf0.001")
    out.foreach { r =>
      assert(r.getLong(1) % 2 == 1, s"tgt side must be odd ids: $r")
      assert(r.getDouble(3) >= 0.0, s"margin must be non-negative: $r")
    }
  }

  test("hardNegatives: no same-label neighbor survives, ranks are " +
       "contiguous from 1, and an all-same-label window yields zero rows") {
    // anchor 0 (label 0): k=2 window holds one same-label (dropped)
    // and one different-label vector (the surviving hard negative);
    // anchor 10 (label 9): both window members share label 9 -> no rows
    val e = vecDf(Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0),
      (1L, Seq(0.99f, 0.1f, 0f, 0f), 0),  // same label, nearest
      (4L, Seq(0.97f, 0.2f, 0f, 0f), 1),  // different label, 2nd nearest
      (5L, Seq(0.6f, 0.6f, 0.5f, 0f), 2), // different, OUTSIDE the window
      (10L, Seq(0f, 0f, 0f, 1f), 9),
      (11L, Seq(0f, 0f, 0.1f, 0.99f), 9),
      (12L, Seq(0f, 0.1f, 0f, 0.98f), 9)))
    val anchors = e.filter(col("vec_id").isin(0L, 10L))
    val out = Mining.hardNegatives(anchors, e, e, k = 2, m = 2).collect()
    val a0 = out.filter(_.getLong(0) == 0L)
    assert(a0.length == 1, s"anchor 0: exactly one in-window negative: ${a0.mkString(";")}")
    assert(a0.head.getLong(1) == 4L && a0.head.getInt(3) == 1,
      s"the different-label window member ranks 1: ${a0.head}")
    val a10 = out.filter(_.getLong(0) == 10L)
    assert(a10.isEmpty,
      s"an all-same-label top-k window yields no negatives: ${a10.mkString(";")}")
  }

  test("bitextMineServe is bit-identical to the batch bitextMine on " +
       "the sf0.001 declared slice") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, sf).filter(col("vec_id") < 400)
    val src = e.filter(col("vec_id") % 2 === 0)
    val tgt = e.filter(col("vec_id") % 2 =!= 0)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    val batch = Mining.bitextMine(src, tgt, k = 4)
      .orderBy("src_id").collect().map(key)
    val shard = Mining.fitBitextServe(src, tgt, k = 4)
    val serve = Mining.bitextMineServe(src, shard, k = 4)
      .orderBy("src_id").collect().map(key)
    assert(serve.toSeq == batch.toSeq,
      "serve-tier bitext mining diverged from the batch join+window spelling")
  }

  test("q_bitext_mine_stream drains to the batch q_bitext_mine row set " +
       "exactly") {
    val sf = "/root/testdata/sf0.001"
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    val streamed = SparkEntry.queries("q_bitext_mine_stream")(spark, sf)
      .collect().map(key).sortBy(_._1)
    val batch = SparkEntry.queries("q_bitext_mine")(spark, sf)
      .collect().map(key).sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq,
      "drained bitext stream diverged from the batch operator")
  }

  test("hardNegRows serve expression is bit-identical to the batch " +
       "join+window spelling, including null-label anchors/neighbors") {
    // vectors as above plus UNLABELED rows on both sides: anchor 20
    // has no label (keeps ALL window members), neighbor 21 has none
    // (never dropped) — the null-safe filter semantics the serve
    // expression must reproduce exactly
    import org.apache.spark.sql.functions._
    val e = vecDf(Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0),
      (1L, Seq(0.99f, 0.1f, 0f, 0f), 0),
      (4L, Seq(0.97f, 0.2f, 0f, 0f), 1),
      (5L, Seq(0.6f, 0.6f, 0.5f, 0f), 2),
      (10L, Seq(0f, 0f, 0f, 1f), 9),
      (11L, Seq(0f, 0f, 0.1f, 0.99f), 9),
      (12L, Seq(0f, 0.1f, 0f, 0.98f), 9)))
      .unionByName(vecDf(Seq(
        (20L, Seq(0.98f, 0.15f, 0f, 0f), 0),
        (21L, Seq(0.96f, 0.25f, 0f, 0f), 0)))
        .withColumn("label", lit(null).cast("int")))
    val anchors = e
    val batch = Mining.hardNegatives(anchors, e, e, k = 3, m = 3)
      .orderBy("anchor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val shard = graft.operators.AnnServe.fitLabeledShard(e, e)
    val serve = graft.operators.AnnServe.hardNegRows(anchors, shard, k = 3, m = 3)
      .orderBy("anchor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(serve.toSeq == batch.toSeq,
      s"serve-tier hard negatives diverged from the batch spelling:\n" +
        s"serve=${serve.mkString(";")}\nbatch=${batch.mkString(";")}")
    // the unlabeled anchor kept a full window (nothing droppable)
    assert(serve.count(_._1 == 20L) == 3)
  }

  test("q_hard_negatives_stream drains to the batch q_hard_negatives " +
       "row set exactly") {
    val sf = "/root/testdata/sf0.001"
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))
    val streamed = SparkEntry.queries("q_hard_negatives_stream")(spark, sf)
      .collect().map(key).sortBy(t => (t._1, t._4))
    val batch = SparkEntry.queries("q_hard_negatives")(spark, sf)
      .collect().map(key).sortBy(t => (t._1, t._4))
    assert(streamed.toSeq == batch.toSeq,
      "drained hard-negative stream diverged from the batch operator")
  }

  test("q_hard_negatives declared query: deterministic, label-safe, " +
       "at most 5 per anchor") {
    val sf = "/root/testdata/sf0.001"
    val run = () => SparkEntry.queries("q_hard_negatives")(spark, sf)
      .collect().map(_.toString)
    assert(run().sameElements(run()), "hard negatives must be deterministic")
    val out = SparkEntry.queries("q_hard_negatives")(spark, sf).collect()
    assert(out.nonEmpty)
    val perAnchor = out.groupBy(_.getLong(0))
    perAnchor.foreach { case (a, rows) =>
      assert(rows.length <= 5, s"anchor $a exceeded m=5")
      assert(rows.map(_.getInt(3)).sorted.sameElements(1 to rows.length),
        s"anchor $a ranks not contiguous")
    }
    // label safety against the source table
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { r =>
      assert(labels(r.getLong(0)) != labels(r.getLong(1)),
        s"same-label negative leaked: $r")
    }
  }
}
