package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources
import graft.ml.{Artifacts, IsolationForest, PcaRecon, Preproc}

class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_src").toString

  test("csv source: explicit schema + coerce-style timestamp (bad -> null, not error)") {
    val dir = tmp()
    val csv =
      """timestamp,transaction_id,customer_id,merchant_id,amount,channel,location
        |2025-05-01T02:00:00Z,1000,101,501,250.5,card,Harare
        |NOT_A_DATE,1001,102,502,10.0,pos,Gweru
        |2025-05-02T03:30:00+00:00,1002,103,503,99.9,mobile_money,Mutare""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/tx.csv"), csv.getBytes)
    val df = Sources.transactionsCsv(spark, s"$dir/tx.csv")
    assert(df.count() == 3)
    assert(df.filter(col("timestamp").isNull).count() == 1)   // coerced, row kept
    assert(df.schema("amount").dataType.typeName == "double")
    val first = df.filter(col("transaction_id") === "1000").head
    assert(first.getTimestamp(0).toInstant.toString == "2025-05-01T02:00:00Z")
  }

  test("json batch source reads request-body-shaped records") {
    val dir = tmp()
    val json =
      """{"timestamp":"2025-05-01T02:00:00.000Z","transaction_id":"1","customer_id":"101","merchant_id":"501","amount":5000.0,"channel":"card","location":"Mutare"}
        |{"timestamp":"2025-05-01T03:00:00.000Z","transaction_id":"2","customer_id":"102","merchant_id":"502","amount":20.0,"channel":"pos","location":"Harare"}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.json"), json.getBytes)
    val df = Sources.transactionsJson(spark, s"$dir/b.json")
    assert(df.count() == 2)
    assert(df.filter(col("amount") === 5000.0).count() == 1)
  }

  test("scored log sink: date-partitioned append with sink timestamp") {
    val dir = tmp()
    val scored = Seq(
      ("1", java.sql.Timestamp.valueOf("2025-05-01 02:00:00"), 0.9),
      ("2", java.sql.Timestamp.valueOf("2025-05-02 03:00:00"), 0.1))
      .toDF("transaction_id", "ts", "aggregated_score")
    Sources.appendScoredLog(scored, "ts", s"$dir/log")
    Sources.appendScoredLog(scored.filter(col("transaction_id") === "1"), "ts", s"$dir/log")
    val back = spark.read.parquet(s"$dir/log")
    assert(back.count() == 3)                                  // append semantics
    assert(back.columns.contains("scored_at"))
    // physical layout is partitioned by date
    val parts = new java.io.File(s"$dir/log").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("score_date="))
    assert(parts.toSet == Set("score_date=2025-05-01", "score_date=2025-05-02"))
    // a date predicate prunes at the PARTITION level (never reaches the
    // row scan) — the 100 TB access pattern for the scored log
    val pruned = back.filter(col("score_date") === "2025-05-01")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("score_date"),
           s"no partition pruning in:\n${plan.take(800)}")
    assert("PartitionFilters: \\[[^\\]]*score_date".r.findFirstIn(plan).isDefined,
           s"score_date not in PartitionFilters:\n${plan.take(800)}")
    assert(pruned.count() == 2) // both copies of tx 1
  }

  test("bucketed tables join without a shuffle on the bucket key") {
    import org.apache.spark.sql.functions._
    // drop any leftover table metadata AND its warehouse directory (a
    // prior JVM's managed-table location survives the catalog)
    Seq("ev_b", "prof_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    Sources.writeBucketed(ev.select("event_id", "user_id", "value"), "ev_b", "user_id", 4)
    Sources.writeBucketed(
      ev.groupBy("user_id").agg(avg("value").as("cust_avg")), "prof_b", "user_id", 4)
    val joined = spark.table("ev_b")
      .join(spark.table("prof_b").hint("merge"), "user_id")
    val plan = joined.queryExecution.executedPlan.toString
    // co-located bucketed sides: the sort-merge join needs no Exchange
    assert(plan.contains("SortMergeJoin"), plan.take(500))
    assert(!plan.contains("Exchange hashpartitioning"),
           s"unexpected shuffle:\n${plan.take(800)}")
    assert(joined.count() == ev.count())
  }

  test("artifact round-trip: preproc, pca, iforest persist and reload identically") {
    val dir = tmp()
    val df = Seq((1.0, "a", Seq(1.0, 2.0)), (2.0, "b", Seq(2.0, 1.0)),
                 (3.0, "a", Seq(0.5, 0.7))).toDF("x", "c", "features")
    val pre = Preproc.fit(df, Seq("x"), Seq("c"))
    Artifacts.savePreproc(pre, s"$dir/pre.json")
    assert(Artifacts.loadPreproc(s"$dir/pre.json") == pre)

    val pca = PcaRecon.fit(df, "features", 1)
    Artifacts.savePca(pca, s"$dir/pca.json")
    val pca2 = Artifacts.loadPca(s"$dir/pca.json")
    assert(pca2.d == pca.d && pca2.k == pca.k)
    assert(pca2.components.map(_.toSeq).toSeq == pca.components.map(_.toSeq).toSeq)

    val lof = graft.ml.Lof.fitNovelty(
      (1 to 30).map(i => (i.toLong, Seq(i * 1.0, i * 2.0)))
        .toDF("id", "features"), "id", "features", k = 5)
    Artifacts.saveLofNovelty(lof, s"$dir/lof.json")
    val lof2 = Artifacts.loadLofNovelty(s"$dir/lof.json")
    assert(lof2.k == lof.k && lof2.kdist.toSeq == lof.kdist.toSeq &&
      lof2.lrd.toSeq == lof.lrd.toSeq &&
      lof2.points.map(_.toSeq).toSeq == lof.points.map(_.toSeq).toSeq)

    val forest = IsolationForest.fit(df, "features", nTrees = 5, subsample = 3)
    Artifacts.saveForest(forest, s"$dir/if.json")
    val forest2 = Artifacts.loadForest(s"$dir/if.json")
    assert(forest2.psi == forest.psi && forest2.offset == forest.offset)
    assert(forest2.trees.length == forest.trees.length)
    // reloaded forest scores identically
    val s1 = df.select(forest.scoreSamplesCol(col("features"))).collect().map(_.getDouble(0))
    val s2 = df.select(forest2.scoreSamplesCol(col("features"))).collect().map(_.getDouble(0))
    assert(s1.sameElements(s2))
  }

  test("ANN index artifacts: IVF centroids and PQ codebooks reload bit-identically") {
    val dir = tmp()
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cent = graft.operators.Ivf.fitCentroids(e, "vec_id", "embedding", nlist = 8)
    Artifacts.saveIvfCentroids(cent, s"$dir/ivf.json")
    val cent2 = Artifacts.loadIvfCentroids(s"$dir/ivf.json")
    assert(cent2.map(_.toSeq).toSeq == cent.map(_.toSeq).toSeq)

    val pq = graft.operators.Pq.fit(e, "vec_id", "embedding", m = 8, ksub = 16)
    Artifacts.savePq(pq, s"$dir/pq.json")
    val pq2 = Artifacts.loadPq(s"$dir/pq.json")
    assert(pq2.m == pq.m && pq2.ksub == pq.ksub && pq2.dsub == pq.dsub)
    assert(pq2.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    // a prober using the reloaded state returns identical neighbors
    val q = e.filter(col("vec_id") < 5)
    val r1 = graft.operators.Pq.topkIvfPq(e, "vec_id", "embedding", q,
      k = 5, cent, nprobe = 4, pq, shortlist = 20).collect().map(_.toString)
    val r2 = graft.operators.Pq.topkIvfPq(e, "vec_id", "embedding", q,
      k = 5, cent2, nprobe = 4, pq2, shortlist = 20).collect().map(_.toString)
    assert(r1.sameElements(r2))
  }

  test("bloom artifact round-trip: reloaded sketch scrubs identically") {
    import org.apache.spark.sql.functions.col
    val dir = tmp()
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0).limit(100)
    val bf = graft.operators.Corpus.fitDecontaminationBloom(bench, "doc_id", "text")
    Artifacts.saveBloom(bf, s"$dir/bench.bloom")
    val bf2 = Artifacts.loadBloom(s"$dir/bench.bloom")
    val a = graft.operators.Corpus
      .decontaminateWithBloom(corpus, bf, "doc_id", "text").collect().toSeq
    val b = graft.operators.Corpus
      .decontaminateWithBloom(corpus, bf2, "doc_id", "text").collect().toSeq
    assert(a == b && a.nonEmpty, "reloaded sketch must scrub bit-identically")
  }

  test("NB quality model and fuzzy key set reload bit-identically and serve identically") {
    import org.apache.spark.sql.functions.col
    val dir = tmp()
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val m = graft.operators.Corpus.fitNbQuality(
      docs.filter(col("lang") === "en"), docs.filter(col("lang") =!= "en"),
      "doc_id", "text")
    Artifacts.saveNbQuality(m, s"$dir/nb.json")
    val m2 = Artifacts.loadNbQuality(s"$dir/nb.json")
    assert(m2.nBuckets == m.nBuckets && m2.base == m.base &&
      m2.prior == m.prior && m2.weights.sameElements(m.weights))
    val probe = docs.limit(50)
    val a = graft.operators.Corpus.nbScoreRows(probe, m, "doc_id", "text")
      .collect().toSeq
    val b = graft.operators.Corpus.nbScoreRows(probe, m2, "doc_id", "text")
      .collect().toSeq
    assert(a == b && a.nonEmpty)

    val keys = graft.operators.Corpus.fitFuzzyKeys(
      docs.filter(col("doc_id") % 10 === 0), "text", prefixChars = 32)
    Artifacts.saveFuzzyKeys(keys, s"$dir/fuzzy.json")
    assert(Artifacts.loadFuzzyKeys(s"$dir/fuzzy.json").sameElements(keys)
      && keys.nonEmpty)
  }

  test("ANN serve shard reloads bit-identically and serves identically") {
    val dir = tmp()
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val sh = graft.operators.AnnServe.fitShard(e)
    Artifacts.saveAnnShard(sh, s"$dir/shard.json")
    val sh2 = Artifacts.loadAnnShard(s"$dir/shard.json")
    assert(sh2.dim == sh.dim && sh2.ids.sameElements(sh.ids) &&
      sh2.flatVecs.sameElements(sh.flatVecs))
    import org.apache.spark.sql.functions.col
    val q = e.filter(col("vec_id") < 5)
    val a = graft.operators.AnnServe.topkRows(q, sh)
      .orderBy("query_id", "neighbor_id").collect().toSeq
    val b = graft.operators.AnnServe.topkRows(q, sh2)
      .orderBy("query_id", "neighbor_id").collect().toSeq
    assert(a == b && a.nonEmpty, "reloaded shard must serve bit-identically")
  }

  test("graph-beam serve shard reloads bit-identically and serves " +
       "identically — no graph rebuild on load") {
    val dir = tmp()
    import org.apache.spark.sql.functions.col
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val graph = graft.operators.Ivf.knnGraph(e, "vec_id", "embedding", 8)
    val sh = graft.operators.AnnServe.fitGraphShard(e, graph)
    Artifacts.saveGraphShard(sh, s"$dir/graph.bin")
    val sh2 = Artifacts.loadGraphShard(s"$dir/graph.bin")
    assert(sh2.dim == sh.dim && sh2.ids.sameElements(sh.ids) &&
      sh2.flatVecs.sameElements(sh.flatVecs) &&
      sh2.nbrOff.sameElements(sh.nbrOff) &&
      sh2.nbrIdx.sameElements(sh.nbrIdx) &&
      sh2.entryIdx.sameElements(sh.entryIdx))
    val q = e.filter(col("vec_id") < 5)
    val a = graft.operators.AnnServe.graphTopkRows(q, sh)
      .orderBy("query_id", "neighbor_id").collect().toSeq
    val b = graft.operators.AnnServe.graphTopkRows(q, sh2)
      .orderBy("query_id", "neighbor_id").collect().toSeq
    assert(a == b && a.nonEmpty, "reloaded graph shard must serve bit-identically")
  }

  test("SQ8 serve shard reloads bit-identically and serves identically") {
    val dir = tmp()
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val sh = graft.operators.AnnServe.fitSqShard(e)
    Artifacts.saveSqShard(sh, s"$dir/sq.bin")
    val sh2 = Artifacts.loadSqShard(s"$dir/sq.bin")
    assert(sh2.dim == sh.dim && sh2.ids.sameElements(sh.ids) &&
      sh2.codes.sameElements(sh.codes) && sh2.minl.sameElements(sh.minl) &&
      sh2.stepl.sameElements(sh.stepl) && sh2.norms.sameElements(sh.norms))
    import org.apache.spark.sql.functions.col
    val q = e.filter(col("vec_id") < 5)
    val a = graft.operators.AnnServe.sqTopkRows(q, sh)
      .orderBy("query_id", "neighbor_id").collect().toSeq
    val b = graft.operators.AnnServe.sqTopkRows(q, sh2)
      .orderBy("query_id", "neighbor_id").collect().toSeq
    assert(a == b && a.nonEmpty, "reloaded SQ8 shard must serve bit-identically")
  }

  test("BM25 index artifact reloads bit-identically and serves identically " +
       "— no index rebuild on load") {
    val dir = tmp()
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val ix = graft.operators.Retrieval.fitBm25Index(docs, "doc_id", "text")
    Artifacts.saveBm25Index(ix, s"$dir/bm25.bin")
    val ix2 = Artifacts.loadBm25Index(s"$dir/bm25.bin")
    assert(ix2.terms.sameElements(ix.terms) && ix2.df.sameElements(ix.df) &&
      ix2.postOff.sameElements(ix.postOff) &&
      ix2.postDoc.sameElements(ix.postDoc) &&
      ix2.postTf.sameElements(ix.postTf) &&
      ix2.postDl.sameElements(ix.postDl) &&
      ix2.n == ix.n && ix2.avgdl == ix.avgdl)
    val q = graft.operators.Retrieval.queryTermArrays(docs, "doc_id", "text")
    val a = graft.operators.Retrieval.bm25ServeRows(q, ix)
      .orderBy("query_id", "rank").collect().toSeq
    val b = graft.operators.Retrieval.bm25ServeRows(q, ix2)
      .orderBy("query_id", "rank").collect().toSeq
    assert(a == b && a.nonEmpty, "reloaded index must serve bit-identically")
    // corrupt class: a truncated file fails at load as a header error
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/bm25.bin"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/trunc.bin"), bytes.take(40))
    intercept[Exception] { Artifacts.loadBm25Index(s"$dir/trunc.bin") }
    // wrong magic fails as "not a Bm25Index artifact", not a misread
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/badmagic.bin"),
      Array.fill[Byte](64)(0x5a))
    intercept[IllegalArgumentException] {
      Artifacts.loadBm25Index(s"$dir/badmagic.bin")
    }
  }

  test("lang model round-trips bit-identically and serves identically") {
    val dir = tmp()
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val m = graft.operators.Corpus.fitLangModel(
      docs, "doc_id", "text", "lang", nBuckets = 256)
    Artifacts.saveLangModel(m, s"$dir/lang.json")
    val m2 = Artifacts.loadLangModel(s"$dir/lang.json")
    assert(m2.langs.sameElements(m.langs) && m2.nBuckets == m.nBuckets &&
      m2.flatW.sameElements(m.flatW) && m2.priors.sameElements(m.priors))
    val a = graft.operators.Corpus
      .langScoreRows(docs, m, "doc_id", "text", "lang")
      .orderBy("doc_id").collect().toSeq
    val b = graft.operators.Corpus
      .langScoreRows(docs, m2, "doc_id", "text", "lang")
      .orderBy("doc_id").collect().toSeq
    assert(a == b && a.nonEmpty, "reloaded lang model must serve bit-identically")
  }

  test("two-level quantizer round-trips with identical probe output") {
    import org.apache.spark.sql.functions.col
    val dir = tmp()
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("f"))
    val c2 = graft.operators.Ivf.fitCentroids2(e, "vec_id", "f", nc = 8, nf = 8)
    Artifacts.saveCentroids2(c2, s"$dir/c2")
    val c2b = Artifacts.loadCentroids2(s"$dir/c2")
    assert(c2b.nc == c2.nc && c2b.nf == c2.nf && c2b.dim == c2.dim)
    val probe = (m: graft.operators.Ivf.Centroids2) =>
      e.select(col("vec_id"),
        graft.operators.Ivf.probeCells2Col(col("f"), m, npc = 2, npf = 3).as("cells"))
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSeq
    assert(probe(c2b) == probe(c2),
      "reloaded two-level quantizer must probe identically")
  }

  test("ensemble bundle round-trip: loaded bundle scores identically") {
    val dir = tmp()
    val fitted = graft.ml.Ensemble.fit(spark, "/root/testdata/sf0.001")
    Artifacts.saveEnsemble(fitted, s"$dir/bundle")
    val loaded = Artifacts.loadEnsemble(spark, s"$dir/bundle")
    assert(loaded.cfg == fitted.cfg && loaded.aeThreshold == fitted.aeThreshold)
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val a = graft.ml.Ensemble.scoreBatch(ev, fitted).orderBy("transaction_id").collect()
    val b = graft.ml.Ensemble.scoreBatch(ev, loaded).orderBy("transaction_id").collect()
    assert(a.sameElements(b))
  }

  test("jdbc sink + source round-trip (embedded Derby)") {
    // live-DB form of src_jdbc_profile / snk_mysql_log: write scores,
    // read them back plain and range-partitioned
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val driver = Some("org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val scores = Seq(
      (1L, 101L, 344.07, 0.42, "Medium"),
      (2L, 102L, 15.53, 0.05, "Low"),
      (3L, 103L, 50000.0, 0.93, "High"),
      (4L, 101L, 205.5, 0.12, "Low"))
      .toDF("transaction_id", "customer_id", "amount", "aggregated_score", "risk_level")
    Sources.writeJdbc(scores.coalesce(1), url, "scores", mode = "overwrite", driver = driver,
      // Derby maps StringType to CLOB, which can't be compared/pushed —
      // declare the string column explicitly (MySQL DDL would too)
      options = Map("createTableColumnTypes" -> "risk_level VARCHAR(10)"))
    val back = Sources.readJdbc(spark, url, "scores", driver = driver)
    assert(back.count() == 4)
    assert(back.columns.map(_.toLowerCase).toSet ==
      Set("transaction_id", "customer_id", "amount", "aggregated_score", "risk_level"))
    val hi = back.filter(col("risk_level") === "High").head
    assert(hi.getAs[Long]("transaction_id") == 3L)
    // partitioned read: 3 disjoint id ranges in parallel
    val part = Sources.readJdbc(spark, url, "scores", driver = driver,
      partitioning = Some(("transaction_id", 0L, 5L, 3)))
    assert(part.rdd.getNumPartitions == 3)
    assert(part.count() == 4)
    assert(part.agg(sum("aggregated_score")).head.getDouble(0) ==
      back.agg(sum("aggregated_score")).head.getDouble(0))
  }

  test("mysql dialect contract: the scored-log schema maps to concrete " +
       "MySQL DDL through Spark's registered dialect") {
    import org.apache.spark.sql.jdbc.JdbcDialects
    import org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
    import org.apache.spark.sql.types._
    val dialect = JdbcDialects.get("jdbc:mysql://db.example.invalid:3306/fraud")
    val schema = StructType(Seq(
      StructField("transaction_id", LongType),
      StructField("customer_id", LongType),
      StructField("ts", TimestampType),
      StructField("amount", DoubleType),
      StructField("aggregated_score", DoubleType),
      StructField("risk_level", StringType),
      StructField("scored_at", TimestampType)))
    // the URL must select the MySQL dialect, not the generic fallback —
    // backtick identifier quoting below is the observable proof
    assert(dialect.getClass.getName.toLowerCase.contains("mysql"))
    val ddl = JdbcUtils.schemaString(dialect, schema,
      caseSensitive = false, Some("risk_level VARCHAR(10)"))
    // the exact CREATE TABLE column list Spark would send to MySQL 8:
    // every type is a valid MySQL column type, identifiers are
    // backtick-quoted, and the explicit VARCHAR override (the Derby
    // round-trip above uses the same option) lands verbatim
    for (c <- Seq("`transaction_id` BIGINT", "`customer_id` BIGINT",
        "`ts` TIMESTAMP", "`amount` DOUBLE PRECISION",
        "`aggregated_score` DOUBLE PRECISION",
        "`risk_level` VARCHAR(10)", "`scored_at` TIMESTAMP"))
      assert(ddl.contains(c), s"missing [$c] in [$ddl]")
  }
}
