package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** robots.txt gating — the crawl-side admission control that runs
  * BEFORE any page is fetched (and in a corpus pipeline, the audit
  * that removes pages that should never have been fetched): parse
  * each host's robots.txt into (type, path-prefix) rules and gate
  * every URL by the LONGEST-MATCH rule, Allow winning ties — the
  * REP semantics (RFC 9309 §2.2.2) restricted to the prefix-only
  * core (no `*`/`$` wildcards; documented subset, the overwhelming
  * share of real rules).
  *
  * The longest-match verdict needs no per-URL rule ranking: it is
  * two scalar aggregates — the longest matching Allow prefix and the
  * longest matching Disallow prefix — and `allowed` iff
  * `maxAllow >= maxDisallow` with "no match" reading as -1 (no rule
  * → allowed; equal lengths → Allow wins). That keeps the whole gate
  * one broadcast join plus one hash aggregate.
  *
  * Scale shape: the rules table is tiny relative to the URL corpus
  * (one row per host × rule, rule sets bounded) → broadcast build
  * side; URLs stream through the join and the per-URL agg shuffles
  * only (doc_id-keyed) gate rows. Zero driver-side work. */
object Robots {

  /** Parse robots.txt bodies into one row per Allow/Disallow rule:
    * (host, rtype, rpath). Directive names are case-insensitive;
    * comments, blank lines, `User-agent`, `Crawl-delay`, and
    * empty-path rules (an empty `Disallow:` means allow-all per the
    * REP and contributes NO rule) are dropped. */
  def parseRobots(robots: DataFrame, hostCol: String,
                  txtCol: String): DataFrame =
    robots.select(col(hostCol).as("host"),
        explode(split(col(txtCol), "\n")).as("line"))
      .select(col("host"),
        lower(regexp_extract(col("line"), "(?i)^(Allow|Disallow)\\s*:", 1))
          .as("rtype"),
        trim(regexp_extract(col("line"),
          "(?i)^(?:Allow|Disallow)\\s*:\\s*(\\S*)", 1)).as("rpath"))
      .filter(col("rtype") =!= "" && col("rpath") =!= "")

  /** Gate URLs by host rules: for each URL row (idCol, hostCol,
    * pathCol), the longest matching Allow/Disallow prefix lengths and
    * the verdict. Prefix match is on the RAW path (robots rules refer
    * to the path as crawled, before any canonicalization).
    *
    * Shape: the per-host rules collapse into ONE array row per host
    * (rule sets are small and bounded per the REP), broadcast-joined
    * to the URL stream, and the longest-match maxima fold ROW-LOCALLY
    * over that array — no per-URL aggregation exchange at all, so the
    * gate adds zero shuffles to any pipeline it joins (pinned in
    * PlanShapeSpec). `carry` columns pass through untouched. */
  def robotsGate(urls: DataFrame, rules: DataFrame, idCol: String = "doc_id",
                 hostCol: String = "domain", pathCol: String = "path",
                 carry: Seq[String] = Nil): DataFrame = {
    val ra = rules.groupBy("host")
      .agg(collect_list(struct(col("rtype"), col("rpath"))).as("__rules"))
    def best(t: String) = aggregate(
      filter(coalesce(col("__rules"),
          expr("CAST(array() AS array<struct<rtype:string,rpath:string>>)")),
        r => r.getField("rtype") === t &&
          col("path").startsWith(r.getField("rpath"))),
      lit(-1),
      (a, r) => greatest(a, length(r.getField("rpath"))))
    urls.select(Seq(col(idCol).as("doc_id"), col(hostCol).as("host"),
        col(pathCol).as("path")) ++ carry.map(col): _*)
      .join(broadcast(ra), Seq("host"), "left")
      .withColumn("__ba", best("allow"))
      .withColumn("__bd", best("disallow"))
      .select(Seq(col("doc_id"), col("host"), col("path")) ++ carry.map(col) ++ Seq(
        when(col("__ba") === -1, lit(null).cast("int"))
          .otherwise(col("__ba")).as("max_allow"),
        when(col("__bd") === -1, lit(null).cast("int"))
          .otherwise(col("__bd")).as("max_disallow"),
        (col("__ba") >= col("__bd")).cast("int").as("allowed")): _*)
  }

  /** Deterministic robots.txt generator (the plant pattern): one
    * robots body per distinct source host. Each body carries noise
    * the parser must skip (User-agent, a comment, a blank line,
    * Crawl-delay, an empty Disallow) and three real rules planted
    * both ways against the crawl generators' paths: `Disallow:
    * /{lang0}/` blocks that language's pages on the host, `Allow:
    * /{lang0}/p%41ge%2f-2` (for `Extract.urlWrapped` URLs) and
    * `Allow: /{lang0}/crawl-2` (for `Warc.warcRecords` URIs)
    * re-allow page ids starting with 2 via the LONGER match, and
    * `Disallow: /x-{source}/` never matches (a dead rule). lang0
    * varies by the source's numeric suffix, so different hosts block
    * different languages. */
  def robotsWrapped(docs: DataFrame, sourceCol: String): DataFrame = {
    val langs = array(lit("de"), lit("en"), lit("es"), lit("fr"), lit("zh"))
    val sfx = regexp_extract(col(sourceCol), "[0-9]+", 0).cast("int")
    val lang0 = element_at(langs, sfx % 5 + 1)
    docs.select(col(sourceCol)).distinct()
      .select(concat(col(sourceCol), lit(".example.com")).as("host"),
        concat(
          lit("User-agent: *\n"),
          lit("# generated policy\n\n"),
          lit("Disallow: /"), lang0, lit("/\n"),
          lit("Allow: /"), lang0, lit("/p%41ge%2f-2\n"),
          lit("Allow: /"), lang0, lit("/crawl-2\n"),
          lit("Disallow: /x-"), col(sourceCol), lit("/\n"),
          lit("Disallow:\n"),
          lit("Crawl-delay: "), (sfx % 10).cast("string"), lit("\n"))
          .as("robots_txt"))
  }
}
