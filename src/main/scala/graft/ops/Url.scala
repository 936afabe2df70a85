package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-based web-corpus curation — the C4/RefinedWeb intake pattern: a
  * crawl is deduplicated by CANONICAL URL before any content pass (the
  * same page arrives as http/https, with/without `www.`, with tracking
  * query params and fragments), then throttled per registered domain so
  * no single site dominates the corpus (RefinedWeb §3.1 caps pages per
  * domain; content farms otherwise contribute millions).
  *
  * Canonicalization is a pure regexp chain (scheme, `www.`, query string,
  * fragment, trailing slash) using only constructs with identical Java /
  * RE2 semantics — shuffle-free, codegen'd. The dedup winner is min
  * doc_id per canonical URL (one partial-agg groupBy + key join back, the
  * exact-dedup shape); the domain cap runs through the bounded-heap
  * [[graft.plans.TopK]] operator, so a million-page domain ships `cap`
  * rows through the exchange, not its population.
  *
  * The synthetic corpus has no URLs, so [[withUrls]] seeds them
  * deterministically (several doc_id residue classes mapping to the SAME
  * canonical URL with different surface forms, mirrored in the oracle) —
  * the collision semantics are pinned by value, not just "no dups found".
  */
object Url {

  val DomainCap = 10

  /** Deterministic URL seeding: every doc gets a URL; residue classes
    * deliberately collide post-canonicalization (scheme / www / utm query
    * / trailing-slash variants of the same page).
    */
  def withUrls(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val page = concat(lit("site"), pmod(id, lit(37)), lit(".com/page"),
      pmod(id, lit(11)))
    val url = when(id % 4 === 0, concat(lit("https://www."), page))
      .when(id % 4 === 1, concat(lit("http://"), page, lit("/")))
      .when(id % 4 === 2,
        concat(lit("https://"), page, lit("?utm_source=feed&ref="), id))
      .otherwise(concat(lit("https://www."), page, lit("#section"), id))
    docs.withColumn("url", url)
  }

  /** Scheme, www., query, fragment, trailing slash stripped; lowered. */
  def canonical(url: Column): Column = {
    val noScheme = regexp_replace(lower(url), lit("^https?://"), lit(""))
    val noWww = regexp_replace(noScheme, lit("^www\\."), lit(""))
    val noQuery = regexp_replace(noWww, lit("[?#].*$"), lit(""))
    regexp_replace(noQuery, lit("/$"), lit(""))
  }

  /** Registered domain = canonical host (first path segment cut off). */
  def domain(canon: Column): Column =
    regexp_replace(canon, lit("/.*$"), lit(""))

  /** Per-doc verdicts: canonical form, domain, whether the doc wins its
    * canonical-URL group (min doc_id), and whether it survives the
    * per-domain cap (first [[DomainCap]] winners by doc_id per domain).
    */
  def urlDedup(docs: DataFrame, cap: Int = DomainCap): DataFrame = {
    val withCanon = docs
      .select(col("doc_id"), col("url"),
        canonical(col("url")).as("canon"))
      .withColumn("domain", domain(col("canon")))
    val winners = withCanon.groupBy("canon")
      .agg(min(col("doc_id")).as("_win"))
    val tagged = withCanon.join(winners, "canon")
      .withColumn("url_winner", col("doc_id") === col("_win"))
    // cap applies to canonical winners only: TopK's bounded per-partition
    // heaps prune before the single domain exchange
    val kept = graft.plans.TopK.perKey(
      tagged.filter(col("url_winner")).select("doc_id", "domain"),
      Seq("domain"), Seq(graft.plans.TopK.asc("doc_id")), cap)
      .select(col("doc_id").as("_kept"))
    tagged.join(kept, col("doc_id") === col("_kept"), "left")
      .select(col("doc_id"), col("url"), col("canon"), col("domain"),
        col("url_winner"),
        (col("url_winner") && col("_kept").isNotNull).as("kept"))
      .orderBy("doc_id")
  }
}
