package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Norm
import graft.schema.Schemas

/** Per-platform raw→fact normalizers — the reference's projection layer
  * (SURVEY.md §2.2 P1-P13) and required-field filters (§2.3 F3-F9) as pure
  * Column pipelines. Every normalizer takes the raw payload DataFrame, the
  * company attribution as COLUMNS (P12 enrichment — `lit`s on the
  * per-company path, the fetchAll control-join columns on the single-scan
  * path, so one normalizer serves both), and the batch timestamp (P13
  * `fetched_at`), and emits rows in the sink schema's column order.
  */
object Normalize {

  private def isoTs(c: Column): Column = try_to_timestamp(c)

  /** P1-P3 + F3 (scrapers/twitter_scraper.py:65-94). */
  def twitter(raw: DataFrame, name: Column, handle: Column, batchTs: Column): DataFrame =
    raw.filter(col("createdAt").isNotNull) // F3
      .select(
        col("id").as("tweet_id"),
        name.as("company_name"),
        col("url").as("twitter_url"),
        col("text"),
        col("author.name").as("author_handle"), // P1: nested struct
        Norm.parseTwitterTs(col("createdAt")).as("created_at"), // P3
        Norm.orZero(col("replyCount")).as("reply_count"),
        Norm.orZero(col("retweetCount")).as("retweet_count"),
        Norm.orZero(col("likeCount")).as("like_count"),
        Norm.orZero(col("viewCount")).as("view_count"),
        Norm.first(col("media")).getField("expanded_url").as("image"), // P1
        // P2: first video/animated_gif media → its first variant URL
        Norm.first(
            Norm.firstWhere(col("extendedEntities.media"),
                m => m.getField("type").isin("video", "animated_gif"))
              .getField("videoInfo").getField("variants"))
          .getField("url").as("videourl"),
        batchTs.as("fetched_at")) // P13

  /** F4 + timeline projection (scrapers/twitter2_scraper.py:49-64). */
  def twitter2(raw: DataFrame, name: Column, handle: Column, batchTs: Column): DataFrame =
    raw.filter(col("id").isNotNull && col("text").isNotNull) // F4
      .select(
        col("id").as("tweet_id"),
        name.as("company_name"),
        col("url").as("twitter_url"),
        col("text"),
        col("author.name").as("author_handle"),
        isoTs(col("createdAt")).as("created_at"),
        Norm.orZero(col("replyCount")).as("reply_count"),
        Norm.orZero(col("retweetCount")).as("retweet_count"),
        Norm.orZero(col("likeCount")).as("like_count"),
        Norm.orZero(col("viewCount")).as("view_count"),
        lit(null).cast(StringType).as("image"),
        lit(null).cast(StringType).as("videourl"),
        batchTs.as("fetched_at"))

  /** snscrape projection (scrapers/twitter3_scraper.py:42-55); the ordered
    * early-exit (F9) is the connector's since-filter + newest-first cap.
    */
  def twitter3(raw: DataFrame, name: Column, handle: Column, batchTs: Column): DataFrame =
    raw.filter(col("id").isNotNull)
      .select(
        col("id").cast(StringType).as("tweet_id"),
        name.as("company_name"),
        col("url").as("twitter_url"),
        col("content").as("text"),
        col("user.username").as("author_handle"),
        col("date").as("created_at"),
        Norm.orZero(col("replyCount")).as("reply_count"),
        Norm.orZero(col("retweetCount")).as("retweet_count"),
        Norm.orZero(col("likeCount")).as("like_count"),
        Norm.orZero(col("viewCount")).as("view_count"),
        lit(null).cast(StringType).as("image"),
        lit(null).cast(StringType).as("videourl"),
        batchTs.as("fetched_at"))

  /** X1 flatten + F8 error skip + P7 coalescing + F5
    * (scrapers/instagram_scraper.py:78-112). Entry shapes: topPosts ∪
    * latestPosts, else flat items, else the entry IS a post.
    */
  def instagram(raw: DataFrame, name: Column, handle: Column, batchTs: Column): DataFrame = {
    val selfPost = struct(Schemas.instagramPost.fieldNames.toSeq.map(col): _*)
    // typed empty array<struct<...>> (a bare array() is array<string> and
    // won't cast to a struct element type)
    val emptyPosts = filter(array(selfPost), _ => lit(false))
    val posts =
      when(size(coalesce(col("topPosts"), emptyPosts)) +
             size(coalesce(col("latestPosts"), emptyPosts)) > 0,
        concat(coalesce(col("topPosts"), emptyPosts), coalesce(col("latestPosts"), emptyPosts)))
      .when(col("items").isNotNull, col("items"))
      .when(coalesce(col("id"), col("shortCode")).isNotNull, array(selfPost))
      .otherwise(emptyPosts)
    // P7 alias coalescing with PYTHON-`or` semantics (instagram_scraper.py
    // :102-109): "" and 0 are falsy and fall through to the next alias —
    // nullif folds them away so coalesce matches `a or b [or default]`
    def orS(a: Column, b: Column) = coalesce(nullif(a, lit("")), nullif(b, lit("")))
    def orN(a: Column, b: Column) =
      coalesce(nullif(a, lit(0)), nullif(b, lit(0)), lit(0))
    raw.filter(col("error").isNull) // F8
      .select(name.as("__cn"), explode(posts).as("p")) // X1 (company rides the explode)
      .select(
        orS(col("p.id"), col("p.shortCode")).as("post_id"), // P7
        col("__cn").as("company_name"),
        orS(col("p.description"), col("p.caption")).as("caption"),
        orS(col("p.username"), col("p.ownerUsername")).as("author_handle"), // username FIRST (line 104)
        coalesce(isoTs(col("p.publishedAt")), isoTs(col("p.timestamp"))).as("created_at"),
        orN(col("p.likesCount"), col("p.like_count")).as("like_count"),
        orN(col("p.commentsCount"), col("p.comment_count")).as("comment_count"),
        coalesce(col("p.images"), lit("")).as("image"), // it.get("images", "")
        orS(col("p.videoUrl"), col("p.video_url")).as("videourl"),
        batchTs.as("fetched_at"))
      .filter(col("post_id").isNotNull && col("created_at").isNotNull) // F5
  }

  /** P4-P5 over extracted cards (scrapers/trustpilot_scraper.py:56-91). */
  def trustpilot(raw: DataFrame, name: Column, handle: Column, batchTs: Column): DataFrame =
    raw.select(
      name.as("company_name"),
      handle.as("company_web_address"),
      col("author_name"),
      Norm.ratingFromAlt(col("rating_alt")).as("rating"), // P4
      col("review_title"),
      col("review_body"),
      Norm.parseTrustpilotDate(col("review_date_str")).as("review_date"), // P5
      batchTs.as("fetched_at"))

  /** P6 over extracted blocks (scrapers/feefo_scraper.py:46-71). */
  def feefo(raw: DataFrame, name: Column, handle: Column, batchTs: Column): DataFrame =
    raw.select(
      name.as("company_name"),
      handle.as("feefo_business_info"),
      col("customer_name"),
      col("service_review"),
      col("product_review"),
      col("customer_location"),
      Norm.parseFeefoDate(col("purchase_date_str")).as("review_date"), // P6
      batchTs.as("fetched_at"))

  /** scrapers/google_maps_scraper.py:68-78. */
  def googleMaps(raw: DataFrame, name: Column, handle: Column, batchTs: Column): DataFrame =
    raw.select(
      name.as("company_name"),
      handle.as("place_url"),
      col("name").as("reviewer_name"),
      col("stars").as("rating"),
      col("text").as("review_text"),
      isoTs(col("reviewDate")).as("review_date"),
      col("reviewUrl"),
      col("ownerResponse").as("owner_response"),
      batchTs.as("fetched_at"))

  /** X2 listing unwrap + P8 (scrapers/reddit_scraper.py:54-55,78-112). */
  def reddit(raw: DataFrame, name: Column, handle: Column, batchTs: Column): DataFrame =
    raw.select(name.as("__cn"), explode(col("data.children")).as("child")) // X2
      .select(col("__cn"), col("child.data.*"))
      .select(
        col("__cn").as("company_name"),
        Norm.redditUrl(col("permalink")).as("post_url"), // P8
        col("title"),
        col("author"),
        Norm.first(col("preview.images")).getField("source").getField("url").as("image_url"),
        Norm.orZero(col("score")).as("votes"),
        Norm.orZero(col("num_comments")).as("comments"),
        nullif(col("selftext"), lit("")).as("full_review"), // `selftext or None`
        Norm.epochSecTs(col("created_utc")).as("review_date"), // P8 epoch→ts
        batchTs.as("fetched_at"))

  /** P9-P10 + F6 (scrapers/facebook_scraper.py:80-115). */
  def facebook(raw: DataFrame, name: Column, handle: Column, batchTs: Column): DataFrame = {
    val firstRef = Norm.first(col("textReferences"))
    val firstImg = Norm.firstWhere(col("media"),
      m => m.getField("photo_image").getField("url").isNotNull ||
        m.getField("image").getField("uri").isNotNull ||
        m.getField("image").getField("url").isNotNull)
    raw.select(
        coalesce(col("postFacebookId"), col("postId")).as("post_id"),
        name.as("company_name"),
        handle.as("facebook_username"),
        col("text").as("message"),
        isoTs(col("time")).as("created_at"),
        Norm.orZero(col("likes")).as("reactions_count"),
        Norm.orZero(col("comments")).as("comments_count"),
        coalesce(firstRef.getField("short_name"), firstRef.getField("shortname")).as("author_name"), // P9
        coalesce( // P10
          firstImg.getField("photo_image").getField("url"),
          firstImg.getField("image").getField("uri"),
          firstImg.getField("image").getField("url")).as("image"),
        Norm.orZero(col("shares")).as("share_count"),
        col("url").as("post_url"),
        batchTs.as("fetched_at"))
      .filter(col("post_id").isNotNull && col("created_at").isNotNull) // F6
  }

  /** P11 + F7 (scrapers/linkedin_scraper.py:65-109). */
  def linkedin(raw: DataFrame, name: Column, handle: Column, batchTs: Column): DataFrame =
    raw.filter(col("posted_at").isNotNull && // F7
        col("posted_at.date").isNotNull && col("posted_at.timestamp").isNotNull)
      .select(
        name.as("company_name"),
        coalesce(col("full_urn"), col("urn")).as("urn"),
        col("text"),
        col("url"),
        isoTs(col("posted_at.date")).as("posted_at_iso"),
        col("posted_at.timestamp").as("posted_at_ts"),
        Norm.fullName(col("author.first_name"), col("author.last_name")).as("author_name"), // P11
        col("author.username").as("author_profile_id"),
        col("author.headline").as("author_headline"),
        col("media.url").as("image"),
        Norm.orZero(col("stats.total_reactions")).as("total_reactions"),
        Norm.orZero(col("stats.like")).as("like_count"),
        Norm.orZero(col("stats.support")).as("support"),
        Norm.orZero(col("stats.love")).as("love"),
        Norm.orZero(col("stats.insight")).as("insight"),
        Norm.orZero(col("stats.celebrate")).as("celebrate"),
        Norm.orZero(col("stats.comments")).as("comments_count"),
        Norm.orZero(col("stats.reposts")).as("reposts"),
        col("post_type").as("type"),
        batchTs.as("fetched_at"))
}
