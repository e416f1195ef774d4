package graft.schema

import org.apache.spark.sql.types._

/** Schema registry (SURVEY.md §1.3): fixed sink schemas + explicit
  * schema-on-read payload schemas for every source.
  *
  * Sink column lists are determined by the reference's INSERT statements
  * (/root/reference/utils/db_helpers.py:92-300); payload shapes by what each
  * scraper reads (FIXTURES.md §2, citations inline). Everything nullable —
  * the reference's dominant failure mode is missing fields, and required-
  * field enforcement is a FILTER (F3-F9), not a schema constraint.
  */
object Schemas {

  private def s(n: String)  = StructField(n, StringType)
  private def i(n: String)  = StructField(n, IntegerType)
  private def l(n: String)  = StructField(n, LongType)
  private def d(n: String)  = StructField(n, DoubleType)
  private def ts(n: String) = StructField(n, TimestampType)
  private def dt(n: String) = StructField(n, DateType)

  // ---- control table (utils/db_helpers.py:55,70) ----

  val platforms: Seq[String] = Seq(
    "twitter", "twitter2", "twitter3", "instagram", "trustpilot",
    "feefo", "google_maps", "reddit", "facebook", "linkedin")

  val users: StructType = StructType(
    Seq(i("id"), s("company_name"), s("company_web_address"),
      s("instagram_username"), s("twitter_username"), s("feefo_business_info"),
      s("place_url"), s("facebook_username"), s("linkedin_username")) ++
      platforms.map(p => ts(s"last_fetched_$p")))

  // ---- sink (fact) tables; conflict keys in Sinks below ----

  /** utils/db_helpers.py:97-101 */
  val twitterMentions: StructType = StructType(Seq(
    s("tweet_id"), s("company_name"), s("twitter_url"), s("text"),
    s("author_handle"), ts("created_at"), i("reply_count"), i("retweet_count"),
    i("like_count"), i("view_count"), s("image"), s("videourl"), ts("fetched_at")))

  /** utils/db_helpers.py:114-121 */
  val instagramMentions: StructType = StructType(Seq(
    s("post_id"), s("company_name"), s("caption"), s("author_handle"),
    ts("created_at"), i("like_count"), i("comment_count"), s("image"),
    s("videourl"), ts("fetched_at")))

  /** utils/db_helpers.py:134-142 */
  val trustpilotReviews: StructType = StructType(Seq(
    s("company_name"), s("company_web_address"), s("author_name"), i("rating"),
    s("review_title"), s("review_body"), dt("review_date"), ts("fetched_at")))

  /** utils/db_helpers.py:159-170 */
  val feefoReviews: StructType = StructType(Seq(
    s("company_name"), s("feefo_business_info"), s("customer_name"),
    s("service_review"), s("product_review"), s("customer_location"),
    dt("review_date"), ts("fetched_at")))

  /** utils/db_helpers.py:187-197 */
  val googleMapsReviews: StructType = StructType(Seq(
    s("company_name"), s("place_url"), s("reviewer_name"), d("rating"),
    s("review_text"), ts("review_date"), s("reviewUrl"), s("owner_response"),
    ts("fetched_at")))

  /** utils/db_helpers.py:225-242 */
  val redditPosts: StructType = StructType(Seq(
    s("company_name"), s("post_url"), s("title"), s("author"), s("image_url"),
    i("votes"), i("comments"), s("full_review"), ts("review_date"), ts("fetched_at")))

  /** utils/db_helpers.py:258-267 */
  val facebookPosts: StructType = StructType(Seq(
    s("post_id"), s("company_name"), s("facebook_username"), s("message"),
    ts("created_at"), i("reactions_count"), i("comments_count"), s("author_name"),
    s("image"), i("share_count"), s("post_url"), ts("fetched_at")))

  /** utils/db_helpers.py:279-296 */
  val linkedinPosts: StructType = StructType(Seq(
    s("company_name"), s("urn"), s("text"), s("url"), ts("posted_at_iso"),
    l("posted_at_ts"), s("author_name"), s("author_profile_id"),
    s("author_headline"), s("image"), i("total_reactions"), i("like_count"),
    i("support"), i("love"), i("insight"), i("celebrate"), i("comments_count"),
    i("reposts"), s("type"), ts("fetched_at")))

  /** Sink name → (schema, conflict key) — SURVEY.md §2.5 K1-K8. */
  val sinks: Map[String, (StructType, Seq[String])] = Map(
    "twitter_mentions"    -> (twitterMentions, Seq("tweet_id")),
    "instagram_mentions"  -> (instagramMentions, Seq("post_id")),
    "trustpilot_reviews"  -> (trustpilotReviews, Seq("company_name", "author_name", "review_title", "review_date")),
    "feefo_reviews"       -> (feefoReviews, Seq("company_name", "feefo_business_info", "customer_name", "service_review", "review_date")),
    "google_maps_reviews" -> (googleMapsReviews, Seq("place_url", "reviewer_name", "reviewUrl")),
    "reddit_posts"        -> (redditPosts, Seq("company_name", "post_url", "review_date")),
    "facebook_posts"      -> (facebookPosts, Seq("post_id")),
    "linkedin_posts"      -> (linkedinPosts, Seq("company_name", "urn")))

  // ---- raw payload schemas (schema-on-read, FIXTURES.md §2) ----

  /** Apify search actor item (scrapers/twitter_scraper.py:65-94). */
  private val videoInfo = StructType(Seq(
    StructField("variants", ArrayType(StructType(Seq(s("url")))))))
  private val extMedia = StructType(Seq(
    s("type"), StructField("videoInfo", videoInfo)))
  val twitterRaw: StructType = StructType(Seq(
    s("id"), s("url"), s("text"), s("createdAt"),
    i("retweetCount"), i("replyCount"), i("likeCount"), i("viewCount"),
    StructField("author", StructType(Seq(s("name")))),
    StructField("media", ArrayType(StructType(Seq(s("expanded_url"))))),
    StructField("extendedEntities", StructType(Seq(
      StructField("media", ArrayType(extMedia)))))))

  /** twitter-scraper-lite item (scrapers/twitter2_scraper.py:49-64). */
  val twitter2Raw: StructType = StructType(Seq(
    s("id"), s("url"), s("text"), s("createdAt"),
    i("retweetCount"), i("replyCount"), i("likeCount"), i("viewCount"),
    StructField("author", StructType(Seq(s("name"))))))

  /** snscrape tweet (scrapers/twitter3_scraper.py:42-55); source-ordered
    * newest→oldest.
    */
  val twitter3Raw: StructType = StructType(Seq(
    l("id"), s("content"), ts("date"), s("url"),
    StructField("user", StructType(Seq(s("username")))),
    i("replyCount"), i("retweetCount"), i("likeCount"), i("viewCount")))

  /** Instagram hashtag-search entry: may carry topPosts/latestPosts arrays,
    * a flat items array, be a post itself, or be an error marker
    * (scrapers/instagram_scraper.py:78-112).
    */
  val instagramPost: StructType = StructType(Seq(
    s("id"), s("shortCode"), s("caption"), s("description"),
    s("ownerUsername"), s("username"), s("timestamp"), s("publishedAt"),
    i("likesCount"), i("like_count"), i("commentsCount"), i("comment_count"),
    // the reference reads `images` (a string, default "") and the
    // videoUrl/video_url alias pair (instagram_scraper.py:107-109)
    s("images"), s("videoUrl"), s("video_url")))
  val instagramRaw: StructType = StructType(Seq(
    StructField("error", StringType),
    StructField("topPosts", ArrayType(instagramPost)),
    StructField("latestPosts", ArrayType(instagramPost)),
    StructField("items", ArrayType(instagramPost))) ++ instagramPost.fields)

  /** Trustpilot review card, post-HTML-extraction (the CSS pulls at
    * scrapers/trustpilot_scraper.py:56-91 happen in the connector; rating
    * alt-text and date string are parsed in Spark).
    */
  val trustpilotRaw: StructType = StructType(Seq(
    s("author_name"), s("rating_alt"), s("review_title"), s("review_body"),
    s("review_date_str"), i("page_num")))

  /** Feefo feedback block, post-HTML-extraction
    * (scrapers/feefo_scraper.py:46-71).
    */
  val feefoRaw: StructType = StructType(Seq(
    s("customer_name"), s("purchase_date_str"), s("service_review"),
    s("product_review"), s("customer_location"), i("page_num")))

  /** Google Maps review item (scrapers/google_maps_scraper.py:68-78). */
  val googleMapsRaw: StructType = StructType(Seq(
    s("name"), d("stars"), s("text"), s("reviewDate"), s("reviewUrl"),
    s("ownerResponse")))

  /** Reddit search.json listing page (scrapers/reddit_scraper.py:48-99). */
  val redditPost: StructType = StructType(Seq(
    s("permalink"), s("title"), s("author"), i("score"), i("num_comments"),
    // the live API serializes created_utc as a FLOAT (1714550400.0); a
    // Long field would null the whole record under PERMISSIVE parsing
    d("created_utc"), s("selftext"),
    StructField("preview", StructType(Seq(
      StructField("images", ArrayType(StructType(Seq(
        StructField("source", StructType(Seq(s("url")))))))))))))
  val redditRaw: StructType = StructType(Seq(
    StructField("data", StructType(Seq(
      s("after"),
      StructField("children", ArrayType(StructType(Seq(
        StructField("data", redditPost))))))))))

  /** Facebook page post (scrapers/facebook_scraper.py:80-115). */
  val facebookRaw: StructType = StructType(Seq(
    s("postFacebookId"), s("postId"), s("text"), s("time"),
    i("likes"), i("comments"), i("shares"), s("url"),
    StructField("textReferences", ArrayType(StructType(Seq(
      s("short_name"), s("shortname"))))),
    StructField("media", ArrayType(StructType(Seq(
      StructField("photo_image", StructType(Seq(s("url")))),
      StructField("image", StructType(Seq(s("uri"), s("url"))))))))))

  /** LinkedIn profile post (scrapers/linkedin_scraper.py:65-109). */
  val linkedinRaw: StructType = StructType(Seq(
    s("urn"), s("full_urn"), s("text"), s("url"),
    StructField("posted_at", StructType(Seq(s("date"), l("timestamp")))),
    StructField("author", StructType(Seq(
      s("first_name"), s("last_name"), s("username"), s("headline")))),
    StructField("media", StructType(Seq(s("url")))),
    StructField("stats", StructType(Seq(
      i("total_reactions"), i("like"), i("support"), i("love"), i("insight"),
      i("celebrate"), i("comments"), i("reposts")))),
    s("post_type")))
}
