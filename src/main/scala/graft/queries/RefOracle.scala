package graft.queries

/** DuckDB oracle SQL for every query in [[RefQueries]] — runs on the SAME
  * parquet fixture tables (driver registers them by name). The `model`
  * CTE below must stay in exact lock-step with
  * [[graft.model.RedditModel]] / [[graft.transform.Enrich]].
  *
  * Cross-dialect parity rules (discovered empirically, keep!):
  *  - DuckDB `SUM(int)` is HUGEINT → always `CAST(... AS BIGINT)`;
  *  - DuckDB decimal literals are DECIMAL, not DOUBLE → pin `::DOUBLE`;
  *  - DuckDB allows lateral column-alias references → qualify base-table
  *    columns inside the enrichment SELECT (`posts_raw.title`);
  *  - DuckDB `regexp_replace` needs the 'g' flag (Spark replaces all);
  *  - weekday: Spark `weekday()` = Monday 0; DuckDB `isodow()` = Monday 1;
  *  - epoch millis: Spark `unix_millis` ↔ DuckDB `epoch_ms`;
  *  - every float output rounded to 6 on both sides; total ORDER BY.
  */
object RefOracle {

  /** Shared Reddit-model CTE (posts from orders, comments from lineitem). */
  lazy val modelCte: String = """WITH posts_raw AS (
  SELECT
    o_orderkey AS id,
    CASE CAST(o_orderkey % 4 AS INTEGER)
      WHEN 0 THEN 'Breaking: order ' || o_orderkey || ' just dropped!!!'
      WHEN 1 THEN 'Is order ' || o_orderkey || ' worth it?'
      WHEN 2 THEN 'ORDER ' || o_orderkey || ' MEGATHREAD'
      ELSE 'quiet little update #' || o_orderkey END AS title,
    CASE WHEN o_custkey % 13 = 0 THEN '[deleted]'
         ELSE 'user_' || (o_custkey % 101) END AS author,
    o_orderpriority AS subreddit,
    CAST((o_orderkey % 2000) * 2 - 200 AS INTEGER) AS score,
    CAST(0.5 AS DOUBLE) + (o_orderkey % 50) / CAST(100.0 AS DOUBLE) AS upvote_ratio,
    CAST(o_orderkey % 45 AS INTEGER) AS num_comments,
    o_orderdate + (o_orderkey % 24) * INTERVAL 1 HOUR AS created_utc,
    CASE WHEN o_orderkey % 3 = 0 THEN NULL
         ELSE 'self text body for order ' || o_orderkey || ' priority ' || o_orderpriority
    END AS selftext,
    'https://example.com/o/' || o_orderkey AS url,
    (o_orderkey % 7 = 0) AS is_video,
    (o_orderkey % 5 = 0) AS is_original_content,
    (o_orderkey % 11 = 0) AS over_18,
    (o_orderkey % 17 = 0) AS stickied,
    (o_orderkey % 19 = 0) AS locked
  FROM orders
), posts AS (
  SELECT
    posts_raw.id,
    -- RE2's \w here is ASCII-only; the Spark side uses (?U)\w (the
    -- correct Python-parity semantics). They agree because fixture
    -- titles are ASCII by construction — EnrichSpec pins that
    -- invariant (see Enrich.cleanTitle's ORACLE SEAM note).
    trim(regexp_replace(posts_raw.title, '[^\w\s]', '', 'g')) AS title,
    posts_raw.author,
    posts_raw.subreddit,
    posts_raw.score,
    posts_raw.upvote_ratio,
    posts_raw.num_comments,
    posts_raw.created_utc,
    COALESCE(posts_raw.selftext, '') AS selftext,
    posts_raw.url,
    posts_raw.is_video, posts_raw.is_original_content, posts_raw.over_18,
    posts_raw.stickied, posts_raw.locked,
    CAST(length(posts_raw.title) AS INTEGER) AS title_length,
    CAST(length(posts_raw.selftext) AS INTEGER) AS selftext_length,
    COALESCE(length(posts_raw.selftext) > 0, FALSE) AS has_selftext,
    CAST(hour(posts_raw.created_utc) AS INTEGER) AS hour_posted,
    CAST(isodow(posts_raw.created_utc) - 1 AS INTEGER) AS day_of_week,
    posts_raw.num_comments / (posts_raw.score + CAST(1.0 AS DOUBLE)) AS engagement_rate,
    CASE WHEN posts_raw.score <= 0 THEN 'Negative'
         WHEN posts_raw.score <= 10 THEN 'Low'
         WHEN posts_raw.score <= 100 THEN 'Medium'
         WHEN posts_raw.score <= 1000 THEN 'High'
         ELSE 'Viral' END AS score_category
  FROM posts_raw
), comments AS (
  SELECT
    l_orderkey * 10 + l_linenumber AS id,
    l_orderkey AS post_id,
    CASE WHEN l_suppkey % 13 = 0 THEN '[deleted]'
         ELSE 'c_user_' || (l_suppkey % 211) END AS author,
    'reply about part ' || l_partkey ||
      CASE WHEN l_linenumber % 2 = 0 THEN ' (nice!)' ELSE '' END AS body,
    CAST((l_suppkey % 120) - 20 AS INTEGER) AS score,
    l_shipdate AS created_utc,
    l_orderkey AS parent_id,
    (l_linenumber = 1) AS is_submitter
  FROM lineitem WHERE l_partkey % 4 <> 0
)
"""

  private def avgI(x: String): String =
    s"(round(CAST(SUM($x) AS DOUBLE) / COUNT($x), 6) + 0.0)"

  val q01: String = modelCte + """
SELECT subreddit,
  COUNT(*) AS total_posts,
  (round(CAST(SUM(score) AS DOUBLE) / COUNT(score), 6) + 0.0) AS avg_score,
  (round(CAST(SUM(num_comments) AS DOUBLE) / COUNT(num_comments), 6) + 0.0) AS avg_comments,
  MAX(score) AS highest_score,
  MIN(score) AS lowest_score
FROM posts GROUP BY subreddit
ORDER BY total_posts DESC, subreddit"""

  val q02: String = modelCte + """
SELECT p.subreddit, p.title, p.author, p.score, p.num_comments,
  p.upvote_ratio, epoch_ms(p.created_utc) AS created_ms, p.id
FROM posts p
JOIN (SELECT subreddit, MAX(score) AS max_score FROM posts GROUP BY subreddit) m
  ON p.subreddit = m.subreddit AND p.score = m.max_score
ORDER BY p.score DESC, p.id"""

  val q03: String = modelCte + s"""
SELECT hour_posted,
  COUNT(*) AS post_count,
  ${avgI("score")} AS avg_score,
  ${avgI("num_comments")} AS avg_comments
FROM posts GROUP BY hour_posted ORDER BY hour_posted"""

  val q04: String = modelCte + s"""
SELECT day_of_week,
  CASE day_of_week
    WHEN 0 THEN 'Monday' WHEN 1 THEN 'Tuesday' WHEN 2 THEN 'Wednesday'
    WHEN 3 THEN 'Thursday' WHEN 4 THEN 'Friday' WHEN 5 THEN 'Saturday'
    WHEN 6 THEN 'Sunday' END AS day_name,
  COUNT(*) AS post_count,
  ${avgI("score")} AS avg_score
FROM posts GROUP BY day_of_week ORDER BY day_of_week"""

  val q05: String = modelCte + s"""
SELECT author,
  COUNT(*) AS post_count,
  ${avgI("score")} AS avg_score,
  CAST(SUM(num_comments) AS BIGINT) AS total_comments_received
FROM posts WHERE author <> '[deleted]'
GROUP BY author HAVING COUNT(*) > 1
ORDER BY post_count DESC, avg_score DESC, author LIMIT 20"""

  val q06: String = modelCte + """
SELECT subreddit,
  CAST(SUM(CASE WHEN is_video THEN 1 ELSE 0 END) AS BIGINT) AS video_posts,
  CAST(SUM(CASE WHEN has_selftext THEN 1 ELSE 0 END) AS BIGINT) AS text_posts,
  CAST(SUM(CASE WHEN is_original_content THEN 1 ELSE 0 END) AS BIGINT) AS oc_posts,
  CAST(SUM(CASE WHEN over_18 THEN 1 ELSE 0 END) AS BIGINT) AS nsfw_posts,
  COUNT(*) AS total_posts
FROM posts GROUP BY subreddit ORDER BY subreddit"""

  val q07: String = modelCte + """
SELECT subreddit, score_category,
  COUNT(*) AS post_count,
  (round(AVG(engagement_rate), 6) + 0.0) AS avg_engagement_rate,
  (round(CAST(SUM(CAST(round(upvote_ratio * 100) AS BIGINT)) AS DOUBLE)
    / 100.0 / COUNT(upvote_ratio), 6) + 0.0) AS avg_upvote_ratio
FROM posts GROUP BY subreddit, score_category
ORDER BY subreddit, score_category"""

  val q08: String = modelCte + """
SELECT p.subreddit,
  COUNT(c.id) AS total_comments,
  (round(CAST(SUM(c.score) AS DOUBLE) / COUNT(c.score), 6) + 0.0) AS avg_comment_score,
  COUNT(DISTINCT c.author) AS unique_commenters
FROM posts p LEFT JOIN comments c ON p.id = c.post_id
GROUP BY p.subreddit ORDER BY p.subreddit"""

  val q09: String = modelCte + """
SELECT p.subreddit, c.author,
  COUNT(c.id) AS comment_count,
  (round(CAST(SUM(c.score) AS DOUBLE) / COUNT(c.score), 6) + 0.0) AS avg_comment_score
FROM posts p JOIN comments c ON p.id = c.post_id
WHERE c.author <> '[deleted]'
GROUP BY p.subreddit, c.author
HAVING COUNT(c.id) >= 3
ORDER BY p.subreddit, comment_count DESC, c.author"""

  val q10: String = modelCte + s"""
SELECT CAST(CAST(created_utc AS DATE) AS VARCHAR) AS date, subreddit,
  COUNT(*) AS daily_posts,
  ${avgI("score")} AS avg_daily_score,
  MAX(score) AS max_daily_score
FROM posts GROUP BY CAST(created_utc AS DATE), subreddit
ORDER BY date DESC, subreddit"""

  val q11: String = modelCte + s"""
SELECT subreddit,
  ${avgI("title_length")} AS avg_title_length,
  (round(CAST(SUM(CASE WHEN title LIKE '%?%' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) + 0.0) AS question_rate,
  (round(CAST(SUM(CASE WHEN upper(title) = title THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) + 0.0) AS all_caps_rate
FROM posts GROUP BY subreddit ORDER BY subreddit"""

  /** Pearson corr from exact integer moments — MUST mirror
    * RefQueries.corrI (pairwise deletion via the CASE'd y).
    */
  private def corrISql(xc: String): String = {
    val x = s"CAST($xc AS BIGINT)"
    val y = s"CAST(CASE WHEN $xc IS NOT NULL THEN score END AS BIGINT)"
    val n = s"COUNT($x)"
    val num = s"CAST($n * SUM($x * $y) - SUM($x) * SUM($y) AS DOUBLE)"
    val den = s"""sqrt(CAST($n * SUM($x * $x) - SUM($x) * SUM($x) AS DOUBLE)
      * CAST($n * SUM($y * $y) - SUM($y) * SUM($y) AS DOUBLE))"""
    s"(round($num / $den, 6) + 0.0)"
  }

  val q12: String = modelCte + s"""
SELECT subreddit,
  ${corrISql("title_length")} AS title_length_score_corr,
  ${corrISql("selftext_length")} AS selftext_length_score_corr,
  ${corrISql("hour_posted")} AS hour_score_corr
FROM posts WHERE score > 0
GROUP BY subreddit ORDER BY subreddit"""

  val q13: String = modelCte + s"""
SELECT subreddit,
  COUNT(*) AS posts_this_week,
  ${avgI("score")} AS avg_score,
  CASE WHEN COUNT(*) >= 2 THEN (round(sqrt(
    CAST(COUNT(score) * SUM(CAST(score AS BIGINT) * score)
      - SUM(CAST(score AS BIGINT)) * SUM(CAST(score AS BIGINT)) AS DOUBLE)
    / CAST(COUNT(score) * (COUNT(score) - 1) AS DOUBLE)), 6) + 0.0)
  END AS score_std_dev,
  ${avgI("num_comments")} AS avg_comments,
  COUNT(DISTINCT author) AS unique_authors
FROM posts
WHERE created_utc >= TIMESTAMP '${RefQueries.weeklyFrom}'
  AND created_utc < TIMESTAMP '${RefQueries.weeklyAsOf}'
GROUP BY subreddit ORDER BY avg_score DESC, subreddit"""

  val q14: String = modelCte + """
SELECT subreddit,
  (round(CAST(SUM(CASE WHEN is_original_content THEN score END) AS DOUBLE)
    / COUNT(CASE WHEN is_original_content THEN score END), 6) + 0.0) AS avg_oc_score,
  (round(CAST(SUM(CASE WHEN NOT is_original_content THEN score END) AS DOUBLE)
    / COUNT(CASE WHEN NOT is_original_content THEN score END), 6) + 0.0) AS avg_non_oc_score,
  (round(CAST(SUM(CAST(is_original_content AS INTEGER)) AS DOUBLE)
    * CAST(100.0 AS DOUBLE) / COUNT(*), 6) + 0.0) AS oc_percentage
FROM posts GROUP BY subreddit ORDER BY subreddit"""

  val q15: String = modelCte + """
SELECT id, subreddit, score,
  CASE WHEN score >= 1000 THEN 'Viral' WHEN score >= 100 THEN 'Popular'
       WHEN score >= 10 THEN 'Good' ELSE 'Low' END AS performance_tier,
  CAST(rank() OVER (PARTITION BY subreddit ORDER BY score DESC) AS INTEGER)
    AS rank_in_subreddit
FROM posts ORDER BY subreddit, rank_in_subreddit, id"""

  /** Q16 thread-depth oracle: the SAME derived edge set, depths via a
    * recursive CTE (the engine-native dual of the iterative frontier
    * climb). `modelCte` is shared verbatim — only the WITH keyword
    * gains RECURSIVE.
    */
  val q16: String =
    modelCte.replace("WITH posts_raw", "WITH RECURSIVE posts_raw") + """
, surv AS (
  SELECT id, post_id, score,
    CAST(row_number() OVER (PARTITION BY post_id ORDER BY id, score)
      AS INTEGER) AS pos
  FROM comments
), edge AS (
  SELECT post_id, pos AS child_pos,
    ((((score + 20) % (pos - 1)) + (pos - 1)) % (pos - 1)) + 1
      AS parent_pos
  FROM surv WHERE pos > 1
), climb(post_id, pos, depth) AS (
  SELECT post_id, pos, 1 FROM surv WHERE pos = 1
  UNION ALL
  SELECT e.post_id, e.child_pos, climb.depth + 1
  FROM climb JOIN edge e
    ON e.post_id = climb.post_id AND e.parent_pos = climb.pos
), wd AS (
  SELECT s.post_id, s.id, s.pos, c.depth
  FROM surv s JOIN climb c ON c.post_id = s.post_id AND c.pos = s.pos
), agg1 AS (
  SELECT post_id, COUNT(*) AS n_comments, MAX(depth) AS max_depth
  FROM wd GROUP BY post_id
), dp AS (
  SELECT w.post_id, MIN(w.id) AS deepest_id
  FROM wd w JOIN agg1 a ON a.post_id = w.post_id AND w.depth = a.max_depth
  GROUP BY w.post_id
), lv AS (
  SELECT w.post_id, COUNT(*) AS n_leaves FROM wd w
  WHERE NOT EXISTS (SELECT 1 FROM edge e
    WHERE e.post_id = w.post_id AND e.parent_pos = w.pos)
  GROUP BY w.post_id
)
SELECT a.post_id, a.n_comments, a.max_depth, l.n_leaves, d.deepest_id
FROM agg1 a
JOIN dp d ON d.post_id = a.post_id
JOIN lv l ON l.post_id = a.post_id
ORDER BY a.post_id"""

  val statsDaily: String = modelCte + s"""
SELECT subreddit, CAST(CAST(created_utc AS DATE) AS VARCHAR) AS date,
  COUNT(*) AS total_posts,
  ${avgI("score")} AS avg_score,
  ${avgI("num_comments")} AS avg_comments,
  MAX(score) AS top_post_score
FROM posts
WHERE created_utc >= TIMESTAMP '${RefQueries.statsFrom}'
  AND created_utc < TIMESTAMP '${RefQueries.statsTo}'
GROUP BY subreddit, CAST(created_utc AS DATE)
ORDER BY subreddit, date"""

  val transformPosts: String = modelCte + """
SELECT id, title, selftext, author, subreddit, score, num_comments,
  title_length, selftext_length, has_selftext, hour_posted, day_of_week,
  (round(engagement_rate, 6) + 0.0) AS engagement_rate, score_category,
  (round(upvote_ratio, 6) + 0.0) AS upvote_ratio,
  epoch_ms(created_utc) AS created_ms,
  is_video, is_original_content, over_18, stickied, locked
FROM posts ORDER BY id"""
}
