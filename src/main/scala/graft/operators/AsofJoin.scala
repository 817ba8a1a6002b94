package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** As-of join: for each left row, the most recent right row of the
  * same key with rightTime <= leftTime — the canonical time-series
  * operator Spark has no built-in for (SURVEY §7.4 / builder brief).
  *
  * Implementation choice (b→a from the brief's preference order):
  * compose existing operators via the union + ordered-window trick —
  * tag both sides, union them, and carry the latest right row forward
  * with last(_, ignoreNulls) over a per-key ordered window. This is
  * ONE hash shuffle + per-partition sort, the same cost as a regular
  * sort-merge join; the naive alternative (theta-join on
  * `l.t >= r.t` then max-per-group) explodes to O(|L|·|R|) pairs per
  * key and a BroadcastNestedLoop — unusable at 100 TB.
  *
  * Tie semantics: a right row at exactly leftTime matches (>=), which
  * is why right rows sort BEFORE left rows at equal timestamps.
  */
object AsofJoin {

  /** Generic as-of join. `left`/`right` must share `keyCol`;
    * `leftTime`/`rightTime` must be mutually comparable. Right-side
    * payload columns are returned null when no right row precedes the
    * left row. */
  def asof(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTimeCol: String, rightTimeCol: String,
      rightPayload: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    // side marker: right rows first at equal times (>= semantics)
    val taggedLeft = left
      .withColumn("__t", col(leftTimeCol))
      .withColumn("__side", lit(1))
      .select((lCols.map(col) :+ col("__t") :+ col("__side")) ++
        rightPayload.map(c => lit(null).cast(
          right.schema(c).dataType).as(s"__r_$c")): _*)
    val taggedRight = right
      .withColumn("__t", col(rightTimeCol))
      .withColumn("__side", lit(0))
      .select((lCols.map(c =>
        if (c == keyCol) col(keyCol)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col("__t") :+ col("__side")) ++
        rightPayload.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedLeft.unionByName(taggedRight)
      .select((lCols.map(col) :+ col("__side")) ++
        rightPayload.map(c =>
          last(col(s"__r_$c"), ignoreNulls = true).over(w)
            .as(s"asof_$c")): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }

  /** Registered query: for each purchase event, the user's most
    * recent click at-or-before it. Clicks deduped to one per
    * (user, ts) — max event_id — so the as-of match is deterministic
    * and oracle-able against DuckDB's native ASOF JOIN. */
  def asofPurchaseClick(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = events.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
    asof(purchases, clicks,
      keyCol = "user_id", leftTimeCol = "ts", rightTimeCol = "ts",
      rightPayload = Seq("click_id"))
      .select(col("event_id"), col("user_id"), col("asof_click_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x1_asof_join" -> (asofPurchaseClick _)
  )

  val oracle: Map[String, String] = Map(
    "x1_asof_join" ->
      """WITH purchases AS (
        |  SELECT user_id, ts, event_id FROM events
        |  WHERE event_type = 'purchase'),
        |clicks AS (
        |  SELECT user_id, ts, max(event_id) AS click_id FROM events
        |  WHERE event_type = 'click' GROUP BY user_id, ts)
        |SELECT p.event_id, p.user_id, c.click_id AS asof_click_id
        |FROM purchases p
        |ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin
  )
}
