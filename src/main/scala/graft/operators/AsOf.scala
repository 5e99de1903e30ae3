package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the single most recent right
  * row with the same key whose time is at-or-before the left row's time
  * (pandas `merge_asof` / DuckDB `ASOF JOIN` semantics; unmatched left
  * rows survive with nulls, i.e. the LEFT variant).
  *
  * Spark has no native as-of join, and the naive encodings both break at
  * scale: an inequality theta-join plans as a range join whose candidate
  * set explodes quadratically per key, and a per-key `collect_list` sort
  * caps at executor memory. This composition instead tags both sides,
  * unions them, and runs ONE window per key ordered by
  * (time, side, tie-break): `last(right_payload, ignoreNulls)` over
  * rows-unbounded-preceding carries the latest right row forward into
  * each left row. Cost = one shuffle on the key + one sort per partition
  * — the same plan shape Spark gives any window aggregate, so it
  * inherits AQE skew handling and spills instead of exploding. At 100 TB
  * the sort is per-key-group and streaming; nothing is ever materialized
  * per key.
  *
  * Ordering conventions (both mirrored in the DuckDB oracle):
  *   - right rows sort BEFORE left rows at equal time (`side` 0 < 1), so
  *     a right row at exactly the left row's time matches (`>=`, DuckDB
  *     ASOF default);
  *   - among right rows with equal (key, time), `tieBreak` columns order
  *     them and the LAST one wins (e.g. max event_id) — making the join
  *     deterministic without a separate dedup shuffle;
  *   - null times never match (DuckDB ASOF / pandas merge_asof drop
  *     them): null-time RIGHT rows are filtered before the window —
  *     ascending sort would otherwise put them FIRST and carry one
  *     forward into every left row — and a null-time LEFT row sorts
  *     before all right rows of its key, so it survives unmatched.
  */
object AsOf {

  /** @param key        equality join key columns (present on both sides)
    * @param leftTime   left ordering column (any orderable type;
    *                   `nearest` needs a timestamp — distances are
    *                   microsecond differences)
    * @param rightTime  right ordering column (same type as leftTime)
    * @param tieBreak   right-side columns breaking equal-(key, time) ties;
    *                   the greatest tuple wins for `backward`, the
    *                   smallest for `forward` (each direction prefers its
    *                   nearest-in-sort-order row — mirror-symmetric)
    * @param tolerance  optional predicate (leftTime, rightTime) => Column;
    *                   a matched right row failing it is nulled out (e.g.
    *                   attribution windows: match only within 7 days)
    * @param direction  pandas merge_asof directions: `backward` (latest
    *                   right at-or-before, the default), `forward`
    *                   (earliest right at-or-after), `nearest` (whichever
    *                   of the two is closer in |Δt|; ties prefer the
    *                   backward match). All three ride the same plan:
    *                   one shuffle on the key — `nearest` adds a second
    *                   per-partition sort, never a second Exchange.
    * @return all left columns, then all non-key right columns (null when
    *         no right row qualifies). Non-key column names must not
    *         collide across sides.
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      key: Seq[String],
      leftTime: String,
      rightTime: String,
      tieBreak: Seq[String] = Nil,
      tolerance: Option[(Column, Column) => Column] = None,
      direction: String = "backward"): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"joinAsOf: direction must be backward|forward|nearest, got $direction")
    val lCols = left.columns.toSeq
    val rPayload = right.columns.toSeq.filterNot(key.contains)
    val overlap = lCols.intersect(rPayload)
    require(overlap.isEmpty,
      s"joinAsOf: non-key columns must be disjoint, both sides have: ${overlap.mkString(", ")}")
    require(rPayload.contains(rightTime), s"joinAsOf: right side lacks time column $rightTime")

    val tbCols = tieBreak.zipWithIndex.map { case (_, i) => s"__tb$i" }
    val r = right.filter(col(rightTime).isNotNull).select(
      key.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"),
        struct(rPayload.map(col): _*).as("__r"), lit(null).cast("binary").as("__l")) ++
        tieBreak.zip(tbCols).map { case (c, a) => col(c).as(a) }: _*)
    // unionByName needs identical schemas: __r's struct type comes from the
    // right projection, so build the left rows by selecting FROM the union
    // schema instead — cheapest is union on the right's schema with typed
    // nulls. Spark types lit(null) as NULL which unionByName widens, but a
    // window over a NULL-typed struct field breaks — so cast explicitly.
    val lTyped = left.select(
      key.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(r.schema("__r").dataType).as("__r"),
        struct(lCols.map(col): _*).as("__l")) ++
        tbCols.zip(tieBreak).map { case (a, c) =>
          lit(null).cast(r.schema(a).dataType).as(a)
        }: _*)
    val rTyped = r.withColumn("__l", lit(null).cast(lTyped.schema("__l").dataType))

    // Both directions partition on the key, so even `nearest` — which
    // evaluates both windows — plans ONE Exchange (the second window
    // only adds a per-partition re-sort). Backward sorts right rows
    // (side 0) BEFORE left at equal time and carries the last right
    // payload forward; forward reverses the side order (left first at
    // equal time, so an exactly-simultaneous right row is still ahead
    // of the frame start) and carries the first right payload backward.
    val part = Window.partitionBy(key.map(col): _*)
    val wB = part.orderBy(col("__t") +: col("__side") +: tbCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = part.orderBy(col("__t") +: col("__side").desc +: tbCols.map(col): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val unioned = rTyped.unionByName(lTyped)
    val matched = (direction match {
      case "backward" =>
        unioned.withColumn("__m", last(col("__r"), ignoreNulls = true).over(wB))
      case "forward" =>
        // ascending sort puts null left times FIRST, where the following
        // frame holds real right rows — a null time must never match, so
        // gate explicitly (backward gets this for free: nothing precedes)
        unioned.withColumn("__m",
          when(col("__t").isNotNull,
            first(col("__r"), ignoreNulls = true).over(wF)))
      case "nearest" =>
        val b = last(col("__r"), ignoreNulls = true).over(wB)
        val f = when(col("__t").isNotNull,
          first(col("__r"), ignoreNulls = true).over(wF))
        val distB = unix_micros(col("__t")) - unix_micros(col("__b").getField(rightTime))
        val distF = unix_micros(col("__f").getField(rightTime)) - unix_micros(col("__t"))
        unioned.withColumn("__b", b).withColumn("__f", f)
          .withColumn("__m",
            when(col("__b").isNotNull && (col("__f").isNull || distB <= distF),
              col("__b")).otherwise(col("__f")))
    }).filter(col("__side") === 1)
    val gated = tolerance match {
      case Some(p) =>
        matched.withColumn("__m",
          when(col("__m").isNotNull && p(col("__t"), col("__m").getField(rightTime)),
            col("__m")))
      case None => matched
    }
    gated.select(
      lCols.map(n => col("__l").getField(n).as(n)) ++
        rPayload.map(n => col("__m").getField(n).as(n)): _*)
  }
}
