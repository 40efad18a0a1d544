package graft.proc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Scan

/** Keyed as-of join — the kdb `aj` / pandas `merge_asof` operator: every
  * left row is paired with the LAST right row of the same key whose time is
  * at-or-before the left row's ("backward"; "forward" pairs the FIRST
  * at-or-after), optionally within a tolerance. Spark has no native as-of
  * join; the naive encodings are a non-equi range join (quadratic per key)
  * or a per-key window over a union (one task per key — dies on a hot key).
  *
  * Scale shape: both sides union into one stream ordered by
  * (key…, time, side) and the match is a DISTRIBUTED as-of carry
  * (`Scan.fillForward`): range-partitioned on the ordering, partition-local
  * window, boundary values stitched through a summary-sized broadcast — so
  * ONE key spanning a billion rows still spans many parallel tasks. The
  * carried payload embeds its key and is masked when it crosses a key
  * boundary, which is what makes the single global ordering safe.
  *
  * Times may be numeric or timestamps (both sides the same type); they
  * order and subtract through their double cast (timestamps: seconds, with
  * microsecond precision exact in 53 bits), so `tolerance` is in seconds
  * for timestamps and in index units otherwise. Right rows at the exact
  * left instant match in both directions (merge_asof semantics). Output:
  * every left column, then every non-key right column, `suffix`-renamed on
  * collision with a left name; unmatched left rows keep nulls.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTime: String, rightTime: String,
               direction: String = "backward",
               tolerance: Option[Double] = None,
               suffix: String = "_r"): DataFrame = {
    require(keyCols.nonEmpty, "as-of join needs at least one key column")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(tolerance.forall(_ >= 0), "tolerance must be >= 0")
    val sign = if (direction == "backward") lit(1.0) else lit(-1.0)

    val rValCols = right.columns.filterNot(keyCols.contains).toSeq
    // __t/__side/__lp/__rp/__fv are the union stream's top-level helpers,
    // so KEY columns (which stay top-level) must avoid the whole set; right
    // VALUE columns only ever live as fields inside the __rp carry struct,
    // so they clash solely with its __k/__t0 sibling fields — a right value
    // named e.g. "__t" is legal
    val reservedTop = Set("__k", "__t0", "__t", "__side", "__lp", "__rp", "__fv")
    val reservedCarry = Set("__k", "__t0")
    val clashes = (keyCols.filter(reservedTop) ++
      rValCols.filter(reservedCarry)).distinct
    require(clashes.isEmpty,
      s"column name(s) ${clashes.mkString(", ")} are reserved by the as-of carry")
    // the carried struct embeds its own key and signed time so a carry that
    // crossed a key boundary (or exceeds tolerance) can be rejected
    val rCarry = struct(
      struct(keyCols.map(col): _*).as("__k") +:
      (col(rightTime).cast("double") * sign).as("__t0") +:
      rValCols.map(col): _*)
    val rCarryType = right.select(rCarry.as("__rp")).schema("__rp").dataType
    val lPay = struct(left.columns.map(col): _*)
    val lPayType = left.select(lPay.as("__lp")).schema("__lp").dataType

    val rU = right.select(
      keyCols.map(col) ++ Seq(
        (col(rightTime).cast("double") * sign).as("__t"),
        lit(0).as("__side"),
        lit(null).cast(lPayType).as("__lp"),
        rCarry.as("__rp")): _*)
    val lU = left.select(
      keyCols.map(col) ++ Seq(
        (col(leftTime).cast("double") * sign).as("__t"),
        lit(1).as("__side"),
        lPay.as("__lp"),
        lit(null).cast(rCarryType).as("__rp")): _*)

    val filled = Scan.fillForward(rU.unionByName(lU),
      keyCols ++ Seq("__t", "__side"), "__rp", "__fv")

    val sameKey = col("__fv").getField("__k") === struct(keyCols.map(col): _*)
    val inTol = tolerance
      .map(t => col("__t") - col("__fv").getField("__t0") <= lit(t))
      .getOrElse(lit(true))
    val matched = when(col("__fv").isNotNull && sameKey && inTol, col("__fv"))

    val leftNames = left.columns.toSet
    val outLeft = left.columns.toSeq.map(c => col("__lp").getField(c).as(c))
    val outRight = rValCols.map { c =>
      val name = if (leftNames.contains(c)) s"$c$suffix" else c
      matched.getField(c).as(name)
    }
    filled.where(col("__side") === 1).select(outLeft ++ outRight: _*)
  }
}
