package graft.proc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Scan

/** Keyed as-of join — the kdb `aj` / pandas `merge_asof` operator: every
  * left row is paired with the LAST right row of the same key whose time is
  * at-or-before the left row's ("backward"; "forward" pairs the FIRST
  * at-or-after; "nearest" takes whichever of the two is closer, ties to
  * backward — the pandas rule), optionally within a tolerance, optionally
  * excluding exact-instant matches (`allowExactMatches = false`, pandas
  * `allow_exact_matches`). Spark has no native as-of join; the naive
  * encodings are a non-equi range join (quadratic per key) or a per-key
  * window over a union (one task per key — dies on a hot key).
  *
  * Scale shape: both sides union into one stream ordered by
  * (key…, time, side) and the match is a DISTRIBUTED as-of carry
  * (`Scan.fillForward`): range-partitioned on the ordering, partition-local
  * window, boundary values stitched through a summary-sized broadcast — so
  * ONE key spanning a billion rows still spans many parallel tasks. The
  * carried payload embeds its key and is masked when it crosses a key
  * boundary, which is what makes the single global ordering safe.
  * "nearest" composes one backward and one forward carry — two range
  * exchanges instead of one; still no per-key task anywhere.
  *
  * Times may be numeric or timestamps (both sides the same type); they
  * order and subtract through their double cast (timestamps: seconds, with
  * microsecond precision exact in 53 bits), so `tolerance` is in seconds
  * for timestamps and in index units otherwise. Right rows at the exact
  * left instant match in both directions unless `allowExactMatches` is
  * false (then backward is strictly-before, forward strictly-after, and
  * nearest considers neither). Output: every left column, then every
  * non-key right column, `suffix`-renamed on collision with a left name;
  * unmatched left rows keep nulls.
  */
object AsofJoin {

  /** See the object scaladoc for semantics and the scale shape; oracles:
    * q82_asof_join (backward), q91_asof_nearest (nearest two-carry
    * composition vs DuckDB's two-sided ASOF emulation).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTime: String, rightTime: String,
               direction: String = "backward",
               tolerance: Option[Double] = None,
               suffix: String = "_r",
               allowExactMatches: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty, "as-of join needs at least one key column")
    require(Set("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    require(tolerance.forall(_ >= 0), "tolerance must be >= 0")
    val rValCols = right.columns.filterNot(keyCols.contains).toSeq
    // __t/__side/__lp/__rp/__fv are the union stream's top-level helpers,
    // so KEY columns (which stay top-level) must avoid the whole set; right
    // VALUE columns only ever live as fields inside the __rp carry struct,
    // so they clash solely with its __k/__t0 sibling fields — a right value
    // named e.g. "__t" is legal. The __asof_* columns are this object's
    // carry outputs attached to the LEFT frame between passes.
    val reservedTop = Set("__k", "__t0", "__t", "__side", "__lp", "__rp",
      "__fv", "__asof_b", "__asof_f")
    val reservedCarry = Set("__k", "__t0")
    val clashes = (keyCols.filter(reservedTop) ++
      rValCols.filter(reservedCarry) ++
      left.columns.filter(Set("__asof_b", "__asof_f"))).distinct
    require(clashes.isEmpty,
      s"column name(s) ${clashes.mkString(", ")} are reserved by the as-of carry")

    val leftNames = left.columns.toSet
    def outName(c: String) = if (leftNames.contains(c)) s"$c$suffix" else c
    // a suffixed name may collide with ANOTHER right column that needed no
    // suffix (right has both "x" and "x_r"): fail here with the pair named,
    // not later with an AMBIGUOUS_REFERENCE far from the join
    locally {
      val outs = rValCols.map(outName)
      val dups = outs.diff(outs.distinct).distinct
      require(dups.isEmpty,
        s"as-of join output name collision on ${dups.mkString(", ")} — " +
          "rename the right-side column(s) or choose a different suffix")
      // a SUFFIXED right name can also land on an existing LEFT column
      // (left has both "x" and "x_r", right has "x"): every left column is
      // projected into the output, so that too is a duplicate output column
      val leftDups = outs.filter(leftNames.contains).distinct
      require(leftDups.isEmpty,
        s"as-of join output name collision with left column(s) " +
          s"${leftDups.mkString(", ")} — rename the column(s) or choose " +
          "a different suffix")
    }

    def project(df: DataFrame, chosen: Column): DataFrame =
      df.select(left.columns.toSeq.map(col) ++
        rValCols.map(c => chosen.getField(c).as(outName(c))): _*)

    direction match {
      case "nearest" =>
        val b = carryMatch(left, right, keyCols, leftTime, rightTime,
          backward = true, tolerance, allowExactMatches, "__asof_b")
        val f = carryMatch(b, right, keyCols, leftTime, rightTime,
          backward = false, tolerance, allowExactMatches, "__asof_f")
        val lt = col(leftTime).cast("double")
        // __t0 is stored in SIGNED time (backward: +t, forward: −t), so
        // both deltas below are ≥ 0 for any candidate that survived the
        // carry mask
        val db = lt - col("__asof_b").getField("__t0")
        val df_ = -col("__asof_f").getField("__t0") - lt
        val chosen = when(col("__asof_b").isNull, col("__asof_f"))
          .when(col("__asof_f").isNull, col("__asof_b"))
          // tie → backward (pandas merge_asof nearest rule)
          .when(db <= df_, col("__asof_b"))
          .otherwise(col("__asof_f"))
        project(f, chosen)
      case d =>
        val m = carryMatch(left, right, keyCols, leftTime, rightTime,
          backward = d == "backward", tolerance, allowExactMatches, "__asof_b")
        project(m, col("__asof_b"))
    }
  }

  /** One directional carry pass: returns `left` plus `outCol`, a struct of
    * the matched right row's carry (fields __k, __t0 in signed time, then
    * every right value column) — null where no same-key right row within
    * tolerance (and strictness) exists. The heart of [[asofJoin]]; public
    * surface goes through there.
    */
  private def carryMatch(left: DataFrame, right: DataFrame,
                         keyCols: Seq[String], leftTime: String,
                         rightTime: String, backward: Boolean,
                         tolerance: Option[Double], allowExact: Boolean,
                         outCol: String): DataFrame = {
    val sign = if (backward) lit(1.0) else lit(-1.0)
    val rValCols = right.columns.filterNot(keyCols.contains).toSeq
    // the carried struct embeds its own key and signed time so a carry that
    // crossed a key boundary (or exceeds tolerance) can be rejected
    val rCarry = struct(
      struct(keyCols.map(col): _*).as("__k") +:
      (col(rightTime).cast("double") * sign).as("__t0") +:
      rValCols.map(col): _*)
    val rCarryType = right.select(rCarry.as("__rp")).schema("__rp").dataType
    val lPay = struct(left.columns.map(col): _*)
    val lPayType = left.select(lPay.as("__lp")).schema("__lp").dataType

    // with exact matches allowed, same-instant right rows sort BEFORE left
    // rows (side 0 < 1) and are carried into them; excluding exact matches
    // flips the side order so a left row only sees strictly-earlier rights
    val sideL = if (allowExact) 1 else 0
    val rU = right.select(
      keyCols.map(col) ++ Seq(
        (col(rightTime).cast("double") * sign).as("__t"),
        lit(1 - sideL).as("__side"),
        lit(null).cast(lPayType).as("__lp"),
        rCarry.as("__rp")): _*)
    val lU = left.select(
      keyCols.map(col) ++ Seq(
        (col(leftTime).cast("double") * sign).as("__t"),
        lit(sideL).as("__side"),
        lPay.as("__lp"),
        lit(null).cast(rCarryType).as("__rp")): _*)

    // Duplicate right timestamps on one key: the fill ordering must break
    // the (key, __t, __side) tie deterministically or the carried payload
    // is shuffle-arrival-dependent. Sorting by the carry struct itself
    // (struct ordering over signed time then the value columns) makes the
    // MAX payload win every run — deterministic-but-positional-free
    // (pandas merge_asof's "last occurrence" has no distributed analog).
    // Struct ordering requires orderable fields, so a right frame carrying
    // a MapType keeps the documented arbitrary-but-valid behavior.
    val rpOrderable = !rValCols.exists(c =>
      graft.core.Scan.containsMapType(right.schema(c).dataType))
    val tieOrder = if (rpOrderable) Seq("__rp") else Nil
    val filled = Scan.fillForward(rU.unionByName(lU),
      keyCols ++ Seq("__t", "__side") ++ tieOrder, "__rp", "__fv")

    val sameKey = col("__fv").getField("__k") === struct(keyCols.map(col): _*)
    val dt = col("__t") - col("__fv").getField("__t0")
    val strictOk = if (allowExact) lit(true) else dt > 0
    val inTol = tolerance.map(t => dt <= lit(t)).getOrElse(lit(true))
    val matched =
      when(col("__fv").isNotNull && sameKey && inTol && strictOk, col("__fv"))
    filled.where(col("__side") === sideL)
      .select(left.columns.toSeq.map(c => col("__lp").getField(c).as(c)) :+
        matched.as(outCol): _*)
  }
}
