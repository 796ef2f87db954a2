package graft.jobs

import graft.format.ParquetStats
import graft.model.{DataFileEntry, FieldDef}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-file predicate proofs from manifest stats: can we show that
  * EVERY live row of a data file satisfies a DELETE predicate? If yes,
  * the file's manifest entry is simply dropped — a metadata-level
  * delete, the Iceberg "partition-scoped DELETE" fast path. Dropping a
  * whole date range / format class from a 10^12-row table then costs
  * O(touched manifests) instead of writing position deletes for every
  * row (let alone rewriting files).
  *
  * Soundness stance is the exact DUAL of scan pruning
  * ([[graft.format.QTableFileIndex]]): pruning may KEEP too much
  * (may-match is conservative-true), a whole-file delete may DROP too
  * little (all-match is conservative-false). Any predicate shape,
  * column kind, or stat gap this evaluator does not recognize returns
  * false and the file falls through to the ordinary position-delete
  * scan — never wrong, only less fast.
  *
  * The predicate must be ANALYZER-RESOLVED against the snapshot's
  * logical schema (DeleteJob resolves it through a zero-row probe
  * plan): attributes arrive as `AttributeReference`s — possibly under
  * the analyzer's widening casts, which are unwrapped when
  * order-preserving — and literal sides as foldable expressions,
  * evaluated here to constants.
  *
  * Three-valued logic is the trap the null-count harvest exists for: a
  * range proof like `min >= v  =>  all rows satisfy col >= v` holds
  * only when the file has NO nulls in `col` (a null row evaluates the
  * comparison to NULL, which WHERE does not keep — so a "fully
  * matching" file with one null row must NOT be dropped wholesale).
  * Every comparison proof therefore requires the file's exact recorded
  * null count ([[DataFileEntry.knownNullCount]]) to be zero.
  *
  * Exactness caveats mirror [[StatsAggregate]]: string stats at the
  * truncation bound remain usable as one-sided BOUNDS (truncated min is
  * a valid lower bound, bumped max a valid upper bound) but not for
  * equality; float/double columns are never proven (parquet stats are
  * NaN-blind while Spark orders NaN greatest, so neither bound is
  * trustworthy for universal claims).
  */
object StatsDelete {

  /** True iff the stats PROVE every live row of `e` satisfies the
    * resolved predicate `pred`. */
  def allMatch(pred: Expression, e: DataFileEntry,
      fields: Map[String, FieldDef]): Boolean = pred match {
    case And(l, r) => allMatch(l, e, fields) && allMatch(r, e, fields)
    // all rows satisfy (l OR r) if all satisfy l, or all satisfy r —
    // weaker than the true union but sound
    case Or(l, r) => allMatch(l, e, fields) || allMatch(r, e, fields)
    case Literal(true, BooleanType) => true
    case IsNotNull(a) => field(a, fields).exists(f => provenNonNull(e, f))
    case IsNull(a) => field(a, fields).exists(f =>
      e.knownNullCount(f.phys).contains(e.rowCount))
    case c: BinaryComparison => (field(c.left, fields), constOf(c.right),
        field(c.right, fields), constOf(c.left)) match {
      case (Some(f), Some(v), _, _) => prove(c, f, v, e, mirrored = false)
      case (_, _, Some(f), Some(v)) => prove(c, f, v, e, mirrored = true)
      case _ => false
    }
    // prefix proofs: if both file bounds start with P, every value in
    // [min, max] starts with P (strings with prefix P are the interval
    // [P, succ(P)) in byte order) — one-sided truncated bounds only
    // WIDEN [min, max], so the proof stays sound on them
    case StartsWith(a, p) => (field(a, fields), constOf(p)) match {
      case (Some(f), Some(u)) => provenPrefix(f, u.toString, e)
      case _ => false
    }
    // LIKE over the default escape: a pattern with no wildcards is
    // equality; a trailing-%-only pattern is a prefix; anything else
    // (inner %/_/escapes) yields no proof
    case lk: Like if lk.escapeChar == '\\' =>
      (field(lk.left, fields), constOf(lk.right)) match {
        case (Some(f), Some(u)) =>
          val p = u.toString
          def wild(s: String) = s.exists(c => c == '%' || c == '_' || c == '\\')
          if (!wild(p)) provenConstant(f, p, e)
          else if (p.endsWith("%") && !wild(p.dropRight(1)))
            provenPrefix(f, p.dropRight(1), e)
          else false
        case _ => false
      }
    case In(a, vs) if vs.forall(_.foldable) =>
      field(a, fields).exists(f => provenNonNull(e, f) &&
        vs.flatMap(constOf).exists(v => provenConstant(f, v, e)))
    case InSet(a, vs) =>
      field(a, fields).exists(f => provenNonNull(e, f) &&
        vs.exists(v => provenConstant(f, v, e)))
    case _ => false
  }

  // ------------------------------------------------------------ helpers

  /** `col OP v` (or `v OP col` when mirrored) proven for every row via
    * the file bounds: GE/GT prove on the min, LE/LT on the max, EQ needs
    * both bounds exact and equal to v. */
  private def prove(c: BinaryComparison, f: FieldDef, v: Any,
      e: DataFileEntry, mirrored: Boolean): Boolean = {
    if (!provenNonNull(e, f)) return false
    val b = bounds(e, f).getOrElse(return false)
    c match {
      case _: EqualTo | _: EqualNullSafe => provenConstant(f, v, e)
      case _: GreaterThanOrEqual =>
        if (!mirrored) cmp(b.min, v).exists(_ >= 0) // col >= v: min >= v
        else cmp(b.max, v).exists(_ <= 0)           // v >= col: max <= v
      case _: GreaterThan =>
        if (!mirrored) cmp(b.min, v).exists(_ > 0)
        else cmp(b.max, v).exists(_ < 0)
      case _: LessThanOrEqual =>
        if (!mirrored) cmp(b.max, v).exists(_ <= 0) // col <= v: max <= v
        else cmp(b.min, v).exists(_ >= 0)           // v <= col: min >= v
      case _: LessThan =>
        if (!mirrored) cmp(b.max, v).exists(_ < 0)
        else cmp(b.min, v).exists(_ > 0)
      case _ => false
    }
  }

  /** Resolve a (possibly cast-wrapped) attribute side to its FieldDef.
    * Only ORDER-PRESERVING integral widenings are unwrapped — a cast
    * that can reorder or truncate values (string<->numeric, narrowing)
    * yields no proof. Float/double columns are excluded entirely
    * (NaN-blind stats). */
  private def field(x: Expression,
      fields: Map[String, FieldDef]): Option[FieldDef] = (x match {
    case a: AttributeReference => Some(a.name)
    case Cast(a: AttributeReference, to, _, _)
      if integral(a.dataType) && integral(to) &&
        width(to) >= width(a.dataType) => Some(a.name)
    case _ => None
  }).flatMap(fields.get).filter(f => f.sparkType match {
    case FloatType | DoubleType => false
    case _ => true
  })

  private def integral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private def width(t: DataType): Int = t match {
    case ByteType => 1; case ShortType => 2
    case IntegerType => 4; case LongType => 8; case _ => 0
  }

  /** Evaluate a foldable literal side to a constant (null = no proof). */
  private def constOf(x: Expression): Option[Any] =
    if (x.foldable) Option(x.eval(null)) else None

  private def provenNonNull(e: DataFileEntry, f: FieldDef): Boolean =
    (f.defaultOpt.nonEmpty && e.seq < f.defaultSeq) || // rows = the
    // non-null initial default (read path's per-file seq rule)
    e.knownNullCount(f.phys).contains(0L)

  /** Virtual stats-domain bounds for a file that PREDATES field `f`'s
    * add-column commit: every row surfaces the initial default (the
    * read path's seq rule), so min = max = the default — an exact
    * whole-file proof basis with zero reads. Long/String stats domain
    * only (float/double are excluded from proofs anyway, boolean has
    * no stats domain). */
  private def preEvolutionDefault(e: DataFileEntry, f: FieldDef): Option[Any] =
    if (f.defaultOpt.isEmpty || e.seq >= f.defaultSeq) None
    else f.typedDefault.flatMap {
      case i: Int    => Some(i.toLong)
      case l: Long   => Some(l)
      case s: String => Some(s)
      case _         => None
    }

  /** File bounds in the stats domain. minExact/maxExact flag whether
    * the value is exact (vs a one-sided bound from truncation). */
  private final case class Bounds(min: Any, max: Any,
      minExact: Boolean, maxExact: Boolean)

  private def bounds(e: DataFileEntry, f: FieldDef): Option[Bounds] =
    preEvolutionDefault(e, f) match {
      case Some(v) => Some(Bounds(v, v, true, true))
      case None => boundsRecorded(e, f)
    }

  private def boundsRecorded(e: DataFileEntry, f: FieldDef): Option[Bounds] =
    f.phys match {
      case "phash" =>
        if (e.phashMin > e.phashMax) None
        else Some(Bounds(e.phashMin, e.phashMax, true, true))
      case "image_id" =>
        if (e.imageIdMin == null || e.imageIdMin.isEmpty ||
          e.imageIdMax == null || e.imageIdMax.isEmpty) None
        else Some(Bounds(e.imageIdMin, e.imageIdMax, true, true))
      case phys => e.stats.get(phys).flatMap { st =>
        st.kind match {
          case "long" => Some(Bounds(st.min.toLong, st.max.toLong, true, true))
          case "string" => Some(Bounds(st.min, st.max,
            st.min.length < ParquetStats.MaxStatLen,
            st.max.length < ParquetStats.MaxStatLen))
          case _ => None
        }
      }
    }

  /** Equality proof: every row equals `v` — min == max == v, and both
    * bounds must be EXACT (truncated stats can agree on a prefix while
    * the real values differ). */
  private def provenConstant(f: FieldDef, v: Any, e: DataFileEntry): Boolean =
    provenNonNull(e, f) && bounds(e, f).exists(b => b.minExact && b.maxExact &&
      cmp(b.min, v).contains(0) && cmp(b.max, v).contains(0))

  /** Prefix proof: every non-null row starts with `p` iff both bounds
    * do (see allMatch); the empty prefix matches every non-null row. */
  private def provenPrefix(f: FieldDef, p: String, e: DataFileEntry): Boolean =
    provenNonNull(e, f) && (p.isEmpty || bounds(e, f).exists(b => (b.min, b.max) match {
      case (mn: String, mx: String) => mn.startsWith(p) && mx.startsWith(p)
      case _ => false
    }))

  /** Stat-vs-constant ordering; None = incomparable = no proof. Stat
    * values are Long or String; constants are Catalyst-internal (boxed
    * integrals, UTF8String). */
  private def cmp(stat: Any, v: Any): Option[Int] = (stat, v) match {
    case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
    case (x: Long, y: Int) => Some(java.lang.Long.compare(x, y.toLong))
    case (x: Long, y: Short) => Some(java.lang.Long.compare(x, y.toLong))
    case (x: Long, y: Byte) => Some(java.lang.Long.compare(x, y.toLong))
    case (x: String, y: UTF8String) =>
      Some(UTF8String.fromString(x).compareTo(y))
    case (x: String, y: String) =>
      Some(UTF8String.fromString(x).compareTo(UTF8String.fromString(y)))
    case _ => None
  }
}
