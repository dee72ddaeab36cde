package graft.ops

/** The reference engine's operator algebra.
  *
  * Mirrors `Operators.OperationType` in the reference
  * (file_system/src/main/java/com/file_system/Operators.java:13-19) plus the
  * textual command syntax accepted by its console
  * (RainStorm.java:884-891, validateOperation RainStorm.java:924-979):
  *
  *   FILTER:<pattern>                  case-insensitive substring match
  *   COLUMN_FILTER:<col>:<value>       exact trimmed equality on one column
  *   TRANSFORM:uppercase|lowercase|trim|splitintowords
  *   TRANSFORM:select:<c1>,<c2>,...    projection
  *   AGGREGATE                         global running count (1,2,3,... per row)
  *
  * This file defines the ADT + parser only; compilation to Spark plans lives
  * in [[OpCompiler]].
  */
sealed trait StreamOp extends Product with Serializable

object StreamOp {
  /** O1 — keep rows whose line contains `pattern`, case-insensitively
    * (Operators.java:121-144, applied :77-81). */
  final case class Filter(pattern: String) extends StreamOp

  /** O2 — split on `,`, keep rows where `trim(values[col]) == value`
    * (Operators.java:258-277, name resolution Node.java:412-437). */
  final case class ColumnFilter(column: String, value: String) extends StreamOp

  /** O3-O5 — whole-line string transforms (Operators.java:159-164). */
  final case class Transform(kind: TransformKind) extends StreamOp

  /** O6 — one word per output row (Operators.java:165-167); the reference's
    * only generator-shaped op. */
  case object SplitIntoWords extends StreamOp

  /** O7 — projection by column names (Operators.java:169-188,
    * Node.java:438-474). */
  final case class Select(columns: Seq[String]) extends StreamOp

  /** O8 — the fused filter-then-transform op (Operators.java:87-91: one
    * operator holding both a predicate and a scalar transform; its
    * constructor takes Function<String,String>, so only the whole-line
    * transforms fuse — not select/splitintowords). The console prompt
    * advertises the descriptor `FILTERED_TRANSFORM:pattern:operation`
    * (RainStorm.java:884-887) but validateOperation has no case for it
    * (RainStorm.java:939-979) — declared-but-unreachable surface, same
    * story as AGGREGATE:sum/max/min, given its declared semantics here. */
  final case class FilteredTransform(pattern: String, kind: TransformKind) extends StreamOp

  /** O9 — stateful global running count: every input row emits the count so
    * far, 1,2,3,... (Operators.java:57-63, :93-100). The reference's state was
    * per-worker (interleaved partial counts); we implement the intended
    * single-global-count semantics (SURVEY.md §2.1 O9 caveat). */
  case object Aggregate extends StreamOp

  /** The `AGGREGATE:sum|max|min:field` surface the reference's console
    * advertises (RainStorm.java:888-891) but never implemented
    * (Node.java:475-477 always builds the counter; SURVEY.md §1.3
    * "unimplemented surface") — here with the declared semantics: each row
    * emits the running aggregate of `field` up to itself in global order. */
  final case class AggregateField(kind: RunningCount.Kind, field: String) extends StreamOp

  sealed trait TransformKind extends Product with Serializable
  case object Uppercase extends TransformKind
  case object Lowercase extends TransformKind
  case object TrimLine extends TransformKind

  /** Parse the reference's textual op descriptor. Surrounding double quotes on
    * FILTER patterns / COLUMN_FILTER values are stripped, matching
    * Node.java:417-420 and the quote-aware tokenizer Node.java:355-382. */
  def parse(descriptor: String): Either[String, StreamOp] = {
    def unquote(s: String): String = {
      val t = s.trim
      if (t.length >= 2 && t.startsWith("\"") && t.endsWith("\""))
        t.substring(1, t.length - 1)
      else t
    }
    val parts = descriptor.split(":", 3).toList
    parts match {
      case "FILTER" :: pat :: Nil                    => Right(Filter(unquote(pat)))
      case "FILTER" :: p1 :: p2 :: Nil               => Right(Filter(unquote(s"$p1:$p2")))
      case "COLUMN_FILTER" :: col :: value :: Nil    => Right(ColumnFilter(col.trim, unquote(value)))
      case "TRANSFORM" :: "uppercase" :: Nil         => Right(Transform(Uppercase))
      case "TRANSFORM" :: "lowercase" :: Nil         => Right(Transform(Lowercase))
      case "TRANSFORM" :: "trim" :: Nil              => Right(Transform(TrimLine))
      case "TRANSFORM" :: "splitintowords" :: Nil    => Right(SplitIntoWords)
      // the operation is split off the LAST ':' so a colon-bearing pattern
      // parses (FILTERED_TRANSFORM:a:b:uppercase filters on "a:b") — the
      // same tolerance FILTER's p1:p2 rejoin gives its grammar
      case "FILTERED_TRANSFORM" :: rest if rest.nonEmpty =>
        val tail = rest.mkString(":")
        val cut = tail.lastIndexOf(':')
        if (cut < 0)
          Left(s"FILTERED_TRANSFORM needs <pattern>:<operation>: $descriptor")
        else {
          val (pat, op) = (tail.substring(0, cut), tail.substring(cut + 1))
          scalarTransform(op.trim).map(FilteredTransform(unquote(pat), _))
            .toRight(s"FILTERED_TRANSFORM needs uppercase|lowercase|trim, got: $op")
        }
      case "TRANSFORM" :: "select" :: cols :: Nil    =>
        val cs = cols.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        if (cs.isEmpty) Left(s"TRANSFORM:select needs at least one column: $descriptor")
        else Right(Select(cs))
      case "AGGREGATE" :: func :: field :: Nil if field.trim.nonEmpty
          && RunningCount.Kind.fromName(func.trim).exists(_ != RunningCount.Kind.Count) =>
        Right(AggregateField(RunningCount.Kind.fromName(func.trim).get, field.trim))
      // the reference's validateOperation accepts ANY AGGREGATE tail and
      // builds the counter (RainStorm.java:971-973) — preserve that tolerance
      case "AGGREGATE" :: _                          => Right(Aggregate)
      case _ => Left(s"unrecognized operator descriptor: $descriptor")
    }
  }

  private def scalarTransform(name: String): Option[TransformKind] = name match {
    case "uppercase" => Some(Uppercase)
    case "lowercase" => Some(Lowercase)
    case "trim"      => Some(TrimLine)
    case _           => None
  }

  def parseUnsafe(descriptor: String): StreamOp =
    parse(descriptor).fold(msg => throw new IllegalArgumentException(msg), identity)
}
