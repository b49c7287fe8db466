package graft

/** Defensive parsing for the engine's `GRAFT_*` tuning knobs.
  *
  * The knobs (IVF-PQ geometry, NN-descent depth, graph serving depth)
  * are read once at object init and interpolated into BOTH the Spark
  * plans and the oracle SQL, so a malformed value must fail loudly AT
  * THE KNOB — a bare `.toInt` surfaces as an opaque
  * `ExceptionInInitializerError` far from the cause, and a zero or
  * negative value would silently generate degenerate plans (0-cell
  * quantizers, empty beams) instead of failing at all.
  */
object EnvKnobs {

  /** A strictly-positive integer knob: returns `default` when the
    * variable is unset, otherwise parses it and REQUIRES > 0, failing
    * with a message that names the variable.
    */
  def posInt(name: String, default: Int): Int =
    parsePosInt(name, sys.env.get(name), default)

  /** A strictly-positive LONG knob — for knobs whose production values
    * exceed Int (a Bloom filter sized ∝ 10·n bits at corpus scale).
    */
  def posLong(name: String, default: Long): Long =
    parsePosLong(name, sys.env.get(name), default)

  private[graft] def parsePosLong(name: String, raw: Option[String],
                                  default: Long): Long =
    raw match {
      case None => default
      case Some(r) =>
        val v =
          try r.trim.toLong
          catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"env $name must be a positive integer, got '$r'")
          }
        require(v > 0, s"env $name must be > 0, got $v")
        v
    }

  /** The parse/validate core, split from the env read for testability. */
  private[graft] def parsePosInt(name: String, raw: Option[String],
                                 default: Int): Int =
    raw match {
      case None => default
      case Some(r) =>
        val v =
          try r.trim.toInt
          catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"env $name must be a positive integer, got '$r'")
          }
        require(v > 0, s"env $name must be > 0, got $v")
        v
    }
}
