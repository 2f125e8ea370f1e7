package graft.ops

/** Business-calendar arithmetic as pure integer closed forms — no
  * calendar table, no UDF, no loop: weekday counting over epoch-day
  * numbers compiles to a handful of codegen'd integer ops, identical
  * text on the Spark side (`expr`) and the DuckDB oracle side (the
  * [[Spatial]] shared-SQL convention, so the two engines cannot
  * drift).
  *
  * Anchor: epoch day 0 = 1970-01-01 = Thursday; day −3 is a Monday, so
  * with `n = e + 3`, `g(e) = 5·(n div 7) + least(n mod 7, 5)` counts
  * the weekdays in `[Monday −3, e)` — and the weekdays in `[e1, e2)`
  * are `g(e2) − g(e1)`. All operands non-negative for any e ≥ −3
  * (every modern date), so truncating `div`/`%` agree with flooring
  * `//` and the count is engine-exact.
  */
object Calendar {

  /** SQL text: number of business days (Mon–Fri) in `[e1, e2)` given
    * two epoch-day expressions; negative when e2 < e1 (antisymmetric).
    *
    * @param divOp the engine's integer-division spelling — `"div"`
    *              (Spark) or `"//"` (DuckDB); they agree exactly
    *              because every operand here is non-negative. One
    *              builder, two spellings → the formulas cannot drift.
    */
  def busDaysSql(e1: String, e2: String, divOp: String = "div"): String = {
    def g(e: String) =
      s"(5 * (((($e) + 3) $divOp 7)) + least((($e) + 3) % 7, 5))"
    s"(${g(e2)} - ${g(e1)})"
  }

  /** SQL text: ISO-ish weekday index 0=Monday … 6=Sunday of an
    * epoch-day expression.
    */
  def dowSql(e: String): String = s"((($e) + 3) % 7)"
}
