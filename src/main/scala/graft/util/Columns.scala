package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression helpers shared across operators. */
object Columns {

  /** Let-binding for Column expressions: evaluate `value` ONCE per row and
    * expose it to `body` as a lambda variable (a plain slot read).
    *
    * Why it exists: a higher-order function's lambda BODY re-evaluates its
    * non-lambda subexpressions once per array element — HOFs hoist
    * nothing. Any expression of the shape
    * `transform(positions, i => f(expensive, i))` silently re-computes
    * `expensive` (a tokenizer regex, a built gram array, …) per element;
    * measured two orders of magnitude on gopherRepetition before its
    * rewrite. Wrapping as `letBind(expensive)(e => transform(positions,
    * i => f(e, i)))` evaluates it once. The mechanism is the standard
    * single-element-transform trick: `element_at(transform(array(v),
    * body), 1)`.
    */
  def letBind(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)
}
