package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression combinators. */
object Cols {

  /** Let-binding for column expressions: evaluate `value` ONCE per row
    * and reference it as a lambda variable in `body`.
    *
    * Why this exists: Spark evaluates higher-order-function lambdas in
    * interpreted mode, outside whole-stage codegen's subexpression
    * elimination — an expression tree captured from the enclosing scope
    * (e.g. `split(text, " ")` referenced via `element_at` inside a
    * `transform` lambda) is RE-EVALUATED per array element, silently
    * turning a linear map stage quadratic. Routing the value through a
    * single-element array and a `transform` lambda makes it a bound
    * lambda attribute, evaluated once. Measured on the shingle pipeline
    * at sf0.1: 8× faster, bit-identical output. */
  def let(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)
}
