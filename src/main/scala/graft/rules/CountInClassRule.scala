package graft.rules

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Length, Literal, RegExpReplace, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{CharClassParser, CountInClass}

/** Optimizer rule (SURVEY §4 candidate (b)): rewrite the ubiquitous
  * char-class-count idiom
  *   `length(x) - length(regexp_replace(x, '[class]', ''))`
  * into the fused single-scan [[CountInClass]] expression. Null semantics
  * are identical (both forms are null iff x is null), values are identical
  * for the conservatively-parsed classes (plain members, literal escapes,
  * ASCII ranges; anything fancier keeps the regex path).
  */
object CountInClassRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case s @ Subtract(
          Length(x),
          Length(RegExpReplace(y, Literal(cls: UTF8String, StringType),
            Literal(rep: UTF8String, StringType), Literal(1, _))), _)
          if rep.numChars() == 0 && x.semanticEquals(y) =>
        CharClassParser.expand(cls.toString)
          .map(set => CountInClass(x, set): org.apache.spark.sql.catalyst.expressions.Expression)
          .getOrElse(s)
    }
}

/** SparkSessionExtensions entry point — register with
  * `spark.sql.extensions=graft.rules.GraftExtensions` (Sessions.builder
  * does this for every engine session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  private def fn(name: String, usage: String,
                 build: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft", name, usage),
      (exprs: Seq[Expression]) => build(exprs))

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => CountInClassRule)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    // SQL-callable registrations of the native expressions
    e.injectFunction(fn("text_stats",
      "text_stats(str) - fused single-pass text statistics struct",
      exprs => graft.functions.TextStats(exprs.head)))
    e.injectFunction(fn("minhash_sig",
      "minhash_sig(str) - 16-component MinHash signature (array<long>)",
      exprs => graft.functions.MinHashSig(exprs.head)))
    e.injectFunction(fn("count_in_class",
      "count_in_class(str, chars) - count of code points in the char set",
      exprs => graft.functions.CountInClass(exprs.head,
        exprs(1).eval(null).toString)))
    e.injectFunction(fn("dot_product",
      "dot_product(array<double>, array<double>) - sequential dot product",
      exprs => graft.functions.DotProduct(exprs.head, exprs(1))))
  }
}
