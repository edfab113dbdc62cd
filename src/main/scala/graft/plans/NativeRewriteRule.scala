package graft.plans

import graft.functions.TokenCount
import graft.ops.TextAnalysis
import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpExtractAll, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite the reference token-count form
  * `size(regexp_extract_all(text, tokenPattern, 0))` into the native
  * single-scan [[TokenCount]] kernel.
  *
  * This is the engine-extension pattern for transparent acceleration: a
  * user (or generated SQL) writing the portable regex form gets the
  * kernel automatically — one character scan instead of materializing
  * every match string — with bit-identical results (the parity is
  * property-tested in `TextAnalysisSpec`). Scoped deliberately tight:
  * only the EXACT tokenizer pattern literal rewrites, and only under
  * non-legacy `size(null)` semantics (both sides then agree null→null),
  * so no other regex use can be silently altered.
  *
  * Injected via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`); plan-shape evidence in `PlanShapeSpec`.
  */
object NativeRewriteRule extends Rule[LogicalPlan] {

  private val tokenPattern = TextAnalysis.tokenPattern

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case s @ Size(RegExpExtractAll(text, Literal(p: UTF8String, StringType), Literal(0, IntegerType)), _)
          if !s.legacySizeOfNull && p.toString == tokenPattern =>
        TokenCount(text)
    }
}
