package graft.expressions

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: collapse nested NFC normalizations —
  * `graft_nfc(graft_nfc(x))` ≡ `graft_nfc(x)` because Unicode
  * normalization is idempotent by definition (UAX #15). The nesting
  * arises naturally when composed pipelines each defensively normalize
  * their input (a curation stage normalizes before hashing, its caller
  * already normalized before chunking); without the rule every layer
  * pays a full string scan per row. A `Rule[LogicalPlan]` rather than a
  * per-node peephole so it rewrites EVERYWHERE an expression appears —
  * projections, filters, join keys, aggregate keys — and keeps
  * rewriting to a fixpoint (a triple-nested call collapses in one pass
  * of the rule batch because the match re-applies bottom-up).
  *
  * Registered through `GraftExtensions.injectOptimizerRule`, the same
  * session-extension surface as the function registrations, so any
  * session built `.withExtensions(new GraftExtensions)` gets it.
  */
object CollapseNfc extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case NfcNormalize(inner @ NfcNormalize(_)) => inner
    }
}
