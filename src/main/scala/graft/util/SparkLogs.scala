package graft.util

import org.apache.logging.log4j.Level
import org.apache.logging.log4j.core.config.Configurator

/** Log hygiene for the repo's runnable mains and the testkit. */
object SparkLogs {

  /** WindowExec warns "No Partition Defined" on every execution of a
    * global window. The repo's only global windows are (a) the testkit's
    * single-file writers, where whole-file deterministic row order is the
    * point, and (b) t5_vocab's rank over its 20 post-`limit` survivors —
    * constant-size by construction (a `partitionBy(lit(1))` there is
    * constant-folded away, so the warning fires regardless). Both are
    * deliberate and scale-safe; silencing THIS logger keeps bench/verify
    * logs signal. Query paths are plan-audited (PlanAudit) instead. */
  def quietGlobalWindowWarning(): Unit =
    Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec", Level.ERROR)
}
