package graft.ext

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.functions.{CosineSim, JaroWinkler, NfcNormalize, PqAdc}

/** Engine extension point, installed with
  * `spark.sql.extensions=graft.ext.GraftExtensions` (SURVEY.md §7.3):
  * registers the native function surface so SQL and DataFrame code can
  * call the codegen'd expressions by name. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      CosineSim.info,
      children => CosineSim(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("pq_adc"),
      PqAdc.info,
      children => PqAdc(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      NfcNormalize.info,
      children => NfcNormalize(children.head)))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      JaroWinkler.info,
      children => JaroWinkler(children.head, children(1))))
    // whole-operator extension: partial→final per-key top-k (plans the
    // TopKPerKeyNode logical operator; see graft.plans.TopKPerKey)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}
