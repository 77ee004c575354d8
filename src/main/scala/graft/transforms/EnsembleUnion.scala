package graft.transforms

import org.apache.spark.sql.DataFrame

/** Union of the control and perturbed ensemble members along the member
  * dimension — the long-form equivalent of the reference's
  * `xr.concat([ds_cf, ds_pf], dim='number')`, gated by the
  * USE_CONTROL_MEMBER_IN_ENSEMBLE flag
  * (reference: databricks/glofas-transform.py:111-114,
  * databricks/config.json:48).
  *
  * `unionByName` (not positional union) so the two sides may carry columns
  * in different orders; both must already be long-form with a `number`
  * member column (0 = control by GloFAS convention). A union is a no-shuffle
  * operator — partitions of both children are concatenated as-is.
  */
object EnsembleUnion {
  def apply(perturbed: DataFrame, control: DataFrame, useControl: Boolean = true): DataFrame =
    if (useControl) perturbed.unionByName(control) else perturbed
}
