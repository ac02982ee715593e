from salesforce_plugin_spark.operators.analytics import (
    class_balance,
    cohort_retention,
    key_skew,
    copurchase_pairs,
    funnel,
    session_transitions,
    user_growth,
    zscore_outliers,
)
from salesforce_plugin_spark.operators.elt import (
    BulkQueryExtract,
    ObjectExtract,
    SchemaReconcileLoad,
)
from salesforce_plugin_spark.operators.joins import (
    asof_join,
    interval_overlap_join,
    range_join_bucketed,
)
from salesforce_plugin_spark.operators.merge import (
    apply_changes,
    fold_additive_rollup,
    snapshot_diff,
    surrogate_keys,
)
from salesforce_plugin_spark.operators.timeseries import (
    date_dimension,
    resample_daily_ffill,
    rolling_daily_metrics,
)
from salesforce_plugin_spark.operators.partitioning import (
    explain_skew,
    write_zordered,
    zorder_key,
    repartition_by_time,
    salted_join,
    write_bucketed,
)
from salesforce_plugin_spark.operators.schema_reconcile import (
    FieldDescriptor,
    from_describe,
    jsonpaths_document,
    load_with_reconciliation,
    reconcile_table,
    redshift_copy_command,
    to_describe,
)
from salesforce_plugin_spark.operators.scd import scd2_apply_changes, scd2_intervals
from salesforce_plugin_spark.operators.transforms import (
    add_fetch_time,
    coerce_to_epoch_seconds,
    decode_epoch_millis,
    drop_attributes,
    flatten_relationship,
    nest_children,
    scrub_newlines,
    truncate_varchar,
)

__all__ = [
    "funnel",
    "key_skew",
    "class_balance",
    "snapshot_diff",
    "surrogate_keys",
    "fold_additive_rollup",
    "cohort_retention",
    "copurchase_pairs",
    "session_transitions",
    "user_growth",
    "zscore_outliers",
    "asof_join",
    "range_join_bucketed",
    "interval_overlap_join",
    "apply_changes",
    "scd2_apply_changes",
    "scd2_intervals",
    "BulkQueryExtract",
    "ObjectExtract",
    "SchemaReconcileLoad",
    "explain_skew",
    "repartition_by_time",
    "salted_join",
    "write_bucketed",
    "zorder_key",
    "write_zordered",
    "FieldDescriptor",
    "from_describe",
    "to_describe",
    "reconcile_table",
    "jsonpaths_document",
    "redshift_copy_command",
    "load_with_reconciliation",
    "flatten_relationship",
    "nest_children",
    "drop_attributes",
    "coerce_to_epoch_seconds",
    "decode_epoch_millis",
    "scrub_newlines",
    "add_fetch_time",
    "truncate_varchar",
]
