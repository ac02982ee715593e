from salesforce_plugin_spark.plans.soql import (
    RelationshipRegistry,
    SoqlError,
    soql_to_df,
)

__all__ = ["soql_to_df", "SoqlError", "RelationshipRegistry"]
