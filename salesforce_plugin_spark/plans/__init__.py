from salesforce_plugin_spark.plans.soql import SoqlError, soql_to_df

__all__ = ["soql_to_df", "SoqlError"]
