from mbta_etl_spark.plans.registry import oracle_sql, queries

__all__ = ["queries", "oracle_sql"]
