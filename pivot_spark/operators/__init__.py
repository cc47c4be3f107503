from pivot_spark.operators.pivot import pivot, PivotResult, PivotError, output_schema

__all__ = ["pivot", "PivotResult", "PivotError", "output_schema"]
