"""Scalar/aggregate function helpers shared by operator modules."""

from real_time_big_data_architect_spark.functions.numeric import dec_avg, dec_sum

__all__ = ["dec_sum", "dec_avg"]
