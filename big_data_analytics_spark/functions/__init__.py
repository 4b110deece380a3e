from big_data_analytics_spark.functions.money import (
    money_cents,
    money_sum,
    money_avg,
    scaled_int,
    scaled_sum,
)

__all__ = ["money_cents", "money_sum", "money_avg", "scaled_int", "scaled_sum"]
