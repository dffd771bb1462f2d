from pyprima_spark.plans.queries import QUERIES
from pyprima_spark.plans.oracles import ORACLES

__all__ = ["QUERIES", "ORACLES"]
