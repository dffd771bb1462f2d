"""pyprima_spark — a PySpark-native analytics engine with the data-processing
capabilities of tum-ens/pyPRIMA, re-expressed as declarative Spark plans.

The reference (/root/reference/code/) is a single-node pandas ETL; this
package provides the same query semantics as composable DataFrame
operators designed for cluster scale (broadcast dims, bucketed pairwise
ops, window-bounded state, AQE).
"""

from pyprima_spark.session import build_session
from pyprima_spark.catalog import load_tables

__all__ = ["build_session", "load_tables"]
__version__ = "0.1.0"
