"""keystone_spark — a PySpark-native analytics engine with the capabilities
of amplab/keystone (KeystoneML), rebuilt Spark-first.

Reference: amplab/keystone (KeystoneML, ICDE 2017, arXiv:1610.09451).
See SURVEY.md for the operator-by-operator mapping. Everything here is
DataFrame/Catalyst-first: relational operators are declarative Spark SQL,
numeric kernels are Arrow-batched pandas UDFs, pipelines lower to
DataFrame -> DataFrame functions so Catalyst/AQE optimize the whole plan.
"""

from keystone_spark.session import (configure_session, get_session,
                                    warm_python_workers)

__all__ = ["get_session", "configure_session", "warm_python_workers"]

__version__ = "0.1.0"
