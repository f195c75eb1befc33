"""condor_spark — a from-scratch PySpark-native synopsis streaming engine.

Same capabilities as TU-Berlin-DIMA/Condor (PVLDB 14(10):1818-1831), built
Spark-first: numpy sketch kernels + two-phase mapInPandas/applyInPandas
build, tumbling/sliding/session/count windows, an evaluation join layer, and
Structured Streaming with an exactly-once foreachBatch sink.
"""

__version__ = "0.1.0"
