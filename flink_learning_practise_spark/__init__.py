"""flink_learning_practise_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference repo ``lenhop/flink-learning-practise``
(a PyFlink learning + real-time order-analytics project), extended with
LLM-data-pipeline operators (dedup, similarity search, multimodal columns,
text analysis) and designed for 100 TB scale.

Everything is expressed with the DataFrame/SQL API so Catalyst/Tungsten
choose the physical plan; Python UDFs are confined to multimodal stubs.
"""

__version__ = "0.1.0"
