"""tmdb_spark_data_pipeline_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of Zaina-M/tmdb-spark-data-pipeline
(reference at /root/reference), rebuilt Spark-first per /root/repo/SURVEY.md."""

__version__ = "0.1.0"
