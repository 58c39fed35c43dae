"""PySpark-native market-data analytics engine.

A from-scratch re-expression of the capabilities of
``ErwinGoneMad/MarketDataPipeline`` (reference at /root/reference) on
Apache Spark: one DataFrame with a ``symbol`` column and
``Window.partitionBy("symbol").orderBy("datetime")`` replaces the
reference's per-symbol ``Dict[str, DataFrame]`` + Python loop
(reference src/main.py:63-87).

Public API mirrors the reference's documented surface
(reference README.md:86-110):

    fetch_intraday_data -> compute_all_features -> generate_targets
      -> prepare_dataset -> train_model -> evaluate_model -> predict

plus Spark-native extensions the reference lacks: structured-streaming
bar ingestion, deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding-cosine), similarity search, text analysis, and
multimodal binary-column plumbing.
"""

from marketdatapipeline_spark.config import PipelineConfig
from marketdatapipeline_spark.session import get_spark

__all__ = ["PipelineConfig", "get_spark"]

__version__ = "0.1.0"
