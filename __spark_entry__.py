"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction end-to-end on sf0.001;
``queries``/``oracle_sql`` expose every SQL-expressible operator from
SURVEY.md §2 plus the training-data ops (dedup / similarity / text analysis /
multimodal plumbing) with value-identical DuckDB oracles. Implementations
live in ``gnosis_ocr_spark.plans.driver_queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline (route → HTML strip ∪ PDF split →
    stub OCR → assembly) over a corpus derived from sf0.001 documents."""
    from pyspark.sql import functions as F

    from gnosis_ocr_spark.plans.driver_queries import q_html_extract, q_pdf_extract

    sf_dir = "/root/testdata/sf0.001"
    html = q_html_extract(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("url"),
        "extracted_text",
        F.lit(1).alias("n_pages"),
        F.lit("html").alias("route"),
    )
    pdf = q_pdf_extract(spark, sf_dir).select(
        "url", "extracted_text", "n_pages", F.lit("pdf").alias("route")
    )
    return html.unionByName(pdf)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gnosis_ocr_spark.plans.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from gnosis_ocr_spark.plans.driver_queries import ORACLES

    return dict(ORACLES)
