"""The end-to-end extraction plan (SURVEY.md §7 phases 1–4 composed).

    documents (url, warc_ts, html, text, lang)
      ├─ route on magic bytes (P2, pure Column exprs)
      ├─ HTML branch: vectorized boilerplate strip (U7)        — narrow, no shuffle
      ├─ PDF branch : salted repartition (skew) → mapInPandas
      │               page split+raster (U1/U2) → iterator-UDF
      │               OCR (U3) → sort-aggregate assembly (A6/U8) — ONE shuffle
      ├─ empty branch: '' / 0 pages                             — narrow
      └─ unionByName (SO2) → (url, extracted_text, n_pages, route)

Shuffle census at scale: the HTML and empty branches are shuffle-free end to
end; the PDF branch shuffles exactly twice (the salted repartition that fixes
page-count skew, then the groupBy(url) assembly). Nothing else moves data.
The union is plan-level only (no exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gnosis_ocr_spark.operators.html_extract import extract_html_udf
from gnosis_ocr_spark.operators.layout import assemble_documents
from gnosis_ocr_spark.operators.ocr import make_ocr_udf
from gnosis_ocr_spark.operators.pdf_split import split_pdf_pages
from gnosis_ocr_spark.operators.routing import (
    ROUTE_EMPTY,
    ROUTE_HTML,
    ROUTE_PDF,
    with_route,
)
from gnosis_ocr_spark.operators.skew import salted_repartition

RESULT_COLS = ["url", "extracted_text", "n_pages", "route"]


def extract_corpus(
    docs: DataFrame,
    ocr_engine: str = "stub",
    pdf_partitions: int | None = None,
) -> DataFrame:
    """documents → (url, extracted_text, n_pages, route).

    ``pdf_partitions`` sizes the salted PDF repartition; default leaves it to
    spark.sql.shuffle.partitions (AQE coalesces small outputs).
    """
    routed = with_route(docs)

    html_branch = (
        routed.filter(F.col("route") == ROUTE_HTML)
        .select(
            "url",
            extract_html_udf(F.col("html")).alias("extracted_text"),
            F.lit(1).cast("int").alias("n_pages"),
            F.lit(ROUTE_HTML).alias("route"),
        )
    )

    empty_branch = routed.filter(F.col("route") == ROUTE_EMPTY).select(
        "url",
        F.lit("").alias("extracted_text"),
        F.lit(0).cast("int").alias("n_pages"),
        F.lit(ROUTE_EMPTY).alias("route"),
    )

    pdf_rows = routed.filter(F.col("route") == ROUTE_PDF).select("url", "html")
    pdf_rows = salted_repartition(pdf_rows, pdf_partitions)
    pages = split_pdf_pages(pdf_rows)
    page_texts = pages.withColumn("page_text", make_ocr_udf(ocr_engine)(F.col("png")))
    pdf_branch = assemble_documents(
        page_texts.select("url", "page_no", "page_text")
    ).withColumn("route", F.lit(ROUTE_PDF))

    return html_branch.unionByName(pdf_branch).unionByName(empty_branch)
