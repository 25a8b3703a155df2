"""U1/U2 — PDF probe + page split + rasterize as ``mapInPandas``.

The reference does this per-file with poppler in 10-page continuation jobs
(probe: /root/reference/app/jobs.py:375-377; split+raster dpi=150 PNG with
first_page/last_page pushdown: :386-390; continuation chaining: :349-356).
Here the whole mechanism is one flat-map over Arrow batches: each input row
``(url, html=pdf bytes)`` explodes to ``(url, page_no, png)`` rows, parsing in
fixed 10-page windows inside the UDF so peak memory stays bounded exactly like
the reference's batching — but the "continuation" is just iteration, and Spark
schedules partitions in parallel.

Documents whose bytes fail to parse emit a sentinel row
``(url, page_no=NULL, png=NULL)`` so downstream assembly still reports the url
(extracted_text = '', n_pages = 0) without a reconciliation join.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType

from gnosis_ocr_spark.functions.codec_pdf import extract_pages, page_count, page_text
from gnosis_ocr_spark.functions.codec_png import encode_page_png

PAGE_SCHEMA = "url string, page_no int, png binary"
EXTRACT_BATCH_PAGES = 10  # reference window: 10 pages/job (app/jobs.py:378)
MAX_PAGES = 500  # reference cap (app/config.py:18)


@pandas_udf(IntegerType())
def pdf_page_count_udf(pdf: pd.Series) -> pd.Series:
    """U1 probe, vectorized; -1 marks unparseable bytes."""

    def probe(b) -> int:
        try:
            return page_count(bytes(b))
        except Exception:
            return -1

    return pdf.map(probe)


def _split_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf_batch in batches:
        out_url: list[str] = []
        out_no: list[int | None] = []
        out_png: list[bytes | None] = []
        for url, blob in zip(pdf_batch["url"], pdf_batch["html"]):
            emitted = 0
            try:
                data = bytes(blob)
                total = min(page_count(data), MAX_PAGES)
                # 10-page windows with range pushdown into the parser
                for start in range(1, total + 1, EXTRACT_BATCH_PAGES):
                    end = min(start + EXTRACT_BATCH_PAGES - 1, total)
                    for off, spans in enumerate(extract_pages(data, start, end)):
                        text = page_text(spans)
                        out_url.append(url)
                        out_no.append(start + off)
                        out_png.append(encode_page_png(text))
                        emitted += 1
            except Exception:
                pass
            if emitted == 0:  # sentinel so the url survives to assembly
                out_url.append(url)
                out_no.append(None)
                out_png.append(None)
        yield pd.DataFrame({"url": out_url, "page_no": out_no, "png": out_png})


def split_pdf_pages(pdf_rows: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """(url, html) → (url, page_no, png) — the U2 flat-map."""
    slim = pdf_rows.select(
        F.col(url_col).alias("url"), F.col(html_col).alias("html")
    )
    return slim.mapInPandas(_split_batches, schema=PAGE_SCHEMA)
