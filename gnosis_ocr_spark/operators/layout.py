"""U8/A6/W1 — layout reconstruction and document assembly.

Two levels, mirroring SURVEY.md §2.8 U8:

- **Page level** (:func:`assemble_documents`): the reference renders results
  sorted by page number (/root/reference/app/static/js/main.js:38-44, page
  keys parsed at app/jobs.py:234-238). Here it is ONE sort-aggregate — no
  window, no second shuffle:
  ``groupBy(url).agg(array_join(transform(array_sort(collect_list(
  struct(page_no, page_text))), s -> s.page_text), '\\n\\n'))``.
  ``array_sort`` on structs orders by the leading field (page_no), so page
  order is restored regardless of task completion order.

- **Span level** (:func:`assemble_spans`): bounding-box reading order for
  positioned spans — rows quantized on ``y`` (top-to-bottom), spans
  left-to-right within a row — as a grouped ``applyInPandas``. The pure
  per-page function lives in ``functions.codec_pdf.page_text`` and is shared
  with the in-UDF PDF path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gnosis_ocr_spark.functions.codec_pdf import Span, page_text

PAGE_SEP = "\n\n"


def assemble_documents(
    page_texts: DataFrame,
    url_col: str = "url",
    page_col: str = "page_no",
    text_col: str = "page_text",
    out_col: str = "extracted_text",
) -> DataFrame:
    """(url, page_no, page_text) → (url, extracted_text, n_pages).

    NULL ``page_no`` rows are parse-failure sentinels: excluded from both the
    text aggregate (collect_list skips NULL elements) and the page count
    (count(col) skips NULLs), so broken documents yield ('', 0) without a
    reconciliation join.

    If the input carries a per-page ``ocr_conf`` column (the scored OCR
    protocol), the document gets its page-average as ``ocr_confidence`` in
    the SAME sort-aggregate — no second shuffle; sentinel docs get 0.0.
    """
    entry = F.when(
        F.col(page_col).isNotNull(),
        F.struct(F.col(page_col).alias("p"), F.col(text_col).alias("t")),
    )
    aggs = [
        # Python-strip semantics (ALL whitespace, both ends) — F.trim
        # strips only 0x20, so a document whose first/last page extracts
        # empty kept its leading/trailing page separators, diverging from
        # the reference's .strip() byte-identity on edge-empty-page docs
        F.regexp_replace(
            F.regexp_replace(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(entry)),
                        lambda s: s.getField("t"),
                    ),
                    PAGE_SEP,
                ),
                r"^\s+",
                "",
            ),
            r"\s+$",
            "",
        ).alias(out_col),
        F.count(F.col(page_col)).cast("int").alias("n_pages"),
    ]
    if "ocr_conf" in page_texts.columns:
        aggs.append(
            F.coalesce(F.avg("ocr_conf"), F.lit(0.0)).alias("ocr_confidence")
        )
    if "route" in page_texts.columns:
        # every page row of a document carries the same format route
        # (sniffed once from the bytes in the split stage); max() folds it
        # into the SAME sort-aggregate — no extra shuffle, deterministic
        aggs.append(F.max("route").alias("route"))
    return page_texts.groupBy(F.col(url_col).alias("url")).agg(*aggs)


SPAN_DOC_SCHEMA = "url string, extracted_text string, n_pages int"


def assemble_spans(
    spans_df: DataFrame,
    row_quantum: float = 4.0,
) -> DataFrame:
    """(url, page_no, x, y, span_text) → (url, extracted_text, n_pages).

    Bounding-box reading order per page (y descending in PDF coords, x
    ascending within a row), pages joined by a blank line. Grouped
    ``applyInPandas`` — one group per document, Arrow both ways.
    """

    def assemble(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        (url,) = key
        pages = []
        for page_no, grp in sorted(pdf.groupby("page_no"), key=lambda kv: kv[0]):
            spans = [
                Span(x, y, t)
                for x, y, t in zip(grp["x"], grp["y"], grp["span_text"])
            ]
            pages.append(page_text(spans, row_quantum))
        text = PAGE_SEP.join(pages).strip()
        return pd.DataFrame(
            {"url": [url], "extracted_text": [text], "n_pages": [len(pages)]}
        )

    return spans_df.groupBy("url").applyInPandas(assemble, schema=SPAN_DOC_SCHEMA)
