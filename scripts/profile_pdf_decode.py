#!/usr/bin/env python
"""Per-writer-class PDF decode cost profile (round-4 bench attribution).

pdf_extract's wall-clock is dominated by per-row *decode compute* inside the
vectorized split stage — this script measures it in isolation (no Spark):
for every writer class in the corpus/driver rotation, build one 2-page doc
and time ``page_count + extract_pages + page_text`` over N reps. Prints a
markdown table (pasted into FIXTURES.md) and a JSON line.

Run: python scripts/profile_pdf_decode.py [reps]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gnosis_ocr_spark.functions import codec_pdf as cp  # noqa: E402

WRITERS: dict[str, callable] = {
    "plain": lambda p: cp.build_pdf(p),
    "flate": lambda p: cp.build_pdf(p, compress=True),
    "pdf15": lambda p: cp.build_pdf_15(p),
    "lzw": lambda p: cp.build_pdf_filtered(p, filters=("LZWDecode",)),
    "a85flate": lambda p: cp.build_pdf_filtered(
        p, filters=("ASCII85Decode", "FlateDecode"), indirect_length=True
    ),
    "tj_kerned": lambda p: cp.build_pdf_tj_kerned(p),
    "rc4": lambda p: cp.build_pdf_encrypted(p, revision=3),
    "type0": lambda p: cp.build_pdf_type0(p),
    "form_xobj": lambda p: cp.build_pdf_form_xobject(p),
    "aes": lambda p: cp.build_pdf_encrypted(p, revision=4),
    "type0_cmap": lambda p: cp.build_pdf_type0(p, custom_cmap=True),
    "scanned": lambda p: cp.build_pdf_scanned(p),
    "scanned_jpeg": lambda p: cp.build_pdf_scanned(p, image_filter="jpeg"),
    "type0_ucs2": lambda p: cp.build_pdf_type0(p, predefined="UniGB-UCS2-H"),
    "type0_gbk": lambda p: cp.build_pdf_type0(
        p, predefined="GBK-EUC-H", charset="gbk"
    ),
    "scanned_g4": lambda p: cp.build_pdf_scanned(
        p, width=128, height=128, image_filter="g4"
    ),
    "scanned_1bit": lambda p: cp.build_pdf_scanned(
        p, width=128, height=128, image_filter="raw1"
    ),
    "scanned_jpeg_prog": lambda p: cp.build_pdf_scanned(
        p, image_filter="jpeg_prog"
    ),
    "scanned_inline": lambda p: cp.build_pdf_scanned(p, image_filter="inline"),
    "scanned_g3_2d": lambda p: cp.build_pdf_scanned(
        p, width=128, height=128, image_filter="g3_2d"
    ),
    "scanned_jbig2": lambda p: cp.build_pdf_scanned(
        p, width=128, height=128, image_filter="jbig2"
    ),
    "scanned_jbig2_sym": lambda p: cp.build_pdf_scanned(
        p, width=128, height=128, image_filter="jbig2_globals"
    ),
    "scanned_jpx": lambda p: cp.build_pdf_scanned(
        p, width=128, height=128, image_filter="jpx_jp2"
    ),
    "scanned_sep_t4": lambda p: cp.build_pdf_scanned(
        p, image_filter="separation"
    ),
    "scanned_devicen_t0": lambda p: cp.build_pdf_scanned(
        p, image_filter="devicen"
    ),
    "scanned_lab": lambda p: cp.build_pdf_scanned(p, image_filter="lab"),
}

# scanned classes pay their cost in the IMAGE path (extract_pages_with_
# images + _gray_pixels + scan decode), not the text path — time the same
# work the production split stage does
_SCANNED = {
    "scanned", "scanned_jpeg", "scanned_g4", "scanned_1bit",
    "scanned_jpeg_prog", "scanned_inline", "scanned_g3_2d",
    "scanned_jbig2", "scanned_jbig2_sym", "scanned_jpx",
    "scanned_sep_t4", "scanned_devicen_t0", "scanned_lab",
}

PAGES = [
    "analysis baseline corpus dataset engine extraction fixture golden one",
    "inference journal kernel layout markup notebook operator pipeline two",
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    results: dict[str, float] = {}
    for name, build in WRITERS.items():
        # DISTINCT docs per rep: the decryptor memo must only amortize
        # within one document (page_count + windows), as in production —
        # a single reused object would overstate the cache win
        docs = [
            build([p + f" v{i}" for p in PAGES]) for i in range(reps)
        ]
        from gnosis_ocr_spark.operators.pdf_split import _scan_png

        def work(pdf: bytes) -> None:
            cp.page_count(pdf)
            if name in _SCANNED:
                for spans, imgs in cp.extract_pages_with_images(pdf):
                    if spans:
                        cp.page_text(spans)
                    else:
                        _scan_png(imgs)
            else:
                for spans in cp.extract_pages(pdf):
                    cp.page_text(spans)

        work(docs[0])  # warm-up (regex compilation, tables)
        t0 = time.perf_counter()
        for pdf in docs:
            work(pdf)
        results[name] = (time.perf_counter() - t0) / reps * 1000.0  # ms/doc
    base = results["plain"]
    print("| writer | ms/doc (2 pages) | × plain |")
    print("|---|---|---|")
    for name, ms in sorted(results.items(), key=lambda kv: kv[1]):
        print(f"| {name} | {ms:.2f} | {ms / base:.1f}× |")
    print()
    print(json.dumps({"reps": reps, "ms_per_doc": {k: round(v, 3) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
