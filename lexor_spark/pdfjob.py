"""PDF extraction job: binary PDF column → text per document.

Same architecture as the HTML job (`lexor_spark/job.py`): salted
repartition on url-hash, one fused ``mapInArrow`` UDF, cyclic GC off,
error rows instead of task failures.  The kernel is
`lexor_spark.kernel.pdftext` (pure Python + stdlib zlib; subset
documented there).

The synthetic PDF corpus is generated distributed (mapInPandas over
``documents``) as a pure function of (doc_id, text) — deterministic
bytes on every run, so extraction results are pinned by tests.
"""

from __future__ import annotations

import gc
from typing import Iterator, Optional

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lexor_spark.kernel.pdftext import build_simple_pdf, extract_pdf_text

__all__ = ["pdf_pages_df", "extract_pdfs", "PDF_OUTPUT_SCHEMA"]

PDF_OUTPUT_SCHEMA = ("url string, text string, n_pages int, n_streams int, "
                     "n_bytes_in long, ok boolean, err string")

_PDF_ARROW = pa.schema([
    ("url", pa.string()), ("text", pa.string()), ("n_pages", pa.int32()),
    ("n_streams", pa.int32()), ("n_bytes_in", pa.int64()),
    ("ok", pa.bool_()), ("err", pa.string()),
])


def pdf_pages_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic (url, warc_ts, pdf binary) table from ``documents``.
    Each document's text becomes a wrapped-line single-page PDF; even
    doc_ids are FlateDecode-compressed, odd ones raw — both kernel paths
    get continuous coverage."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text", "source")

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, blobs = [], []
            for doc_id, text, source in zip(pdf["doc_id"], pdf["text"],
                                            pdf["source"]):
                lines = [text[i:i + 80] for i in range(0, min(len(text), 4000), 80)]
                blobs.append(build_simple_pdf(
                    [f"Document {doc_id}"] + lines,
                    compress=(doc_id % 2 == 0)))
                urls.append(f"https://site{doc_id % 97}.example/{source}/d{doc_id}.pdf")
            yield pd.DataFrame({"url": urls, "pdf": blobs})

    return docs.mapInPandas(_gen, "url string, pdf binary")


def _extract_pdf_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    gc_was_enabled = gc.isenabled()
    gc.disable()
    try:
        for batch in batches:
            urls = batch.column("url").to_pylist()
            blobs = batch.column("pdf").to_pylist()
            cols: dict[str, list] = {n: [] for n in _PDF_ARROW.names}
            for url, blob in zip(urls, blobs):
                res = extract_pdf_text(bytes(blob) if blob is not None else b"")
                cols["url"].append(url)
                cols["text"].append(res.text)
                cols["n_pages"].append(res.n_pages)
                cols["n_streams"].append(res.n_streams)
                cols["n_bytes_in"].append(len(blob) if blob is not None else 0)
                cols["ok"].append(res.ok)
                cols["err"].append(res.err)
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols[n], type=_PDF_ARROW.field(n).type)
                 for n in _PDF_ARROW.names], schema=_PDF_ARROW)
    finally:
        if gc_was_enabled:
            gc.enable()


def extract_pdfs(pdfs: DataFrame, salt_buckets: int = 256,
                 partitions: Optional[int] = None) -> DataFrame:
    """(url, pdf) → extracted text, salted + Arrow-batched like the HTML
    job."""
    sc = pdfs.sparkSession.sparkContext
    if partitions is None:
        partitions = sc.defaultParallelism * 4
    salted = (pdfs.select("url", "pdf")
              .repartition(partitions,
                           F.pmod(F.xxhash64("url"), F.lit(salt_buckets))))
    return salted.mapInArrow(_extract_pdf_batches, PDF_OUTPUT_SCHEMA)
