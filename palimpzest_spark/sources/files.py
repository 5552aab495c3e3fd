"""File-per-row sources: text / HTML / PDF / XLS / image / audio directories.

Reference: ``core/data/iter_dataset.py`` — each ``*FileDataset`` yields one
record per file with ``filename`` + parsed ``contents`` (HTML→text with link
inlining, PDF→text via pypdf, XLS→per-sheet rows, image/audio→base64).

Spark-first: directory listings become distributed scans —
``spark.read.text`` (wholetext) for text-likes, ``binaryFile`` for bytes —
so a million-file corpus parallelizes by file without driver involvement.
Parsers run as Arrow-batched ``mapInPandas``. PDF/XLS/audio decoders need
libraries this container doesn't ship (pypdf/openpyxl/librosa); those
parse steps raise ``NotImplementedError`` with the dependency named, while
the scan+schema+batching plumbing stays real and tested (same policy as
``functions/multimodal.py``). HTML→text is implemented for real (stdlib
``html.parser``), matching ``iter_dataset.py:216-281`` semantics: scripts
and styles dropped, links inlined as ``text (href)``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def text_files(spark: SparkSession, path: str) -> DataFrame:
    """One row per file: (filename, contents). ``iter_dataset.py:385-422``."""
    return (
        spark.read.option("wholetext", True)
        .text(path)
        .select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("filename"),
            F.col("value").alias("contents"),
        )
    )


def _html_to_text(html: str) -> str:
    from html.parser import HTMLParser

    class Extract(HTMLParser):
        def __init__(self) -> None:
            super().__init__()
            self.parts: list[str] = []
            self._skip = 0
            self._href: str | None = None

        def handle_starttag(self, tag: str, attrs: list) -> None:
            if tag in ("script", "style"):
                self._skip += 1
            elif tag == "a":
                self._href = dict(attrs).get("href")

        def handle_endtag(self, tag: str) -> None:
            if tag in ("script", "style") and self._skip:
                self._skip -= 1
            elif tag == "a" and self._href:
                self.parts.append(f"({self._href})")
                self._href = None

        def handle_data(self, data: str) -> None:
            if not self._skip and data.strip():
                self.parts.append(data.strip())

    p = Extract()
    try:
        p.feed(html)
    except Exception:
        return html
    return " ".join(p.parts)


def html_files(spark: SparkSession, path: str) -> DataFrame:
    """HTML → visible text with links inlined (``iter_dataset.py:216-281``)."""
    raw = text_files(spark, path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "filename": pdf["filename"],
                    "contents": pdf["contents"].fillna("").map(_html_to_text),
                }
            )

    return raw.mapInPandas(parse, schema="filename string, contents string")


def binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    return df.select(
        F.element_at(F.split("path", "/"), -1).alias("filename"),
        "content",
        "length",
        "modificationTime",
    )


def pdf_files(spark: SparkSession, path: str, parser: str = "stub") -> DataFrame:
    """PDF → text (``iter_dataset.py:326-382``). Real parsing needs pypdf
    (not in this container): ``parser="pypdf"`` raises with guidance;
    ``parser="stub"`` emits a deterministic placeholder so the distributed
    plumbing is exercised end-to-end."""
    raw = binary_files(spark, path, glob="*.pdf")
    if parser == "pypdf":
        raise NotImplementedError(
            "PDF text extraction needs pypdf, which this container does not "
            "ship; run with parser='stub' here, or install pypdf on the "
            "cluster image and swap the stub body for pypdf.PdfReader"
        )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "filename": pdf["filename"],
                    "contents": [
                        f"[pdf-stub len={0 if b is None else len(b)}]"
                        for b in pdf["content"]
                    ],
                }
            )

    return raw.select("filename", "content").mapInPandas(
        parse, schema="filename string, contents string"
    )


def xls_files(spark: SparkSession, path: str, parser: str = "stub") -> DataFrame:
    """XLS → one row per sheet (``iter_dataset.py:425-469``); openpyxl gated."""
    raw = binary_files(spark, path, glob="*.xls*")
    if parser == "openpyxl":
        raise NotImplementedError(
            "XLS parsing needs openpyxl/xlrd (not in this container); "
            "parser='stub' exercises the scan + per-sheet fan-out plumbing"
        )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fn, b in zip(pdf["filename"], pdf["content"]):
                rows.append({"filename": fn, "sheet": "Sheet1",
                             "contents": f"[xls-stub len={0 if b is None else len(b)}]"})
            yield pd.DataFrame(rows, columns=["filename", "sheet", "contents"])

    return raw.select("filename", "content").mapInPandas(
        parse, schema="filename string, sheet string, contents string"
    )


def audio_files(spark: SparkSession, path: str) -> DataFrame:
    """Audio as opaque binary + metadata (``iter_dataset.py:472-511``) —
    feature extraction is ``functions.multimodal.extract_features``."""
    return binary_files(spark, path).withColumn("modality", F.lit("audio"))


def image_files(spark: SparkSession, path: str) -> DataFrame:
    """Images as opaque binary (``iter_dataset.py:284-323``)."""
    return binary_files(spark, path).withColumn("modality", F.lit("image"))
