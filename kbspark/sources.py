"""Raw-dump sources (SURVEY.md §2.A S1).

The engine's primary input is the Iceberg-style pages table, but the
reference's first stage is a streaming XML scan of the Wikipedia
multistream dump (qurator/wikipedia/xml.py:105-143): iterparse per
``<page>``, namespace validation (xml.py:15-20), page_id/title/text
extraction, incremental memory release. This module re-expresses that
shape Spark-first: ``binaryFile`` scan of dump shards → Arrow-batched
``mapInPandas`` running an incremental ``iterparse`` per shard → pages
rows. Each shard parses independently (the multistream format exists
precisely for that), so the stage is narrow and scales with shard count.

A WARC-ish reader for Common-Crawl-style records is included for the
web corpus: records of the simple form used by our fixtures
(header lines + payload separated by CRLFCRLF).
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WIKI_NS = "{http://www.mediawiki.org/xml/export-0.10/}"

XML_PAGES_SCHEMA = "page_id long, title string, text string, shard string"


def _iter_pages(data: bytes, ns: str = WIKI_NS):
    """Incremental parse of one dump shard; clears elements as it goes
    (the xml.py:105-143 pattern: bounded memory regardless of shard
    size)."""
    context = ET.iterparse(io.BytesIO(data), events=("end",))
    for _event, elem in context:
        if elem.tag == f"{ns}page":
            ns_el = elem.find(f"{ns}ns")
            if ns_el is not None and ns_el.text not in (None, "0"):
                elem.clear()
                continue
            id_el = elem.find(f"{ns}id")
            title_el = elem.find(f"{ns}title")
            text_el = elem.find(f"{ns}revision/{ns}text")
            yield (
                int(id_el.text) if id_el is not None else None,
                title_el.text if title_el is not None else None,
                text_el.text if text_el is not None else "",
            )
            elem.clear()


def validate_namespace(data: bytes, ns: str = WIKI_NS) -> bool:
    """Root-element namespace check (xml.py:15-20 analog)."""
    for _event, elem in ET.iterparse(io.BytesIO(data), events=("start",)):
        return elem.tag.startswith(ns)
    return False


def read_wiki_xml(spark: SparkSession, path: str, ns: str = WIKI_NS) -> DataFrame:
    """Dump shards (one XML file per shard) → (page_id, title, text,
    shard). Namespace-0 pages only, like the reference's scan."""
    files = spark.read.format("binaryFile").load(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if not validate_namespace(data, ns):
                    raise ValueError(f"wrong XML namespace in {fpath}")
                for page_id, title, text in _iter_pages(data, ns):
                    rows.append((page_id, title, text, fpath))
            yield pd.DataFrame(
                rows, columns=["page_id", "title", "text", "shard"]
            )

    return files.select("path", "content").mapInPandas(
        run, schema=XML_PAGES_SCHEMA
    )


WARC_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def read_warcish(spark: SparkSession, path: str) -> DataFrame:
    """Minimal Common-Crawl-style record reader: shards of concatenated
    records, each ``WARC/1.0\\r\\nHeader: v...\\r\\n\\r\\npayload`` with
    headers WARC-Target-URI, WARC-Date, Content-Language. Produces the
    input_hint pages shape."""
    files = spark.read.format("binaryFile").load(path)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for rec in bytes(content).split(b"WARC/1.0\r\n"):
                    if not rec.strip():
                        continue
                    head, _, payload = rec.partition(b"\r\n\r\n")
                    headers = dict(
                        line.split(": ", 1)
                        for line in head.decode("utf-8", "replace").splitlines()
                        if ": " in line
                    )
                    payload = payload.rstrip(b"\r\n")
                    text = payload.decode("utf-8", "replace")
                    rows.append(
                        (
                            headers.get("WARC-Target-URI"),
                            pd.to_datetime(
                                headers.get("WARC-Date"), errors="coerce", utc=True
                            ).tz_localize(None)
                            if headers.get("WARC-Date")
                            else None,
                            payload,
                            text,
                            headers.get("Content-Language", "und"),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return files.select("content").mapInPandas(run, schema=WARC_SCHEMA)
