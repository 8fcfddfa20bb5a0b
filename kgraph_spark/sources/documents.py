"""Document sources (SURVEY.md §2 A1–A4).

A1 JATS/PMC-style XML parse → interleaved span documents (pUDF over raw
XML strings; stdlib ElementTree — per-document work is bounded, parallelism
comes from partitions, not per-doc streaming: SURVEY §2 A3 note).
A2 JSON paper parse → spark.read.json + column mapping.
A4 bundle dir source — filename is ground truth for the paper id
(reference dedup.py:283-295: LLM-hallucinated ids are never trusted)."""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgraph_spark.schemas import DOCUMENTS


def parse_jats_xml(raw: str) -> dict | None:
    """Minimal JATS-shaped parse (reference examples/medlit/pipeline/parser.py:76-228):
    doc_id preference doi > pmid > article-id; title; abstract; body <sec>
    paragraphs via itertext; <graphic|fig> elements become media spans."""
    try:
        root = ET.fromstring(raw)
    except ET.ParseError:
        return None

    def _id(pub_type: str) -> str | None:
        el = root.find(f".//article-id[@pub-id-type='{pub_type}']")
        return el.text.strip() if el is not None and el.text else None

    doc_id = _id("doi") or _id("pmid") or _id("pmc")
    if not doc_id:
        return None
    title_el = root.find(".//article-title")
    title = "".join(title_el.itertext()).strip() if title_el is not None else None

    spans: list[tuple] = []
    cursor = 0

    def add_text(text: str) -> None:
        nonlocal cursor
        text = " ".join(text.split())
        if not text:
            return
        spans.append(("text", text, None, cursor))
        cursor += len(text) + 2

    def add_media(ref: str) -> None:
        nonlocal cursor
        spans.append(("media", "", ref, cursor))
        cursor += 1

    abstract = root.find(".//abstract")
    if abstract is not None:
        add_text("".join(abstract.itertext()))
    body = root.find(".//body")
    if body is not None:
        for sec in body.iter():
            if sec.tag == "p":
                add_text("".join(sec.itertext()))
            elif sec.tag in ("graphic", "fig", "media"):
                href = sec.get("{http://www.w3.org/1999/xlink}href") or sec.get("href") or ""
                add_media(f"media://{doc_id}/{href or len(spans)}")
    if not spans:
        return None
    return {"doc_id": doc_id, "title": title, "spans": spans}


def xml_documents(xml_df: DataFrame, raw_col: str = "raw") -> DataFrame:
    """(raw xml string) → documents(doc_id, spans). Unparseable rows drop."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf[raw_col]:
                d = parse_jats_xml(raw or "")
                if d is not None:
                    rows.append({"doc_id": d["doc_id"], "spans": d["spans"]})
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    return xml_df.select(raw_col).mapInPandas(gen, schema=DOCUMENTS)


def json_paper_documents(spark: SparkSession, path: str) -> DataFrame:
    """A2: med-lit-schema-ish Paper JSON → span documents. Expects
    {paper_id, title?, abstract?, sections:[{name?, text}]}."""
    return paper_spans(spark.read.json(path))


def paper_spans(raw: DataFrame) -> DataFrame:
    """A2 core transform over already-parsed paper rows (paper_id,
    abstract?, sections:array<struct<…,text>>): abstract first, then section
    texts in order; empty texts dropped; offset = position among the kept
    texts; zero-span papers dropped (reference extract.py builds the same
    section walk). Split from the reader so the driver oracle can feed
    synthesized rows without a JSON file on disk."""
    sections = F.coalesce(F.col("sections"), F.array())
    texts = F.filter(
        F.concat(
            F.array(F.coalesce(F.col("abstract"), F.lit(""))),
            F.transform(sections, lambda s: F.coalesce(s["text"], F.lit(""))),
        ),
        lambda t: t != "",
    )
    spans = F.transform(
        texts,
        lambda t, i: F.struct(
            F.lit("text").alias("kind"),
            t.alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    return raw.select(F.col("paper_id").alias("doc_id"), spans.alias("spans")).filter(
        F.size("spans") > 0
    )


def bundle_paper_id_from_filename(df: DataFrame) -> DataFrame:
    """A4: paper_id from the bundle filename — ground truth over any id in
    the payload (reference dedup.py:287-289)."""
    return df.withColumn(
        "paper_id",
        F.regexp_extract(F.input_file_name(), r"paper_([A-Za-z0-9]+)\.json", 1),
    )
