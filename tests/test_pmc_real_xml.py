"""A1 + B2 on the reference's REAL PMC JATS corpus (172 committed XMLs).

Until round 5, the JATS parser and overlapping-window chunker were tested
only on synthesized XML. These tests drive the 39-paper "smorgasbord" list
(reference run-ingest.sh:27-40 — the set behind pass1_bundles/) plus the
full 172-file directory through the Spark path and check:
  * every file parses (mapInPandas xml_documents) with >= 1 span;
  * doc-id preference doi > pmid > pmc against an independent in-test
    ElementTree oracle (real corpus: all 172 carry DOIs, so the lower
    rungs stay covered by the synthesized tests in test_sources_promotion);
  * span-sequence invariants on real JATS: strictly increasing offsets,
    kinds in {text, media}, text spans non-empty, media spans carry refs;
  * B2 window-0 == the (whitespace-normalized) abstract when present
    (reference pmc_streaming.py:104-107 abstract-window semantics).
"""

from __future__ import annotations

import glob
import xml.etree.ElementTree as ET
from pathlib import Path

import pytest

XML_DIR = "/root/reference/examples/medlit/pmc_xmls"

pytestmark = pytest.mark.skipif(
    not Path(XML_DIR).exists(), reason="reference corpus not mounted"
)

# reference run-ingest.sh:27-40, list "smorgasbord" (the pass1_bundles set)
SMORGASBORD = [
    "PMC10667925", "PMC11128938", "PMC11548364", "PMC11560769", "PMC11685751",
    "PMC11779774", "PMC11795198", "PMC12035109", "PMC12055610", "PMC12187266",
    "PMC12750049", "PMC12753587", "PMC12754092", "PMC12757429", "PMC12757875",
    "PMC12758042", "PMC12764803", "PMC12764813", "PMC12766194", "PMC12775561",
    "PMC12780067", "PMC12780394", "PMC12783088", "PMC12784210", "PMC12784249",
    "PMC12784773", "PMC12785246", "PMC12785631", "PMC12788344", "PMC2386281",
    "PMC3607291", "PMC4192497", "PMC4374115", "PMC4398279", "PMC4480270",
    "PMC4880116", "PMC5487382", "PMC5579818", "PMC6727998",
]


def _raws(names=None):
    files = sorted(glob.glob(f"{XML_DIR}/*.xml"))
    if names is not None:
        files = [f for f in files if Path(f).stem in names]
    return [(Path(f).stem, Path(f).read_text()) for f in files]


@pytest.fixture(scope="module")
def parsed_all(spark):
    from kgraph_spark.sources.documents import xml_documents

    raws = _raws()
    df = spark.createDataFrame(raws, "pmc string, raw string")
    docs = xml_documents(df).collect()
    return raws, docs


def test_all_172_real_xmls_parse(parsed_all):
    raws, docs = parsed_all
    assert len(raws) == 172
    assert len(docs) == 172
    assert all(len(d["spans"]) >= 1 for d in docs)


def test_smorgasbord_39_parse_with_text(parsed_all):
    """Every paper behind pass1_bundles parses and yields text spans."""
    raws, docs = parsed_all
    expected_ids = set()
    for pmc, raw in raws:
        if pmc in SMORGASBORD:
            root = ET.fromstring(raw)
            el = root.find(".//article-id[@pub-id-type='doi']")
            expected_ids.add(el.text.strip())
    assert len(expected_ids) == 39
    by_id = {d["doc_id"]: d for d in docs}
    for did in expected_ids:
        assert did in by_id, did
        assert any(s["kind"] == "text" and s["text"] for s in by_id[did]["spans"]), did


def test_doc_id_preference_matches_oracle(parsed_all):
    """doc_id = doi > pmid > pmc, checked per file against ElementTree."""
    raws, docs = parsed_all
    got = {d["doc_id"] for d in docs}
    for pmc, raw in raws:
        root = ET.fromstring(raw)

        def gid(t):
            el = root.find(f".//article-id[@pub-id-type='{t}']")
            return el.text.strip() if el is not None and el.text else None

        expected = gid("doi") or gid("pmid") or gid("pmc")
        assert expected in got, (pmc, expected)


def test_span_sequence_invariants_on_real_jats(parsed_all):
    _, docs = parsed_all
    for d in docs:
        offsets = [s["offset"] for s in d["spans"]]
        assert offsets == sorted(offsets) and len(set(offsets)) == len(offsets), d["doc_id"]
        for s in d["spans"]:
            assert s["kind"] in ("text", "media"), d["doc_id"]
            if s["kind"] == "text":
                assert s["text"], d["doc_id"]
            else:
                assert s["media_ref"], d["doc_id"]


def test_abstract_is_window_zero_on_real_corpus(spark, parsed_all):
    """B2: chunk window 0 of each doc equals the normalized abstract text
    whenever the XML has a non-empty abstract."""
    from kgraph_spark.operators.chunking import chunk_spans
    from kgraph_spark.sources.documents import xml_documents

    raws = _raws(set(SMORGASBORD))
    df = spark.createDataFrame(raws, "pmc string, raw string")
    docs_df = xml_documents(df)
    w0 = {
        r["doc_id"]: r["content"]
        for r in chunk_spans(docs_df).filter("chunk_index = 0").collect()
    }
    for pmc, raw in raws:
        root = ET.fromstring(raw)
        abstract = root.find(".//abstract")
        if abstract is None:
            continue
        norm = " ".join("".join(abstract.itertext()).split())
        if not norm:
            continue
        el = root.find(".//article-id[@pub-id-type='doi']")
        did = el.text.strip()
        assert w0.get(did) == norm, did
