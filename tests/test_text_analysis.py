from __future__ import annotations

import pytest


def test_code_likeness_hand_case(spark):
    import math

    from kgraph_spark.operators.text_analysis import code_likeness

    code = "int main() {\n  x = 1;\n  y = 2;\n}"
    prose = "The quick brown fox jumps over the lazy dog near the bank."
    df = spark.createDataFrame(
        [("c1", code), ("p1", prose)], "doc_id string, text string"
    )
    out = {r["doc_id"]: r for r in code_likeness(df).collect()}
    c, p = out["c1"], out["p1"]
    assert c["n_lines"] == 4 and p["n_lines"] == 1
    # {}()=;=; -> 8 structural symbols; 2 of 4 lines indented, 2 end ';'
    assert c["sym_ratio"] == pytest.approx(8.0 / len(code), abs=1e-6)
    assert c["indent_ratio"] == pytest.approx(0.5, abs=1e-9)
    assert c["semi_ratio"] == pytest.approx(0.5, abs=1e-9)
    logit = round(-4.0 + 14.0 * (8.0 / len(code)) + 3.0 * 0.5 + 4.0 * 0.5, 6)
    assert c["prob"] == pytest.approx(1 / (1 + math.exp(-logit)), abs=1e-5)
    assert bool(c["is_code"]) is True
    assert bool(p["is_code"]) is False and p["sym_ratio"] == 0.0


def test_license_markers_hand_case(spark):
    from kgraph_spark.operators.text_analysis import license_markers

    rows = [
        ("a", "Copyright 2024 ACME. All rights reserved. copyright."),
        ("b", "Licensed under the MIT License terms."),
        ("c", "Released under the GNU General Public License v3."),
        ("d", "Shared as Creative Commons CC-BY 4.0."),
        ("e", "Just a plain sentence about dogs."),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["doc_id"]: r for r in license_markers(df).collect()}
    assert out["a"]["n_copyright"] == 2 and bool(out["a"]["license_flagged"])
    assert bool(out["b"]["has_mit"]) and bool(out["b"]["license_flagged"])
    assert bool(out["c"]["has_gpl"])
    assert bool(out["d"]["has_cc"])
    assert not bool(out["e"]["license_flagged"])
    assert out["e"]["n_copyright"] == 0
