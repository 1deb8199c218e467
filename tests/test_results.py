"""W3C SPARQL results serializers: CSV/TSV/JSON forms over solution
DataFrames (spec: sparql11-results-csv-tsv, sparql11-results-json)."""

import csv
import glob
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rify_spark.results import (  # noqa: E402
    results_json,
    results_json_lines,
    results_tsv_lines,
    write_results_csv,
    write_results_tsv,
)
from rify_spark.sparql import sparql_select  # noqa: E402


@pytest.fixture(scope="module")
def solutions(spark):
    # one clean row, one row with an unbound (NULL) var, one row whose
    # values need quoting/escaping in every format
    return spark.createDataFrame(
        [
            ("alice", "bob"),
            ("carol", None),
            ('say "hi", ok\tnow\nbye\\', "x"),
        ],
        "a string, b string",
    )


def _read_text_files(path):
    lines = []
    for f in sorted(glob.glob(os.path.join(path, "part-*"))):
        with open(f, encoding="utf-8") as fh:
            lines.extend(fh.read().splitlines())
    return lines


def _read_csv_rows(path):
    rows = []
    for f in sorted(glob.glob(os.path.join(path, "part-*"))):
        with open(f, encoding="utf-8", newline="") as fh:
            rows.extend(csv.reader(fh))  # handles multiline quoted fields
    return rows


def test_csv_round_trips_through_csv_reader(solutions, tmp_path):
    out = str(tmp_path / "res_csv")
    write_results_csv(solutions.coalesce(1), out)
    rows = _read_csv_rows(out)
    assert rows[0] == ["a", "b"]
    body = sorted(rows[1:])
    # unbound -> empty field; RFC 4180 quoting preserves the hard value
    assert ["alice", "bob"] in body
    assert ["carol", ""] in body
    assert ['say "hi", ok\tnow\nbye\\', "x"] in body


def test_tsv_lines_escape_and_quote(solutions):
    got = sorted(
        r.line for r in results_tsv_lines(solutions).collect()
    )
    assert '"alice"\t"bob"' in got
    assert '"carol"\t' in got
    hard = next(l for l in got if l.startswith('"say'))
    # spec escapes: \\ \t \n \" — and the tab separator survives intact
    assert hard == '"say \\"hi\\", ok\\tnow\\nbye\\\\"\t"x"'


def test_tsv_file_has_var_header(solutions, tmp_path):
    out = str(tmp_path / "res_tsv")
    write_results_tsv(solutions.coalesce(1), out)
    lines = _read_text_files(out)
    assert lines[0] == "?a\t?b"
    assert '"alice"\t"bob"' in lines[1:]
    assert '"carol"\t' in lines[1:]


def test_json_lines_omit_unbound(solutions):
    objs = [
        json.loads(r.line) for r in results_json_lines(solutions).collect()
    ]
    by_a = {o["a"]["value"]: o for o in objs}
    assert by_a["alice"]["b"] == {"type": "literal", "value": "bob"}
    # unbound variables are omitted from the binding object (spec §3.2.2)
    assert "b" not in by_a["carol"]
    assert all(o["a"]["type"] == "literal" for o in objs)


def test_json_document_form(solutions):
    doc = results_json(solutions)
    assert doc["head"] == {"vars": ["a", "b"]}
    assert len(doc["results"]["bindings"]) == 3
    assert {"a": {"type": "literal", "value": "carol"}} in doc["results"][
        "bindings"
    ]


def test_json_row_cap(solutions):
    with pytest.raises(ValueError, match="max_rows"):
        results_json(solutions, max_rows=2)


def test_end_to_end_from_sparql_optional(spark):
    quads = spark.createDataFrame(
        [
            ("a", "knows", "b", "default_graph"),
            ("b", "knows", "c", "default_graph"),
            ("b", "age", "30", "default_graph"),
        ],
        "s string, p string, o string, g string",
    )
    df = sparql_select(
        quads,
        "SELECT ?x ?age WHERE { ?x <knows> ?y "
        "OPTIONAL { ?x <age> ?age } }",
    )
    doc = results_json(df)
    assert doc["head"]["vars"] == ["x", "age"]
    binds = doc["results"]["bindings"]
    assert {"x": {"type": "literal", "value": "a"}} in binds  # age unbound
    assert {
        "x": {"type": "literal", "value": "b"},
        "age": {"type": "literal", "value": "30"},
    } in binds
