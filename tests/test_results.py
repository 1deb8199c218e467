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
    results_xml,
    results_xml_ask,
    results_xml_fragments,
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


def test_xml_fragments_escape_and_omit_unbound(solutions):
    lines = {r.line for r in results_xml_fragments(solutions).collect()}
    # unbound -> the binding element is omitted entirely (spec §2.3.1)
    assert (
        '<result><binding name="a"><literal>carol</literal></binding>'
        "</result>" in lines
    )
    hard = next(line for line in lines if "say" in line)
    # raw tab is legal, preserved XML character data; newline must be a
    # character reference so the fragment stays ONE physical line
    assert '<literal>say "hi", ok\tnow&#10;bye\\</literal>' in hard
    assert all("\n" not in line for line in lines)


def test_xml_fragment_escapes_markup(spark):
    df = spark.createDataFrame([("<b> & </b>",)], "a string")
    (row,) = results_xml_fragments(df).collect()
    assert "&lt;b&gt; &amp; &lt;/b&gt;" in row.line
    assert "<b>" not in row.line


def test_xml_carriage_return_survives_round_trip(spark):
    import xml.etree.ElementTree as ET

    # a raw \r in the document would be normalized to \n by every
    # conforming parser (XML 1.0 §2.11); the &#13; reference survives
    df = spark.createDataFrame([("a\rb\nc",)], "a string")
    root = ET.fromstring(results_xml(df))
    ns = {"sr": "http://www.w3.org/2005/sparql-results#"}
    lit = root.find("sr:results/sr:result/sr:binding/sr:literal", ns)
    assert lit.text == "a\rb\nc"


def test_xml_document_parses_and_round_trips(solutions):
    import xml.etree.ElementTree as ET

    root = ET.fromstring(results_xml(solutions))
    ns = {"sr": "http://www.w3.org/2005/sparql-results#"}
    assert [v.get("name") for v in root.findall("sr:head/sr:variable", ns)] == [
        "a",
        "b",
    ]
    results = root.findall("sr:results/sr:result", ns)
    assert len(results) == 3
    got = {
        tuple(
            (b.get("name"), b.find("sr:literal", ns).text)
            for b in res.findall("sr:binding", ns)
        )
        for res in results
    }
    assert (("a", "carol"),) in got  # b omitted
    assert (("a", "alice"), ("b", "bob")) in got
    assert (("a", 'say "hi", ok\tnow\nbye\\'), ("b", "x")) in got


def test_xml_row_cap_and_ask(solutions):
    import xml.etree.ElementTree as ET

    with pytest.raises(ValueError, match="max_rows"):
        results_xml(solutions, max_rows=2)
    ns = {"sr": "http://www.w3.org/2005/sparql-results#"}
    for value, lex in ((True, "true"), (False, "false")):
        root = ET.fromstring(results_xml_ask(value))
        assert root.find("sr:boolean", ns).text == lex
