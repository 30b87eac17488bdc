"""End-to-end contract pipeline: extract -> header mapping -> contract
validation -> records/metrics/report (the docpact run_pipeline switch
path)."""

from __future__ import annotations

from pdf_ocr_spark.plans.contract_pipeline import run_contract_pipeline
from pdf_ocr_spark.corpus import generate_doc
from pdf_ocr_spark.extract.schema import INPUT_SCHEMA, span_dicts

CONTRACT = {
    "schema": {
        "port": ["port"],
        "vessel": ["vessel"],
        "tonnage": ["tonnage", "tonnage (mt)"],
        "eta": ["eta"],
        "cargo": ["cargo"],
        "grade": ["grade"],
    },
    "rules": {
        "tonnage": {"pattern": r"[\d,]+"},
        "port": {"not_null": True},
    },
}


def _input(spark, ids):
    return spark.createDataFrame(
        [{"doc_id": d, "spans": span_dicts(generate_doc(d))} for d in ids],
        INPUT_SCHEMA,
    )


def test_pipeline_products(spark, tmp_path):
    ids = [f"pdfish-{i:06d}" for i in range(12)] + [
        f"grid-{i:06d}" for i in range(6)
    ]
    out = run_contract_pipeline(
        spark, CONTRACT, _input(spark, ids), out_dir=str(tmp_path / "o")
    )
    records = out["records"].collect()
    assert records, "no records extracted"
    # every record carries validation verdicts
    assert all(r.valid in (True, False) for r in records)
    # header mapping resolved at least the standard headers
    canon = {r.canonical for r in records if r.canonical}
    assert "port" in canon and "tonnage" in canon

    metrics = {r.doc_id: r for r in out["metrics"].collect()}
    assert set(metrics) == set(ids)
    assert all(m.spans_in > 0 for m in metrics.values())

    # report aggregates only real violations
    report = {r.violation: r.n_docs for r in out["report"].collect()}
    assert all(n > 0 for n in report.values())

    # written tables round-trip
    assert spark.read.parquet(str(tmp_path / "o" / "records")).count() == len(
        records
    )


def test_rules_flag_nonmatching_values(spark):
    ids = [f"pdfish-{i:06d}" for i in range(8)]
    out = run_contract_pipeline(spark, CONTRACT, _input(spark, ids))
    bad = out["records"].filter(
        (~out["records"].valid)
        & (out["records"].canonical == "tonnage")
    )
    # tonnage cells are digit/comma strings in the corpus EXCEPT where a
    # word column was mapped under the tonnage heading; both outcomes are
    # fine — what must hold is consistency of flag and csv
    for r in out["records"].collect():
        assert r.valid == (r.violations_csv == "")
    assert bad.count() == out["records"].filter(
        out["records"].violations_csv.contains("tonnage.pattern")
    ).count()


def test_typed_contract_produces_mapped_records(spark):
    """A contract with declared column types adds the 'mapped' output:
    wide records from the deterministic dimension/measure mapping, one
    per (data row x unpivot group) per table block, validated by the
    same rules as assert columns."""
    ids = [f"pdfish-{i:06d}" for i in range(6)]
    contract = dict(CONTRACT, types={"tonnage": "float"})
    out = run_contract_pipeline(spark, contract, _input(spark, ids))
    assert "mapped" in out
    rows = out["mapped"].collect()
    assert rows, "typed contract produced no mapped records"
    # all headers here are single-part: strings become shared cell
    # columns, the float tonnage is the measure -> one implicit group
    assert all(r.group_key == "" for r in rows)
    assert any(r.port is not None for r in rows)
    assert any(r.tonnage is not None for r in rows)
    # contract rules ride the wide records as assert columns
    assert "violations" in out["mapped"].columns
    for r in rows:
        assert isinstance(list(r.violations), list)
