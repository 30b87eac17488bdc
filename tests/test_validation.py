"""Contract-validation operator: rule compilation + assert columns."""

from __future__ import annotations

import pytest

from pdf_ocr_spark.operators.validation import (
    compile_contract,
    validate,
    violation_histogram,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [
            (1, "en", "src1", 100),
            (2, "xx", "src2", 100),     # bad lang
            (3, "en", "nope", 100),     # bad source pattern
            (4, "en", None, 100),       # null source
            (5, "en", "src9", 9999),    # out of range
            (6, None, "src1", 10),      # null lang AND too short
        ],
        "doc_id long, lang string, source string, n_chars long",
    )


CONTRACT = {
    "lang": {"valid_values": ["en", "de"], "not_null": True},
    "source": {"pattern": r"src\d+", "not_null": True},
    "n_chars": {"min": 50, "max": 400},
}


def test_rule_count(spark):
    assert len(compile_contract(CONTRACT)) == 6


def test_validate_flags_and_violations(spark, df):
    out = {r.doc_id: r for r in validate(df, CONTRACT).collect()}
    assert out[1].valid and out[1].violations == []
    assert out[2].violations == ["lang.valid_values"]
    assert out[3].violations == ["source.pattern"]
    # null value: pattern rule passes (absence gated by not_null only)
    assert out[4].violations == ["source.not_null"]
    assert out[5].violations == ["n_chars.max"]
    assert out[6].violations == ["lang.not_null", "n_chars.min"]
    assert out[6].n_violations == 2 and not out[6].valid


def test_hard_gate_mode(spark, df):
    kept = validate(df, CONTRACT, keep_invalid=False)
    assert [r.doc_id for r in kept.collect()] == [1]
    assert kept.columns == df.columns  # assert columns stripped


def test_histogram(spark, df):
    h = {
        r.violation: r.n_docs
        for r in violation_histogram(validate(df, CONTRACT)).collect()
    }
    assert h == {
        "lang.valid_values": 1,
        "source.pattern": 1,
        "source.not_null": 1,
        "n_chars.max": 1,
        "lang.not_null": 1,
        "n_chars.min": 1,
    }
