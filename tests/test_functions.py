"""Unit tests for the columnar scalar library additions."""

import pytest

pytestmark = pytest.mark.spark


def test_parse_css_color(spark):
    from pyspark.sql import functions as F

    from pdf_ocr_spark.functions import parse_css_color

    cases = [
        ("#ff0000", (255, 0, 0)),
        ("#F00", (255, 0, 0)),
        ("#abc", (170, 187, 204)),
        ("rgb(10, 20, 30)", (10, 20, 30)),
        ("rgb(10,20,30)", (10, 20, 30)),
        ("RED", (255, 0, 0)),
        ("  orange ", (255, 166, 0)),
        ("lightgrey", (212, 212, 212)),
        ("#ffffff", None),  # white dropped
        ("#fff", None),
        ("rgb(255, 255, 255)", None),
        ("transparent", None),
        ("inherit", None),
        ("none", None),
        ("", None),
        ("not-a-color", None),
        ("#12345", None),  # bad hex length
        ("rgb(1, 2)", None),  # malformed
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], ["s"])
    got = {
        r.s: (None if r.c is None else (r.c.r, r.c.g, r.c.b))
        for r in df.select("s", parse_css_color(F.col("s")).alias("c")).collect()
    }
    for s, want in cases:
        assert got[s] == want, (s, got[s], want)
