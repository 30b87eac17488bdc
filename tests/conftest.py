from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pdf_ocr_spark.session import get_spark

    s = get_spark(app="pytest", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"),
                  shuffle_partitions=8)
    yield s
    s.stop()


def rows_to_tuples(spans) -> list[tuple]:
    return [(s.kind, s.text, s.media_ref, s.offset) for s in spans]
