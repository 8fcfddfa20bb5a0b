from __future__ import annotations

import pytest

from kgraph_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kgraph_spark_tests", parallelism=8, shuffle_partitions=8)
    yield s


def plan_text(df) -> str:
    """Formatted physical plan as a string (explain prints to stdout)."""
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()
