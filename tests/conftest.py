from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from standard_data_quality_framework_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sdqf_tests", cores=4, shuffle_partitions=4,
                  extra_conf={"spark.driver.memory": "4g"})
    yield s


@pytest.fixture(scope="session")
def pages_pdf():
    from standard_data_quality_framework_spark.fixtures import make_pages
    return make_pages(n=600, seed=7)


@pytest.fixture(scope="session")
def pages_df(spark, pages_pdf, tmp_path_factory):
    # round-trip through parquet so Spark sees real binary/timestamp types
    import pyarrow as pa
    import pyarrow.parquet as pq
    p = tmp_path_factory.mktemp("pages") / "pages.parquet"
    schema = pa.schema([
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ])
    pq.write_table(
        pa.Table.from_pandas(pages_pdf, schema=schema, preserve_index=False),
        str(p))
    return spark.read.parquet(str(p))


@pytest.fixture(scope="session")
def golden(pages_pdf):
    from tests.oracle import label_pages
    return label_pages(pages_pdf)
