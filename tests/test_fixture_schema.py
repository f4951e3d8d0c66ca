"""Fixture-schema canary: fail ONE named test (not 50+ queries) when
the driver regenerates /root/testdata with a different physical layout.

Round-5 incident: events.ts changed from parquet timestamp[ns] to
timestamp[us] and every events consumer broke at analysis time. The
catalog normalizes ts behind normalize_events_ts; this test pins both
the normalized logical schema and the set of physical layouts that
normalization is known to handle.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from presto_0_235_spark.catalog import TABLES, load_table
from tests.conftest import SF_DIR

# Physical ts encodings normalize_events_ts knows how to restore.
KNOWN_TS_LAYOUTS = {"timestamp[ns]", "timestamp[us]", "int64"}


def test_events_physical_ts_layout_is_known():
    footer = pq.read_schema(f"{SF_DIR}/events.parquet")
    ts_type = str(footer.field("ts").type)
    assert ts_type in KNOWN_TS_LAYOUTS, (
        f"events.ts fixture layout changed to {ts_type!r}; teach "
        "catalog.normalize_events_ts (and this test) the new layout"
    )


def test_events_normalized_schema(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    fields = {f.name: f.dataType for f in df.schema.fields}
    # LTZ TimestampType required: event-time ops + withWatermark
    # reject TIMESTAMP_NTZ.
    assert isinstance(fields["ts"], T.TimestampType), fields["ts"]
    assert isinstance(fields["event_id"], T.LongType)
    assert isinstance(fields["user_id"], T.LongType)
    assert isinstance(fields["event_type"], T.StringType)
    assert isinstance(fields["value"], T.DoubleType)


@pytest.mark.parametrize("name", TABLES)
def test_all_fixture_tables_load(spark, sf_dir, name):
    df = load_table(spark, sf_dir, name)
    assert len(df.schema.fields) > 0
