"""Round-6 regression locks.

1. DRIVER_WINDOW schema lint: the correctness driver canonicalizes results
   through ``pandas.DataFrame.sort_values``, which cannot sort object-list
   cells — an array/map/struct column in any driver-window query errors the
   whole row (x40 in round 4, x42 in round 5: the same bug class two rounds
   running). This lint makes the class impossible: no complex type may
   appear in the output schema of any DRIVER_WINDOW query. Arrays must ship
   serialized (``concat_ws('|', ...)`` / ``array_to_string``).
2. x42_product_quantize itself now ships codes serialized; pin that.
"""

from __future__ import annotations

import pytest

from pyspark.sql.types import ArrayType, MapType, StructType

from dwh_etl_framework_spark.queries import DRIVER_WINDOW, QUERIES

from conftest import SF_DIR


@pytest.mark.parametrize("name", DRIVER_WINDOW)
def test_driver_window_schema_is_canonicalizable(spark, name):
    """No array/map/struct column may reach the driver's pandas hasher."""
    sdf = QUERIES[name].fn(spark, SF_DIR)
    complex_cols = [
        (f.name, f.dataType.simpleString())
        for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name}: driver-window query outputs complex-typed columns "
        f"{complex_cols} — the driver canonicalizer cannot sort these; "
        f"serialize (concat_ws('|', transform(col, c -> cast(c as string))))"
    )


def test_x42_codes_are_serialized(spark):
    sdf = QUERIES["x42_product_quantize"].fn(spark, SF_DIR)
    field = {f.name: f for f in sdf.schema.fields}["codes"]
    assert field.dataType.simpleString() == "string"
    row = sdf.limit(1).collect()[0]
    # m=4 subspaces -> 4 '|'-separated integer codes
    parts = row["codes"].split("|")
    assert len(parts) == 4 and all(p.lstrip("-").isdigit() for p in parts)
