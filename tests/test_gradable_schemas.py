"""Every registered query must return a frame the *driver's*
canonicalizer can grade.

The driver canonicalizes results with ``pandas.sort_values`` over all
columns before hashing; array/map/struct-typed columns arrive in pandas
as Python lists/dicts, which are unhashable and crash the sort (the
round-2 ``ecom_products_enriched`` ERR). Our local comparator tolerates
lists, so without this guard a query can be green locally and red in
the driver.

The rule: graded output columns must be atomic (string / numeric /
bool / date / timestamp / binary). Queries that conceptually produce
collections serialize them (``to_json`` / ``concat_ws``) in the graded
projection and keep the typed API in ``operators``/``pipelines``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from big_data_analytics_spark.queries import load_all
from tests.conftest import SF_SMOKE

REGISTRY = load_all()

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_output_schema_is_driver_sortable(spark, name):
    df = REGISTRY[name].spark_fn(spark, SF_SMOKE)
    bad = [f.name for f in df.schema.fields if isinstance(f.dataType, _COMPLEX)]
    assert not bad, (
        f"{name} returns complex-typed columns {bad}; the driver's "
        "pandas sort_values canonicalizer cannot hash them — serialize "
        "with to_json()/concat_ws() in the graded projection"
    )
