"""Static golden outputs for the reference pipelines on the canonical
fixture (100 users / 50 products / 5 categories / 2000 sessions,
seed-free hash datagen — SURVEY.md §5 item 3).

These constants were captured from a verified run and pin BOTH the
datagen and the pipelines: a change to either that alters results
fails here even if the dynamic cross-checks (which recompute from the
same data) still agree.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_analytics_spark.datagen import gen_all
from big_data_analytics_spark.pipelines import (
    clv,
    monthly_sales,
    revenue_by_state,
    top_products,
)

GOLDEN_REVENUE_BY_STATE_TOP3 = [
    ("GA", 56245.72), ("NC", 53927.84), ("IL", 44569.74)]
GOLDEN_TOP_PRODUCTS_TOP3 = [
    ("prod_00049", 22441.05), ("prod_00048", 20531.72), ("prod_00047", 19221.86)]
GOLDEN_MONTHLY_SALES = [
    ("2025-03-01 00:00:00", 90670.53), ("2025-04-01 00:00:00", 117733.40),
    ("2025-05-01 00:00:00", 134590.70), ("2025-06-01 00:00:00", 30869.92)]
GOLDEN_TXN_COUNT = 514
GOLDEN_CLV_SUM = 329367319.52


@pytest.fixture(scope="module")
def data(spark):
    return gen_all(spark, n_users=100, n_products=50, n_categories=5,
                   n_sessions=2000)


def test_golden_revenue_by_state(data):
    got = [(r.state, r.total_revenue)
           for r in revenue_by_state(data["users"], data["transactions"], 3).collect()]
    assert got == GOLDEN_REVENUE_BY_STATE_TOP3


def test_golden_top_products(data):
    got = [(r.product_id, r.total_revenue)
           for r in top_products(data["transactions"], data["products"], 3).collect()]
    assert got == GOLDEN_TOP_PRODUCTS_TOP3


def test_golden_monthly_sales(data):
    got = [(str(r.month), r.total)
           for r in monthly_sales(data["transactions"]).collect()]
    assert got == GOLDEN_MONTHLY_SALES


def test_golden_clv(data):
    c = clv(data["users"], data["transactions"], data["sessions"])
    assert c.count() == 100
    assert data["transactions"].count() == GOLDEN_TXN_COUNT
    assert round(c.agg(F.sum("clv")).first()[0], 2) == GOLDEN_CLV_SUM
