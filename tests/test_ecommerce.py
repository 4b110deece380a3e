"""E-commerce fixture invariants (FIXTURES.md §9) + pipeline semantics.

The datagen invariants come straight from the reference generator's
logic (/root/reference/dataset_generator.py:269-299,388-404); pipeline
results are cross-checked against independent recomputations in pandas
on the collected (small) fixture — a second implementation acting as
oracle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_analytics_spark.datagen import gen_all
from big_data_analytics_spark.pipelines import (
    clv,
    monthly_sales,
    product_daily_metrics,
    products_enriched,
    revenue_by_state,
    top_products,
    user_session_metrics,
    user_spend,
)


@pytest.fixture(scope="module")
def data(spark):
    d = gen_all(spark, n_users=100, n_products=50, n_categories=5, n_sessions=2000)
    return {k: v.cache() for k, v in d.items()}


def test_cardinalities(data):
    assert data["categories"].count() == 5
    assert data["products"].count() == 50
    assert data["users"].count() == 100
    assert data["sessions"].count() == 2000
    n_conv = data["sessions"].filter(F.col("conversion_status") == "converted").count()
    assert data["transactions"].count() == n_conv > 300


def test_determinism(spark, data):
    """Same seed inputs → byte-identical output, independent of run."""
    again = gen_all(spark, n_users=100, n_products=50, n_categories=5, n_sessions=2000)
    for name in ("users", "products", "sessions", "transactions"):
        a = sorted(str(r) for r in data[name].collect())
        b = sorted(str(r) for r in again[name].collect())
        assert a == b, f"{name} not deterministic"


def test_session_duration_invariants(data):
    """Σ view_duration == duration_seconds == end-start (FIXTURES §9.4)."""
    bad = data["sessions"].filter(
        F.aggregate(
            "page_views", F.lit(0),
            lambda acc, p: acc + p.getField("view_duration")
        ) != F.col("duration_seconds")
    ).count()
    assert bad == 0
    bad2 = data["sessions"].filter(
        (F.unix_timestamp(F.to_timestamp("end_time"))
         - F.unix_timestamp(F.to_timestamp("start_time")))
        != F.col("duration_seconds")
    ).count()
    assert bad2 == 0


def test_conversion_invariants(data):
    """converted ⇒ cart non-empty ∧ checkout+confirmation page views;
    browsed ⇒ empty cart (FIXTURES §9.3)."""
    conv = data["sessions"].filter(F.col("conversion_status") == "converted")
    assert conv.filter(F.size(F.map_keys("cart_contents")) == 0).count() == 0
    assert conv.filter(
        ~F.exists("page_views", lambda p: p.getField("page_type") == "checkout")
        | ~F.exists("page_views", lambda p: p.getField("page_type") == "confirmation")
    ).count() == 0
    browsed = data["sessions"].filter(F.col("conversion_status") == "browsed")
    assert browsed.filter(F.size(F.map_keys("cart_contents")) > 0).count() == 0


def test_viewed_products_invariants(data):
    """viewed_products distinct and ⊆ page_views product ids (§9.5);
    cart quantities > 0 (§9.6); cart keys ⊆ viewed_products."""
    s = data["sessions"]
    assert s.filter(
        F.size("viewed_products") != F.size(F.array_distinct("viewed_products"))
    ).count() == 0
    pv_products = F.array_distinct(F.filter(
        F.transform("page_views", lambda p: p.getField("product_id")),
        lambda x: x.isNotNull(),
    ))
    assert s.filter(F.size(F.array_except("viewed_products", pv_products)) > 0).count() == 0
    assert s.filter(
        F.exists(F.map_values("cart_contents"), lambda v: v.getField("quantity") <= 0)
    ).count() == 0
    assert s.filter(
        F.size(F.array_except(F.map_keys("cart_contents"), F.col("viewed_products"))) > 0
    ).count() == 0


def test_transaction_money_invariants(data):
    """items.subtotal = bround(q*p,2); subtotal = Σ items.subtotal;
    total = bround(subtotal-discount,2) (FIXTURES §9.1-9.2)."""
    t = data["transactions"]
    assert t.filter(
        F.exists("items", lambda i: i.getField("subtotal")
                 != F.bround(i.getField("quantity") * i.getField("unit_price"), 2))
    ).count() == 0
    assert t.filter(
        F.abs(F.aggregate("items", F.lit(0.0),
                          lambda acc, i: acc + i.getField("subtotal"))
              - F.col("subtotal")) > 1e-9
    ).count() == 0
    assert t.filter(
        F.col("total") != F.bround(F.col("subtotal") - F.col("discount"), 2)
    ).count() == 0
    assert t.filter(F.col("discount") < 0).count() == 0
    assert t.filter(F.exists("items", lambda i: i.getField("quantity") < 1)).count() == 0


def test_fk_resolution(data):
    """Every FK resolves (FIXTURES §9.8) and txn ts = session end (§9.7)."""
    s, u, t, p, c = (data["sessions"], data["users"], data["transactions"],
                     data["products"], data["categories"])
    assert s.join(u, "user_id", "left_anti").count() == 0
    assert t.join(u, "user_id", "left_anti").count() == 0
    assert p.join(c, "category_id", "left_anti").count() == 0
    items = t.select(F.explode("items").alias("i")).select(F.col("i.product_id").alias("product_id"))
    assert items.join(p, "product_id", "left_anti").count() == 0
    joined = t.join(s.select("session_id", "end_time"), "session_id")
    assert joined.filter(F.col("timestamp") != F.col("end_time")).count() == 0


def test_cart_price_matches_product_base_price(data):
    """Cart entry price is the product's current (base) price."""
    cart = data["sessions"].select(
        F.explode("cart_contents").alias("product_id", "entry")
    ).select("product_id", F.col("entry.price").alias("price")).distinct()
    joined = cart.join(data["products"].select("product_id", "base_price"), "product_id")
    assert joined.filter(F.abs(F.col("price") - F.col("base_price")) > 1e-9).count() == 0


# ---------------------------------------------------------------------
# pipelines, cross-checked against independent pandas recomputation
# ---------------------------------------------------------------------

def test_revenue_by_state(data):
    got = revenue_by_state(data["users"], data["transactions"], n=10).toPandas()
    txns = data["transactions"].select("user_id", "total").toPandas()
    users = data["users"].select(
        "user_id", F.col("geo_data.state").alias("state")).toPandas()
    exp = (
        txns.merge(users, on="user_id")
        .groupby("state")["total"].sum().round(2)
        .sort_values(ascending=False).head(10)
    )
    assert len(got) == min(10, len(exp))
    assert dict(zip(got.state, got.total_revenue)) == pytest.approx(exp.to_dict())


def test_top_products(data):
    got = top_products(data["transactions"], data["products"], n=5).toPandas()
    items = data["transactions"].select(F.explode("items").alias("i")).select(
        F.col("i.product_id").alias("product_id"), F.col("i.subtotal").alias("subtotal")
    ).toPandas()
    exp = (items.groupby("product_id")["subtotal"].sum().round(2)
           .sort_values(ascending=False).head(5))
    assert dict(zip(got.product_id, got.total_revenue)) == pytest.approx(exp.to_dict())
    assert got.name.notna().all()


def test_clv_semantics(data):
    got = clv(data["users"], data["transactions"], data["sessions"])
    assert got.count() == 100  # every user kept (left join)
    pdf = got.toPandas().set_index("user_id")
    # independent recomputation
    spend = user_spend(data["transactions"]).toPandas().set_index("user_id")
    metrics = user_session_metrics(data["sessions"]).toPandas().set_index("user_id")
    for uid, row in pdf.iterrows():
        ts = float(spend.total_spent.get(uid, 0.0))
        sc = int(metrics.session_count.get(uid, 0))
        td = int(metrics.total_duration.get(uid, 0))
        eng = sc * td / 1000.0
        assert row.total_spent == pytest.approx(ts)
        assert row.engagement_score == pytest.approx(eng)
        assert row.clv == pytest.approx(round(ts * eng, 2), abs=0.011)


def test_clv_degenerate_regression(spark, data):
    """The committed reference artifact encodes an all-zero right side
    (SURVEY §5): with no sessions, every user row survives with zeroed
    metrics — exactly the left-join + fill semantics."""
    empty_sessions = data["sessions"].filter(F.lit(False))
    got = clv(data["users"], data["transactions"], empty_sessions)
    assert got.count() == 100
    assert got.filter(
        (F.col("session_count") != 0) | (F.col("total_duration") != 0)
        | (F.col("engagement_score") != 0.0) | (F.col("clv") != 0.0)
    ).count() == 0


def test_product_daily_metrics(data):
    got = product_daily_metrics(data["sessions"])
    # views total == total viewed_products occurrences
    total_views = got.agg(F.sum("views")).first()[0]
    exp_views = data["sessions"].select(
        F.size("viewed_products").alias("n")).agg(F.sum("n")).first()[0]
    assert total_views == exp_views
    # purchases only from converted sessions' carts
    total_purch = got.agg(F.sum("purchases")).first()[0]
    exp_purch = (
        data["sessions"].filter(F.col("conversion_status") == "converted")
        .select(F.explode("cart_contents").alias("k", "v"))
        .agg(F.sum("v.quantity")).first()[0]
    )
    assert total_purch == exp_purch
    assert got.filter(F.col("views") < 0).count() == 0


def test_monthly_sales(data):
    got = monthly_sales(data["transactions"]).toPandas()
    assert got.total.sum() == pytest.approx(
        data["transactions"].agg(F.sum("total")).first()[0], abs=0.1)
    # months within the 90-day window before T0
    assert 3 <= len(got) <= 5


def test_products_enriched(data):
    got = products_enriched(data["products"], data["categories"])
    assert got.count() == 50
    assert got.filter(F.col("category.name") == "Unknown Category").count() == 0
    # orphan FK → fallback name (reference load_mongo.py:87-94)
    orphan = data["products"].withColumn("category_id", F.lit("cat_999"))
    got2 = products_enriched(orphan, data["categories"])
    assert got2.filter(F.col("category.name") == "Unknown Category").count() == 50


def test_inventory_levels_matches_sequential_fold(data):
    """Lindley-recursion window form == the reference's sequential
    max(0, stock - qty) fold, replayed in Python per product."""
    from big_data_analytics_spark.pipelines.ecommerce import inventory_levels

    got = inventory_levels(
        data["transactions"],
        data["products"].select("product_id", "current_stock"),
    ).toPandas()

    events = (
        data["transactions"]
        .select("transaction_id", "timestamp", F.explode("items").alias("i"))
        .select("transaction_id", "timestamp",
                F.col("i.product_id").alias("product_id"),
                F.col("i.quantity").alias("quantity"))
        .toPandas()
    )
    stock0 = {r.product_id: r.current_stock
              for r in data["products"].select("product_id", "current_stock").collect()}
    # sequential replay (the reference's InventoryManager semantics)
    expected = {}
    for pid, grp in events.groupby("product_id"):
        s = stock0[pid]
        for row in grp.sort_values(["timestamp", "transaction_id"]).itertuples():
            s = max(0, s - row.quantity)
            expected[(pid, row.transaction_id)] = s
    assert len(got) == len(expected)
    for r in got.itertuples():
        assert expected[(r.product_id, r.transaction_id)] == r.stock_after, \
            (r.product_id, r.transaction_id)


def test_dwell_time_derivation_matches_stored(spark):
    """W2: lead()-derived dwell times must equal the generated
    view_duration for every page view."""
    from big_data_analytics_spark.queries.ecommerce_shaped import ecom_dwell_times
    row = ecom_dwell_times(spark, "/root/testdata/sf0.01").first()
    assert row.n_views > 0
    assert row.n_mismatching == 0
    assert row.n_matching == row.n_views
