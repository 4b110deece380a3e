"""Seeded, Spark-native e-commerce dataset generator.

Re-expresses the reference's single-process generator
(/root/reference/dataset_generator.py, 526 LoC, ≈3,310 sessions/s
single-threaded — BASELINE.md) as pure column expressions over
``spark.range``:

- **Deterministic by construction**: every "random" value is a hash of
  (salt, entity id) — no RNG state, no ordering dependence, so the same
  (seed, n) always produces the same rows on any cluster topology. The
  reference's uuid4 ids are NOT seed-reproducible (SURVEY.md §7); ours
  are hash-derived hex, stable across runs.
- **Embarrassingly parallel**: `spark.range(n)` partitions the id
  space; generation is a narrow map with no shuffle, so throughput
  scales linearly with cores — the 100 TB path is just `n=10**11`
  with more partitions.

Schemas follow FIXTURES.md §1-5, which mirror the reference's data
model exactly (structs, arrays-of-structs, string-keyed maps,
ISO-8601-string timestamps — dataset_generator.py:160,236-320).

Invariants guaranteed (FIXTURES.md §9, from generator logic at
dataset_generator.py:269-299,388-404):
  - sum(page_views.view_duration) == duration_seconds
  - unix(end_time) - unix(start_time) == duration_seconds
  - converted ⇒ cart non-empty ∧ checkout+confirmation page_views
  - items.subtotal == bround(quantity*unit_price, 2); txn subtotal ==
    Σ items.subtotal; total == bround(subtotal - discount, 2)
  - viewed_products distinct ⊆ page_views.product_id
  - cart_contents values all have quantity > 0
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: Fixed anchor (the reference anchors to wall-clock `now()`; fixtures
#: pin T0 so golden files are stable — FIXTURES.md).
T0 = "2025-06-08T00:00:00"
T0_EPOCH = 1749340800  # seconds, UTC

STATES = ["CA", "NY", "TX", "FL", "WA", "IL", "PA", "OH", "GA", "NC"]
CITIES = ["Springfield", "Riverton", "Lakeside", "Fairview", "Greenwood",
          "Madison", "Clinton", "Georgetown", "Salem", "Ashland"]
PAGE_TYPES = ["home", "search", "category_listing", "product_detail", "cart"]
DEVICE_TYPES = ["mobile", "desktop", "tablet"]
OS_NAMES = ["iOS", "Android", "Windows", "macOS"]
BROWSERS = ["Chrome", "Safari", "Firefox", "Edge"]
REFERRERS = ["direct", "email", "social", "search_engine", "affiliate"]
PAYMENT_METHODS = ["credit_card", "paypal", "apple_pay", "crypto"]
ADJ = ["Premium", "Classic", "Modern", "Deluxe", "Eco", "Smart", "Ultra",
       "Compact", "Pro", "Mini"]
NOUN = ["Widget", "Gadget", "Lamp", "Speaker", "Backpack", "Bottle",
        "Charger", "Notebook", "Camera", "Headphones"]


def _h(salt: str, *cols: Column) -> Column:
    """Non-negative 64-bit hash of (salt, cols) — the randomness source."""
    return F.abs(F.xxhash64(F.lit(salt), *cols))


def _hint(salt: str, lo: int, hi: int, *cols: Column) -> Column:
    """Deterministic integer in [lo, hi]."""
    return (F.pmod(_h(salt, *cols), F.lit(hi - lo + 1)) + lo).cast("int")


def _huniform(salt: str, lo: float, hi: float, *cols: Column) -> Column:
    """Deterministic double in [lo, hi)."""
    u = F.pmod(_h(salt, *cols), F.lit(1_000_000)) / 1_000_000.0
    return u * (hi - lo) + lo


def _pick(salt: str, values: list[str], *cols: Column) -> Column:
    """Deterministic choice from a literal list."""
    arr = F.array([F.lit(v) for v in values])
    return F.element_at(arr, _hint(salt, 1, len(values), *cols))


def _hex_id(prefix: str, salt: str, width: int, *cols: Column) -> Column:
    """Hash-derived hex id (reference uses uuid4().hex[:width],
    dataset_generator.py:74-80 — not seed-stable; this is)."""
    return F.concat(F.lit(prefix),
                    F.substring(F.sha2(F.concat_ws("|", F.lit(salt), *cols), 256), 1, width))


def _iso(epoch_col: Column) -> Column:
    """Epoch seconds → ISO-8601 string (reference stores ISO strings,
    dataset_generator.py:160)."""
    return F.date_format(F.timestamp_seconds(epoch_col), "yyyy-MM-dd'T'HH:mm:ss")


# ---------------------------------------------------------------------
# categories — dataset_generator.py:167-184
# ---------------------------------------------------------------------
def gen_categories(spark: SparkSession, n: int = 5) -> DataFrame:
    df = spark.range(n).withColumn("cid", F.col("id").cast("int"))
    cat_id = F.format_string("cat_%03d", F.col("cid"))
    n_sub = _hint("nsub", 3, 5, F.col("cid"))
    sub = F.transform(
        F.sequence(F.lit(1), n_sub),
        lambda i: F.struct(
            F.format_string("sub_%03d_%02d", F.col("cid"), i).alias("subcategory_id"),
            F.concat(_pick("subadj", ADJ, F.col("cid"), i), F.lit(" "),
                     _pick("subnoun", NOUN, F.col("cid"), i)).alias("name"),
            # uniform 0.10..0.40, 2dp (dataset_generator.py:177)
            F.bround(_huniform("margin", 0.10, 0.40, F.col("cid"), i), 2)
            .alias("profit_margin"),
        ),
    )
    return df.select(
        cat_id.alias("category_id"),
        F.concat(_pick("catadj", ADJ, F.col("cid")), F.lit(" "),
                 _pick("catnoun", NOUN, F.col("cid")), F.lit("s")).alias("name"),
        sub.alias("subcategories"),
    )


# ---------------------------------------------------------------------
# products — dataset_generator.py:190-221
# ---------------------------------------------------------------------
def gen_products(spark: SparkSession, n: int = 50, n_categories: int = 5) -> DataFrame:
    df = spark.range(n).withColumn("pid", F.col("id").cast("int"))
    pid = F.col("pid")
    n_hist = _hint("nhist", 1, 3, pid)
    # price history: 1..3 entries, ascending dates, 2dp prices 5..500
    hist = F.transform(
        F.sequence(F.lit(1), n_hist),
        lambda i: F.struct(
            F.bround(_huniform("price", 5.0, 500.0, pid, i), 2).alias("price"),
            _iso(F.lit(T0_EPOCH)
                 - (n_hist - i + 1) * F.lit(30 * 86400)
                 - _hint("histjit", 0, 86399, pid, i)).alias("date"),
        ),
    )
    return (
        df.select(
            pid.alias("pid"),
            F.format_string("prod_%05d", pid).alias("product_id"),
            F.initcap(F.concat(_pick("padj", ADJ, pid), F.lit(" "),
                               _pick("pnoun", NOUN, pid))).alias("name"),
            F.format_string("cat_%03d", F.pmod(_h("pcat", pid), F.lit(n_categories))
                            .cast("int")).alias("category_id"),
            hist.alias("price_history"),
            _hint("stock", 413, 644, pid).alias("current_stock"),
            (F.pmod(_h("active", pid), F.lit(100)) < 95).alias("is_active"),
        )
        .withColumns({
            # base_price = most recent price; creation_date = first
            # history date (dataset_generator.py:209,218)
            "base_price": F.element_at(F.col("price_history"), -1).getField("price"),
            "creation_date": F.element_at(F.col("price_history"), 1).getField("date"),
        })
        .drop("pid")
    )


# ---------------------------------------------------------------------
# users — dataset_generator.py:227-245
# ---------------------------------------------------------------------
def gen_users(spark: SparkSession, n: int = 100) -> DataFrame:
    df = spark.range(n).withColumn("uid", F.col("id").cast("int"))
    uid = F.col("uid")
    reg_epoch = (F.lit(T0_EPOCH) - _hint("reg", 180, 270, uid) * 86400
                 - _hint("regjit", 0, 86399, uid))
    last_epoch = reg_epoch + _hint("last", 0, 180, uid) * 86400
    return df.select(
        F.format_string("user_%06d", uid).alias("user_id"),
        F.struct(
            _pick("city", CITIES, uid).alias("city"),
            _pick("state", STATES, uid).alias("state"),
            F.lit("US").alias("country"),
        ).alias("geo_data"),
        _iso(reg_epoch).alias("registration_date"),
        _iso(F.least(last_epoch, F.lit(T0_EPOCH))).alias("last_active"),
    )


# ---------------------------------------------------------------------
# sessions — dataset_generator.py:250-344
# ---------------------------------------------------------------------
def gen_sessions(spark: SparkSession, n: int = 2000, n_users: int = 100,
                 n_products: int = 50, n_categories: int = 5) -> DataFrame:
    """Clickstream sessions with ordered page_views whose view_durations
    partition duration_seconds exactly (proportional-split by hashed
    weights — the distributed restatement of the reference's
    consecutive-slot-diff construction, dataset_generator.py:271-274).
    """
    df = spark.range(n).withColumn("sid", F.col("id").cast("int"))
    sid = F.col("sid")

    uid = F.pmod(_h("suser", sid), F.lit(n_users)).cast("int")
    conv_roll = F.pmod(_h("conv", sid), F.lit(100))
    status = (
        F.when(conv_roll < 25, "converted")
        .when(conv_roll < 55, "abandoned")
        .otherwise("browsed")
    )
    n_views = (
        F.when(F.col("conversion_status") == "converted", _hint("nv", 4, 10, sid))
        .when(F.col("conversion_status") == "abandoned", _hint("nv", 3, 10, sid))
        .otherwise(_hint("nv", 1, 8, sid))
    )
    duration = _hint("dur", 30, 3600, sid)
    start_epoch = (F.lit(T0_EPOCH) - _hint("sday", 0, 89, sid) * 86400
                   - _hint("ssec", 0, 86399, sid))

    base = df.select(
        sid.alias("sid"),
        uid.alias("uid"),
        status.alias("conversion_status"),
        duration.alias("duration_seconds"),
        start_epoch.alias("start_epoch"),
    ).withColumns({
        "n_views": n_views,
        # per-view weights 1..99; durations split ∝ weight, exact sum
        "w": F.transform(F.sequence(F.lit(1), n_views),
                         lambda i: _hint("w", 1, 99, F.col("sid"), i).cast("long")),
    }).withColumn(
        "wtot", F.aggregate("w", F.lit(0).cast("long"), lambda acc, x: acc + x)
    ).withColumn(
        # cumulative offsets in seconds: off[i] = floor(d * cumw_i / wtot),
        # off[0] = 0, off[n] = d exactly (telescoping)
        "off",
        F.transform(
            F.sequence(F.lit(0), F.col("n_views")),
            lambda i: F.floor(
                F.col("duration_seconds")
                * F.aggregate(F.slice("w", F.lit(1), i), F.lit(0).cast("long"),
                              lambda acc, x: acc + x)
                / F.col("wtot")
            ),
        ),
    )

    is_conv = F.col("conversion_status") == "converted"
    is_aband = F.col("conversion_status") == "abandoned"
    nv = F.col("n_views")

    def page_type(i):
        weighted = _pick("pt", PAGE_TYPES, F.col("sid"), i)
        no_cart = _pick("ptb", PAGE_TYPES[:4], F.col("sid"), i)
        return (
            F.when(is_conv & (i == nv), "confirmation")
            .when(is_conv & (i == nv - 1), "checkout")
            .when((is_conv | is_aband) & (i == 1), "product_detail")
            .when(is_aband & (i == nv), "cart")
            .when(is_conv | is_aband, weighted)
            .otherwise(no_cart)
        )

    def page_product(i, ptype):
        pidx = F.pmod(_h("pvprod", F.col("sid"), i), F.lit(n_products)).cast("int")
        return F.when(ptype == "product_detail",
                      F.format_string("prod_%05d", pidx)).otherwise(F.lit(None))

    def page_category(i, ptype):
        cidx = F.pmod(_h("pvcat", F.col("sid"), i), F.lit(n_categories)).cast("int")
        return F.when(ptype == "category_listing",
                      F.format_string("cat_%03d", cidx)).otherwise(F.lit(None))

    with_pv = base.withColumn(
        "page_views",
        F.transform(
            F.sequence(F.lit(1), nv),
            lambda i: F.struct(
                _iso(F.col("start_epoch")
                     + F.element_at("off", i)).alias("timestamp"),
                page_type(i).alias("page_type"),
                page_product(i, page_type(i)).alias("product_id"),
                page_category(i, page_type(i)).alias("category_id"),
                (F.element_at("off", i + F.lit(1)) - F.element_at("off", i))
                .cast("int").alias("view_duration"),
            ),
        ),
    ).withColumn(
        # distinct product_detail targets, in first-view order
        # (reference builds a set, dataset_generator.py:269,280,316)
        "viewed_products",
        F.array_distinct(
            F.transform(
                F.filter("page_views", lambda p: p.getField("page_type") == "product_detail"),
                lambda p: p.getField("product_id"),
            )
        ),
    )

    # cart: first k viewed products; entry price == the product's
    # base_price (same hash construction as gen_products)
    def cart_entry(p):
        pnum = F.substring(p, 6, 5).cast("int")
        hist_len = _hint("nhist", 1, 3, pnum)
        price = F.bround(_huniform("price", 5.0, 500.0, pnum, hist_len), 2)
        return F.struct(
            _hint("cqty", 1, 3, F.col("sid"), pnum).alias("quantity"),
            price.alias("price"),
        )

    k = _hint("cartk", 1, 3, F.col("sid"))
    cart = F.when(
        is_conv | is_aband,
        F.map_from_arrays(
            F.slice("viewed_products", 1, k),
            F.transform(F.slice("viewed_products", 1, k), cart_entry),
        ),
    ).otherwise(F.map_from_arrays(F.array(), F.array().cast("array<struct<quantity:int,price:double>>")))

    return with_pv.withColumn("cart_contents", cart).select(
        _hex_id("sess_", "sessid", 10, F.col("sid")).alias("session_id"),
        F.format_string("user_%06d", F.col("uid")).alias("user_id"),
        _iso(F.col("start_epoch")).alias("start_time"),
        _iso(F.col("start_epoch") + F.col("duration_seconds")).alias("end_time"),
        F.col("duration_seconds"),
        F.struct(
            _pick("city", CITIES, F.col("uid")).alias("city"),
            _pick("state", STATES, F.col("uid")).alias("state"),
            F.lit("US").alias("country"),
            F.concat_ws(".", _hint("ip1", 1, 254, F.col("sid")),
                        _hint("ip2", 0, 254, F.col("sid")),
                        _hint("ip3", 0, 254, F.col("sid")),
                        _hint("ip4", 1, 254, F.col("sid"))).alias("ip_address"),
        ).alias("geo_data"),
        F.struct(
            _pick("dev", DEVICE_TYPES, F.col("sid")).alias("type"),
            _pick("os", OS_NAMES, F.col("sid")).alias("os"),
            _pick("browser", BROWSERS, F.col("sid")).alias("browser"),
        ).alias("device_profile"),
        "viewed_products",
        "page_views",
        "cart_contents",
        "conversion_status",
        _pick("ref", REFERRERS, F.col("sid")).alias("referrer"),
    )


# ---------------------------------------------------------------------
# transactions — dataset_generator.py:349-519 (from converted sessions)
# ---------------------------------------------------------------------
def gen_transactions(sessions: DataFrame) -> DataFrame:
    """One transaction per converted session: items from cart_contents,
    per-item subtotal = bround(qty*price, 2), txn subtotal = Σ items,
    20% discount chance at a rate ∈ {.05,.1,.15,.2}, total =
    bround(subtotal − discount, 2) (dataset_generator.py:388-404)."""
    conv = sessions.filter(F.col("conversion_status") == "converted")
    items = F.transform(
        F.array_sort(F.map_entries("cart_contents")),
        lambda e: F.struct(
            e.getField("key").alias("product_id"),
            e.getField("value").getField("quantity").alias("quantity"),
            e.getField("value").getField("price").alias("unit_price"),
            F.bround(
                e.getField("value").getField("quantity")
                * e.getField("value").getField("price"), 2
            ).alias("subtotal"),
        ),
    )
    with_items = conv.withColumn("items", items).withColumn(
        "subtotal",
        F.aggregate("items", F.lit(0.0), lambda acc, x: acc + x.getField("subtotal")),
    )
    disc_roll = F.pmod(_h("disc", F.col("session_id")), F.lit(100))
    rate = F.element_at(
        F.array(F.lit(0.05), F.lit(0.10), F.lit(0.15), F.lit(0.20)),
        _hint("drate", 1, 4, F.col("session_id")),
    )
    discount = F.when(disc_roll < 20,
                      F.bround(F.col("subtotal") * rate, 2)).otherwise(F.lit(0.0))
    return with_items.select(
        _hex_id("txn_", "txnid", 12, F.col("session_id")).alias("transaction_id"),
        "session_id",
        "user_id",
        F.col("end_time").alias("timestamp"),
        "items",
        "subtotal",
        discount.alias("discount"),
        F.bround(F.col("subtotal") - discount, 2).alias("total"),
        _pick("pay", PAYMENT_METHODS, F.col("session_id")).alias("payment_method"),
        F.lit("completed").alias("status"),
    )


def gen_all(spark: SparkSession, n_users: int = 100, n_products: int = 50,
            n_categories: int = 5, n_sessions: int = 2000) -> dict[str, DataFrame]:
    """The full fixture set at the FIXTURES.md default scale; pass
    larger n_* for scale testing (generation is shuffle-free)."""
    sessions = gen_sessions(spark, n_sessions, n_users, n_products, n_categories)
    return {
        "categories": gen_categories(spark, n_categories),
        "products": gen_products(spark, n_products, n_categories),
        "users": gen_users(spark, n_users),
        "sessions": sessions,
        "transactions": gen_transactions(sessions),
    }
