"""Driver contract for the spark-graft builder (PySpark target).

Every query below drives the ENGINE (step configs through
``data_validation_engine_spark.StepEngine``), not hand-written Spark — so the
driver's DuckDB-oracle comparison validates operator semantics end to end.

Keys map 1:1 to SURVEY.md §2's operator inventory; ``oracle_sql()`` returns
the ANSI-SQL equivalent DuckDB runs on the same parquet tables.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession

from data_validation_engine_spark import StepEngine
from data_validation_engine_spark.messages import Reporting
from data_validation_engine_spark.steps import (
    Aggregation,
    AntiJoin,
    ColumnAddition,
    ConfirmJoinHasMatch,
    DeferredFilter,
    HeaderJoin,
    ImmediateFilter,
    InnerJoin,
    LeftJoin,
    Notification,
    OneToOneJoin,
    OrphanIdentification,
    SelectColumns,
    SemiJoin,
    TableUnion,
)
from data_validation_engine_spark.steps.sync_filters import apply_sync_filters

_ENGINES: dict[int, StepEngine] = {}


def _engine(spark: SparkSession) -> StepEngine:
    key = id(spark)
    if key not in _ENGINES:
        _ENGINES[key] = StepEngine(spark)
    return _ENGINES[key]


def _load(spark: SparkSession, sf_dir: str, names: Iterable[str]) -> dict[str, DataFrame]:
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


# ---------------------------------------------------------------------------
# relational step queries (SURVEY §2.3)
# ---------------------------------------------------------------------------

def q_add_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColumnAddition + SelectColumns: per-row revenue on lineitem."""
    ents = _load(spark, sf_dir, ["lineitem"])
    eng = _engine(spark)
    eng.evaluate(
        ents,
        config=ColumnAddition(
            entity_name="lineitem",
            column_name="revenue",
            expression="l_extendedprice * (1 - l_discount)",
        ),
    )
    eng.evaluate(
        ents,
        config=SelectColumns(
            entity_name="lineitem",
            columns="l_orderkey, l_linenumber, revenue",
        ),
    )
    return ents["lineitem"]


def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ImmediateFilter: quantity + date predicate pushed to the scan."""
    ents = _load(spark, sf_dir, ["lineitem"])
    eng = _engine(spark)
    eng.evaluate(
        ents,
        config=ImmediateFilter(
            entity_name="lineitem",
            expression="l_quantity > 45 AND l_shipdate >= '1997-01-01'",
        ),
    )
    eng.evaluate(
        ents,
        config=SelectColumns(
            entity_name="lineitem",
            columns="l_orderkey, l_linenumber, l_quantity, l_returnflag",
        ),
    )
    return ents["lineitem"]


def q_group_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation: TPC-H Q1-shaped pricing summary."""
    ents = _load(spark, sf_dir, ["lineitem"])
    _engine(spark).evaluate(
        ents,
        config=Aggregation(
            entity_name="lineitem",
            group_by="l_returnflag, l_linestatus",
            agg_columns={
                "round(sum(l_quantity), 2)": "sum_qty",
                "round(sum(l_extendedprice), 2)": "sum_base_price",
                "round(sum(l_extendedprice * (1 - l_discount)), 2)": "sum_disc_price",
                "round(avg(l_quantity), 4)": "avg_qty",
                "count(1)": "count_order",
            },
        ),
    )
    return ents["lineitem"]


def q_group_by_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation with pivot (fixed value list, no extra distinct job)."""
    ents = _load(spark, sf_dir, ["lineitem"])
    _engine(spark).evaluate(
        ents,
        config=Aggregation(
            entity_name="lineitem",
            group_by="l_linestatus",
            agg_columns={"round(sum(l_quantity), 2)": "q"},
            pivot_column="l_returnflag",
            pivot_values=["A", "N", "R"],
        ),
    )
    return ents["lineitem"]


def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SelectColumns with distinct."""
    ents = _load(spark, sf_dir, ["orders"])
    _engine(spark).evaluate(
        ents,
        config=SelectColumns(
            entity_name="orders",
            columns="o_orderstatus, o_orderpriority",
            distinct=True,
        ),
    )
    return ents["orders"]


def q_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LeftJoin (theta) + new_columns with last-wins overwrite."""
    ents = _load(spark, sf_dir, ["customer", "nation"])
    eng = _engine(spark)
    eng.evaluate(
        ents,
        config=LeftJoin(
            entity_name="customer",
            target_name="nation",
            join_condition="customer.c_nationkey = nation.n_nationkey",
            new_columns={"nation.n_name": "nation_name"},
        ),
    )
    eng.evaluate(
        ents,
        config=SelectColumns(
            entity_name="customer",
            columns="c_custkey, c_name, c_acctbal, nation_name",
        ),
    )
    return ents["customer"]


def q_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InnerJoin with a compound theta condition."""
    ents = _load(spark, sf_dir, ["supplier", "nation"])
    eng = _engine(spark)
    eng.evaluate(
        ents,
        config=InnerJoin(
            entity_name="supplier",
            target_name="nation",
            join_condition=(
                "supplier.s_nationkey = nation.n_nationkey "
                "AND supplier.s_acctbal > 0"
            ),
            new_columns={"nation.n_name": "nation_name"},
        ),
    )
    eng.evaluate(
        ents,
        config=SelectColumns(
            entity_name="supplier",
            columns="s_suppkey, s_name, nation_name",
        ),
    )
    return ents["supplier"]


def q_one_to_one_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OneToOneJoin: integrity-checked many-to-one lookup."""
    ents = _load(spark, sf_dir, ["customer", "nation"])
    eng = _engine(spark)
    eng.evaluate(
        ents,
        config=OneToOneJoin(
            entity_name="customer",
            target_name="nation",
            join_condition="customer.c_nationkey = nation.n_nationkey",
            new_columns={"nation.n_regionkey": "regionkey"},
        ),
    )
    eng.evaluate(
        ents,
        config=SelectColumns(
            entity_name="customer", columns="c_custkey, regionkey"
        ),
    )
    return ents["customer"]


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemiJoin: customers with at least one high-value order."""
    ents = _load(spark, sf_dir, ["customer", "orders"])
    eng = _engine(spark)
    eng.evaluate(
        ents,
        config=SemiJoin(
            entity_name="customer",
            target_name="orders",
            join_condition=(
                "customer.c_custkey = orders.o_custkey "
                "AND orders.o_totalprice > 100000"
            ),
        ),
    )
    eng.evaluate(
        ents,
        config=SelectColumns(entity_name="customer", columns="c_custkey, c_name"),
    )
    return ents["customer"]


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AntiJoin: customers with no orders."""
    ents = _load(spark, sf_dir, ["customer", "orders"])
    eng = _engine(spark)
    eng.evaluate(
        ents,
        config=AntiJoin(
            entity_name="customer",
            target_name="orders",
            join_condition="customer.c_custkey = orders.o_custkey",
        ),
    )
    eng.evaluate(
        ents,
        config=SelectColumns(entity_name="customer", columns="c_custkey, c_name"),
    )
    return ents["customer"]


def q_has_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ConfirmJoinHasMatch: boolean match flag (match-at-most-once target)."""
    ents = _load(spark, sf_dir, ["orders", "customer"])
    eng = _engine(spark)
    eng.evaluate(
        ents,
        config=ConfirmJoinHasMatch(
            entity_name="orders",
            target_name="customer",
            join_condition=(
                "orders.o_custkey = customer.c_custkey "
                "AND customer.c_acctbal > 5000"
            ),
            column_name="rich_customer",
        ),
    )
    eng.evaluate(
        ents,
        config=SelectColumns(
            entity_name="orders", columns="o_orderkey, rich_customer"
        ),
    )
    return ents["orders"]


def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TableUnion: case-insensitive union by name with null-fill."""
    ents = _load(spark, sf_dir, ["customer", "supplier"])
    eng = _engine(spark)
    eng.evaluate(
        ents,
        config=SelectColumns(
            entity_name="customer",
            columns="c_custkey AS id, c_name AS name, c_acctbal AS acctbal",
            new_entity_name="cust_part",
        ),
    )
    eng.evaluate(
        ents,
        config=SelectColumns(
            entity_name="supplier",
            columns="s_suppkey AS ID, s_name AS NAME, s_nationkey AS nationkey",
            new_entity_name="supp_part",
        ),
    )
    eng.evaluate(
        ents,
        config=TableUnion(
            entity_name="cust_part",
            target_name="supp_part",
            new_entity_name="unioned",
        ),
    )
    eng.evaluate(
        ents,
        config=ColumnAddition(
            entity_name="unioned",
            column_name="src",
            expression="CASE WHEN nationkey IS NULL THEN 'cust' ELSE 'supp' END",
        ),
    )
    return ents["unioned"]


def q_identify_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OrphanIdentification: parts never ordered (IsOrphaned flag)."""
    ents = _load(spark, sf_dir, ["part", "lineitem"])
    eng = _engine(spark)
    eng.evaluate(
        ents,
        config=OrphanIdentification(
            entity_name="part",
            target_name="lineitem",
            join_condition="part.p_partkey = lineitem.l_partkey",
        ),
    )
    eng.evaluate(
        ents,
        config=SelectColumns(
            entity_name="part", columns="p_partkey, IsOrphaned"
        ),
    )
    return ents["part"]


def q_join_header(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HeaderJoin: attach a 1-row summary header to every nation row."""
    ents = _load(spark, sf_dir, ["nation", "orders"])
    eng = _engine(spark)
    eng.evaluate(
        ents,
        config=Aggregation(
            entity_name="orders",
            group_by=[],
            agg_columns={
                "count(1)": "n_orders",
                "round(max(o_totalprice), 2)": "max_price",
            },
            new_entity_name="header",
        ),
    )
    eng.evaluate(
        ents,
        config=HeaderJoin(
            entity_name="nation",
            target_name="header",
            header_column_name="submission",
        ),
    )
    eng.evaluate(
        ents,
        config=SelectColumns(
            entity_name="nation",
            columns=(
                "n_nationkey, n_name, submission.n_orders AS n_orders, "
                "submission.max_price AS max_price"
            ),
        ),
    )
    return ents["nation"]


def q_sync_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sync-filter stage survivors: validate-all-then-drop over orders."""
    ents = _load(spark, sf_dir, ["orders"])
    apply_sync_filters(
        ents,
        [
            DeferredFilter(
                entity_name="orders",
                expression="o_totalprice < 400000",
                reporting=Reporting(code="HUGE_ORDER", message="too big"),
            ),
            DeferredFilter(
                entity_name="orders",
                expression="o_orderstatus <> 'P'",
                reporting=Reporting(code="PENDING", message="pending"),
            ),
        ],
    )
    _engine(spark).evaluate(
        ents,
        config=SelectColumns(
            entity_name="orders",
            columns="o_orderkey, o_orderstatus, o_totalprice",
        ),
    )
    return ents["orders"]


def q_sync_filter_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sync-filter message feed: one row per (record, failed filter)."""
    ents = _load(spark, sf_dir, ["orders"])
    msgs = apply_sync_filters(
        ents,
        [
            DeferredFilter(
                entity_name="orders",
                expression="o_totalprice < 400000",
                reporting=Reporting(
                    code="HUGE_ORDER",
                    message="order too big",
                    reporting_field="o_orderkey",
                ),
            ),
            DeferredFilter(
                entity_name="orders",
                expression="o_orderstatus <> 'P'",
                reporting=Reporting(
                    code="PENDING",
                    message="order pending",
                    reporting_field="o_orderkey",
                ),
            ),
        ],
    )
    return msgs.selectExpr(
        "entity",
        "error_code",
        "error_message",
        "failure_type",
        "CAST(reporting_field AS BIGINT) AS record_key",
    )


def q_notification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Notification: distributed message emission with compiled template."""
    ents = _load(spark, sf_dir, ["customer"])
    msgs = _engine(spark).evaluate(
        ents,
        config=Notification(
            entity_name="customer",
            expression="c_acctbal < 0",
            reporting=Reporting(
                code="NEG_BAL",
                message="customer {{c_name}} has negative balance",
                reporting_field="c_custkey",
            ),
        ),
    )
    return msgs.selectExpr(
        "entity",
        "error_code",
        "error_message",
        "CAST(reporting_field AS BIGINT) AS record_key",
    )


def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL function library incl. NHS mod-11 as a pure expression."""
    ents = _load(spark, sf_dir, ["customer"])
    eng = _engine(spark)
    eng.evaluate(
        ents,
        config=SelectColumns(
            entity_name="customer",
            columns=(
                "c_custkey, "
                "over_10k(c_acctbal) AS big_bal, "
                "x_not_greater_than_y(c_acctbal, 5000.0) AS le_5k, "
                "number_matches_within_percentage(5000.0, c_acctbal, 0.5)"
                " AS near_5k, "
                "nhsno_mod11_check(lpad(cast(c_custkey AS STRING), 10, '4'))"
                " AS nhs_ok"
            ),
        ),
    )
    return ents["customer"]


# ---------------------------------------------------------------------------
# data contract queries (SURVEY §2.5)
# ---------------------------------------------------------------------------

_CONTRACT_DISCHEMA = {
    "contract": {
        "datasets": {
            "orders_sub": {
                "fields": {
                    "okey": "int",
                    "price": "PositiveFloat",
                    "odate": {
                        "type": "conformatteddate",
                        "constraints": {"date_format": "%d/%m/%Y"},
                    },
                    "status": {
                        "callable": "constr",
                        "constraints": {"min_length": 1, "max_length": 1},
                    },
                    "prio": "str",
                },
                "key_field": "okey",
                "mandatory_fields": ["okey", "price"],
            }
        }
    }
}


def _stringified_orders(spark: SparkSession, sf_dir: str):
    """Orders re-encoded as strings — the 'string-in, validate, cast' input
    shape — with deterministic dirt: every 7th price is junk, every 11th
    price missing, every 13th date in the wrong format."""
    ents = _load(spark, sf_dir, ["orders"])
    return ents["orders"].selectExpr(
        "CAST(o_orderkey AS STRING) AS okey",
        """CASE WHEN o_orderkey % 11 = 0 THEN NULL
                WHEN o_orderkey % 7 = 0 THEN 'junk'
                ELSE CAST(o_totalprice AS STRING) END AS price""",
        """CASE WHEN o_orderkey % 13 = 0
                THEN date_format(o_orderdate, 'yyyy-MM-dd')
                ELSE date_format(o_orderdate, 'dd/MM/yyyy') END AS odate""",
        "o_orderstatus AS status",
        "o_orderpriority AS prio",
    )


def q_contract_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract cast: TRIM+TRY_CAST scalars, regex-guarded formatted date
    parse; records failing any check are dropped (reference record
    rejection)."""
    from data_validation_engine_spark.contract import apply_contract, parse_contract

    contract = parse_contract(_CONTRACT_DISCHEMA)
    typed, _ = apply_contract(
        contract.entity("orders_sub"), _stringified_orders(spark, sf_dir)
    )
    return typed.selectExpr(
        "okey", "price", "odate", "status", "prio"
    )


def q_contract_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract validation feed: one message per (record, failed check)."""
    from data_validation_engine_spark.contract import apply_contract, parse_contract

    contract = parse_contract(_CONTRACT_DISCHEMA)
    _, messages = apply_contract(
        contract.entity("orders_sub"), _stringified_orders(spark, sf_dir)
    )
    return messages.selectExpr(
        "entity",
        "error_code",
        "error_location",
        "category",
        "CAST(reporting_field AS BIGINT) AS record_key",
    )


def q_record_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable 1-based record index in file order (zipWithIndex replacement)."""
    from data_validation_engine_spark.contract import add_record_index

    ents = _load(spark, sf_dir, ["customer"])
    return add_record_index(ents["customer"]).selectExpr(
        "c_custkey", "__record_index__ AS record_index"
    )


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect-compatible ANSI SQL)
# ---------------------------------------------------------------------------

def _nhs_mod11_oracle(x: str) -> str:
    clean = f"REGEXP_REPLACE(CAST({x} AS VARCHAR), '[ -]', '', 'g')"
    weighted = " + ".join(
        f"CAST(SUBSTRING({clean}, {i}, 1) AS INT) * {11 - i}" for i in range(1, 10)
    )
    return (
        f"CASE WHEN REGEXP_MATCHES({clean}, '^[0-9]{{10}}$') THEN "
        f"(11 - (CASE WHEN ({weighted}) % 11 = 0 THEN 11 ELSE ({weighted}) % 11 END))"
        f" = CAST(SUBSTRING({clean}, 10, 1) AS INT) ELSE FALSE END"
    )


_ORACLES: dict[str, str] = {
    "add_select": """
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue
        FROM lineitem
    """,
    "filter": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        FROM lineitem
        WHERE l_quantity > 45 AND l_shipdate >= '1997-01-01'
    """,
    "group_by": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               count(1) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
    "group_by_pivot": """
        SELECT l_linestatus,
               round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS "A",
               round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS "N",
               round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS "R"
        FROM lineitem
        GROUP BY l_linestatus
    """,
    "distinct": """
        SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
    "left_join": """
        SELECT c_custkey, c_name, c_acctbal, n_name AS nation_name
        FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
    """,
    "inner_join": """
        SELECT s_suppkey, s_name, n_name AS nation_name
        FROM supplier JOIN nation
          ON s_nationkey = n_nationkey AND s_acctbal > 0
    """,
    "one_to_one_join": """
        SELECT c_custkey, n_regionkey AS regionkey
        FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
    """,
    "semi_join": """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE c.c_custkey = o.o_custkey AND o.o_totalprice > 100000
        )
    """,
    "anti_join": """
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o WHERE c.c_custkey = o.o_custkey
        )
    """,
    "has_match": """
        SELECT o_orderkey,
               EXISTS (
                   SELECT 1 FROM customer c
                   WHERE o.o_custkey = c.c_custkey AND c.c_acctbal > 5000
               ) AS rich_customer
        FROM orders o
    """,
    "union": """
        SELECT *,
               CASE WHEN nationkey IS NULL THEN 'cust' ELSE 'supp' END AS src
        FROM (
            SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal,
                   NULL::INT AS nationkey
            FROM customer
            UNION ALL
            SELECT s_suppkey, s_name, NULL, s_nationkey FROM supplier
        )
    """,
    "identify_orphans": """
        SELECT p_partkey,
               NOT EXISTS (
                   SELECT 1 FROM lineitem l WHERE p.p_partkey = l.l_partkey
               ) AS IsOrphaned
        FROM part p
    """,
    "join_header": """
        SELECT n_nationkey, n_name, h.n_orders, h.max_price
        FROM nation
        CROSS JOIN (
            SELECT count(1) AS n_orders, round(max(o_totalprice), 2) AS max_price
            FROM orders
        ) h
    """,
    "sync_filters": """
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE COALESCE(o_totalprice < 400000, FALSE)
          AND COALESCE(o_orderstatus <> 'P', FALSE)
    """,
    "sync_filter_messages": """
        SELECT 'orders' AS entity, 'HUGE_ORDER' AS error_code,
               'order too big' AS error_message, 'record' AS failure_type,
               o_orderkey AS record_key
        FROM orders WHERE NOT COALESCE(o_totalprice < 400000, FALSE)
        UNION ALL
        SELECT 'orders', 'PENDING', 'order pending', 'record', o_orderkey
        FROM orders WHERE NOT COALESCE(o_orderstatus <> 'P', FALSE)
    """,
    "notification": """
        SELECT 'customer' AS entity, 'NEG_BAL' AS error_code,
               'customer ' || c_name || ' has negative balance'
                   AS error_message,
               c_custkey AS record_key
        FROM customer WHERE c_acctbal < 0
    """,
    "contract_cast": """
        WITH stringified AS (
            SELECT CAST(o_orderkey AS VARCHAR) AS okey,
                   CASE WHEN o_orderkey % 11 = 0 THEN NULL
                        WHEN o_orderkey % 7 = 0 THEN 'junk'
                        ELSE CAST(o_totalprice AS VARCHAR) END AS price,
                   CASE WHEN o_orderkey % 13 = 0
                        THEN strftime(o_orderdate, '%Y-%m-%d')
                        ELSE strftime(o_orderdate, '%d/%m/%Y') END AS odate,
                   o_orderstatus AS status,
                   o_orderpriority AS prio
            FROM orders
        )
        SELECT TRY_CAST(TRIM(okey) AS BIGINT) AS okey,
               TRY_CAST(TRIM(price) AS DOUBLE) AS price,
               CASE WHEN regexp_matches(TRIM(odate),
                        '^[0-9]{2}/[0-9]{2}/[0-9]{4}$')
                    THEN CAST(strptime(TRIM(odate), '%d/%m/%Y') AS DATE)
                    ELSE NULL END AS odate,
               TRIM(status) AS status,
               TRIM(prio) AS prio
        FROM stringified
        WHERE COALESCE(okey IS NOT NULL AND TRIM(okey) <> '', FALSE)
          AND COALESCE(TRY_CAST(TRIM(okey) AS BIGINT) IS NOT NULL, FALSE)
          AND COALESCE(price IS NOT NULL AND TRIM(price) <> '', FALSE)
          AND COALESCE(TRY_CAST(TRIM(price) AS DOUBLE) IS NOT NULL, FALSE)
          AND COALESCE(TRY_CAST(TRIM(price) AS DOUBLE) > 0, FALSE)
          AND COALESCE(odate IS NULL OR TRIM(odate) = ''
                OR (CASE WHEN regexp_matches(TRIM(odate),
                             '^[0-9]{2}/[0-9]{2}/[0-9]{4}$')
                         THEN CAST(strptime(TRIM(odate), '%d/%m/%Y') AS DATE)
                         ELSE NULL END) IS NOT NULL, FALSE)
          AND COALESCE(status IS NULL OR TRIM(status) = ''
                OR LENGTH(TRIM(status)) >= 1, FALSE)
          AND COALESCE(status IS NULL OR TRIM(status) = ''
                OR LENGTH(TRIM(status)) <= 1, FALSE)
    """,
    "contract_messages": """
        WITH stringified AS (
            SELECT CAST(o_orderkey AS VARCHAR) AS okey,
                   CASE WHEN o_orderkey % 11 = 0 THEN NULL
                        WHEN o_orderkey % 7 = 0 THEN 'junk'
                        ELSE CAST(o_totalprice AS VARCHAR) END AS price,
                   CASE WHEN o_orderkey % 13 = 0
                        THEN strftime(o_orderdate, '%Y-%m-%d')
                        ELSE strftime(o_orderdate, '%d/%m/%Y') END AS odate,
                   o_orderstatus AS status,
                   o_orderpriority AS prio
            FROM orders
        )
        SELECT 'orders_sub' AS entity, 'MISSING_MANDATORY_VALUE' AS error_code,
               'price' AS error_location, 'missing' AS category,
               CAST(okey AS BIGINT) AS record_key
        FROM stringified
        WHERE NOT COALESCE(price IS NOT NULL AND TRIM(price) <> '', FALSE)
        UNION ALL
        SELECT 'orders_sub', 'INVALID_NUMBER', 'price', 'type',
               CAST(okey AS BIGINT)
        FROM stringified
        WHERE NOT COALESCE(price IS NULL OR TRIM(price) = ''
              OR TRY_CAST(TRIM(price) AS DOUBLE) IS NOT NULL, FALSE)
        UNION ALL
        SELECT 'orders_sub', 'OUT_OF_RANGE_GT', 'price', 'constraint',
               CAST(okey AS BIGINT)
        FROM stringified
        WHERE NOT COALESCE(price IS NULL OR TRIM(price) = ''
              OR TRY_CAST(TRIM(price) AS DOUBLE) > 0, FALSE)
        UNION ALL
        SELECT 'orders_sub', 'INVALID_DATE', 'odate', 'type',
               CAST(okey AS BIGINT)
        FROM stringified
        WHERE NOT COALESCE(odate IS NULL OR TRIM(odate) = ''
              OR (CASE WHEN regexp_matches(TRIM(odate),
                           '^[0-9]{2}/[0-9]{2}/[0-9]{4}$')
                       THEN CAST(strptime(TRIM(odate), '%d/%m/%Y') AS DATE)
                       ELSE NULL END) IS NOT NULL, FALSE)
    """,
    "record_index": """
        SELECT c_custkey, row_number() OVER () AS record_index FROM customer
    """,
    "scalar_functions": f"""
        SELECT c_custkey,
               c_acctbal > 10000 AS big_bal,
               c_acctbal <= 5000.0 AS le_5k,
               ABS(c_acctbal - 5000.0) <= ABS(5000.0 * 0.5) AS near_5k,
               {_nhs_mod11_oracle("lpad(cast(c_custkey AS VARCHAR), 10, '4')")}
                   AS nhs_ok
        FROM customer
    """,
}


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue by nation via the
    engine (two theta joins + filter + aggregation)."""
    sf_dir = "/root/testdata/sf0.001"
    ents = _load(spark, sf_dir, ["customer", "orders", "lineitem", "nation"])
    eng = _engine(spark)
    eng.evaluate(
        ents,
        config=InnerJoin(
            entity_name="orders",
            target_name="customer",
            join_condition="orders.o_custkey = customer.c_custkey",
            new_columns={"customer.c_nationkey": "c_nationkey"},
        ),
    )
    eng.evaluate(
        ents,
        config=InnerJoin(
            entity_name="lineitem",
            target_name="orders",
            join_condition="lineitem.l_orderkey = orders.o_orderkey",
            new_columns={"orders.c_nationkey": "c_nationkey"},
        ),
    )
    eng.evaluate(
        ents,
        config=LeftJoin(
            entity_name="lineitem",
            target_name="nation",
            join_condition="lineitem.c_nationkey = nation.n_nationkey",
            new_columns={"nation.n_name": "nation_name"},
        ),
    )
    eng.evaluate(
        ents,
        config=Aggregation(
            entity_name="lineitem",
            group_by="nation_name",
            agg_columns={
                "round(sum(l_extendedprice * (1 - l_discount)), 2)": "revenue",
                "count(1)": "n_items",
            },
        ),
    )
    return ents["lineitem"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "add_select": q_add_select,
        "filter": q_filter,
        "group_by": q_group_by,
        "group_by_pivot": q_group_by_pivot,
        "distinct": q_distinct,
        "left_join": q_left_join,
        "inner_join": q_inner_join,
        "one_to_one_join": q_one_to_one_join,
        "semi_join": q_semi_join,
        "anti_join": q_anti_join,
        "has_match": q_has_match,
        "union": q_union,
        "identify_orphans": q_identify_orphans,
        "join_header": q_join_header,
        "sync_filters": q_sync_filters,
        "sync_filter_messages": q_sync_filter_messages,
        "notification": q_notification,
        "scalar_functions": q_scalar_functions,
        "contract_cast": q_contract_cast,
        "contract_messages": q_contract_messages,
        "record_index": q_record_index,
    }


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
