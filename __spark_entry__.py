"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator family from SURVEY.md §2
(+ training-data-pipeline ops), each (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — DuckDB-runnable ANSI SQL equivalents, alias-matched
column-for-column with the Spark results.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from chemharmony_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_pricing_summary": Q.q01_pricing_summary,
        "q02_top_orders": Q.q02_top_orders,
        "q03_region_revenue": Q.q03_region_revenue,
        "q04_filter_predicates": Q.q04_filter_predicates,
        "q05_recode": Q.q05_recode,
        "q06_regex_strip_cast": Q.q06_regex_strip_cast,
        "q07_distinct": Q.q07_distinct,
        "q08_pivot_counts": Q.q08_pivot_counts,
        "q09_melt": Q.q09_melt,
        "q10_window_rownumber": Q.q10_window_rownumber,
        "q11_keep_unique_keys": Q.q11_keep_unique_keys,
        "q12_window_median": Q.q12_window_median,
        "q13_discordance": Q.q13_discordance,
        "q14_having_floor": Q.q14_having_floor,
        "q15_conditional_sum": Q.q15_conditional_sum,
        "q16_group_min_two_level": Q.q16_group_min_two_level,
        "q17_count_distinct": Q.q17_count_distinct,
        "q18_union_by_name": Q.q18_union_by_name,
        "q19_intersect_except": Q.q19_intersect_except,
        "q20_grid_negatives": Q.q20_grid_negatives,
        "q21_semi_anti_join": Q.q21_semi_anti_join,
        "q22_left_join_histogram": Q.q22_left_join_histogram,
        "q23_full_outer_consistency": Q.q23_full_outer_consistency,
        "q24_group_id_md5": Q.q24_group_id_md5,
        "q25_content_id_json": Q.q25_content_id_json,
        "q26_stratified_sample": Q.q26_stratified_sample,
        "q27_json_extract": Q.q27_json_extract,
        "q28_tumbling_window": Q.q28_tumbling_window,
        "q29_sessionize": Q.q29_sessionize,
    }


_DEC = "DECIMAL(18,2)"
_DISC = "(CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))"
_REV = f"CAST(SUM(CAST(l_extendedprice AS {_DEC}) * {_DISC}) AS DOUBLE)"


def oracle_sql() -> dict[str, str]:
    return {
        "q01_pricing_summary": f"""
            SELECT *, sum_qty / count_order AS avg_qty FROM (
              SELECT l_returnflag, l_linestatus,
                CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS sum_qty,
                CAST(SUM(CAST(l_extendedprice AS {_DEC})) AS DOUBLE) AS sum_base_price,
                {_REV} AS sum_disc_price,
                COUNT(*) AS count_order
              FROM lineitem
              WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
              GROUP BY l_returnflag, l_linestatus)
        """,
        "q02_top_orders": f"""
            SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
                   {_REV} AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY o_orderkey, o_orderdate
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10
        """,
        "q03_region_revenue": f"""
            SELECT r_name, n_name, {_REV} AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name
        """,
        "q04_filter_predicates": f"""
            SELECT l_returnflag, COUNT(*) AS n,
                   CAST(SUM(CAST(l_quantity AS {_DEC})) AS DOUBLE) AS qty
            FROM lineitem
            WHERE l_returnflag IN ('A','R')
              AND l_quantity BETWEEN 10 AND 20
              AND l_shipdate IS NOT NULL
            GROUP BY l_returnflag
        """,
        "q05_recode": """
            SELECT CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'filled'
                        WHEN 'P' THEN 'pending' ELSE 'other' END AS status,
                   COUNT(*) AS n
            FROM orders GROUP BY 1
        """,
        "q06_regex_strip_cast": """
            SELECT CAST(regexp_replace(o_orderpriority, '[^0-9]', '', 'g') AS DOUBLE)
                     AS prio_num,
                   COUNT(*) AS n
            FROM orders GROUP BY 1
        """,
        "q07_distinct": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
        "q08_pivot_counts": """
            SELECT o_orderpriority,
                   COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
                   COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
                   COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
            FROM orders GROUP BY o_orderpriority
        """,
        "q09_melt": f"""
            SELECT metric, COUNT(*) AS n,
                   CAST(SUM(CAST(value AS {_DEC})) AS DOUBLE) AS total
            FROM (
              SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
              UNION ALL
              SELECT 'l_extendedprice', l_extendedprice FROM lineitem
              UNION ALL
              SELECT 'l_discount', l_discount FROM lineitem
            ) WHERE value IS NOT NULL
            GROUP BY metric
        """,
        "q10_window_rownumber": """
            SELECT o_custkey, o_orderkey, rn FROM (
              SELECT o_custkey, o_orderkey,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate DESC, o_orderkey) AS rn
              FROM orders)
            WHERE rn <= 3
        """,
        "q11_keep_unique_keys": """
            SELECT o_custkey, o_orderkey FROM (
              SELECT o_custkey, o_orderkey,
                     COUNT(*) OVER (PARTITION BY o_custkey) AS c
              FROM orders)
            WHERE c = 1
        """,
        "q12_window_median": """
            SELECT l_partkey, median(l_quantity) AS med_qty
            FROM lineitem GROUP BY l_partkey
        """,
        "q13_discordance": """
            SELECT l_partkey, MIN(l_returnflag) AS flag, COUNT(*) AS n
            FROM lineitem GROUP BY l_partkey
            HAVING COUNT(DISTINCT l_returnflag) = 1
        """,
        "q14_having_floor": """
            SELECT l_partkey, COUNT(*) AS n FROM lineitem
            GROUP BY l_partkey HAVING COUNT(*) > 320
        """,
        "q15_conditional_sum": """
            SELECT l_returnflag,
                   COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_hi_disc,
                   COUNT(*) FILTER (WHERE l_discount <= 0.05) AS n_lo_disc
            FROM lineitem GROUP BY l_returnflag
        """,
        "q16_group_min_two_level": """
            SELECT l_partkey, MIN(cnt) AS mincnt FROM (
              SELECT l_partkey, l_returnflag, COUNT(*) AS cnt
              FROM lineitem GROUP BY l_partkey, l_returnflag)
            GROUP BY l_partkey
        """,
        "q17_count_distinct": """
            SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS nsupp
            FROM lineitem GROUP BY l_partkey
        """,
        "q18_union_by_name": """
            SELECT bucket, COUNT(*) AS n FROM (
              SELECT o_orderkey, 'open' AS bucket FROM orders WHERE o_orderstatus = 'O'
              UNION ALL
              SELECT o_orderkey, 'filled' FROM orders WHERE o_orderstatus = 'F')
            GROUP BY bucket
        """,
        "q19_intersect_except": """
            SELECT nk, 'both' AS op FROM (
              SELECT c_nationkey AS nk FROM customer
              INTERSECT SELECT s_nationkey FROM supplier)
            UNION ALL
            SELECT nk, 'cust_only' AS op FROM (
              SELECT c_nationkey AS nk FROM customer
              EXCEPT SELECT s_nationkey FROM supplier)
        """,
        "q20_grid_negatives": """
            WITH obs AS (
              SELECT n_name, o_orderstatus, COUNT(*) AS n
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              GROUP BY n_name, o_orderstatus),
            grid AS (
              SELECT n_name, o_orderstatus
              FROM (SELECT DISTINCT n_name FROM nation),
                   (SELECT DISTINCT o_orderstatus FROM orders))
            SELECT g.n_name, g.o_orderstatus, COALESCE(obs.n, 0) AS n
            FROM grid g LEFT JOIN obs USING (n_name, o_orderstatus)
        """,
        "q21_semi_anti_join": """
            SELECT 'with_orders' AS bucket, COUNT(*) AS n FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)
            UNION ALL
            SELECT 'without_orders', COUNT(*) FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "q22_left_join_histogram": """
            SELECT n_orders, COUNT(*) AS n_customers FROM (
              SELECT COALESCE(cnt, 0) AS n_orders
              FROM customer
              LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt
                         FROM orders GROUP BY o_custkey) o
                ON c_custkey = o.o_custkey)
            GROUP BY n_orders
        """,
        "q23_full_outer_consistency": """
            SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
                   COALESCE(ncust, 0) AS ncust, COALESCE(nsupp, 0) AS nsupp
            FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS ncust
                  FROM customer GROUP BY 1) c
            FULL OUTER JOIN
                 (SELECT s_nationkey AS nationkey, COUNT(*) AS nsupp
                  FROM supplier GROUP BY 1) s
            USING (nationkey)
        """,
        "q24_group_id_md5": """
            SELECT l_returnflag, l_linestatus,
                   md5(concat_ws(chr(31), l_returnflag, l_linestatus)) AS gid
            FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)
        """,
        "q25_content_id_json": """
            SELECT p_partkey, data, md5(data) AS cid FROM (
              SELECT p_partkey,
                     to_json(struct_pack(p_brand := p_brand, p_size := p_size,
                                         p_type := p_type))::VARCHAR AS data
              FROM part)
        """,
        "q26_stratified_sample": """
            SELECT l_returnflag, l_orderkey, l_linenumber FROM (
              SELECT l_returnflag, l_orderkey, l_linenumber,
                     ROW_NUMBER() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY md5(concat_ws('|', l_orderkey, l_linenumber))) AS rn
              FROM lineitem)
            WHERE rn <= 5
        """,
        "q27_json_extract": """
            SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(k) AS BIGINT) AS sum_k,
                   MIN(k) AS min_k, MAX(k) AS max_k
            FROM (SELECT event_type,
                         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
                  FROM events)
            GROUP BY event_type
        """,
        "q28_tumbling_window": f"""
            SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket,
                   event_type, COUNT(*) AS n,
                   CAST(SUM(CAST(value AS {_DEC})) AS DOUBLE) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "q29_sessionize": """
            WITH flagged AS (
              SELECT user_id, ts,
                     CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
                            OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > 1800000000000
                          THEN 1 ELSE 0 END AS is_new
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            numbered AS (
              SELECT user_id,
                     SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS session_id
              FROM flagged)
            SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions,
                   COUNT(*) AS n_events
            FROM numbered GROUP BY user_id
        """,
    }
