"""Three-way consistency: for every oracle written in engine-neutral ANSI
SQL, running that exact SQL through ``spark.sql`` over registered views must
produce the same rows as the DataFrame-API query. (The DuckDB leg of the
triangle is tools/check_oracle.py.)

Oracles using DuckDB-dialect functions (list_*, EPOCH, encode,
string_split_regex, quantile_cont, json_extract_string, //) are excluded —
dialect difference, not semantic difference.
"""

from __future__ import annotations

import pytest

from icenetetl_spark.queries import all_oracles, all_queries
from icenetetl_spark.sources.testdata import register_views

SF_DIR = "/root/testdata/sf0.001"

ANSI_ORACLES = [
    "p_filter_derive",
    "p_rename_normalize",
    "p_route_classify",
    "j1_broadcast_left_join",
    "j2_inner_enrich",
    "j3_latest_snapshot",
    "j4_anti_join_upsert",
    "j5_grid_wkt",
    "a1_meta_rollup",
    "a4_distinct",
    "a6_grid_spacing",
    "w1_row_number",
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_local_supplier",
    "q6_revenue_delta",
    "j_salted_join",
    "q4_semi_join",
    "q13_cust_distribution",
    "q16_distinct_suppliers",
    "q18_large_orders",
    "q19_disjunctive",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    "p10_first_distinct",
    "a_rollup_grouping",
    "a_pivot_returnflag",
    "f_string_funcs",
    "ev_top_users",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q14_promo_effect",
    "q15_top_supplier",
    "q17_small_qty_avg",
    "q21_waiting_supplier",
    "q22_global_sales",
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q11_important_parts",
    "q12_priority_lines",
    "q20_excess_suppliers",
    "ev_transition_matrix",
    "w_cume_percent",
    "dq_expectations",
    "approx_distinct_suppliers",
    "approx_heavy_hitters",
]


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect()
    )


@pytest.mark.parametrize("name", ANSI_ORACLES)
def test_sql_api_matches_dataframe_api(spark, name):
    register_views(spark, SF_DIR)
    df_api = all_queries()[name](spark, SF_DIR)
    sql_api = spark.sql(all_oracles()[name])
    assert _rows(df_api) == _rows(sql_api)
