"""r14 optimization: the shared lineitem moment table (`_li_moments`)
must be a drop-in replacement — every consumer returns bit-identical
rows with and without the injected ``sums`` frame."""

import pytest


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_correlation_matrix_injected_identical(spark, sf_dir, li):
    import __spark_entry__ as entry
    from csp_gateway_spark.operators.analytics import correlation_matrix

    cols = list(entry._CORR_COLS)
    sums = entry._li_moments(spark, sf_dir)
    a = _rows(correlation_matrix(li, cols, scale=2).orderBy("var_a", "var_b"))
    b = _rows(
        correlation_matrix(li, cols, scale=2, sums=sums).orderBy("var_a", "var_b")
    )
    assert a == b


def test_partial_corr_injected_identical(spark, sf_dir, li):
    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from csp_gateway_spark.operators.analytics import partial_corr

    sums = entry._li_moments(spark, sf_dir).select(
        "_n",
        F.col("_s_l_quantity").alias("_sx"),
        F.col("_s_l_extendedprice").alias("_sy"),
        F.col("_s_l_discount").alias("_sz"),
        F.col("_ss_l_quantity").alias("_sxx"),
        F.col("_ss_l_extendedprice").alias("_syy"),
        F.col("_ss_l_discount").alias("_szz"),
        F.col("_sp_l_extendedprice_l_quantity").alias("_sxy"),
        F.col("_sp_l_discount_l_quantity").alias("_sxz"),
        F.col("_sp_l_discount_l_extendedprice").alias("_syz"),
    )
    args = ("l_quantity", "l_extendedprice", "l_discount")
    assert _rows(partial_corr(li, *args)) == _rows(
        partial_corr(li, *args, sums=sums)
    )


def test_cronbach_alpha_injected_identical(spark, sf_dir, li):
    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from csp_gateway_spark.operators.analytics import cronbach_alpha

    item_cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    sums = entry._li_moments(spark, sf_dir).select(
        "_n",
        *[
            c
            for i, col in enumerate(item_cols)
            for c in (
                F.col(f"_s_{col}").alias(f"_s{i}"),
                F.col(f"_ss_{col}").alias(f"_q{i}"),
            )
        ],
        F.col("_st4").alias("_st"),
        F.col("_qt4").alias("_qt"),
    )
    assert _rows(cronbach_alpha(li, item_cols)) == _rows(
        cronbach_alpha(li, item_cols, sums=sums)
    )


def test_mahalanobis_injected_identical(spark, sf_dir, li):
    import __spark_entry__ as entry
    from csp_gateway_spark.operators.analytics import mahalanobis_outliers

    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    narrow = li.select("l_orderkey", "l_linenumber", *cols)
    sums = entry._li_moments(spark, sf_dir)
    assert _rows(mahalanobis_outliers(narrow, cols, k=20)) == _rows(
        mahalanobis_outliers(narrow, cols, k=20, sums=sums)
    )
