"""N1-N4 anonymization parity (anonymize_database.py semantics +
df_with_private_info expectations, FIXTURES.md §2)."""

from __future__ import annotations

from pytrousse_spark import from_df
from pytrousse_spark.operators.anonymize import (
    anonymize_data,
    create_private_info_df,
    id_owner_sql,
)


def _private_ds(spark):
    # FIXTURES.md df_with_private_info: rows 3 and 4 share private identity
    rows = [
        ("name_0", "addr_0", 0),
        ("name_1", "addr_1", 1),
        ("name_2", "addr_2", 2),
        ("name_3", "addr_3", 3),
        ("name_3", "addr_3", 4),
    ]
    return from_df(spark.createDataFrame(rows, ["NAME", "ADDRESS", "data_col"]))


def test_private_table_dedup(spark):
    ds = _private_ds(spark)
    priv = create_private_info_df(ds.df, ["NAME", "ADDRESS"], salt="s")
    rows = priv.collect()
    assert len(rows) == 4  # 5 rows → 4 identities
    assert len({r["ID_OWNER"] for r in rows}) == 4
    assert all(len(r["ID_OWNER"]) == 64 for r in rows)


def test_anonymize_shared_identity(spark):
    ds = _private_ds(spark)
    out, priv = anonymize_data(ds, ["NAME", "ADDRESS"], ["NAME", "ADDRESS"], salt="s")
    rows = out.df.collect()
    assert set(out.columns) == {"data_col", "ID_OWNER"}
    ids = {r["data_col"]: r["ID_OWNER"] for r in rows}
    assert ids[3] == ids[4]           # shared identity
    assert len(set(ids.values())) == 4
    # join back reconstructs the private info
    joined = out.df.join(priv, on="ID_OWNER", how="inner")
    assert joined.count() == 5


def test_null_private_values_filled(spark):
    rows = [("a", None, 0), (None, None, 1), ("a", None, 2)]
    ds = from_df(spark.createDataFrame(rows, "NAME string, ADDRESS string, d int"))
    out, priv = anonymize_data(ds, ["NAME"], ["NAME", "ADDRESS"], salt="s")
    assert priv.count() == 2  # (a,----) and (----,----)
    ids = {r["d"]: r["ID_OWNER"] for r in out.df.collect()}
    assert ids[0] == ids[2] != ids[1]


def test_id_owner_sql_twin(spark, duck):
    ds = _private_ds(spark)
    out, _ = anonymize_data(ds, [], ["NAME", "ADDRESS"], salt="z9")
    spark_ids = sorted(
        (r["data_col"], r["ID_OWNER"]) for r in out.df.collect()
    )
    values = ", ".join(
        f"('name_{i}', 'addr_{i}', {d})" for i, d in [(0, 0), (1, 1), (2, 2), (3, 3), (3, 4)]
    )
    duck_ids = sorted(
        duck.sql(
            f"SELECT data_col, {id_owner_sql(['NAME', 'ADDRESS'], 'z9')} AS id "
            f"FROM (VALUES {values}) t(NAME, ADDRESS, data_col)"
        ).fetchall()
    )
    assert [(d, i) for d, i in spark_ids] == duck_ids
