"""Incremental materialized join-view maintenance (A9) — the
UserSyncJoinOneTest scenario shape from the reference
(client-adapter/elasticsearch/src/test/.../UserSyncJoinOneTest.java):
view = user ⋈ role; main-table changes upsert view rows directly, a
dimension change re-derives every fk-affected view row, deletes
propagate — each batch checked against a full view recompute."""

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from canal_spark import create_table
from canal_spark.mv import JoinViewConfig, maintain_join_view, view_select
from canal_spark.table.writer import append

USER_SCHEMA = StructType(
    [
        StructField("uid", LongType(), False),
        StructField("uname", StringType(), True),
        StructField("role_id", LongType(), True),
    ]
)
ROLE_SCHEMA = StructType(
    [
        StructField("role_id", LongType(), False),
        StructField("role_name", StringType(), True),
    ]
)
VIEW_SCHEMA = StructType(
    [
        StructField("uid", LongType(), False),
        StructField("uname", StringType(), True),
        StructField("role_id", LongType(), True),
        StructField("role_name", StringType(), True),
    ]
)
CFG = JoinViewConfig(
    main_key=["uid"],
    fk_col="role_id",
    dim_pk="role_id",
    main_cols=["uid", "uname", "role_id"],
    dim_cols=["role_name"],
)


def _view_dict(spark, view):
    return {
        r["uid"]: (r["uname"], r["role_id"], r["role_name"])
        for r in view.scan(spark).collect()
    }


def _recompute_dict(spark, users, roles):
    u = spark.createDataFrame(users, USER_SCHEMA)
    r = spark.createDataFrame(roles, ROLE_SCHEMA)
    return {
        row["uid"]: (row["uname"], row["role_id"], row["role_name"])
        for row in view_select(CFG, u, r).collect()
    }


@pytest.fixture()
def mv_setup(spark, tmp_path):
    users = [(i, f"user{i}", i % 3 + 1) for i in range(30)]
    roles = [(1, "admin"), (2, "editor"), (3, "viewer")]
    view = create_table(
        str(tmp_path / "view"), VIEW_SCHEMA, properties={"key-cols": "uid"}
    )
    # initial load = the view definition over the base state
    append(
        spark,
        view,
        view_select(
            CFG,
            spark.createDataFrame(users, USER_SCHEMA),
            spark.createDataFrame(roles, ROLE_SCHEMA),
        ).repartition(4),
    )
    return view, users, roles


def test_main_change_upserts_view_rows(spark, mv_setup):
    view, users, roles = mv_setup
    # ESSyncService main path: one user renamed, one user inserted
    users = [(u if u[0] != 5 else (5, "renamed", u[2])) for u in users]
    users.append((99, "newuser", 2))
    changes = spark.createDataFrame(
        [(5,), (99,)], StructType([StructField("uid", LongType(), False)])
    )
    res = maintain_join_view(
        spark, view, CFG,
        spark.createDataFrame(users, USER_SCHEMA),
        spark.createDataFrame(roles, ROLE_SCHEMA),
        main_changes=changes,
    )
    assert res.applied
    assert _view_dict(spark, view) == _recompute_dict(spark, users, roles)
    got = _view_dict(spark, view)
    assert got[5] == ("renamed", 3, "viewer")
    assert got[99] == ("newuser", 2, "editor")


def test_dim_change_rederives_fk_affected_rows(spark, mv_setup):
    view, users, roles = mv_setup
    # ESSyncService.java:532-650 dim path: role 2 renamed -> every
    # role_id=2 user's view row re-derives; others untouched
    roles = [(1, "admin"), (2, "superuser"), (3, "viewer")]
    dim_changes = spark.createDataFrame(
        [(2,)], StructType([StructField("role_id", LongType(), False)])
    )
    res = maintain_join_view(
        spark, view, CFG,
        spark.createDataFrame(users, USER_SCHEMA),
        spark.createDataFrame(roles, ROLE_SCHEMA),
        dim_changes=dim_changes,
    )
    assert res.applied
    got = _view_dict(spark, view)
    assert got == _recompute_dict(spark, users, roles)
    assert all(v[2] == "superuser" for v in got.values() if v[1] == 2)
    # exactly the affected keys were touched (10 of 30 users have role 2)
    assert res.extra["slice_rows"] == 10


def test_main_delete_and_combined_batch(spark, mv_setup):
    view, users, roles = mv_setup
    # combined batch: delete user 7, rename role 1
    users = [u for u in users if u[0] != 7]
    roles = [(1, "root"), (2, "editor"), (3, "viewer")]
    res = maintain_join_view(
        spark, view, CFG,
        spark.createDataFrame(users, USER_SCHEMA),
        spark.createDataFrame(roles, ROLE_SCHEMA),
        main_changes=spark.createDataFrame(
            [(7,)], StructType([StructField("uid", LongType(), False)])
        ),
        dim_changes=spark.createDataFrame(
            [(1,)], StructType([StructField("role_id", LongType(), False)])
        ),
    )
    assert res.applied
    got = _view_dict(spark, view)
    assert 7 not in got
    assert got == _recompute_dict(spark, users, roles)


def test_replay_same_batch_is_noop(spark, mv_setup):
    view, users, roles = mv_setup
    users = [(u if u[0] != 3 else (3, "changed", u[2])) for u in users]
    kw = dict(
        main_changes=spark.createDataFrame(
            [(3,)], StructType([StructField("uid", LongType(), False)])
        ),
        batch_ordinal=1000,  # source-stream position
    )
    u_df = spark.createDataFrame(users, USER_SCHEMA)
    r_df = spark.createDataFrame(roles, ROLE_SCHEMA)
    assert maintain_join_view(spark, view, CFG, u_df, r_df, **kw).applied
    state = _view_dict(spark, view)
    # crash-replay of the SAME source batch: filters to empty, no commit
    res2 = maintain_join_view(spark, view, CFG, u_df, r_df, **kw)
    assert not res2.applied
    assert _view_dict(spark, view) == state
