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


# ---- star views: N dims + one-to-many child (LabelSyncJoinSubTest) --------

LABEL_SCHEMA = StructType(
    [
        StructField("lid", LongType(), False),
        StructField("uid", LongType(), False),
        StructField("label", StringType(), True),
    ]
)
STAR_VIEW_SCHEMA = StructType(
    [
        StructField("uid", LongType(), False),
        StructField("uname", StringType(), True),
        StructField("role_id", LongType(), True),
        StructField("role_name", StringType(), True),
        StructField("labels", StringType(), True),
    ]
)


def _star_cfg():
    from canal_spark.mv import ChildAgg, DimJoin, StarViewConfig

    return StarViewConfig(
        main_key=["uid"],
        main_cols=["uid", "uname", "role_id"],
        dims=[DimJoin("role_id", "role_id", ["role_name"])],
        child=ChildAgg(
            child_fk="uid",
            # the reference's group_concat(label) subquery
            agg={"labels": "concat_ws(',', sort_array(collect_list(label)))"},
        ),
    )


def _star_recompute(spark, users, roles, labels):
    from canal_spark.mv import star_view_select

    u = spark.createDataFrame(users, USER_SCHEMA)
    r = spark.createDataFrame(roles, ROLE_SCHEMA)
    lbl = spark.createDataFrame(labels, LABEL_SCHEMA)
    return {
        row["uid"]: (row["uname"], row["role_id"], row["role_name"], row["labels"])
        for row in star_view_select(_star_cfg(), u, [r], lbl).collect()
    }


def _star_dict(spark, view):
    return {
        r["uid"]: (r["uname"], r["role_id"], r["role_name"], r["labels"])
        for r in view.scan(spark).collect()
    }


@pytest.fixture()
def star_setup(spark, tmp_path):
    from canal_spark.mv import star_view_select

    users = [(i, f"user{i}", i % 3 + 1) for i in range(30)]
    roles = [(1, "admin"), (2, "editor"), (3, "viewer")]
    labels = [(i, i % 30, f"lbl{i % 7}") for i in range(60)]
    view = create_table(
        str(tmp_path / "starview"), STAR_VIEW_SCHEMA, properties={"key-cols": "uid"}
    )
    append(
        spark,
        view,
        star_view_select(
            _star_cfg(),
            spark.createDataFrame(users, USER_SCHEMA),
            [spark.createDataFrame(roles, ROLE_SCHEMA)],
            spark.createDataFrame(labels, LABEL_SCHEMA),
        ).repartition(4),
    )
    return view, users, roles, labels


def test_star_child_change_reruns_subquery(spark, star_setup):
    """LabelSyncJoinSubTest shape: inserting/changing child rows
    re-derives ONLY the affected mains' view rows via the child_fk."""
    from canal_spark.mv import maintain_star_view

    view, users, roles, labels = star_setup
    # add a label for uid 4, delete all labels of uid 5
    new_labels = [l for l in labels if l[1] != 5] + [(100, 4, "zz-new")]
    child_changes = spark.createDataFrame(
        [l for l in labels if l[1] == 5] + [(100, 4, "zz-new")], LABEL_SCHEMA
    )
    res = maintain_star_view(
        spark, view, _star_cfg(),
        spark.createDataFrame(users, USER_SCHEMA),
        [spark.createDataFrame(roles, ROLE_SCHEMA)],
        child_current=spark.createDataFrame(new_labels, LABEL_SCHEMA),
        child_changes=child_changes,
    )
    assert res.applied
    got = _star_dict(spark, view)
    assert got == _star_recompute(spark, users, roles, new_labels)
    assert "zz-new" in got[4][3]
    assert got[5][3] is None or got[5][3] == ""
    # only the two affected mains were touched
    assert res.extra["slice_rows"] == 2


def test_star_multi_path_batch_and_replay(spark, star_setup):
    """Combined main+dim+child batch, then a crash-replay no-op."""
    from canal_spark.mv import maintain_star_view

    view, users, roles, labels = star_setup
    users = [(u if u[0] != 8 else (8, "renamed8", u[2])) for u in users]
    users = [u for u in users if u[0] != 9]  # delete user 9
    roles = [(1, "admin"), (2, "super"), (3, "viewer")]
    new_labels = labels + [(101, 10, "added")]
    kw = dict(
        main_changes=spark.createDataFrame(
            [(8,), (9,)], StructType([StructField("uid", LongType(), False)])
        ),
        dim_changes=[
            spark.createDataFrame(
                [(2,)], StructType([StructField("role_id", LongType(), False)])
            )
        ],
        child_current=spark.createDataFrame(new_labels, LABEL_SCHEMA),
        child_changes=spark.createDataFrame([(101, 10, "added")], LABEL_SCHEMA),
        batch_ordinal=500,
    )
    u_df = spark.createDataFrame(users, USER_SCHEMA)
    r_df = spark.createDataFrame(roles, ROLE_SCHEMA)
    res = maintain_star_view(spark, view, _star_cfg(), u_df, [r_df], **kw)
    assert res.applied
    got = _star_dict(spark, view)
    assert got == _star_recompute(spark, users, roles, new_labels)
    assert 9 not in got
    assert got[8][0] == "renamed8"
    assert all(v[2] == "super" for v in got.values() if v[1] == 2)
    assert "added" in got[10][3]
    # replay of the same source batch: hwm filters it to empty
    res2 = maintain_star_view(spark, view, _star_cfg(), u_df, [r_df], **kw)
    assert not res2.applied
    assert _star_dict(spark, view) == got
