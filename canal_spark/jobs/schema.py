"""spark-submit job: schema + partition-spec evolution (the DDL verb).

  spark-submit --py-files canal_spark.zip canal_spark/jobs/schema.py \\
      /warehouse/tokens --add quality:double --rename source=origin
  ... --retype n_tok:long                 # widening only
  ... --drop quality
  ... --evolve-partition-by origin,lang   # per-file spec_id, loss-safe
  ... --set-property write.bloom.col=doc_id   # SET TBLPROPERTIES
  ... --unset-property write.bloom.col        # UNSET
  ... --show                              # print current schema + specs

Each flag maps to `Table.evolve_schema` / `evolve_partition_spec` —
metadata-only commits (the engine's DDL barrier: a schema change is
its own snapshot, never mixed into a data batch).  Rename/drop/spec/
--show are pure metadata CAS writes and run sessionless like
jobs/tag.py; --add/--retype spin up a session only because Spark's
DDL-type parser needs the JVM.  Partition/key columns are protected
(the format rejects dropping, renaming or retyping them).
"""

from __future__ import annotations

from canal_spark.jobs.common import base_parser, emit, session


def _pairs(vals: list[str], sep: str, what: str):
    out = []
    for v in vals:
        a, s, b = v.partition(sep)
        if not s or not a or not b:
            raise SystemExit(f"--{what} expects A{sep}B, got {v!r}")
        out.append((a.strip(), b.strip()))
    return out


def main() -> None:
    p = base_parser("evolve the table schema / partition spec")
    p.add_argument("--add", action="append", default=[], metavar="COL:TYPE",
                   help="add a nullable column (repeatable)")
    p.add_argument("--drop", action="append", default=[], metavar="COL")
    p.add_argument("--rename", action="append", default=[], metavar="OLD=NEW")
    p.add_argument("--retype", action="append", default=[], metavar="COL:TYPE",
                   help="widening cast only (int->long, float->double)")
    p.add_argument("--evolve-partition-by", default=None, metavar="COLS",
                   help="comma list; new files partition by the new spec, "
                        "old files keep theirs (per-file spec_id)")
    p.add_argument("--set-property", action="append", default=[],
                   metavar="K=V", help="ALTER TABLE SET TBLPROPERTIES "
                   "(repeatable; e.g. write.bloom.col=doc_id)")
    p.add_argument("--unset-property", action="append", default=[],
                   metavar="K")
    p.add_argument("--show", action="store_true",
                   help="print schema + partition specs (no change)")
    args = p.parse_args()

    from canal_spark import load_table

    table = load_table(args.table)
    out = {"job": "schema"}
    ddl = any([args.add, args.drop, args.rename, args.retype])
    if args.add or args.retype:
        # Spark's DDL-type parser (StructField types for add/retype)
        # needs an active session; rename/drop stay sessionless
        session(args, "canal-schema")
    if ddl:
        snap = table.evolve_schema(
            add=_pairs(args.add, ":", "add") or None,
            drop=args.drop or None,
            rename=_pairs(args.rename, "=", "rename") or None,
            retype=_pairs(args.retype, ":", "retype") or None,
        )
        out["ddl_snapshot_id"] = snap.snapshot_id
    if args.evolve_partition_by is not None:
        cols = [c.strip() for c in args.evolve_partition_by.split(",") if c.strip()]
        snap = table.evolve_partition_spec(cols)
        out["spec_snapshot_id"] = snap.snapshot_id
        out["spec_id"] = table.default_spec_id
    props = args.set_property or args.unset_property
    if props:
        # sessionless metadata CAS, like --rename/--drop
        out["properties"] = table.set_properties(
            dict(_pairs(args.set_property, "=", "set-property")),
            remove=args.unset_property,
        )
    if not ddl and args.evolve_partition_by is None and not props and not args.show:
        p.error("nothing to do: pass --add/--drop/--rename/--retype/"
                "--evolve-partition-by/--set-property/--unset-property or --show")
    from pyspark.sql.types import StructType  # pure-Python, no JVM spin-up

    table.refresh()
    out["schema_id"] = table.current_schema_id
    st = StructType.fromJson(table.schema_json)
    out["schema"] = {f.name: f.dataType.simpleString() for f in st.fields}
    out["partition_specs"] = table.partition_specs
    emit(out)


if __name__ == "__main__":
    main()
