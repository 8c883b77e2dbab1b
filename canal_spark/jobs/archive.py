"""spark-submit job: archive cold changelog segments (S3 analogue).

The binlog purge + RDS OSS upload restated for the staged changelog
(see canal_spark/archive.py): staging files wholly below the retention
ordinal MOVE into ``<archive>/segments/`` with a catalog entry; a
consumer/merge resume older than staging retention reads them back
through ``resolve_changelog`` with manifest range pruning.

Retention ordinal, in precedence order:

* ``--retain-from-ordinal N`` — explicit position (operator override);
* ``--retain-from-table ROOT`` — the destination table's merge
  high-water mark + 1: everything the table has already applied is
  archivable, the un-merged tail always stays hot.  This is the
  production default — the reference purges binlog only past the
  slave-ack position (the same "applied, therefore cold" rule).

  spark-submit --py-files canal_spark.zip canal_spark/jobs/archive.py \\
      /stage/changelog /cold/changelog --retain-from-table /warehouse/tokens
"""

from __future__ import annotations

import argparse

from canal_spark.jobs.common import emit


def main() -> None:
    p = argparse.ArgumentParser(description="archive cold changelog segments")
    p.add_argument("changelog", help="staged changelog dir (hot)")
    p.add_argument("archive", help="cold archive root (segments/ + manifest.json)")
    p.add_argument("--retain-from-ordinal", type=int, default=None,
                   help="archive files wholly below this ordinal")
    p.add_argument("--retain-from-table", default=None,
                   help="derive retention from this table's merge hwm + 1")
    p.add_argument("--app-name", default=None)
    args = p.parse_args()
    if (args.retain_from_ordinal is None) == (args.retain_from_table is None):
        p.error("exactly one of --retain-from-ordinal / --retain-from-table")

    from canal_spark.archive import archive_segments
    from canal_spark.jobs.common import session

    spark = session(args, "canal-archive")

    if args.retain_from_table is not None:
        from canal_spark import load_table
        from canal_spark.merge import merge_high_water_mark

        hwm = merge_high_water_mark(load_table(args.retain_from_table))
        retain = hwm + 1  # files with max_ordinal <= hwm are applied => cold
    else:
        retain = args.retain_from_ordinal

    rep = archive_segments(spark, args.changelog, args.archive, retain)
    emit({"job": "archive", "retain_from_ordinal": retain, **rep})


if __name__ == "__main__":
    main()
