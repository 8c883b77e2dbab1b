"""spark-submit entrypoints (SURVEY.md §7 architecture).

Deployment per BASELINE.json.north_star: ``spark-submit --py-files
canal_spark.zip canal_spark/jobs/<job>.py <args>`` on a multi-executor
cluster.  Each job builds its session from the environment (master set
by spark-submit), runs one maintenance phase (or the whole pass), and
prints a one-line JSON report — the operational analogue of the
reference's per-destination adapter workers
(client-adapter/launcher/.../CanalAdapterWorker.java).
"""
