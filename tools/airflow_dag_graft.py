"""Airflow DAG for the graft pipeline — the production orchestration shape.

Each task launches one `graft.stages.PipelineMain` stage via
`SparkSubmitOperator` (the Spark analog of the reference's per-task
`PostgresOperator` chain). Stages share NOTHING but durable MergeTable
storage under WAREHOUSE, so a task retry or a scheduler failover resumes
from the last committed version of every layer; the watermark advances
only after the fact commit inside `stg_to_dds`, so replays converge
(idempotent merges) rather than double-count.

This file is the documented DAG artifact: the sandbox has no Airflow (or
cluster), so it is exercised indirectly — `PipelineMainSpec` runs the same
three-stage chain, twice plus a full replay, against scratch storage.

Schedule mirrors the reference (`dags/courier_ledger_dag.py:9`): daily at
00:15, no catchup.
"""

from datetime import datetime

from airflow import DAG
from airflow.providers.apache.spark.operators.spark_submit import SparkSubmitOperator

JAR = "{{ var.value.graft_jar }}"                 # assembled engine jar
WAREHOUSE = "{{ var.value.graft_warehouse }}"     # durable MergeTable root
SOURCE = "{{ var.value.graft_source }}/{{ ds }}"  # per-day landing dir

SPARK_CONF = {
    # the engine's session posture (ARCHITECTURE.md): UTC, AQE on,
    # RocksDB streaming state, the defensive broadcast guard injected
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.extensions": "graft.GraftExtensions",
}


def stage(task_id: str, *app_args: str) -> SparkSubmitOperator:
    return SparkSubmitOperator(
        task_id=task_id,
        application=JAR,
        java_class="graft.stages.PipelineMain",
        application_args=list(app_args),
        conf=SPARK_CONF,
    )


with DAG(
    dag_id="graft_courier_ledger",
    schedule="15 0 * * *",
    start_date=datetime(2024, 1, 1),
    catchup=False,
) as dag:
    load_stg = stage("load_stg", "load_stg", WAREHOUSE, SOURCE)
    stg_to_dds = stage("stg_to_dds", "stg_to_dds", WAREHOUSE)
    ledger_update = stage("ledger_update", "ledger_update", WAREHOUSE)

    load_stg >> stg_to_dds >> ledger_update
