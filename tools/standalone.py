"""Local Spark standalone cluster harness.

Models the north rule's "multi-executor cluster at N and 4N executors"
faithfully inside one machine: a standalone master plus worker
process(es), with ``spark.executor.cores`` fixed so the executor COUNT
is what changes between the two measurements. Unlike ``local[n]``
(one JVM, one shared Arrow/python boundary), every executor here is
its own JVM with its own Python workers — the same isolation shape as
a real cluster, so executor-count scaling is actually exercised.
"""
from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
import time
from contextlib import contextmanager

import pyspark

SPARK_HOME = os.path.dirname(pyspark.__file__)
SPARK_CLASS = os.path.join(SPARK_HOME, "bin", "spark-class")
MASTER_URL = "spark://127.0.0.1:7077"


def _spawn(args: list[str], env: dict, log: str) -> subprocess.Popen:
    with open(log, "ab") as f:
        return subprocess.Popen(args, env=env, stdout=f, stderr=f)


@contextmanager
def standalone_cluster(n_executors: int, cores_per_executor: int = 8,
                       memory_per_executor: str = "6g",
                       repo_root: str = "/root/repo"):
    """Start master + one worker per executor; yield (master_url, conf).

    Each worker advertises exactly ``cores_per_executor`` cores, so the
    app gets one executor per worker — executor count is the scaling
    axis.
    """
    tmp = tempfile.mkdtemp(prefix="spark_standalone_")
    env = dict(os.environ,
               SPARK_HOME=SPARK_HOME,
               SPARK_LOG_DIR=tmp,
               SPARK_LOCAL_IP="127.0.0.1",
               SPARK_NO_DAEMONIZE="1",
               PYTHONPATH=repo_root,
               PYSPARK_PYTHON=os.environ.get("PYSPARK_PYTHON", "python3"))
    procs = []
    try:
        procs.append(_spawn(
            [SPARK_CLASS, "org.apache.spark.deploy.master.Master",
             "--host", "127.0.0.1", "--port", "7077", "--webui-port", "0"],
            env, f"{tmp}/master.log"))
        time.sleep(3)
        for i in range(n_executors):
            procs.append(_spawn(
                [SPARK_CLASS, "org.apache.spark.deploy.worker.Worker",
                 MASTER_URL, "--cores", str(cores_per_executor),
                 "--memory", memory_per_executor,
                 "--work-dir", f"{tmp}/work{i}", "--webui-port", "0"],
                env, f"{tmp}/worker{i}.log"))
        time.sleep(4)
        conf = {
            "spark.executor.cores": str(cores_per_executor),
            "spark.executor.memory": memory_per_executor,
            "spark.cores.max": str(n_executors * cores_per_executor),
            # co-located executor JVMs must size GC/netty thread pools
            # for THEIR core slice, not the whole host — otherwise each
            # of 4 JVMs spins up ~23 GC threads and they thrash
            "spark.executor.extraJavaOptions":
                f"-XX:ActiveProcessorCount={cores_per_executor}",
        }
        yield MASTER_URL, conf
    finally:
        for p in reversed(procs):
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()
        shutil.rmtree(tmp, ignore_errors=True)


def cluster_session(master_url: str, conf: dict, app: str = "standalone-bench",
                    shuffle_partitions: int = 64):
    from pyspark.sql import SparkSession
    b = (SparkSession.builder.master(master_url).appName(app)
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "8g")
         .config("spark.submit.pyFiles", "")
         )
    for k, v in conf.items():
        b = b.config(k, v)
    return b.getOrCreate()
