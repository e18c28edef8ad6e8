"""Local Spark standalone cluster — real multi-executor scaling evidence.

The north rule requires the build to run "via spark-submit --py-files on
multi-executor clusters at N and 4N executors".  ``local[N]`` approximates
an executor with N task slots, but all N slots share ONE JVM process — one
address space, one allocator, one GC — which is neither how a cluster
scales nor kind to this sandbox (page faults taken concurrently by many
threads of one process serialize on that process's memory-management locks;
see session.py:_ALLOC_ENV).  This module stands up a real standalone
cluster on localhost — master JVM + worker JVM + one JVM **per executor** —
so "N executors vs 4N executors" is measured with N vs 4N actual executor
processes, each with its own fixed-size pre-touched heap, its own Python
worker pool, and shuffle served over real block transfers.

Reference analogue: the reference is single-process and scales with a
fork-join pool (AbstractSearchContext.java:91-97); Spark's executor
processes are the cluster-native replacement.
"""

from __future__ import annotations

import os
import socket
import subprocess
import time

import pyspark
from pyspark.sql import SparkSession

from .session import _ALLOC_ENV, _export_package_path, _pin_allocators

SPARK_HOME = os.path.dirname(os.path.abspath(pyspark.__file__))
SPARK_CLASS = os.path.join(SPARK_HOME, "bin", "spark-class")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _wait_port(port: int, timeout: float = 60.0) -> None:
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=1):
                return
        except OSError:
            time.sleep(0.3)
    raise TimeoutError(f"port {port} not listening after {timeout}s")


class StandaloneCluster:
    """Master + one worker advertising ``cores``/``memory``; executors are
    sized per application (see :func:`get_cluster_spark`)."""

    def __init__(
        self,
        cores: int = 32,
        memory: str = "100g",
        scratch: str | None = None,
        log_dir: str = "/tmp/spark-standalone",
    ):
        self.cores = cores
        self.memory = memory
        self.port = _free_port()
        self.scratch = scratch or (
            "/dev/shm/sparkgraft/local"
            if os.path.isdir("/dev/shm")
            else "/tmp/sparkgraft-local"
        )
        self.log_dir = f"{log_dir}-{self.port}"
        self._procs: list[subprocess.Popen] = []
        self._logs: list = []

    @property
    def master_url(self) -> str:
        return f"spark://127.0.0.1:{self.port}"

    def _env(self) -> dict:
        env = dict(os.environ)
        env.update(_ALLOC_ENV)
        env.update(
            SPARK_HOME=SPARK_HOME,
            SPARK_LOCAL_IP="127.0.0.1",
            SPARK_LOCAL_DIRS=self.scratch,
            SPARK_LOG_DIR=self.log_dir,
            # master/worker JVMs do no data work — keep them tiny so their
            # heaps never contend with executors for resident pages
            SPARK_DAEMON_MEMORY="1g",
        )
        return env

    def start(self) -> "StandaloneCluster":
        os.makedirs(self.scratch, exist_ok=True)
        os.makedirs(self.log_dir, exist_ok=True)
        env = self._env()
        # log handles are kept and closed in stop(); a failure after the
        # master spawned must not leak its JVM (or its bound port) into the
        # next cluster in the same process
        try:
            self._logs.append(open(f"{self.log_dir}/master.log", "w"))
            self._procs.append(
                subprocess.Popen(
                    [
                        SPARK_CLASS,
                        "org.apache.spark.deploy.master.Master",
                        "--host", "127.0.0.1",
                        "--port", str(self.port),
                        "--webui-port", "0",
                    ],
                    env=env,
                    stdout=self._logs[-1],
                    stderr=subprocess.STDOUT,
                )
            )
            _wait_port(self.port)
            self._logs.append(open(f"{self.log_dir}/worker.log", "w"))
            self._procs.append(
                subprocess.Popen(
                    [
                        SPARK_CLASS,
                        "org.apache.spark.deploy.worker.Worker",
                        self.master_url,
                        "--cores", str(self.cores),
                        "--memory", self.memory,
                        "--webui-port", "0",
                    ],
                    env=env,
                    stdout=self._logs[-1],
                    stderr=subprocess.STDOUT,
                )
            )
        except BaseException:
            self.stop()
            raise
        return self

    def stop(self) -> None:
        for p in reversed(self._procs):
            p.terminate()
        for p in reversed(self._procs):
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()
        self._procs.clear()
        for f in self._logs:
            try:
                f.close()
            except OSError:
                pass
        self._logs.clear()

    def __enter__(self) -> "StandaloneCluster":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


def get_cluster_spark(
    app_name: str,
    cluster: StandaloneCluster,
    total_cores: int,
    executor_cores: int = 4,
    executor_mem_mb: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Session against a standalone cluster with ``total_cores /
    executor_cores`` executors, each its own JVM.

    Executor JVMs get the same fault-storm armor as local mode
    (session.py): fixed pre-touched THP heap, ParallelGC, pinned
    allocators, warm-import Python daemon.  Per-executor pre-touch is
    bounded (a few GB with <= ``executor_cores`` GC threads), so startup
    stays cheap even where concurrent faulting is slow.
    """
    _pin_allocators()
    _export_package_path()
    if executor_mem_mb is None:
        executor_mem_mb = executor_cores * 768
    if shuffle_partitions is None:
        shuffle_partitions = max(total_cores, 8)
    # GC threads CAPPED like session.py (min, not max): AlwaysPreTouch with
    # ~N_CPU parallel GC threads self-inflicts the concurrent-fault collapse
    # this file documents — a 16-core executor must not pre-touch 16-way
    gc_threads = max(1, min(executor_cores, 8))
    exec_opts = (
        f"-Xms{executor_mem_mb}m -XX:+UseParallelGC "
        "-XX:+UseTransparentHugePages -XX:+AlwaysPreTouch "
        f"-XX:ParallelGCThreads={gc_threads}"
    )
    # a caller's extraJavaOptions must MERGE with (not clobber) the
    # fixed-heap/pre-touch armor — last-config-wins would silently drop it
    extra_conf = dict(extra_conf or {})
    user_exec_opts = extra_conf.pop("spark.executor.extraJavaOptions", None)
    if user_exec_opts:
        exec_opts = f"{exec_opts} {user_exec_opts}"
    builder = (
        SparkSession.builder.master(cluster.master_url)
        .appName(app_name)
        .config("spark.cores.max", str(total_cores))
        .config("spark.executor.cores", str(executor_cores))
        .config("spark.executor.memory", f"{executor_mem_mb}m")
        .config("spark.executor.extraJavaOptions", exec_opts)
        .config("spark.driver.memory", "4g")
        .config(
            "spark.driver.extraJavaOptions", "-Xms4g -XX:+UseParallelGC"
        )
        # don't start the timed job until every executor registered
        .config("spark.scheduler.minRegisteredResourcesRatio", "1.0")
        .config("spark.scheduler.maxRegisteredResourcesWaitingTime", "300s")
        # delay scheduling only hurts here: every executor is on the same
        # host, so a reduce task gains nothing by waiting (default 3s/level)
        # for the executor holding its map output — but that wait idles
        # cores ONLY on the multi-executor leg (a 1-executor app is always
        # PROCESS_LOCAL), silently taxing exactly the scaling quotient the
        # north rule measures.  On a real multi-host cluster this would be
        # tuned per topology; same-host standalone wants 0.
        .config("spark.locality.wait", "0s")
        # shuffle/spill stream codec: lz4 (Spark's default).  Round 1 set
        # zstd here to cut collapse-prone page faults, but A/B at 480k docs
        # showed the compressor CPU lands in the build's one big reduce
        # stage, which is exactly where the 4N leg is bandwidth-tight: with
        # everything else equal, lz4 shuffle cut the 8-core build wall
        # 65.5s -> 48.5s while the 2-core leg barely moved — the zstd
        # override was taxing the scaling quotient itself.  Published
        # parquet stays zstd (those bytes are read many times; shuffle
        # bytes are read once).
        .config("spark.io.compression.codec", "lz4")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bounded Arrow batches: see session.py — keeps worker allocator
        # high-water marks warm-up-coverable so timed stages never fault
        # fresh pages N-way concurrently
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.rdd.compress", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config(
            "spark.python.daemon.module", "strucmotif_search_spark.spark_daemon"
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in _ALLOC_ENV.items():
        builder = builder.config(f"spark.executorEnv.{k}", v)
    builder = builder.config(
        "spark.executorEnv.PYTHONPATH", os.environ.get("PYTHONPATH", "")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
