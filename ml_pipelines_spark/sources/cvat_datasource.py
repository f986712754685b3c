"""CVAT shapes as a first-class Spark Python DataSource (Spark 4 API).

``spark.read.format("cvat_shapes")`` with per-job input partitions:
the project walk (labels + job list) runs once inside the reader's
constructor; each InputPartition carries a slice of job ids, and
executors pull their jobs' annotations through the transport in
parallel — the same fan-out as ``fetch_shapes_distributed``, but
surfaced through the engine's own source API, so it composes with
``.schema()``, column pruning, and every downstream DataFrame op like
any built-in format.

A Python DataSource is instantiated in Spark's planning worker, not in
the session process, so the transport cannot be passed as live driver
state — it must travel inside the (string) options:

- ``transport``: dotted ``module:attr`` path, imported where needed —
  the production shape (an authenticated client factory at module
  scope);
- ``transport_pickle``: base64 cloudpickle of the callable (use
  :func:`pickled_transport_option`) — carries closures and test
  fixtures by value.

Usage::

    spark.dataSource.register(CvatShapesDataSource)
    df = (spark.read.format("cvat_shapes")
          .option("project_id", 1)
          .option("transport", "my_pkg.transports:prod_client")
          .load())
"""

from __future__ import annotations

import base64
import importlib
from collections.abc import Iterator

from pyspark import cloudpickle
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .cvat import SHAPE_SCHEMA, CvatSource, Transport, _shape_rows


def pickled_transport_option(transport: Transport) -> str:
    """Serialize a transport callable for the ``transport_pickle``
    option (cloudpickle → base64 string)."""
    return base64.b64encode(cloudpickle.dumps(transport)).decode("ascii")


def _resolve_transport(options: dict) -> Transport:
    if "transport_pickle" in options:
        return cloudpickle.loads(
            base64.b64decode(options["transport_pickle"])
        )
    if "transport" in options:
        mod, _, attr = options["transport"].partition(":")
        return getattr(importlib.import_module(mod), attr)
    raise ValueError(
        "cvat_shapes requires a transport (module:attr) or "
        "transport_pickle option"
    )


class _JobSlice(InputPartition):
    def __init__(self, job_ids: list[int]):
        self.job_ids = job_ids


class _CvatShapesReader(DataSourceReader):
    def __init__(self, options: dict):
        self._project_id = int(options["project_id"])
        self._n_partitions = int(options.get("n_partitions", "8"))
        self._transport = _resolve_transport(options)
        proj = CvatSource(self._transport).fetch_project(self._project_id)
        self._labels = proj["labels"]
        self._job_ids = [int(job) for _task, job in proj["jobs"]]

    def partitions(self) -> list[InputPartition]:
        n = max(1, min(self._n_partitions, len(self._job_ids)))
        slices = [self._job_ids[i::n] for i in range(n)]
        return [_JobSlice(s) for s in slices if s]

    def read(self, partition: _JobSlice) -> Iterator[tuple]:
        src = CvatSource(self._transport)
        for job_id in partition.job_ids:
            ann = src.fetch_annotations(job_id)
            yield from _shape_rows(self._project_id, job_id, ann, self._labels)


class CvatShapesDataSource(DataSource):
    """format("cvat_shapes") — options: project_id (required), one of
    transport ("module:attr") / transport_pickle (base64 cloudpickle),
    and n_partitions (default 8)."""

    @classmethod
    def name(cls) -> str:
        return "cvat_shapes"

    def schema(self):
        return SHAPE_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _CvatShapesReader(self.options)
