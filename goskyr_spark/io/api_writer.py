"""API sink — parity with /root/reference/internal/output/api.go.

Per-source delete-then-insert (A2 in SURVEY §2.4): the first item of each
sourceUrl issues a DELETE of future events (?sourceUrl=…&datetime=<first
date, UTC '2006-01-02 15:04'>) before POSTing batches of ``batch_size``
(default 100) as JSON arrays with basic auth, expecting 201.

Dry-run parity (api.go:139-149): a dry run NEVER writes — it skips the
DELETE and, if ``uri_dry_run`` is set, POSTs each batch to the validation
endpoint and records the result; the write count stays 0. Non-201 on a
real POST is log-and-continue (writeBatch api.go:151-158 counts the batch
as 0 written and keeps going) — it does NOT raise, which also means a
Spark task retry can't be triggered by a flaky endpoint mid-partition.

The Spark-scale variant is ``write_df``: foreachPartition batching with
the per-source DELETE executed once globally (driver-side, from the
distinct sources + min dates — one tiny aggregation) so concurrent
partitions can't race the delete. Requires ``requests``; import-gated.
"""

from __future__ import annotations

import logging
from datetime import timezone
from urllib.parse import quote

from ..kernels.gocompat import go_rfc3339

logger = logging.getLogger("goskyr_spark.api_writer")


class APIWriterError(Exception):
    pass


class APIWriter:
    def __init__(self, uri, user="", password="", batch_size=100,
                 dry_run=False, uri_dry_run="", session=None,
                 skip_delete=False):
        import requests

        self.uri = uri
        self.user = user
        self.password = password
        self.batch_size = batch_size or 100
        self.dry_run = dry_run
        self.uri_dry_run = uri_dry_run
        # internal: write_df issues the per-source DELETE once globally,
        # so its per-partition writers skip it (this is NOT dry-run)
        self.skip_delete = skip_delete
        self.http = session or requests.Session()
        self.deleted_sources = set()
        self.nr_written = 0
        self.validation_results = []

    def _delete_source(self, source_url, first_date):
        dt = first_date.astimezone(timezone.utc).strftime("%Y-%m-%d %H:%M")
        url = (f"{self.uri}?sourceUrl={quote(source_url, safe='')}"
               f"&datetime={quote(dt, safe='')}")
        resp = self.http.delete(url, auth=(self.user, self.password),
                                timeout=60)
        if resp.status_code != 200:
            # fatal in the reference (api.go:74-88)
            raise APIWriterError(
                f"error while deleting items. Status Code: "
                f"{resp.status_code}\nUrl: {url} Response: {resp.text}")

    def _write_batch(self, batch):
        """writeBatch (api.go:138-160): dry run validates (no write,
        count 0); real POST expects 201, logs-and-continues otherwise."""
        if not batch:
            return 0
        payload = [{k: (go_rfc3339(v) if hasattr(v, "utcoffset") else v)
                    for k, v in item.items()} for item in batch]
        if self.dry_run:
            if self.uri_dry_run:
                try:
                    resp = self.http.post(self.uri_dry_run, json=payload,
                                          timeout=60)
                    self.validation_results.append(resp.text)
                except Exception as e:  # validation failure is non-fatal
                    logger.error("error while validating batch: %s", e)
            # in dry run mode we do not write anything to the api
            return 0
        resp = self.http.post(self.uri, json=payload,
                              auth=(self.user, self.password), timeout=60)
        if resp.status_code != 201:
            logger.error("error while adding items. Status Code: %s",
                         resp.status_code)
            return 0
        return len(batch)

    def write(self, items):
        """Streaming write with the reference's per-source delete-dedup.
        Assumes items within one source are date-ascending (api.go:48)."""
        batch = []
        for item in items:
            if not self.dry_run and not self.skip_delete:
                src = item.get("sourceUrl")
                if not isinstance(src, str):
                    continue
                if src not in self.deleted_sources:
                    self.deleted_sources.add(src)
                    first_date = item.get("date")
                    if first_date is None or not hasattr(first_date,
                                                         "utcoffset"):
                        continue
                    self._delete_source(src, first_date)
            batch.append(item)
            if len(batch) == self.batch_size:
                self.nr_written += self._write_batch(batch)
                batch = []
        self.nr_written += self._write_batch(batch)
        return self.nr_written


def write_df(items_df, uri, user="", password="", batch_size=100,
             dry_run=False, uri_dry_run=""):
    """Distributed API sink: one driver-side DELETE per source (min date),
    then foreachPartition POST batches (each partition writer skips the
    delete — it already happened globally). Dry run does neither write
    nor delete. Non-201 POSTs are log-and-continue inside the partition
    (reference parity), so a task retry from an unrelated failure can
    re-POST at most the retried partition — at-least-once, like any
    non-transactional HTTP sink; exactly-once needs an idempotency key
    server-side."""
    from pyspark.sql import functions as F

    if not dry_run:
        firsts = (items_df.groupBy("sourceUrl")
                  .agg(F.min("date").alias("first_date")).collect())
        w = APIWriter(uri, user, password, batch_size)
        for r in firsts:
            w._delete_source(r["sourceUrl"], r["first_date"])

    def sink(rows):
        pw = APIWriter(uri, user, password, batch_size, dry_run=dry_run,
                       uri_dry_run=uri_dry_run, skip_delete=True)
        pw.write(r.asDict() for r in rows)

    items_df.foreachPartition(sink)
