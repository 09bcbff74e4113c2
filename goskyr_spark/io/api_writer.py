"""API sink — parity with /root/reference/internal/output/api.go.

Per-source delete-then-insert (A2 in SURVEY §2.4): the first item of each
sourceUrl issues a DELETE of future events (?sourceUrl=…&datetime=<first
date, UTC '2006-01-02 15:04'>) before POSTing batches of ``batch_size``
(default 100) as JSON arrays with basic auth, expecting 201.

The Spark-scale variant is ``write_df``: foreachPartition batching with
the per-source DELETE executed once globally (driver-side, from the
distinct sources + min dates — one tiny aggregation) so concurrent
partitions can't race the delete. Requires ``requests``; import-gated.
"""

from __future__ import annotations

from datetime import timezone
from urllib.parse import quote

from ..kernels.gocompat import go_rfc3339


class APIWriterError(Exception):
    pass


class APIWriter:
    def __init__(self, uri, user="", password="", batch_size=100,
                 dry_run=False, session=None):
        import requests

        self.uri = uri
        self.user = user
        self.password = password
        self.batch_size = batch_size or 100
        self.dry_run = dry_run
        self.http = session or requests.Session()
        self.deleted_sources = set()
        self.nr_written = 0

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
        if not batch:
            return 0
        payload = [{k: (go_rfc3339(v) if hasattr(v, "utcoffset") else v)
                    for k, v in item.items()} for item in batch]
        target = self.uri if not self.dry_run else self.uri
        resp = self.http.post(target, json=payload,
                              auth=(self.user, self.password), timeout=60)
        if resp.status_code != 201:
            raise APIWriterError(
                f"error while adding items. Status Code: {resp.status_code}")
        return len(batch)

    def write(self, items):
        """Streaming write with the reference's per-source delete-dedup.
        Assumes items within one source are date-ascending (api.go:48)."""
        batch = []
        for item in items:
            if not self.dry_run:
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


def write_df(items_df, uri, user="", password="", batch_size=100):
    """Distributed API sink: one driver-side DELETE per source (min date),
    then foreachPartition POST batches."""
    from pyspark.sql import functions as F

    firsts = (items_df.groupBy("sourceUrl")
              .agg(F.min("date").alias("first_date")).collect())
    w = APIWriter(uri, user, password, batch_size)
    for r in firsts:
        w._delete_source(r["sourceUrl"], r["first_date"])

    def sink(rows):
        pw = APIWriter(uri, user, password, batch_size, dry_run=True)
        pw.write(r.asDict() for r in rows)

    items_df.foreachPartition(sink)
