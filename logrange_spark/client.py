"""Python client for the HTTP serving layer (stdlib urllib only).

The analogue of the reference's api.Client (api/client.go): Querier,
Ingestor and Admin methods over one connection. Pagination follows the
reference contract — pass the previous response's ``nextQueryRequest``
back to ``query`` (api/querier.go:41-83).
"""

from __future__ import annotations

import json
import urllib.request
from typing import Any, Iterator


class Client:
    def __init__(self, base_url: str, timeout_s: float = 75.0):
        self.base_url = base_url.rstrip("/")
        self.timeout_s = timeout_s

    def _post(self, path: str, body: dict) -> dict:
        req = urllib.request.Request(
            f"{self.base_url}{path}",
            data=json.dumps(body).encode("utf-8"),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as e:
            payload = e.read()
            try:
                err = json.loads(payload).get("err") or payload.decode()
            except Exception:
                err = payload.decode(errors="replace")
            raise RuntimeError(f"{path}: {err}") from e

    def ping(self) -> bool:
        with urllib.request.urlopen(
            f"{self.base_url}/api/v1/ping", timeout=self.timeout_s
        ) as resp:
            return json.loads(resp.read()).get("status") == "ok"

    def query(
        self,
        query: str | dict,
        pos: str = "",
        offset: int = 0,
        limit: int | None = None,
        wait_timeout: int = 0,
    ) -> dict:
        """One Query round-trip. ``query`` may be a previous response's
        ``nextQueryRequest`` dict for consecutive page reads."""
        if isinstance(query, dict):
            body = dict(query)
        else:
            body = {"query": query, "pos": pos, "offset": offset,
                    "waitTimeout": wait_timeout}
            if limit is not None:
                body["limit"] = limit
        return self._post("/api/v1/query", body)

    def pages(self, query: str, limit: int = 1000, **kw) -> Iterator[list[dict]]:
        """Iterate all result pages (stops on the first empty page)."""
        res = self.query(query, limit=limit, **kw)
        while res["events"]:
            yield res["events"]
            res = self.query(res["nextQueryRequest"])

    def write(
        self,
        tags: str | dict,
        events: list[Any],
        fields: str | dict | None = None,
    ) -> dict:
        evs = []
        for ev in events:
            if isinstance(ev, dict):
                evs.append(ev)
            else:  # (ts, msg[, fields]) tuple
                evs.append(
                    {
                        "timestamp": ev[0],
                        "message": ev[1],
                        "fields": ev[2] if len(ev) > 2 else {},
                    }
                )
        body = {"tags": tags, "events": evs}
        if fields:
            body["fields"] = fields
        return self._post("/api/v1/write", body)

    def execute(self, query: str) -> str:
        return self._post("/api/v1/execute", {"query": query})["output"]

    def ensure_pipe(self, name: str, tags_cond: str = "", filter_cond: str = "") -> dict:
        """Create the pipe if it doesn't exist; returns its definition
        (reference: api/pipes.go EnsurePipe)."""
        return self._post(
            "/api/v1/pipes",
            {"name": name, "tagsCond": tags_cond, "filterCond": filter_cond},
        )
