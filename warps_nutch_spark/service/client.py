"""NutchClient analog: a thin HTTP client for the REST admin service.

Reference: ``client/NutchClient.java`` (the engine-side convenience
client used to talk to a running master). Pure stdlib urllib so
external workers / scripts can drive a crawl with no dependencies.
"""

from __future__ import annotations

import json
import time
import urllib.parse
import urllib.request


class NutchServiceClient:
    def __init__(self, endpoint: str, timeout_s: float = 30.0):
        self.endpoint = endpoint.rstrip("/")
        self.timeout_s = timeout_s

    def _call(self, method: str, path: str, body=None, form: bool = False):
        url = self.endpoint + path
        data = None
        headers = {}
        if body is not None:
            if form:
                data = urllib.parse.urlencode(body).encode("utf-8")
                headers["Content-Type"] = "application/x-www-form-urlencoded"
            else:
                data = json.dumps(body).encode("utf-8")
                headers["Content-Type"] = "application/json"
        req = urllib.request.Request(url, data=data, method=method,
                                     headers=headers)
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            return json.loads(resp.read().decode("utf-8"))

    # -- admin ----------------------------------------------------------
    def status(self) -> dict:
        return self._call("GET", "/admin")

    def stop_server(self, force: bool = False) -> dict:
        q = "?force=true" if force else ""
        return self._call("GET", f"/admin/stop{q}")

    # -- config ----------------------------------------------------------
    def list_configs(self) -> list[str]:
        return self._call("GET", "/config")

    def get_config(self, conf_id: str) -> dict:
        return self._call("GET", f"/config/{conf_id}")

    def get_property(self, conf_id: str, prop: str):
        return self._call("GET", f"/config/{conf_id}/{prop}")

    def create_config(self, conf_id: str, params: dict | None = None,
                      force: bool = False) -> str:
        return self._call("POST", f"/config/{conf_id}",
                          {"configId": conf_id, "params": params or {},
                           "force": force})

    def set_property(self, conf_id: str, prop: str, value) -> None:
        self._call("PUT", f"/config/{conf_id}/{prop}", {"value": value})

    def delete_config(self, conf_id: str) -> None:
        self._call("DELETE", f"/config/{conf_id}")

    # -- jobs -------------------------------------------------------------
    def create_job(self, jtype: str, args: dict, conf_id: str | None = None,
                   crawl_id: str | None = None) -> str:
        body = {"type": jtype, "args": args}
        if conf_id:
            body["confId"] = conf_id
        if crawl_id:
            body["crawlId"] = crawl_id
        return self._call("POST", "/job/create", body)

    def job_info(self, job_id: str) -> dict:
        return self._call("GET", f"/job/{job_id}")

    def list_jobs(self, state: str | None = None) -> list[dict]:
        q = f"?state={state}" if state else ""
        return self._call("GET", f"/job{q}")

    def stop_job(self, job_id: str) -> bool:
        return self._call("GET", f"/job/{job_id}/stop")

    def abort_job(self, job_id: str) -> bool:
        return self._call("GET", f"/job/{job_id}/abort")

    def wait_job(self, job_id: str, timeout_s: float = 300.0,
                 poll_s: float = 0.2) -> dict:
        t0 = time.time()
        while True:
            info = self.job_info(job_id)
            if info["state"] not in ("IDLE", "RUNNING", "STOPPING"):
                return info
            if time.time() - t0 > timeout_s:
                raise TimeoutError(f"job {job_id} still {info['state']}")
            time.sleep(poll_s)

    # -- db / seed ----------------------------------------------------------
    def db_query(self, **db_filter) -> dict:
        return self._call("POST", "/db", db_filter)

    def create_seed(self, urls: list[str]) -> str:
        return self._call(
            "POST", "/seed/create",
            {"seedUrls": [{"url": u} for u in urls]},
        )["path"]
