"""Structured experiment logging: stdout + text + JSON-lines backends,
master-gated.

Capability parity with the reference's DLLogger setup
(/root/reference/dlib/dllogger/logger.py:198-330: ArbStdOutBackend,
ArbTextStreamBackend, ArbJSONStreamBackend, is_master gating), re-designed
as one small class instead of a backend registry.
"""
from __future__ import annotations

import datetime
import json
import os
import sys
import threading
from typing import Any, Dict, Optional, Union


class ExpLogger:
    _instance: Optional["ExpLogger"] = None

    def __init__(self, outdir: Optional[str] = None, is_master: bool = True,
                 flush_at_log: bool = True, stdout: bool = True):
        self.is_master = is_master
        self.flush_at_log = flush_at_log
        self.stdout = stdout
        self._lock = threading.Lock()
        self._txt = None
        self._jsonl = None
        if outdir is not None and is_master:
            os.makedirs(outdir, exist_ok=True)
            self._txt = open(os.path.join(outdir, "log.txt"), "a")
            self._jsonl = open(os.path.join(outdir, "log.json"), "a")

    # ------------------------------------------------------------- api
    def log(self, data: Union[str, Dict[str, Any]], step: Any = None) -> None:
        if not self.is_master:
            return
        ts = datetime.datetime.now().isoformat(timespec="seconds")
        if isinstance(data, str):
            line = f"[{ts}] {data}" if step is None else f"[{ts}] ({step}) {data}"
            payload = {"ts": ts, "step": step, "msg": data}
        else:
            line = f"[{ts}] ({step}) " + " ".join(
                f"{k}={v}" for k, v in data.items())
            payload = {"ts": ts, "step": step, **data}
        with self._lock:
            if self.stdout:
                print(line, file=sys.stderr)
            if self._txt is not None:
                self._txt.write(line + "\n")
                if self.flush_at_log:
                    self._txt.flush()
            if self._jsonl is not None:
                self._jsonl.write(json.dumps(payload, default=str) + "\n")
                if self.flush_at_log:
                    self._jsonl.flush()

    def flush(self) -> None:
        with self._lock:
            for f in (self._txt, self._jsonl):
                if f is not None:
                    f.flush()

    def close(self) -> None:
        with self._lock:
            for f in (self._txt, self._jsonl):
                if f is not None:
                    f.close()
        self._txt = self._jsonl = None


def init_logger(outdir: Optional[str] = None, is_master: bool = True,
                stdout: bool = True) -> ExpLogger:
    ExpLogger._instance = ExpLogger(outdir, is_master=is_master, stdout=stdout)
    return ExpLogger._instance


def get_logger() -> ExpLogger:
    if ExpLogger._instance is None:
        ExpLogger._instance = ExpLogger(None, is_master=True)
    return ExpLogger._instance


def log(data, step=None) -> None:
    get_logger().log(data, step=step)
