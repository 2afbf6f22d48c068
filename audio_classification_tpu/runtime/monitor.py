"""Background resource monitor (CPU/RSS via psutil + TPU memory via JAX).

Mirrors the reference's `_resource_monitor` thread and aggregate fields
(reference: overlap3_core.py:232-308): samples every `interval` seconds,
aggregates avg/peak. GPU fields become device-memory stats from
`jax.local_devices()[0].memory_stats()` but keep the reference's field
names so metrics.json consumers (batch_eval) keep working.
"""
from __future__ import annotations

import os
import threading
from statistics import mean
from typing import Any, Dict, List, Optional

try:
    import psutil
except ImportError:  # pragma: no cover
    psutil = None


def _device_mem_mb() -> Dict[str, float]:
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats() or {}
        out = {}
        if "bytes_in_use" in stats:
            out["gpu_mem_allocated"] = stats["bytes_in_use"] / (1024**2)
        if "peak_bytes_in_use" in stats:
            out["gpu_max_mem_allocated"] = stats["peak_bytes_in_use"] / (1024**2)
        if "bytes_reserved" in stats or "bytes_limit" in stats:
            out["gpu_mem_reserved"] = stats.get("bytes_reserved", stats.get("bytes_limit", 0)) / (1024**2)
        return out
    except Exception:
        return {}


class CPUMonitor:
    """Process CPU sampler with core-normalized aggregate
    (reference: evaluate_with_sources.py:447-511): raw cpu_percent samples,
    stop() returns avg/peak normalized by logical core count plus raw."""

    def __init__(self, interval: float = 0.5):
        self.interval = max(0.1, interval)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.samples: List[float] = []
        self.proc = psutil.Process(os.getpid()) if psutil else None
        self.started = self.proc is not None
        if self.proc:
            self.proc.cpu_percent(interval=None)

    def start(self):
        if not self.started:
            return

        def _loop():
            while not self._stop.wait(self.interval):
                try:
                    self.samples.append(self.proc.cpu_percent(interval=None))
                except Exception:
                    break

        self._thread = threading.Thread(target=_loop, daemon=True)
        self._thread.start()

    def stop(self) -> Dict[str, Any]:
        import numpy as np

        if not self.started:
            return {"enabled": False, "reason": "psutil_unavailable"}
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)
        if not self.samples:
            return {"enabled": True, "count": 0}
        raw_avg = float(np.mean(self.samples))
        raw_peak = float(np.max(self.samples))
        cores = (psutil.cpu_count(logical=True) if psutil else 1) or 1
        return {
            "enabled": True,
            "count": len(self.samples),
            "interval_sec": self.interval,
            "cpu_logical_cores": cores,
            "cpu_avg_percent": round(min(100.0, raw_avg / cores), 2),
            "cpu_peak_percent": round(min(100.0, raw_peak / cores), 2),
            "cpu_avg_percent_raw": round(raw_avg, 2),
            "cpu_peak_percent_raw": round(raw_peak, 2),
            "normalized": True,
        }


class ResourceMonitor:
    def __init__(self, interval: float = 0.5):
        self.interval = max(0.1, interval)
        self.samples: List[dict] = []
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._proc = psutil.Process(os.getpid()) if psutil else None

    def _loop(self):
        if self._proc:
            self._proc.cpu_percent(interval=None)
        while not self._stop.wait(self.interval):
            if not self._proc:
                break
            try:
                rec = {
                    "cpu": self._proc.cpu_percent(interval=None),
                    "rss_mb": self._proc.memory_info().rss / (1024**2),
                }
                rec.update(_device_mem_mb())
                self.samples.append(rec)
            except Exception:
                break

    def start(self):
        if self._proc is None:
            return
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self):
        if self._proc is None:
            return
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)

    def aggregate(self) -> Dict[str, Any]:
        if not self.samples:
            return {}
        cpu = [s["cpu"] for s in self.samples if "cpu" in s]
        rss = [s["rss_mb"] for s in self.samples if "rss_mb" in s]
        alloc = [s.get("gpu_mem_allocated", 0.0) for s in self.samples]
        res = [s.get("gpu_mem_reserved", 0.0) for s in self.samples]
        return {
            "cpu_avg": round(mean(cpu), 2) if cpu else None,
            "cpu_peak": round(max(cpu), 2) if cpu else None,
            "rss_avg_mb": round(mean(rss), 2) if rss else None,
            "rss_peak_mb": round(max(rss), 2) if rss else None,
            "gpu_mem_allocated_avg_mb": round(mean(alloc), 2) if alloc else None,
            "gpu_mem_allocated_peak_mb": round(max(alloc), 2) if alloc else None,
            "gpu_mem_reserved_peak_mb": round(max(res), 2) if res else None,
        }
