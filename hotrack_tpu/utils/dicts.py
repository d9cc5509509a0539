"""Loss-dict algebra, logging helpers, timers.

Parity: /root/reference/utils.py (add_dict :46-69, merge_dict :31-35,
log_loss_summary :101-109, Timer :150-163, cvt_numpy :200-212).
"""

from __future__ import annotations

import time

import numpy as np


def cvt_numpy(x):
    """Recursively convert device arrays / scalars to numpy (utils.py:200-212)."""
    if isinstance(x, dict):
        return {k: cvt_numpy(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return type(x)(cvt_numpy(v) for v in x)
    if hasattr(x, "__array__"):
        return np.asarray(x)
    return x


def detach_dict(d):
    return cvt_numpy(d)


def add_dict(total: dict, new: dict):
    """Accumulate scalar entries recursively (utils.py:46-69)."""
    for k, v in new.items():
        if isinstance(v, dict):
            total.setdefault(k, {})
            add_dict(total[k], v)
        else:
            v = float(np.asarray(v).mean()) if hasattr(v, "__array__") else float(v)
            total[k] = total.get(k, 0.0) + v


def merge_dict(store: dict, new: dict):
    """Append entries into per-key lists (utils.py:31-35)."""
    for k, v in new.items():
        store.setdefault(k, []).append(v)


def divide_dict(total: dict, n: int) -> dict:
    out = {}
    for k, v in total.items():
        out[k] = divide_dict(v, n) if isinstance(v, dict) else v / max(n, 1)
    return out


def log_loss_summary(loss_dict: dict, cnt: int, log_fn):
    """Report averaged losses (utils.py:101-109)."""
    for k, v in loss_dict.items():
        if isinstance(v, dict):
            for kk, vv in v.items():
                log_fn(f"{k}/{kk}", vv / max(cnt, 1))
        else:
            log_fn(k, v / max(cnt, 1))


def dump_csv(path: str, rows: dict, per_instance_keys=None):
    """Per-instance CSV dump (utils.py:262-279): rows maps column name ->
    list/array of per-instance values."""
    import csv

    keys = list(per_instance_keys or rows.keys())
    cols = {k: np.asarray(rows[k]).reshape(-1) for k in keys}
    n = max(len(v) for v in cols.values())
    with open(path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(keys)
        for i in range(n):
            writer.writerow([cols[k][i] if i < len(cols[k]) else ""
                             for k in keys])


class Timer:
    """Wall-clock segment timer (utils.py:150-163)."""

    def __init__(self, on: bool = True):
        self.on = on
        if on:
            self.last = time.time()

    def tick(self, name: str = ""):
        if not self.on:
            return 0.0
        now = time.time()
        dt = now - self.last
        self.last = now
        if name:
            print(f"[timer] {name}: {dt:.4f}s")
        return dt
