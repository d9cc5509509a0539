"""Machine fingerprint for persistent-XLA-cache directory names.

The persistent compile cache stores serialized AOT executables. CPU-target
executables embed the compile machine's feature set, and XLA's AOT loader
only WARNS on a mismatch ("could lead to execution errors such as SIGILL")
— measured round 5: a cache directory carried over from a container with a
different CPU feature set (and CPU-target entries produced by the remote
TPU compile helper's machine) segfaulted the full test suite inside
`compilation_cache.get_executable_and_time`. Scoping cache directories by
a short hash of the host's CPU flags (plus the requested backend) makes a
feature-set change select a fresh directory instead of loading
incompatible binaries.
"""

from __future__ import annotations

import hashlib
import platform


def machine_fingerprint() -> str:
    """Short stable hash of the host CPU's feature set."""
    txt = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    txt += line
                    break
    except OSError:
        pass
    return hashlib.sha1(txt.encode()).hexdigest()[:10]
