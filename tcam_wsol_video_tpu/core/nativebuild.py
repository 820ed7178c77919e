"""Host-arch tagging for the on-demand native (.so) builds.

The native helpers (ops/native.py, metrics/native_sweep.py,
data/native_loader.py) compile with `g++ -march=native` and cache the
.so next to the source.  A library built on (or copied from) a machine
with a different CPU microarchitecture loads fine but can SIGILL on the
first AVX-512 instruction — mid-evaluation, past any import-time guard.
The fix: the library file name embeds a short hash of the host's
machine type + CPU flags, so a foreign .so is simply never picked up
and a fresh one is built for this host (advisor r3 finding).
"""
from __future__ import annotations

import hashlib
import platform
from functools import lru_cache


@lru_cache(maxsize=1)
def host_tag() -> str:
    """Short stable tag for this host's CPU capabilities."""
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    h = hashlib.sha256(f"{platform.machine()}|{feats}".encode()).hexdigest()
    return f"{platform.machine()}-{h[:8]}"


def tagged_lib_path(native_dir: str, stem: str) -> str:
    import os
    return os.path.join(native_dir, f"{stem}-{host_tag()}.so")
