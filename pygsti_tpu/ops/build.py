"""Build the native extensions with g++ (no pybind11 dependency)."""

from __future__ import annotations

import os
import subprocess
import sysconfig


def build_extension(quiet=False, name="fastcircuitparser"):
    """Compile <name>.cpp into this package directory as _<name>.
    Returns True on success."""
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, name + ".cpp")
    ext_suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(here, "_" + name + ext_suffix)
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return True
    include = sysconfig.get_paths()["include"]
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
           "-I", include, src, "-o", out]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if res.returncode != 0:
        if not quiet:
            print("native build failed:\n" + res.stderr)
        return False
    return True


if __name__ == "__main__":
    for name in ("fastcircuitparser", "fastopcalc"):
        ok = build_extension(quiet=False, name=name)
        print(name, "built" if ok else "FAILED")
