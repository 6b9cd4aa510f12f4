#!/usr/bin/env python3
"""Compile the pure-Python parse kernel to C extensions (optional).

The kernel's correctness is pinned independently of how it's executed
(3,883 byte-equal goldens + error-text parity + differential fuzz vs
the C reference), which makes it safe to swap the interpreter for a
compiled build: run this script where Cython (preferred) or mypyc is
installed and the hot modules become .so extensions importing
transparently in place of the .py files — Python's import machinery
prefers extension modules, and deleting the .so files restores the
pure-Python path. Nothing else in the repo changes.

    python3 tools/build_compiled.py          # build (Cython or mypyc)
    python3 tools/build_compiled.py --clean  # remove built extensions

This sandbox ships NEITHER compiler and forbids installs, so the
compiled path cannot be exercised here; the script import-gates both
and explains. Expected effect, from Cython's typical 2-4x on
branch/call-dense interpreter-bound code (these modules are exactly
that: a state machine plus a dispatch loop; see the hot-loop profile
in README's performance notes): single-core parse throughput 2x+,
which is the gap SURVEY.md §6 names against the C reference's
per-core number. After building, re-run the full gate
(tools/check_goldens.py, tools/diff_error_texts.py,
tools/fuzz_diff.py, pytest tests/) — the goldens decide, not the
compiler.
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys

KERNEL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "html_parser_spark", "kernel")

# hottest first (profile order); tree/charref are small but on the
# per-token path. api/extract/encoding stay interpreted: they run
# once per document, not per token, and encoding does codec-table
# probing at import that mypyc handles poorly.
MODULES = ["tokenizer.py", "treebuilder.py", "charref.py", "tree.py"]


def clean() -> None:
    removed = []
    for pat in ("*.so", "*.pyd", "*.c"):
        for p in glob.glob(os.path.join(KERNEL, pat)):
            os.remove(p)
            removed.append(p)
    build_dir = os.path.join(KERNEL, "build")
    if os.path.isdir(build_dir):
        shutil.rmtree(build_dir)
    print(f"removed {len(removed)} built artifacts")


def _run_setup(tag: str, ext_expr: str) -> bool:
    """Write a temp setup.py whose ext_modules come from `ext_expr`
    (a Python expression over MODULE_PATHS), run build_ext --inplace,
    clean up."""
    setup_src = (
        "from setuptools import setup\n"
        f"MODULE_PATHS = {[os.path.join(KERNEL, m) for m in MODULES]!r}\n"
        f"setup(ext_modules={ext_expr})\n"
    )
    setup_path = os.path.join(KERNEL, f"_setup_{tag}.py")
    with open(setup_path, "w") as f:
        f.write(setup_src)
    try:
        r = subprocess.run(
            [sys.executable, setup_path, "build_ext", "--inplace"],
            cwd=os.path.dirname(KERNEL), capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
            return False
    finally:
        os.remove(setup_path)
    return True


def build_cython() -> bool:
    try:
        import Cython  # noqa: F401
    except ImportError:
        return False
    return _run_setup(
        "cython",
        "__import__('Cython.Build', fromlist=['cythonize']).cythonize("
        "MODULE_PATHS, compiler_directives={'language_level': '3'})")


def build_mypyc() -> bool:
    try:
        from mypyc.build import mypycify  # noqa: F401
    except ImportError:
        return False
    return _run_setup(
        "mypyc",
        "__import__('mypyc.build', fromlist=['mypycify'])"
        ".mypycify(MODULE_PATHS)")


def main() -> int:
    if "--clean" in sys.argv:
        clean()
        return 0
    if build_cython():
        print("built with Cython; verify with tools/check_goldens.py "
              "+ tools/fuzz_diff.py + pytest tests/")
        return 0
    if build_mypyc():
        print("built with mypyc; verify with tools/check_goldens.py "
              "+ tools/fuzz_diff.py + pytest tests/")
        return 0
    print("neither Cython nor mypyc is importable in this environment "
          "(this sandbox forbids installs); the pure-Python kernel "
          "stays active — install Cython and re-run to compile",
          file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
